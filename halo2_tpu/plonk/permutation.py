"""Permutation (copy-constraint) argument: keygen sigma polys + prover z polys.

Equivalent of the reference's external halo2 permutation argument
(SURVEY.md 2.2 "equality/permutation argument").  Cycle structure is built by
the classic next-pointer-swap merge; sigma_j(w^i) = delta^{c'} * w^{r'} where
(c', r') is the cycle-successor of (j, i) and delta generates the non-2-adic
part of Fr* (distinct cosets per column).

Grand-product z polynomials (one per chunk of `degree - 2` columns) are
computed on device: batched numerator/denominator products, one batch
inversion, one associative-scan prefix product.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, mont
from ..field.bn254 import FR_DELTA, FR_MOD
from ..field.limbs import ints_to_mont_limbs
from ..poly.ntt import powers_table
from ..poly.ops import scalar_mont


class PermutationAssembly:
    """Union-find + cycle next-pointers over (column_position, row)."""

    def __init__(self, num_columns: int, n: int):
        self.n = n
        self.num_columns = num_columns
        size = num_columns * n
        self.mapping = list(range(size))  # cycle successor
        self.parent = list(range(size))  # union-find
        self.rank = [0] * size

    def _idx(self, col: int, row: int) -> int:
        return col * self.n + row

    def _find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def add_copy(self, col_a: int, row_a: int, col_b: int, row_b: int) -> None:
        a = self._idx(col_a, row_a)
        b = self._idx(col_b, row_b)
        ra, rb = self._find(a), self._find(b)
        if ra == rb:
            return  # already in the same cycle
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1
        self.mapping[a], self.mapping[b] = self.mapping[b], self.mapping[a]

    def sigma_values(self) -> list:
        """Per column-position: [n] host ints sigma_j(w^i) = delta^{c'} w^{r'}."""
        n = self.n
        # delta^c and omega^r tables
        from ..poly.domain import get_domain

        k = n.bit_length() - 1
        dom = get_domain(k)
        omega_pows = [1] * n
        w = 1
        for i in range(n):
            omega_pows[i] = w
            w = w * dom.omega % FR_MOD
        delta_pows = [pow(FR_DELTA, c, FR_MOD) for c in range(self.num_columns)]
        out = []
        for c in range(self.num_columns):
            col_vals = []
            base = c * n
            for r in range(n):
                m = self.mapping[base + r]
                c2, r2 = divmod(m, n)
                col_vals.append(delta_pows[c2] * omega_pows[r2] % FR_MOD)
            out.append(col_vals)
        return out


def z_polys(values, sigmas, beta: int, gamma: int, chunk_len: int, k: int,
            usable_row: int):
    """Grand-product z polys per chunk, chained, pre-blinding.

    values/sigmas: [P, n, 16] device Montgomery arrays in permutation-column
    order.  Returns list of [n, 16] arrays.
    """
    P, n, _ = values.shape
    from ..poly.domain import get_domain

    dom = get_domain(k)
    omega_pows = powers_table(dom.omega, k)  # [n,16] Montgomery
    beta_m = scalar_mont(beta)
    gamma_m = scalar_mont(gamma)

    chunks = [(s, min(s + chunk_len, P)) for s in range(0, P, chunk_len)]
    zs = []
    last_z = scalar_mont(1)
    for (s, e) in chunks:
        num, den = _chunk_products(
            values[s:e], sigmas[s:e], omega_pows, beta_m, gamma_m, s
        )
        z = _prefix_product(num, den, last_z)
        zs.append(z)
        last_z = z[usable_row]
    return zs


@functools.partial(jax.jit, static_argnums=(5,))
def _chunk_products(vals, sigs, omega_pows, beta_m, gamma_m, delta_base: int):
    """num_i = prod_j (v_j + beta delta^j w^i + gamma), den_i likewise with sigma."""
    m, n, _ = vals.shape
    num = None
    den = None
    for j in range(m):
        delta_j = scalar_mont(pow(FR_DELTA, delta_base + j, FR_MOD))
        id_term = mont.mul(FR, mont.mul(FR, omega_pows, beta_m[None, :]), delta_j[None, :])
        t_num = mont.add(FR, mont.add(FR, vals[j], id_term), gamma_m[None, :])
        sig_term = mont.mul(FR, sigs[j], beta_m[None, :])
        t_den = mont.add(FR, mont.add(FR, vals[j], sig_term), gamma_m[None, :])
        num = t_num if num is None else mont.mul(FR, num, t_num)
        den = t_den if den is None else mont.mul(FR, den, t_den)
    return num, den


@jax.jit
def _prefix_product(num, den, last_z):
    ratio = mont.mul(FR, num, mont.batch_inv(FR, den))  # [n,16]
    # z[0] = last_z; z[i] = last_z * prod_{t<i} ratio[t]
    pref = jax.lax.associative_scan(lambda a, b: mont.mul(FR, a, b), ratio, axis=0)
    one = jnp.asarray(ints_to_mont_limbs([1], FR_MOD))
    shifted = jnp.concatenate([one, pref[:-1]], axis=0)
    return mont.mul(FR, shifted, jnp.broadcast_to(last_z[None, :], shifted.shape))
