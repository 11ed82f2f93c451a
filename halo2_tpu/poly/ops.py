"""Polynomial helpers used by the prover/verifier (device-batched).

The multiopen provers work in *evaluation form* wherever possible (TPU-first:
Kate divisions become batched pointwise ops + one batch inversion instead of
sequential synthetic division; commitments use the Lagrange-basis SRS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, mont
from ..field.bn254 import FR_MOD
from ..field.limbs import int_to_mont_limbs
from .ntt import powers_table


def scalar_mont(x: int):
    """Host int -> [16] device-friendly Montgomery limb vector."""
    return jnp.asarray(int_to_mont_limbs(x % FR_MOD, FR_MOD))


@functools.partial(jax.jit, static_argnums=())
def _horner_eval(coeffs, x_m):
    """Evaluate sum_i c_i x^i by log-tree: powers table x inner product.

    coeffs: [..., n, 16]; x_m: [16] Montgomery scalar.
    """
    n = coeffs.shape[-2]
    k = max(n - 1, 1).bit_length()
    # powers 1..x^{n-1} built by in-trace doubling (log n muls)
    pw = x_m[None, :]
    pw_full = jnp.broadcast_to(jnp.asarray(int_to_mont_limbs(1, FR_MOD)), (1, 16))
    cur = pw_full
    shift = x_m
    while cur.shape[0] < n:
        nxt = mont.mul(FR, cur, shift[None, :])
        cur = jnp.concatenate([cur, nxt], axis=0)
        shift = mont.mul(FR, shift, shift)
    pw_all = cur[:n]
    prod = mont.mul(FR, coeffs, pw_all)
    # tree-sum over the n axis
    m = prod.shape[-2]
    while m > 1:
        half = m // 2
        lo = prod[..., :half, :]
        hi = prod[..., half : 2 * half, :]
        rest = prod[..., 2 * half :, :]
        prod = jnp.concatenate([mont.add(FR, lo, hi), rest], axis=-2)
        m = prod.shape[-2]
    return prod[..., 0, :]


def eval_poly_at(coeffs, x: int) -> int:
    """Evaluate a coefficient-form device poly at a host point; returns int."""
    from ..field.limbs import mont_limbs_to_int

    out = _horner_eval(coeffs, scalar_mont(x))
    return mont_limbs_to_int(np.asarray(out), FR_MOD)


@functools.partial(jax.jit, static_argnums=())
def eval_polys_at(coeffs_batch, x_m):
    """[m, n, 16] coefficient polys evaluated at one Montgomery point."""
    return _horner_eval(coeffs_batch, x_m)


def eval_grouped(groups):
    """Batched multipoint evaluation with ONE host readback.

    groups: list of (point_int, [poly, ...]) with every poly a [n, 16]
    Montgomery device array.  Returns a parallel list of lists of ints.

    One `eval_polys_at` dispatch per point (they queue without blocking) and
    a single concatenated readback — through a high-latency relay this is
    the difference between ~2 round trips and ~2 per opened polynomial
    (the reference's create_proof evaluates serially on the CPU,
    /root/reference/circuits/src/utils.rs:105-120 via halo2's evaluate).
    """
    import jax.numpy as jnp

    from ..field.limbs import mont_limbs_to_int

    outs = []
    for point, polys in groups:
        xm = scalar_mont(point)
        # dispatch per poly, not one [m, n, 16] stack: the batched horner
        # graph holds several m*n-sized temporaries live and exhausted HBM
        # at k=20 with ~8 opened polys (round-4 prove-scale post-mortem);
        # per-poly programs queue asynchronously all the same
        for poly in polys:
            outs.append(eval_polys_at(poly[None], xm))
    if not outs:
        return []
    flat = np.asarray(jnp.concatenate(outs, axis=0))  # single readback
    res = []
    pos = 0
    for _point, polys in groups:
        m = len(polys)
        res.append([mont_limbs_to_int(flat[pos + i], FR_MOD) for i in range(m)])
        pos += m
    return res


@jax.jit
def kate_divide_eval(values, eval_at_z, z_minus_omega_inv):
    """(p - p(z)) / (X - z) in evaluation form over the domain.

    values: [n, 16] evaluations p(w^i); eval_at_z: [16]; z_minus_omega_inv:
    [n, 16] precomputed 1/(w^i - z).  Exact polynomial division when p(z) is
    the true evaluation.
    """
    num = mont.sub(FR, values, eval_at_z[None, :])
    neg = mont.neg(FR, num)  # (p(z) - p(w^i))
    return mont.mul(FR, neg, z_minus_omega_inv)  # / (z - w^i)


@functools.lru_cache(maxsize=64)
def domain_points(k: int, omega: int):
    """[n, 16] Montgomery values w^0..w^{n-1} (device, cached)."""
    return powers_table(omega, k)


def z_minus_omega_inverses(k: int, omega: int, z: int):
    """[n, 16] of 1/(z - w^i) on device."""
    pts = domain_points(k, omega)
    z_m = scalar_mont(z)
    diff = mont.sub(FR, jnp.broadcast_to(z_m, pts.shape), pts)
    return mont.batch_inv(FR, diff)


@jax.jit
def add_polys(a, b):
    return mont.add(FR, a, b)


@jax.jit
def scale_poly(a, s_m):
    return mont.mul(FR, a, s_m[None, :])


@jax.jit
def linear_combine(polys, coeffs_m):
    """sum_i coeffs[i] * polys[i]; polys [m, n, 16], coeffs_m [m, 16]."""
    prod = mont.mul(FR, polys, coeffs_m[:, None, :])
    m = prod.shape[0]
    while m > 1:
        half = m // 2
        lo = prod[:half]
        hi = prod[half : 2 * half]
        rest = prod[2 * half :]
        prod = jnp.concatenate([mont.add(FR, lo, hi), rest], axis=0)
        m = prod.shape[0]
    return prod[0]
