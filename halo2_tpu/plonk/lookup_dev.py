"""Device-side lookup witness generation.

The host path (plonk/lookup.py) runs O(n) Python-bigint loops per lookup
(expression eval, `sorted()` over 254-bit ints, the z recurrence) — serial
milliseconds that dominate proving once the domain is large (ROADMAP item:
"prover host overhead").  This module keeps the identical values (the proof
bytes do not change) but computes them on device:

  * compressed input/table: the quotient path's expression evaluator over the
    n-domain (rotations are rolls), theta-fold in Montgomery form;
  * halo2's permute_expression_pair (reference external
    `halo2_proofs::plonk::lookup::prover::permute_expression_pair`,
    SURVEY.md 2.2): a 16-key lexicographic `lax.sort` on canonical limbs,
    a vectorized binary search of the sorted input into the sorted table,
    and rank bookkeeping with cumsums/gathers instead of scatter;
  * the grand product z: batched numerator/denominator products, ONE batch
    inversion and ONE associative prefix scan (same scheme as the
    permutation argument's z_polys).

Sorting canonical (non-Montgomery) limbs most-significant-first gives
exactly the ascending-integer order the host path produces, so the witness
is bit-identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, mont
from ..frontend.expression import evaluate
from ..poly.ops import scalar_mont


def _roll_rot(arr, rotation: int):
    if rotation == 0:
        return arr
    return jnp.roll(arr, -rotation, axis=0)


def eval_expr_lagrange(expr, fixed_lag, advice_lag, instance_lag, n: int):
    """Evaluate one expression over the n-domain (device, Montgomery)."""

    def const(v):
        return jnp.broadcast_to(scalar_mont(v), (1, 16))

    out = evaluate(
        expr,
        constant=const,
        fixed=lambda q: _roll_rot(fixed_lag[q.column_index], q.rotation),
        advice=lambda q: _roll_rot(advice_lag[q.column_index], q.rotation),
        instance=lambda q: _roll_rot(instance_lag[q.column_index], q.rotation),
        selector=lambda q: (_ for _ in ()).throw(
            AssertionError("unfinalized selector")
        ),
        add=lambda a, b: mont.add(FR, a, b),
        mul=lambda a, b: mont.mul(FR, a, b),
        neg=lambda a: mont.neg(FR, a),
        scale=lambda a, s: mont.mul(
            FR, a, jnp.broadcast_to(scalar_mont(s), (1, 16))
        ),
    )
    return jnp.broadcast_to(out, (n, 16))


def compress_lagrange(exprs, theta: int, fixed_lag, advice_lag, instance_lag,
                      n: int):
    """fold(acc * theta + e) across expressions, Montgomery [n, 16]."""
    theta_m = scalar_mont(theta)
    acc = jnp.zeros((n, 16), dtype=jnp.uint32)
    for e in exprs:
        ev = eval_expr_lagrange(e, fixed_lag, advice_lag, instance_lag, n)
        acc = mont.add(FR, mont.mul(FR, acc, theta_m[None, :]), ev)
    return acc


def _sort_rows(vals):
    """Ascending lexicographic sort of canonical [m, 16] limb rows (limb 15
    most significant)."""
    keys = tuple(vals[:, i] for i in range(15, -1, -1))
    out = jax.lax.sort(keys, num_keys=16, is_stable=False, dimension=0)
    return jnp.stack(out[::-1], axis=1)


def _lex_lt(a, b):
    """a < b rowwise over canonical [m, 16] limbs."""
    lt = jnp.zeros(a.shape[:-1], dtype=bool)
    eq = jnp.ones(a.shape[:-1], dtype=bool)
    for i in range(15, -1, -1):
        ai, bi = a[..., i], b[..., i]
        lt = lt | (eq & (ai < bi))
        eq = eq & (ai == bi)
    return lt


def _searchsorted_rows(T, v):
    """Leftmost insertion index of each row of v [q, 16] into the ascending
    sorted table T [m, 16]; vectorized binary search (log2(m) gathers)."""
    m = T.shape[0]
    q = v.shape[0]
    lo = jnp.zeros((q,), dtype=jnp.int32)
    hi = jnp.full((q,), m, dtype=jnp.int32)
    for _ in range(max(1, (m - 1).bit_length())):
        mid = (lo + hi) // 2
        go_right = _lex_lt(jnp.take(T, jnp.clip(mid, 0, m - 1), axis=0), v)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    return lo


@jax.jit
def _permute_pair_jit(A_can, T_can):
    """Sorted-input / permuted-table construction over canonical limb rows.

    A_can, T_can: [u, 16] canonical.  Returns (A_sorted, S_perm, ok) with ok
    False iff some input value is absent from the table."""
    u = A_can.shape[0]
    A_s = _sort_rows(A_can)
    T_s = _sort_rows(T_can)

    idx = jnp.arange(u, dtype=jnp.int32)
    prev = jnp.roll(A_s, 1, axis=0)
    first = (idx == 0) | jnp.any(A_s != prev, axis=1)

    pos = _searchsorted_rows(T_s, A_s)  # non-decreasing (A_s ascending)
    hit = jnp.all(
        jnp.take(T_s, jnp.clip(pos, 0, u - 1), axis=0) == A_s, axis=1
    ) & (pos < u)
    ok = jnp.all(jnp.where(first, hit, True))

    # table index j is consumed iff j appears in pos (pos maps every input
    # value to its leftmost table index)
    ss = jnp.searchsorted(pos, idx, side="left").astype(jnp.int32)
    used = jnp.take(pos, jnp.clip(ss, 0, u - 1)) == idx
    # leftover r-th unused table row: smallest j with cumsum(~used)[j] == r+1
    cum_unused = jnp.cumsum((~used).astype(jnp.int32))
    sel = jnp.searchsorted(
        cum_unused, jnp.arange(1, u + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    leftover = jnp.take(T_s, jnp.clip(sel, 0, u - 1), axis=0)

    r = jnp.cumsum((~first).astype(jnp.int32)) - 1
    fill = jnp.take(leftover, jnp.clip(r, 0, u - 1), axis=0)
    S_p = jnp.where(first[:, None], A_s, fill)
    return A_s, S_p, ok


def permute_pair_dev(A_mont, S_mont, u: int):
    """Device permute_expression_pair: Montgomery [n, 16] compressed columns
    in, (A' mont, S' mont) [u, 16] out.  Raises ValueError like the host path
    when an input value is missing from the table."""
    A_can = mont.from_mont(FR, A_mont[:u])
    T_can = mont.from_mont(FR, S_mont[:u])
    A_s, S_p, ok = _permute_pair_jit(A_can, T_can)
    if not bool(ok):
        raise ValueError("lookup input not in table")
    return mont.to_mont(FR, A_s), mont.to_mont(FR, S_p)


@jax.jit
def _z_rows_jit(A, S, Ap, Sp, beta_m, gamma_m):
    """Inclusive z prefix [u+1, 16] (Montgomery): z[0] = 1,
    z[i+1] = z[i] * (A_i+beta)(S_i+gamma) / ((A'_i+beta)(S'_i+gamma))."""
    num = mont.mul(
        FR,
        mont.add(FR, A, beta_m[None, :]),
        mont.add(FR, S, gamma_m[None, :]),
    )
    den = mont.mul(
        FR,
        mont.add(FR, Ap, beta_m[None, :]),
        mont.add(FR, Sp, gamma_m[None, :]),
    )
    ratio = mont.mul(FR, num, mont.batch_inv(FR, den))
    pref = jax.lax.associative_scan(
        lambda a, b: mont.mul(FR, a, b), ratio, axis=0
    )
    one = mont.one_like(FR, (1,))
    return jnp.concatenate([one, pref], axis=0)


def lookup_z_dev(A_mont, S_mont, Ap_mont, Sp_mont, beta: int, gamma: int,
                 u: int):
    """Grand-product rows [u+1, 16] Montgomery, device."""
    return _z_rows_jit(
        A_mont[:u], S_mont[:u], Ap_mont, Sp_mont,
        scalar_mont(beta), scalar_mont(gamma),
    )
