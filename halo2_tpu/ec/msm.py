"""Multi-scalar multiplication on TPU (Pippenger, sort + segmented scan).

Replaces the reference's external `halo2_proofs::arithmetic::best_multiexp`
(SURVEY.md 2.2).  TPU-first design — Pippenger's bucket scatter is
gather/scatter-hostile on a vector machine, so bucket accumulation is
reformulated as data-parallel primitives:

  per window w (c-bit digits):
    1. digit extraction from the raw scalar limbs (pure bit ops);
    2. sort points by digit (XLA sort);
    3. segmented inclusive prefix-scan of Jacobian adds
       (lax.associative_scan with a (point, segment-flag) monoid) — the last
       element of each digit-segment IS that bucket's sum;
    4. bucket tails gathered via searchsorted;
    5. weighted bucket reduction sum_v v * B_v as a reversed prefix-scan
       (suffix sums) followed by a tree reduction.

  windows combine with a Horner loop of c doublings (fori_loop, device-side).

The whole MSM is one jit per (n, c) shape; the per-window pipeline is traced
once under lax.scan.  The multi-chip variant (points sharded, window partials
psum-reduced over ICI) lives in dist/msm_sharded.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field.bn254 import FQ_MOD, FR_MOD
from ..field.limbs import ints_to_limbs, mont_limbs_to_int
from . import host as ec_host
from . import jax_g1 as g1

SCALAR_BITS = 256


def _digits_for_windows(scalars, c: int):
    """[n, 16] raw scalar limbs -> [n_windows, n] uint32 digits."""
    n_windows = (SCALAR_BITS + c - 1) // c
    outs = []
    for w in range(n_windows):
        bit0 = w * c
        limb, off = divmod(bit0, 16)
        lo = scalars[:, limb] >> off
        if off + c > 16 and limb + 1 < scalars.shape[1]:
            lo = lo | (scalars[:, limb + 1] << (16 - off))
        outs.append(lo & np.uint32((1 << c) - 1))
    return jnp.stack(outs)


def _segment_scan_op(a, b):
    (ax, ay, az, af) = a
    (bx, by, bz, bf) = b
    s = g1.padd((ax, ay, az), (bx, by, bz))
    keep_b = bf != 0
    x = jnp.where(keep_b[..., None], bx, s[0])
    y = jnp.where(keep_b[..., None], by, s[1])
    z = jnp.where(keep_b[..., None], bz, s[2])
    return (x, y, z, af | bf)


def _window_sum(PX, PY, digits, c: int):
    """Bucket-accumulate one window; returns a single Jacobian point [16]x3."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    sd = digits[order]
    X = jnp.take(PX, order, axis=0)
    Y = jnp.take(PY, order, axis=0)
    one = jnp.broadcast_to(jnp.asarray(g1._ONE), (n, 16))
    Z = one

    flags = jnp.concatenate(
        [jnp.ones((1,), jnp.uint32), (sd[1:] != sd[:-1]).astype(jnp.uint32)]
    )
    vx, vy, vz, _ = jax.lax.associative_scan(
        _segment_scan_op, (X, Y, Z, flags), axis=0
    )

    # bucket tails (bucket 0 excluded — zero weight)
    queries = jnp.arange(1, 1 << c, dtype=jnp.uint32)
    idx = jnp.searchsorted(sd, queries, side="right") - 1
    safe = jnp.clip(idx, 0, n - 1)
    valid = (idx >= 0) & (sd[safe] == queries)
    BX = jnp.take(vx, safe, axis=0)
    BY = jnp.take(vy, safe, axis=0)
    BZ = jnp.take(vz, safe, axis=0)
    ident = g1.identity((queries.shape[0],))
    B = g1.select_point(valid, (BX, BY, BZ), ident)

    # weighted sum: S = sum_v v * B_v = sum of suffix sums
    sx, sy, sz = jax.lax.associative_scan(
        lambda a, b: g1.padd(a, b), tuple(coord[::-1] for coord in B), axis=0
    )
    T = (sx, sy, sz)  # T[j] = sum_{v >= 2^c-1-j} B_v; sum_j T[j] = sum_v v*B_v

    # tree-reduce T (pad to power of two with identity)
    m = 1 << c  # len(T) = 2^c - 1; pad by 1
    pad = g1.identity((1,))
    T = tuple(jnp.concatenate([t, p], axis=0) for t, p in zip(T, pad))
    steps = c
    for _ in range(steps):
        half = T[0].shape[0] // 2
        T = g1.padd(
            tuple(t[:half] for t in T), tuple(t[half:] for t in T)
        )
    return tuple(t[0] for t in T)


@jax.jit
def _msm_tiny(PX, PY, scalars):
    """Bit-serial MSB-first Straus MSM for tiny point counts.

    Compile-light by design: the fori_loop body holds ONE doubling, ONE
    masked select, and log2(n) tree adds — roughly 3 + log2(n) inlined
    point bodies versus the ~15 of the sort+scan window pipeline.  On the
    single-core XLA:CPU path (the 8-virtual-device mesh dryrun and the
    test suite) compile time tracks traced-graph size, so the tiny sizes
    the dryrun provers use (n <= 256 per shard) go through this instead
    of `_msm_core`.  Runtime is O(SCALAR_BITS * n) point adds — only
    sensible at tiny n, where dispatch overhead dominates anyway.
    """
    n = PX.shape[0]
    one = jnp.broadcast_to(jnp.asarray(g1._ONE), (n, 16))
    # bits[b] = bit (255 - b) of every scalar — MSB-first, [256, n]
    limbs = jnp.transpose(scalars, (1, 0))  # [16, n]
    shifts = jnp.arange(15, -1, -1, dtype=jnp.uint32)  # MSB-first in-limb
    bits = ((limbs[:, None, :] >> shifts[None, :, None]) & 1).astype(jnp.uint32)
    bits = bits[::-1].reshape(SCALAR_BITS, n)  # limb 15 holds the top bits

    def body(i, acc):
        m = jax.lax.dynamic_slice_in_dim(bits, i, 1, axis=0)[0] != 0  # [n]
        P = (PX, PY, jnp.where(m[:, None], one, jnp.uint32(0)))
        while P[0].shape[0] > 1:
            half = P[0].shape[0] // 2
            rest = tuple(t[2 * half :] for t in P)
            P = g1.padd(
                tuple(t[:half] for t in P), tuple(t[half : 2 * half] for t in P)
            )
            if rest[0].shape[0]:
                P = tuple(
                    jnp.concatenate([a, r], axis=0) for a, r in zip(P, rest)
                )
        acc = g1.pdouble(acc)
        return g1.padd(acc, tuple(t[0] for t in P))

    init = g1.identity(())
    return jax.lax.fori_loop(0, SCALAR_BITS, body, init)


TINY_MSM_MAX = 256


@functools.partial(jax.jit, static_argnums=(3,))
def _msm_core(PX, PY, scalars, c: int):
    digits_all = _digits_for_windows(scalars, c)  # [n_windows, n]
    n_windows = digits_all.shape[0]

    def body(carry, digits):
        w = _window_sum(PX, PY, digits, c)
        return carry, w

    _, windows = jax.lax.scan(body, 0, digits_all)  # each coord [n_windows, 16]

    # Horner combine from the most significant window down
    def horner(i, acc):
        wi = n_windows - 1 - i
        def dbl_body(_, a):
            return g1.pdouble(a)
        acc = jax.lax.fori_loop(0, c, dbl_body, acc)
        wpt = tuple(coord[wi] for coord in windows)
        return g1.padd(acc, wpt)

    init = tuple(coord[n_windows - 1] for coord in windows)
    result = jax.lax.fori_loop(1, n_windows, lambda i, a: horner(i, a), init)
    return result


def msm_device(PX, PY, scalars, c: int | None = None):
    """MSM over device arrays.

    PX, PY: [n, 16] Montgomery Fq limb arrays of affine points (identity not
    allowed among inputs — matches SRS/commitment usage).
    scalars: [n, 16] raw (non-Montgomery) canonical Fr limbs.
    Returns a Jacobian point (x, y, z) of [16] arrays.
    """
    n = PX.shape[0]
    if c is None and n <= TINY_MSM_MAX:
        return _msm_tiny(PX, PY, scalars)
    if c is None:
        c = 16 if n >= (1 << 16) else (8 if n >= (1 << 7) else 4)
    return _msm_core(PX, PY, scalars, c)


def msm_host(points, scalars, c: int | None = None):
    """Convenience wrapper: host affine points + int scalars -> host affine."""
    assert len(points) == len(scalars) and points
    PX, PY, _ = g1.points_to_device(points)
    s = jnp.asarray(ints_to_limbs([x % FR_MOD for x in scalars]))
    return g1.point_to_host(msm_device(PX, PY, s, c))
