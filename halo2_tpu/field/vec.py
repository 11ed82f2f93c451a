"""Vector-engine field layer: Pallas TPU kernels over limb-major layout.

This is the performance backend of the framework (the role halo2curves'
hand-written x86 Montgomery assembly plays for the reference, SURVEY.md 2.2).
The portable jnp formulation in mont.py traces every limb step through XLA,
which materializes dozens of HBM temporaries per op; these kernels instead
keep all 32 lazy columns of a Montgomery multiply in VMEM and emit ONE fused
kernel per bulk op.

Layout ("vec"): an array of n field elements is [16, n/128, 128] uint32 —
limb axis FIRST (each limb slice of a 128-element group is exactly one
(8,128)-shaped vreg block), batch rows in the middle, 128 lanes last.
`to_vec` / `from_vec` convert from the framework's [..., n, 16] layout.

Kernel math: 16x16-bit limbs, Comba product scanning (32 lazy columns,
all < 2^22, exact in uint32), CIOS-style Montgomery reduction base 2^16,
one conditional subtract at the end (inputs canonical < p => output < p).

Every public op takes a FieldSpec (FR or FQ) so the same kernels serve the
scalar field (NTT/poly pipeline) and the base field (EC/MSM pipeline).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bn254 import LIMB_BITS, N_LIMBS
from .mont import FieldSpec

L = N_LIMBS  # 16
LANES = 128
MASK = np.uint32(0xFFFF)
GROUP = 1024  # elements per grid program (8 sublane-rows of 128 lanes)
SUB = GROUP // LANES  # 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# layout conversion
# ---------------------------------------------------------------------------


def vec_rows(n: int) -> int:
    return -(-n // LANES)


def to_vec(a):
    """[n, 16] limbs-last -> [16, rows, 128] limb-major (zero-padded)."""
    n = a.shape[0]
    rows = -(-n // GROUP) * SUB  # pad to a whole number of kernel groups
    at = jnp.transpose(a, (1, 0))  # [16, n]
    pad = rows * LANES - n
    if pad:
        at = jnp.pad(at, ((0, 0), (0, pad)))
    return at.reshape(L, rows, LANES)


def from_vec(v, n: int):
    """[16, rows, 128] -> [n, 16]."""
    flat = v.reshape(L, -1)[:, :n]
    return jnp.transpose(flat, (1, 0))


# ---------------------------------------------------------------------------
# kernel bodies (operate on lists of [S, 128] vreg blocks)
# ---------------------------------------------------------------------------


def _comba_columns(a, b):
    """32 lazy columns of the 16x16-limb product; each < 32 * 2^16 < 2^22."""
    los = [None] * (2 * L)
    his = [None] * (2 * L)
    for k in range(2 * L - 1):
        lo = None
        hi = None
        for i in range(max(0, k - L + 1), min(k, L - 1) + 1):
            p = a[i] * b[k - i]
            pl_ = p & MASK
            ph = p >> LIMB_BITS
            lo = pl_ if lo is None else lo + pl_
            hi = ph if hi is None else hi + ph
        los[k] = lo
        his[k + 1] = hi
    cols = []
    for k in range(2 * L):
        v = los[k]
        if his[k] is not None:
            v = his[k] if v is None else v + his[k]
        cols.append(v)
    return cols


def _redc(cols, p16, n0inv):
    """Montgomery reduction of 32 lazy columns -> 16 canonical limbs (< p)."""
    t = list(cols)
    for i in range(L):
        ti = t[i]
        m = ((ti & MASK) * n0inv) & MASK
        for j in range(L):
            mp = m * p16[j]
            t[i + j] = t[i + j] + (mp & MASK)
            t[i + j + 1] = t[i + j + 1] + (mp >> LIMB_BITS)
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
    out = []
    carry = None
    for j in range(L):
        v = t[L + j] if carry is None else t[L + j] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_p(out, p16)


def _cond_sub_p(r, p16):
    """r (< 2p, canonical limbs) minus p if >= p."""
    borrow = None
    diff = []
    for j in range(L):
        d = r[j] + np.uint32(1 << LIMB_BITS) - p16[j]
        if borrow is not None:
            d = d - borrow
        diff.append(d & MASK)
        borrow = np.uint32(1) - (d >> LIMB_BITS)
    keep = borrow != 0
    return [jnp.where(keep, x, y) for x, y in zip(r, diff)]


def _add_body(a, b, p16):
    s = [x + y for x, y in zip(a, b)]
    # carry-propagate (sums < 2^17)
    out = []
    carry = None
    for j in range(L):
        v = s[j] if carry is None else s[j] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return _cond_sub_p(out, p16)


def _sub_body(a, b, p16):
    # a - b + p, then conditional subtract
    s = [x + np.uint32(p) - y for x, y, p in zip(a, b, p16)]
    out = []
    carry = None
    for j in range(L):
        v = s[j] if carry is None else s[j] + carry
        # limbs may be "negative" in wrap-around uint32: add borrow space
        v = v + np.uint32(1 << LIMB_BITS)
        out.append(v & MASK)
        carry = (v >> LIMB_BITS) - np.uint32(1)  # signed carry in {-1, 0, 1}
    return _cond_sub_p(out, p16)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _field_consts(spec: FieldSpec):
    p16 = tuple(np.uint32(int(x)) for x in spec.p_limbs)
    n0inv = np.uint32(spec.n0inv)
    return p16, n0inv


def _specs(n_in: int):
    bs = pl.BlockSpec((L, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    return [bs] * n_in, bs


@functools.lru_cache(maxsize=None)
def _vmul_call(spec: FieldSpec, rows: int):
    p16, n0inv = _field_consts(spec)

    def body(a, b):
        return _redc(_comba_columns(a, b), p16, n0inv)

    def kernel(a_ref, b_ref, o_ref):
        res = body([a_ref[i] for i in range(L)], [b_ref[i] for i in range(L)])
        for i in range(L):
            o_ref[i] = res[i]

    if _interpret():
        return lambda a, b: jnp.stack(body([a[i] for i in range(L)],
                                           [b[i] for i in range(L)]))
    in_specs, out_spec = _specs(2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        grid=(rows // SUB,),
        in_specs=in_specs,
        out_specs=out_spec,
    )


@functools.lru_cache(maxsize=None)
def _vadd_call(spec: FieldSpec, rows: int, subtract: bool):
    p16, _ = _field_consts(spec)
    body = _sub_body if subtract else _add_body

    def kernel(a_ref, b_ref, o_ref):
        a = [a_ref[i] for i in range(L)]
        b = [b_ref[i] for i in range(L)]
        res = body(a, b, p16)
        for i in range(L):
            o_ref[i] = res[i]

    if _interpret():
        return lambda a, b: jnp.stack(body([a[i] for i in range(L)],
                                           [b[i] for i in range(L)], p16))
    in_specs, out_spec = _specs(2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        grid=(rows // SUB,),
        in_specs=in_specs,
        out_specs=out_spec,
    )


@functools.lru_cache(maxsize=None)
def _vbutterfly_call(spec: FieldSpec, rows: int):
    """(lo, hi, tw) -> (lo + hi*tw, lo - hi*tw), one fused kernel."""
    p16, n0inv = _field_consts(spec)

    def body(lo, hi, tw):
        t = _redc(_comba_columns(hi, tw), p16, n0inv)
        return _add_body(lo, t, p16), _sub_body(lo, t, p16)

    def kernel(lo_ref, hi_ref, tw_ref, e_ref, o_ref):
        e, o = body([lo_ref[i] for i in range(L)],
                    [hi_ref[i] for i in range(L)],
                    [tw_ref[i] for i in range(L)])
        for i in range(L):
            e_ref[i] = e[i]
            o_ref[i] = o[i]

    if _interpret():
        def fallback(lo, hi, tw):
            e, o = body([lo[i] for i in range(L)], [hi[i] for i in range(L)],
                        [tw[i] for i in range(L)])
            return jnp.stack(e), jnp.stack(o)
        return fallback
    in_specs, out_spec = _specs(3)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        ),
        grid=(rows // SUB,),
        in_specs=in_specs,
        out_specs=(out_spec, out_spec),
    )


@functools.lru_cache(maxsize=None)
def _vscale_call(spec: FieldSpec, rows: int, fma: bool):
    """a * s (one scalar, SMEM-resident 16 limbs) [+ b].  The per-element
    quotient fold `value*y + gate` is this kernel — one pass instead of a
    scalar broadcast materialization plus two."""
    p16, n0inv = _field_consts(spec)

    def body(a, s, b):
        t = _redc(_comba_columns(a, s), p16, n0inv)
        return _add_body(t, b, p16) if fma else t

    def kernel(*refs):
        if fma:
            a_ref, s_ref, b_ref, o_ref = refs
            b = [b_ref[i] for i in range(L)]
        else:
            a_ref, s_ref, o_ref = refs
            b = None
        a = [a_ref[i] for i in range(L)]
        s = [s_ref[i] for i in range(L)]
        out = body(a, s, b)
        for i in range(L):
            o_ref[i] = out[i]

    if _interpret():
        def fallback(a, s, b=None):
            sl = [jnp.broadcast_to(s[i], a.shape[1:]) for i in range(L)]
            out = body([a[i] for i in range(L)], sl,
                       None if b is None else [b[i] for i in range(L)])
            return jnp.stack(out)
        return fallback

    bs = pl.BlockSpec((L, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    in_specs = [bs, s_spec] + ([bs] if fma else [])
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        grid=(rows // SUB,),
        in_specs=in_specs,
        out_specs=bs,
    )


def vscale(spec: FieldSpec, a, s):
    """a [16, rows, 128] times one Montgomery scalar s [16]."""
    a = _ensure_vec(a)
    return _vscale_call(spec, a.shape[1], False)(a, s)


def vfma_scalar(spec: FieldSpec, a, s, b):
    """a * s + b for one scalar s [16] — the quotient y-fold."""
    a, b = _ensure_vec(a), _ensure_vec(b)
    return _vscale_call(spec, a.shape[1], True)(a, s, b)


@functools.lru_cache(maxsize=None)
def _vadd_scalar_call(spec: FieldSpec, rows: int):
    p16, _ = _field_consts(spec)

    def body(a, s):
        return _add_body(a, s, p16)

    def kernel(a_ref, s_ref, o_ref):
        out = body([a_ref[i] for i in range(L)], [s_ref[i] for i in range(L)])
        for i in range(L):
            o_ref[i] = out[i]

    if _interpret():
        def fallback(a, s):
            sl = [jnp.broadcast_to(s[i], a.shape[1:]) for i in range(L)]
            return jnp.stack(body([a[i] for i in range(L)], sl))
        return fallback

    bs = pl.BlockSpec((L, SUB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((L, rows, LANES), jnp.uint32),
        grid=(rows // SUB,),
        in_specs=[bs, s_spec],
        out_specs=bs,
    )


def vadd_scalar(spec: FieldSpec, a, s):
    """a + s for one scalar s [16]."""
    a = _ensure_vec(a)
    return _vadd_scalar_call(spec, a.shape[1])(a, s)


def _ensure_vec(x):
    assert x.ndim == 3 and x.shape[0] == L and x.shape[2] == LANES, x.shape
    assert x.shape[1] % SUB == 0, x.shape
    return x


def vmul(spec: FieldSpec, a, b):
    a, b = _ensure_vec(a), _ensure_vec(b)
    return _vmul_call(spec, a.shape[1])(a, b)


def vadd(spec: FieldSpec, a, b):
    a, b = _ensure_vec(a), _ensure_vec(b)
    return _vadd_call(spec, a.shape[1], False)(a, b)


def vsub(spec: FieldSpec, a, b):
    a, b = _ensure_vec(a), _ensure_vec(b)
    return _vadd_call(spec, a.shape[1], True)(a, b)


def vbutterfly(spec: FieldSpec, lo, hi, tw):
    lo, hi, tw = _ensure_vec(lo), _ensure_vec(hi), _ensure_vec(tw)
    return _vbutterfly_call(spec, lo.shape[1])(lo, hi, tw)


# ---------------------------------------------------------------------------
# 2D u32 transpose kernel: XLA's [n, 32] -> [32, n] transpose runs ~100x off
# HBM bandwidth; Mosaic's in-VMEM transpose unit does much better.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _transpose_call(n: int, cols: int, block_rows: int = 2048):
    def kernel(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((cols, n), jnp.uint32),
        grid=(n // block_rows,),
        in_specs=[
            pl.BlockSpec(
                (block_rows, cols), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(
            (cols, block_rows), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
    )


def transpose_u32(x):
    """[n, cols] u32 -> [cols, n] via a tiled Mosaic transpose (falls back to
    jnp.transpose off-TPU or on shape mismatch)."""
    n, cols = x.shape
    if _interpret() or n % 2048 or cols % 8:
        return jnp.transpose(x, (1, 0))
    return _transpose_call(n, cols)(x)


@functools.lru_cache(maxsize=None)
def _transpose_to_rows_call(cols: int, n: int, block: int = 2048):
    def kernel(x_ref, o_ref):
        o_ref[...] = jnp.transpose(x_ref[...], (1, 0))

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, cols), jnp.uint32),
        grid=(n // block,),
        in_specs=[
            pl.BlockSpec((cols, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((block, cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )


def transpose_to_rows_u32(x):
    """[cols, n] u32 -> [n, cols] (plane-major to row-major) via the Mosaic
    transpose unit.  This is the layout prep for embedding-style row
    gathers: jnp.take(rows, idx, axis=0) pulls CONTIGUOUS cols*4-byte rows,
    which XLA's gather handles at per-row (not per-element) cost."""
    cols, n = x.shape
    if _interpret() or n % 2048 or cols % 8:
        return jnp.transpose(x, (1, 0))
    return _transpose_to_rows_call(cols, n)(x)
