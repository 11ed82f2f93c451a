"""Batched Montgomery field arithmetic in JAX (TPU-native).

Replaces the reference's `halo2curves` Fr/Fq arithmetic (SURVEY.md section
2.2) with a vector formulation sized for the TPU VPU:

  * an element is 16 limbs of 16 bits stored as uint32, limb axis last
    ([..., 16]); every op is elementwise/batched over the leading axes, so a
    polynomial of 2^k coefficients is a [2^k, 16] array and the whole NTT /
    MSM pipeline stays on-device;
  * 16-bit limbs make every partial product exact in uint32
    ((2^16-1)^2 < 2^32) and let column accumulations stay < 2^23, so no
    64-bit arithmetic is ever needed (TPUs have no native u64 multiply);
  * everything stays in Montgomery form (R = 2^256) end-to-end.

All functions take a `FieldSpec` (Fr or Fq) first and operate on canonical
Montgomery residues (< p); every public op re-canonicalizes its result.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from . import bn254
from .bn254 import LIMB_BITS, LIMB_MASK, N_LIMBS
from .limbs import int_to_limbs

U32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)


@dataclass(frozen=True, eq=False)  # eq=False: hashable by identity for jit
class FieldSpec:
    """Static per-field constants, kept as numpy so they trace as literals."""

    name: str
    p: int  # modulus (host int)
    n0inv: int  # -p^{-1} mod 2^16
    p_limbs: np.ndarray = field(repr=False, default=None)
    one: np.ndarray = field(repr=False, default=None)  # R mod p (Montgomery 1)
    r2: np.ndarray = field(repr=False, default=None)  # R^2 mod p
    zero: np.ndarray = field(repr=False, default=None)

    @staticmethod
    def make(name: str, p: int, n0inv: int) -> "FieldSpec":
        return FieldSpec(
            name=name,
            p=p,
            n0inv=n0inv,
            p_limbs=int_to_limbs(p),
            one=int_to_limbs(bn254.R % p),
            r2=int_to_limbs((bn254.R * bn254.R) % p),
            zero=np.zeros((N_LIMBS,), dtype=np.uint32),
        )


FR = FieldSpec.make("Fr", bn254.FR_MOD, bn254.FR_N0INV)
FQ = FieldSpec.make("Fq", bn254.FQ_MOD, bn254.FQ_N0INV)


# ---------------------------------------------------------------------------
# low-level limb helpers
# ---------------------------------------------------------------------------


def _mul_wide(a, b):
    """Schoolbook product of two 16-limb values -> 32 lazy columns.

    Columns are bounded by 32 * 2^16 < 2^21, far below uint32 overflow.
    The limb loop is a lax.scan (16 steps) to keep the trace tiny — each step
    is still a fat vector op over the whole batch.
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + (N_LIMBS,))
    b = jnp.broadcast_to(b, shape + (N_LIMBS,))
    acc0 = jnp.zeros(shape + (2 * N_LIMBS,), dtype=U32)
    zero1 = jnp.zeros(shape + (1,), dtype=U32)

    def step(acc, i):
        ai = jax.lax.dynamic_slice_in_dim(a, i, 1, axis=-1)  # [..., 1]
        p = ai * b  # exact: (2^16-1)^2 < 2^32
        lo = p & MASK
        hi = p >> LIMB_BITS
        contrib = jnp.concatenate([lo, zero1], axis=-1) + jnp.concatenate(
            [zero1, hi], axis=-1
        )  # 17-wide window at offset i
        window = jax.lax.dynamic_slice_in_dim(acc, i, N_LIMBS + 1, axis=-1)
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc, window + contrib, i, axis=-1
        )
        return acc, None

    acc, _ = jax.lax.scan(step, acc0, jnp.arange(N_LIMBS))
    return acc


def _normalize(x, out_limbs=N_LIMBS):
    """Carry-propagate lazy columns (< 2^23 each) into canonical 16-bit limbs.

    The final carry out of the top limb must be zero for in-range values; it
    is dropped (callers guarantee the value fits).
    """
    n = x.shape[-1]
    if n < out_limbs:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (out_limbs - n,), dtype=U32)], axis=-1
        )
    elif n > out_limbs:
        x = x[..., :out_limbs]
    xt = jnp.moveaxis(x, -1, 0)  # [L, ...] for scan over limbs

    def step(carry, xi):
        v = xi + carry
        return v >> LIMB_BITS, v & MASK

    _, outs = jax.lax.scan(step, jnp.zeros(xt.shape[1:], dtype=U32), xt)
    return jnp.moveaxis(outs, 0, -1)


def _big_sub(a, b):
    """(a - b) over 16 canonical limbs with borrow chain.

    Returns (diff_limbs, borrow_out) where borrow_out is 1 iff a < b.
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    at = jnp.moveaxis(jnp.broadcast_to(a, shape + (N_LIMBS,)), -1, 0)
    bt = jnp.moveaxis(jnp.broadcast_to(b, shape + (N_LIMBS,)), -1, 0)

    def step(borrow, ab):
        ai, bi = ab
        d = ai + np.uint32(1 << LIMB_BITS) - bi - borrow
        return np.uint32(1) - (d >> LIMB_BITS), d & MASK

    borrow, outs = jax.lax.scan(step, jnp.zeros(shape, dtype=U32), (at, bt))
    return jnp.moveaxis(outs, 0, -1), borrow


def _cond_sub_p(spec: FieldSpec, x):
    """x - p if x >= p else x (x < 2p, canonical limbs)."""
    p = jnp.asarray(spec.p_limbs)
    diff, borrow = _big_sub(x, p)
    keep = (borrow != 0)[..., None]
    return jnp.where(keep, x, diff)


def _mont_reduce(spec: FieldSpec, t):
    """Montgomery REDC of 32 lazy columns -> canonical residue (< p).

    Sequential over the 16 low limbs (each step needs the true low 16 bits of
    the current column), but every step is a fat vector op over the batch.
    """
    p = jnp.asarray(spec.p_limbs)
    n0inv = np.uint32(spec.n0inv)
    if t.shape[-1] < 2 * N_LIMBS:
        pad = 2 * N_LIMBS - t.shape[-1]
        t = jnp.concatenate(
            [t, jnp.zeros(t.shape[:-1] + (pad,), dtype=U32)], axis=-1
        )

    def step(t, i):
        ti_full = jax.lax.dynamic_slice_in_dim(t, i, 1, axis=-1)[..., 0]
        carry = ti_full >> LIMB_BITS
        ti = ti_full & MASK
        m = (ti * n0inv) & MASK
        mp = m[..., None] * p  # [..., 16], exact in uint32
        lo = mp & MASK
        hi = mp >> LIMB_BITS
        # column i becomes ti + lo[0] which is ≡ 0 mod 2^16; push its carry.
        carry2 = (ti + lo[..., 0]) >> LIMB_BITS
        add16 = hi  # 16-wide contribution at offset i+1
        add16 = add16.at[..., :15].add(lo[..., 1:])
        add16 = add16.at[..., 0].add(carry + carry2)
        window = jax.lax.dynamic_slice_in_dim(t, i + 1, N_LIMBS, axis=-1)
        t = jax.lax.dynamic_update_slice_in_dim(t, window + add16, i + 1, axis=-1)
        return t, None

    t, _ = jax.lax.scan(step, t, jnp.arange(N_LIMBS))
    hi_half = t[..., N_LIMBS:]
    return _cond_sub_p(spec, _normalize(hi_half))


# ---------------------------------------------------------------------------
# public field ops (inputs/outputs: canonical Montgomery residues [..., 16])
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=0)
def mul(spec: FieldSpec, a, b):
    return _mont_reduce(spec, _mul_wide(a, b))


@functools.partial(jax.jit, static_argnums=0)
def square(spec: FieldSpec, a):
    # TODO(perf): dedicated squaring saves ~half the partial products.
    return _mont_reduce(spec, _mul_wide(a, a))


@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, a, b):
    s = a + b  # limbs < 2^17
    return _cond_sub_p(spec, _normalize(s))


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, a, b):
    t = a + jnp.asarray(spec.p_limbs)  # < 2^17 per limb; value = a + p >= b
    diff, _ = _big_sub_lazy(t, b)
    return _cond_sub_p(spec, diff)


def _big_sub_lazy(a, b):
    """Like _big_sub but `a` may have limbs up to 2^17 (one lazy add)."""
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    at = jnp.moveaxis(jnp.broadcast_to(a, shape + (N_LIMBS,)), -1, 0)
    bt = jnp.moveaxis(jnp.broadcast_to(b, shape + (N_LIMBS,)), -1, 0)

    def step(state, ab):
        carry, borrow = state
        ai, bi = ab
        ai = ai + carry
        carry = ai >> LIMB_BITS
        ai = ai & MASK
        d = ai + np.uint32(1 << LIMB_BITS) - bi - borrow
        borrow = np.uint32(1) - (d >> LIMB_BITS)
        return (carry, borrow), d & MASK

    zero = jnp.zeros(shape, dtype=U32)
    (_, borrow), outs = jax.lax.scan(step, (zero, zero), (at, bt))
    return jnp.moveaxis(outs, 0, -1), borrow


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, a):
    p = jnp.broadcast_to(jnp.asarray(spec.p_limbs), a.shape)
    diff, _ = _big_sub(p, a)
    return _cond_sub_p(spec, diff)


@functools.partial(jax.jit, static_argnums=0)
def dbl(spec: FieldSpec, a):
    return add(spec, a, a)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """cond ? a : b with cond shaped like the batch (no limb axis)."""
    return jnp.where(cond[..., None], a, b)


def one_like(spec: FieldSpec, shape):
    return jnp.broadcast_to(jnp.asarray(spec.one), tuple(shape) + (N_LIMBS,))


def zero_like(spec: FieldSpec, shape):
    return jnp.zeros(tuple(shape) + (N_LIMBS,), dtype=U32)


@functools.partial(jax.jit, static_argnums=0)
def to_mont(spec: FieldSpec, a_raw):
    """Canonical integer limbs -> Montgomery form."""
    return mul(spec, a_raw, jnp.asarray(spec.r2))


@functools.partial(jax.jit, static_argnums=0)
def from_mont(spec: FieldSpec, a):
    """Montgomery form -> canonical integer limbs (multiply by R^{-1})."""
    return _mont_reduce(spec, a)


@functools.partial(jax.jit, static_argnums=(0, 2))
def pow_fixed(spec: FieldSpec, x, e: int):
    """x^e for a host-known exponent, square-and-multiply under lax.scan."""
    if e == 0:
        return one_like(spec, x.shape[:-1])
    bits = [int(b) for b in bin(e)[2:]]  # MSB first
    bits_arr = jnp.asarray(np.array(bits, dtype=np.uint32))

    def body(acc, bit):
        acc = square(spec, acc)
        acc = select(jnp.broadcast_to(bit != 0, acc.shape[:-1]), mul(spec, acc, x), acc)
        return acc, None

    init = one_like(spec, x.shape[:-1])
    acc, _ = jax.lax.scan(body, init, bits_arr)
    return acc


@functools.partial(jax.jit, static_argnums=0)
def inv(spec: FieldSpec, x):
    """Inverse by Fermat; inv(0) = 0 (matches ff::Field::invert conventions
    only up to the zero case, which halo2 never exercises on the happy path).
    """
    return pow_fixed(spec, x, spec.p - 2)


@functools.partial(jax.jit, static_argnums=0)
def batch_inv(spec: FieldSpec, x):
    """Invert a [n, 16] batch with ~4n muls + one Fermat inversion.

    Montgomery's trick, parallel flavor: forward & reverse prefix products via
    associative_scan, one scalar inversion of the total, then
    inv(x_i) = P_{i-1} * S_{i+1} * T^{-1}.  Zeros map to zero.
    """
    n = x.shape[0]
    zmask = is_zero(x)
    xs = select(zmask, one_like(spec, x.shape[:-1]), x)

    mulf = functools.partial(mul, spec)
    pref = jax.lax.associative_scan(mulf, xs, axis=0)
    suff = jax.lax.associative_scan(mulf, xs[::-1], axis=0)[::-1]
    total = pref[-1]
    tinv = inv(spec, total)

    ones = one_like(spec, (1,))
    pref_shift = jnp.concatenate([ones, pref[:-1]], axis=0)
    suff_shift = jnp.concatenate([suff[1:], ones], axis=0)
    out = mul(spec, mul(spec, pref_shift, suff_shift), jnp.broadcast_to(tinv, x.shape))
    return select(zmask, zero_like(spec, x.shape[:-1]), out)


# ---------------------------------------------------------------------------
# host <-> device sugar
# ---------------------------------------------------------------------------


def const_mont(spec: FieldSpec, value: int) -> np.ndarray:
    """Host int -> Montgomery limb vector (numpy, usable as a jnp literal)."""
    return int_to_limbs((value % spec.p) * bn254.R % spec.p)
