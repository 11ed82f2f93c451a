"""Poseidon permutation & sponge (off-circuit primitives) + batched JAX kernel.

Host layer mirrors the behavior of the reference's vendored primitives
(reference: circuits/src/poseidon/primitives.rs:57-381): Spec with even R_F,
Grain-generated round constants / Cauchy MDS, x^5 S-box, partial rounds acting
on word 0 only, ConstantLength domain with capacity tag L << 64, 1-element
squeeze.  The production WASM instantiation is WIDTH=3 RATE=2 L=2 with
R_P = N_ROUNDS_P[3] = 60 — note the reference indexes the circomlib table by
WIDTH, not WIDTH-2 (quirk preserved; reference: poseidon_circuit.rs:19-25,134).

The device layer runs the permutation batched over many states ([batch, T]
field elements as Montgomery limb arrays) under lax.scan — one scan step per
round, VPU-vectorized over the batch.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR
from ..field.bn254 import FR_MOD
from ..field.limbs import ints_to_mont_limbs
from ..field.mont import add as f_add
from ..field.mont import mul as f_mul
from ..field.mont import select as f_select
from ..field.mont import square as f_square
from .grain import Grain
from .mds import generate_mds

# circomlib partial-round table (indexed by WIDTH in the reference's quirky
# convention; reference: poseidon_circuit.rs:20-22)
N_ROUNDS_P = [56, 57, 56, 60, 60, 63, 64, 63, 60, 66, 60, 65, 70, 60, 64, 68]
N_ROUNDS_F = 8


@dataclass(frozen=True, eq=False)
class PoseidonSpec:
    """A concrete Poseidon instantiation (width/rate/rounds/consts) over the
    prime field `p` (BN254 Fr by default; Pasta fields for the vendored
    P128Pow5T3 spec parity — see p128pow5t3.py)."""

    width: int
    rate: int
    r_f: int
    r_p: int
    round_constants: tuple  # (r_f + r_p) rows of `width` ints
    mds: tuple  # width x width ints
    mds_inv: tuple
    p: int = FR_MOD

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def make(width: int, rate: int, r_f: int = N_ROUNDS_F, r_p: int | None = None,
             secure_mds: int = 0, p: int = FR_MOD, n_bits: int = 254) -> "PoseidonSpec":
        assert rate == width - 1, "sponge rate must be width-1 (Pow5 layout)"
        assert r_f % 2 == 0
        if r_p is None:
            r_p = N_ROUNDS_P[width]  # reference's WIDTH-indexed lookup
        grain = Grain(p, n_bits, width, r_f, r_p)
        rcs = tuple(
            tuple(grain.next_field_element() for _ in range(width))
            for _ in range(r_f + r_p)
        )
        mds, mds_inv = generate_mds(grain, width, secure_mds)
        return PoseidonSpec(
            width=width,
            rate=rate,
            r_f=r_f,
            r_p=r_p,
            round_constants=rcs,
            mds=tuple(tuple(r) for r in mds),
            mds_inv=tuple(tuple(r) for r in mds_inv),
            p=p,
        )


def wasm_spec() -> PoseidonSpec:
    """The production instantiation used by the reference WASM path."""
    return PoseidonSpec.make(3, 2)


# ---------------------------------------------------------------------------
# host permutation / sponge (Python ints)
# ---------------------------------------------------------------------------


def _sbox(x: int, p: int = FR_MOD) -> int:
    return pow(x, 5, p)


def permute(spec: PoseidonSpec, state: list) -> list:
    """In-place-style Poseidon permutation on `width` host ints."""
    p = spec.p
    t = spec.width
    half_f = spec.r_f // 2
    s = list(state)

    def apply_mds(s):
        return [sum(spec.mds[i][j] * s[j] for j in range(t)) % p for i in range(t)]

    r = 0
    for _ in range(half_f):
        s = apply_mds([_sbox((w + c) % p, p) for w, c in zip(s, spec.round_constants[r])])
        r += 1
    for _ in range(spec.r_p):
        s = [(w + c) % p for w, c in zip(s, spec.round_constants[r])]
        s[0] = _sbox(s[0], p)
        s = apply_mds(s)
        r += 1
    for _ in range(half_f):
        s = apply_mds([_sbox((w + c) % p, p) for w, c in zip(s, spec.round_constants[r])])
        r += 1
    return s


def hash_constant_length(spec: PoseidonSpec, message: list, length: int | None = None) -> int:
    """ConstantLength<L> sponge hash -> 1 squeezed element.

    Padding: zeros to a multiple of RATE; capacity tag = L << 64.
    """
    L = len(message) if length is None else length
    assert len(message) == L
    rate = spec.rate
    k = (L + rate - 1) // rate
    padded = list(message) + [0] * (k * rate - L)

    state = [0] * spec.width
    state[rate] = (L << 64) % spec.p  # initial capacity element
    for chunk_start in range(0, len(padded), rate):
        chunk = padded[chunk_start : chunk_start + rate]
        for i, v in enumerate(chunk):
            state[i] = (state[i] + v) % spec.p
        state = permute(spec, state)
    return state[0]


# ---------------------------------------------------------------------------
# device permutation: batched over [batch, T, 16] Montgomery limb arrays
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _device_consts(spec: PoseidonSpec):
    t = spec.width
    rc = np.stack(
        [ints_to_mont_limbs(row, FR_MOD) for row in spec.round_constants]
    )  # [rounds, T, 16]
    mds = np.stack(
        [ints_to_mont_limbs(row, FR_MOD) for row in spec.mds]
    )  # [T, T, 16]
    half_f = spec.r_f // 2
    n_rounds = spec.r_f + spec.r_p
    is_full = np.array(
        [1 if (r < half_f or r >= half_f + spec.r_p) else 0 for r in range(n_rounds)],
        dtype=np.uint32,
    )
    return rc, mds, is_full, t


def _sbox5_dev(x):
    x2 = f_square(FR, x)
    x4 = f_square(FR, x2)
    return f_mul(FR, x4, x)


@functools.partial(jax.jit, static_argnums=0)
def permute_batched(spec: PoseidonSpec, states):
    """Poseidon permutation over a [batch, T, 16] Montgomery state array.

    One lax.scan step per round: add round constants, S-box (all words in a
    full round, word 0 in a partial round — computed branchlessly with a
    select), then the T x T MDS matmul in the field.
    """
    rc, mds, is_full, t = _device_consts(spec)
    rc = jnp.asarray(rc)
    mds = jnp.asarray(mds)
    is_full = jnp.asarray(is_full)

    def round_body(state, inputs):
        rcs, full = inputs  # rcs: [T, 16]
        s = f_add(FR, state, rcs[None, :, :])
        sb = _sbox5_dev(s)
        word_is_first = jnp.arange(t)[None, :] == 0
        use_sbox = jnp.logical_or(full != 0, word_is_first)
        s = f_select(jnp.broadcast_to(use_sbox, s.shape[:-1]), sb, s)
        # MDS: out[i] = sum_j mds[i][j] * s[j]
        prod = f_mul(FR, mds[None, :, :, :], s[:, None, :, :])  # [b, T(out), T(in), 16]
        out = prod[:, :, 0, :]
        for j in range(1, t):
            out = f_add(FR, out, prod[:, :, j, :])
        return out, None

    out, _ = jax.lax.scan(round_body, states, (rc, is_full))
    return out


def hash_batched(spec: PoseidonSpec, messages):
    """ConstantLength hash of a [batch, L, 16] Montgomery message batch.

    Currently supports L <= rate (one absorption), which covers the
    reference's production L=2, RATE=2 instantiation.
    """
    b, L = messages.shape[0], messages.shape[1]
    rate = spec.rate
    assert L <= rate, "multi-chunk absorption: use the host sponge for now"
    cap = ints_to_mont_limbs([(L << 64) % FR_MOD], FR_MOD)[0]
    state = jnp.zeros((b, spec.width, 16), dtype=jnp.uint32)
    state = state.at[:, :L, :].set(messages)
    state = state.at[:, rate, :].set(jnp.asarray(cap)[None, :])
    out = permute_batched(spec, state)
    return out[:, 0, :]
