"""Radix-2 NTT over BN254 Fr, batched TPU formulation.

Replaces the reference's external `halo2_proofs::arithmetic::best_fft`
(SURVEY.md 2.2 "NTT/coset-FFT kernels").  Computes the plain DFT
a_hat[k] = sum_j a[j] * omega^{jk} so values (not algorithm) match the Rust
prover bit-for-bit.

Design: decimation-in-time with a host-precomputed bit-reversal gather and a
device-built twiddle table (log-doubling).  Each stage is one fat batched
field mul + add/sub over n/2 butterflies — pure VPU work that XLA fuses; the
stage loop is static (k <= 28).  Sharded multi-chip stages live in dist/.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR
from ..field import mont
from ..field.bn254 import FR_MOD
from ..field.limbs import int_to_mont_limbs


@functools.lru_cache(maxsize=None)
def _bitrev_perm(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def powers_table(base: int, log_len: int):
    """Device table [2^log_len, 16] of Montgomery powers base^0..base^{2^log_len - 1}.

    Built by log-doubling: 2^s new entries per step, each a batched field mul
    — O(log n) kernel launches instead of an O(n) host loop.
    """

    @functools.partial(jax.jit, static_argnums=(0, 1))
    def build(base_, log_len_):
        w = jnp.asarray(int_to_mont_limbs(1, FR_MOD))[None, :]
        for s in range(log_len_):
            shift = jnp.asarray(int_to_mont_limbs(pow(base_, 1 << s, FR_MOD), FR_MOD))
            w = jnp.concatenate([w, mont.mul(FR, w, shift[None, :])], axis=0)
        return w

    return build(base, log_len)


def _twiddles(omega: int, k: int):
    """[n/2, 16] Montgomery powers omega^0..omega^{n/2-1} (device, cached)."""
    return powers_table(omega, max(k - 1, 0))


@functools.partial(jax.jit, static_argnums=(3,))
def _ntt_core(a, perm, tw, k: int):
    n = 1 << k
    a = jnp.take(a, perm, axis=-2)
    lead = a.shape[:-2]
    for s in range(1, k + 1):
        m = 1 << s
        half = m // 2
        a = a.reshape(lead + (n // m, m, 16))
        lo = a[..., :half, :]
        hi = a[..., half:, :]
        stage_tw = tw[:: n // m][:half]  # omega^{j * n/m}
        t = mont.mul(FR, hi, stage_tw[None, :, :])
        a = jnp.concatenate([mont.add(FR, lo, t), mont.sub(FR, lo, t)], axis=-2)
    return a.reshape(lead + (n, 16))


def ntt(a, k: int, omega: int):
    """DFT of a [..., n, 16] Montgomery coefficient array (values match
    halo2's best_fft)."""
    n = 1 << k
    assert a.shape[-2] == n
    if n == 1:
        return a
    return _ntt_core(a, jnp.asarray(_bitrev_perm(k)), _twiddles(omega, k), k)


def intt(a, k: int, omega: int):
    """Inverse DFT: NTT with omega^{-1}, scaled by n^{-1}."""
    n = 1 << k
    omega_inv = pow(omega, -1, FR_MOD)
    n_inv = jnp.asarray(int_to_mont_limbs(pow(n, -1, FR_MOD), FR_MOD))
    out = ntt(a, k, omega_inv)
    return mont.mul(FR, out, n_inv[None, :])
