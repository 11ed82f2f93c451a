"""Evaluation domains for the PLONKish prover.

Equivalent of the reference's external `halo2_proofs::poly::EvaluationDomain`
(SURVEY.md 2.2): a 2^k multiplicative subgroup <omega> of Fr for witness
polynomials, plus the 2^{k+j} extended domain evaluated over the distinguished
coset zeta * <omega_ext> for the vanishing-argument quotient, with
j = ceil(log2(quotient_degree)) and zeta a primitive cube root of unity.

All bulk transforms are device NTTs (poly/ntt.py); this module holds the
host-side structure (omegas, Lagrange helpers) and the coset power twists.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FR, mont
from ..field.bn254 import FR_MOD, FR_ROOT_OF_UNITY, FR_S, FR_ZETA
from ..field.limbs import int_to_mont_limbs, ints_to_mont_limbs
from . import ntt as _ntt


@functools.lru_cache(maxsize=None)
def get_domain(k: int, quotient_degree: int = 1) -> "Domain":
    return Domain(k, quotient_degree)


class Domain:
    def __init__(self, k: int, quotient_degree: int = 1):
        assert k <= FR_S
        self.k = k
        self.n = 1 << k
        j = max((quotient_degree - 1).bit_length(), 0) if quotient_degree > 1 else 0
        # halo2: extended size is the smallest power of two >= (degree-1)*n... we
        # store quotient_degree = cs.degree() - 1 pieces; extended_k chosen so
        # 2^extended_k >= quotient_degree * n.
        self.quotient_degree = quotient_degree
        self.extended_k = k + (quotient_degree - 1).bit_length() if quotient_degree > 1 else k
        while (1 << self.extended_k) < quotient_degree * self.n:
            self.extended_k += 1
        self.extended_n = 1 << self.extended_k
        assert self.extended_k <= FR_S

        self.omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - k), FR_MOD)
        self.omega_inv = pow(self.omega, -1, FR_MOD)
        self.extended_omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_S - self.extended_k), FR_MOD)
        self.g_coset = FR_ZETA  # distinguished coset shift (cube root of unity)
        self.g_coset_inv = pow(FR_ZETA, 2, FR_MOD)  # zeta^2 = zeta^{-1}

    # ---- basis conversions (device arrays [..., n, 16], Montgomery) --------
    # Large domains on TPU route through the fused Pallas pipeline
    # (poly/ntt_pallas.py, bit-identical); the portable per-stage NTT is the
    # fallback and the CPU test oracle.

    def lagrange_to_coeff(self, values):
        return _apply_ntt(values, self.k, self.omega, inverse=True)

    def coeff_to_lagrange(self, coeffs):
        return _apply_ntt(coeffs, self.k, self.omega, inverse=False)

    def coeff_to_extended(self, coeffs):
        """Evaluate p over the extended coset zeta * <omega_ext>.

        p(zeta * X) has coefficients a_i * zeta^i (zeta powers cycle mod 3);
        zero-pad to extended_n and NTT with extended_omega.
        """
        return _coeff_to_extended(coeffs, self.n, self.extended_n,
                                  self.extended_k, self.extended_omega)

    def extended_to_coeff(self, values):
        """Inverse of coeff_to_extended; returns extended_n coefficients."""
        coeffs = _apply_ntt(values, self.extended_k, self.extended_omega,
                            inverse=True)
        return _distribute_zeta(coeffs, True)

    # ---- host helpers -------------------------------------------------------

    def omega_pow(self, i: int) -> int:
        return pow(self.omega, i % self.n, FR_MOD)

    def rotate_omega(self, x: int, rotation: int) -> int:
        """x * omega^rotation (negative rotations use omega_inv)."""
        if rotation >= 0:
            return x * pow(self.omega, rotation, FR_MOD) % FR_MOD
        return x * pow(self.omega_inv, -rotation, FR_MOD) % FR_MOD

    def eval_vanishing(self, x: int) -> int:
        """Z_H(x) = x^n - 1."""
        return (pow(x, self.n, FR_MOD) - 1) % FR_MOD

    def eval_lagrange(self, i: int, x: int) -> int:
        """L_i(x) = (omega^i / n) * (x^n - 1) / (x - omega^i)."""
        wi = self.omega_pow(i)
        num = self.eval_vanishing(x) * wi % FR_MOD
        den = (x - wi) % FR_MOD * self.n % FR_MOD
        return num * pow(den, -1, FR_MOD) % FR_MOD

    def lagrange_coeffs_at(self, x: int, count: int) -> list:
        """[L_0(x), ..., L_{count-1}(x)] (host ints; used for instance evals)."""
        return [self.eval_lagrange(i, x) for i in range(count)]


@functools.lru_cache(maxsize=None)
def _zeta_cycle(inv: bool):
    z = pow(FR_ZETA, 2, FR_MOD) if inv else FR_ZETA
    return ints_to_mont_limbs([1, z, z * z % FR_MOD], FR_MOD)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _distribute_zeta(coeffs, inv: bool, pad: int = 0):
    cyc = jnp.asarray(_zeta_cycle(inv))
    n = coeffs.shape[-2]
    idx = jnp.asarray(np.arange(n, dtype=np.int32) % 3)
    out = mont.mul(FR, coeffs, cyc[idx])
    if pad:
        out = jnp.concatenate(
            [out, jnp.zeros(out.shape[:-2] + (pad, 16), dtype=jnp.uint32)], axis=-2
        )
    return out


def _coeff_to_extended(coeffs, n, extended_n, extended_k, extended_omega):
    padded = _distribute_zeta(coeffs, False, extended_n - n)
    return _apply_ntt(padded, extended_k, extended_omega, inverse=False)


def _apply_ntt(arr, k: int, omega: int, inverse: bool):
    """Dispatch [..., n, 16] (optionally batched on a leading axis) to the
    fused TPU pipeline or the portable NTT."""
    from . import ntt_pallas as _fused

    if not _fused.use_fused(k):
        return _ntt.intt(arr, k, omega) if inverse else _ntt.ntt(arr, k, omega)
    if arr.ndim == 2:
        return _fused._ntt_jit(arr, k, omega, inverse)
    out = [_fused._ntt_jit(arr[i], k, omega, inverse) for i in range(arr.shape[0])]
    return jnp.stack(out) if out else arr
