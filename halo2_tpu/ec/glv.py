"""GLV endomorphism scalar decomposition for BN254 G1.

BN254 has the efficiently computable endomorphism phi(x, y) = (beta*x, y)
(beta a cube root of unity in Fq) acting as multiplication by lambda (a cube
root of unity in Fr, lambda^2 + lambda + 1 = 0).  Splitting each scalar as

    k = k1 + k2 * lambda  (mod r),   |k1|, |k2| < ~sqrt(r) ~ 2^128

halves the number of Pippenger windows for the MSM (8 windows of c=16 over
2n points instead of 16 over n): the linear sort+scan work is unchanged but
every per-window fixed cost (bucket reduction over 2^c buckets, searchsorted,
tail gathers, kernel dispatches) is paid half as often.

All parameters (beta, lambda, the reduced lattice basis, the Barrett
constant) are derived numerically at first use and verified against the
curve — nothing is hard-coded from literature.  `decompose_host` is the
exact reference; `decompose_batch` is the vectorized device version used by
the MSM (two's-complement 16-bit-limb arithmetic, error of the Barrett
rounding absorbed by the verified magnitude bound).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..field.bn254 import FQ_MOD, FR_MOD
from . import host as ec_host

LIMB_BITS = 16
MASK16 = (1 << 16) - 1

# Barrett shift: t = k * |b| + r//2 < 2^382; with S = 544 the quotient
# estimate floor(t*m / 2^S), m = floor(2^S / r), is exact or one below
# (t / 2^S < 2^-162), so c in {round-1, round}.  The extra slack is folded
# into MAX_MAG below.
BARRETT_S = 544


@dataclass(frozen=True)
class GLVParams:
    beta: int  # cube root of unity in Fq with phi(P) = lambda * P
    lam: int  # matching cube root of unity in Fr
    v1: tuple  # (a1, b1): a1 + b1*lambda = 0 mod r (short)
    v2: tuple  # (a2, b2)
    max_mag: int  # proven bound on |k1|, |k2| including Barrett slack


def _cube_root_of_unity(p: int) -> int:
    assert p % 3 == 1
    e = (p - 1) // 3
    for g in range(2, 100):
        z = pow(g, e, p)
        if z != 1:
            return z
    raise AssertionError("no cube root found")


def _gauss_reduce(u, v):
    """Lagrange-Gauss reduction of a rank-2 integer lattice basis."""

    def norm2(w):
        return w[0] * w[0] + w[1] * w[1]

    u, v = (u, v) if norm2(u) <= norm2(v) else (v, u)
    while True:
        n_u = norm2(u)
        # round(  <u,v> / <u,u> )
        dot = u[0] * v[0] + u[1] * v[1]
        q = (2 * dot + n_u) // (2 * n_u)  # round to nearest
        v = (v[0] - q * u[0], v[1] - q * u[1])
        if norm2(v) >= n_u:
            return u, v
        u, v = v, u


@functools.lru_cache(maxsize=1)
def params() -> GLVParams:
    lam = _cube_root_of_unity(FR_MOD)
    beta = _cube_root_of_unity(FQ_MOD)
    # match beta to lam on the curve: phi(G) = (beta * x, y) must equal
    # lambda * G; the other assignments use the conjugate roots.
    G = ec_host.G1_GEN
    ok = False
    for lam_c in (lam, pow(lam, 2, FR_MOD)):
        target = ec_host.g1_mul(G, lam_c)
        for beta_c in (beta, pow(beta, 2, FQ_MOD)):
            if (G[0] * beta_c % FQ_MOD, G[1]) == target:
                lam, beta = lam_c, beta_c
                ok = True
                break
        if ok:
            break
    assert ok, "no (beta, lambda) pairing matched the curve"

    v1, v2 = _gauss_reduce((FR_MOD, 0), ((-lam) % FR_MOD, 1))
    # decomposition bound per coordinate: k - c1 v1 - c2 v2 with the c_i
    # within 1/2 (rounding) + 1 (Barrett floor slack) of the real solution,
    # so |k1| <= 1.5 (|a1| + |a2|) and |k2| <= 1.5 (|b1| + |b2|)
    mag1 = abs(v1[0]) + abs(v2[0])
    mag2 = abs(v1[1]) + abs(v2[1])
    p = GLVParams(
        beta=beta, lam=lam, v1=v1, v2=v2,
        max_mag=(3 * max(mag1, mag2)) // 2 + 1,
    )
    assert p.max_mag < 1 << 128, hex(p.max_mag)
    # sanity: v_i are lattice vectors
    assert (v1[0] + v1[1] * lam) % FR_MOD == 0
    assert (v2[0] + v2[1] * lam) % FR_MOD == 0
    return p


def decompose_host(k: int):
    """Exact (round-to-nearest) decomposition: returns signed (k1, k2) with
    k1 + k2*lambda = k (mod r)."""
    p = params()
    (a1, b1), (a2, b2) = p.v1, p.v2
    r = FR_MOD
    # solve (c1, c2) ~ k * (v1, v2)^-1; det = a1*b2 - a2*b1 = +-r
    det = a1 * b2 - a2 * b1
    # c1 = round(k * b2 / det), c2 = round(-k * b1 / det)
    def rnd(num, den):
        if den < 0:
            num, den = -num, -den
        return (2 * num + den) // (2 * den)

    c1 = rnd(k * b2, det)
    c2 = rnd(-k * b1, det)
    k1 = k - c1 * a1 - c2 * a2
    k2 = -c1 * b1 - c2 * b2
    assert (k1 + k2 * p.lam - k) % r == 0
    return k1, k2


# ---------------------------------------------------------------------------
# vectorized device decomposition
# ---------------------------------------------------------------------------


def _int_limbs(x: int, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint32)
    for i in range(count):
        out[i] = x & MASK16
        x >>= LIMB_BITS
    assert x == 0
    return out


@functools.lru_cache(maxsize=1)
def _device_consts():
    """Limb tables for decompose_batch, derived from params().

    The rounding quotients are computed against det = +-r normalized to +r:
      c1 = round(k * b2 / det)  ->  sign(b2/det) folded into a flag
    We precompute |b2|, |b1| (the Barrett multiplicands), m = floor(2^S/r),
    and the magnitudes/signs of a1, a2, b1, b2.
    """
    p = params()
    (a1, b1), (a2, b2) = p.v1, p.v2
    det = a1 * b2 - a2 * b1
    assert abs(det) == FR_MOD
    if det < 0:
        # normalize: flip all signs of one coordinate set so det = +r
        a2, b2 = -a2, -b2
        det = a1 * b2 - a2 * b1
        v1n, v2n = (a1, b1), (a2, b2)
    else:
        v1n, v2n = (a1, b1), (a2, b2)
    assert det == FR_MOD
    m = (1 << BARRETT_S) // FR_MOD
    consts = {
        "mul1": _int_limbs(abs(b2), 8),  # c1 multiplicand |b2|
        "mul1_neg": b2 < 0,  # c1 = round(k*b2/r): sign of b2
        "mul2": _int_limbs(abs(b1), 8),  # c2 multiplicand |b1|
        "mul2_neg": not (b1 < 0),  # c2 = round(-k*b1/r)
        "half_r": _int_limbs(FR_MOD // 2, 16),
        "m": _int_limbs(m, (BARRETT_S - 254 + 16 + 15) // 16 + 16),
        "a1": abs(v1n[0]),
        "a1_neg": v1n[0] < 0,
        "a2": abs(v2n[0]),
        "a2_neg": v2n[0] < 0,
        "b1": abs(v1n[1]),
        "b1_neg": v1n[1] < 0,
        "b2": abs(v2n[1]),
        "b2_neg": v2n[1] < 0,
    }
    return consts, v1n, v2n


def _mul_const(x, const_limbs, out_limbs: int):
    """[..., La] u32 16-bit limbs times a small constant (python limb list)
    -> [..., out_limbs] canonical 16-bit limbs (truncated mod 2^(16*out))."""
    import jax.numpy as jnp

    from ..field.mont import _normalize

    La = x.shape[-1]
    cols = jnp.zeros(x.shape[:-1] + (out_limbs + 2,), dtype=jnp.uint32)
    for j, cl in enumerate(const_limbs):
        cl = int(cl)
        if cl == 0 or j >= out_limbs:
            continue
        p = x * np.uint32(cl)  # < 2^32
        lo = p & MASK16
        hi = p >> LIMB_BITS
        width = min(La, out_limbs + 2 - j)
        cols = cols.at[..., j : j + width].add(lo[..., :width])
        wh = min(La, out_limbs + 2 - j - 1)
        if wh > 0:
            cols = cols.at[..., j + 1 : j + 1 + wh].add(hi[..., :wh])
        # normalize every few steps to keep columns bounded far from 2^32
        if (j & 3) == 3:
            cols = _normalize(cols, out_limbs + 2)
    return _normalize(cols, out_limbs)


def _add_limbs(a, b):
    """Canonical 16-bit limb add (same width), mod 2^(16*width)."""
    from ..field.mont import _normalize

    return _normalize(a + b, a.shape[-1])


def _neg_limbs(a):
    """Two's complement negation mod 2^(16*width)."""
    import jax.numpy as jnp

    from ..field.mont import _normalize

    inv = (~a) & MASK16
    one = jnp.zeros_like(a).at[..., 0].set(1)
    return _normalize(inv + one, a.shape[-1])


def decompose_batch(scalars):
    """[n, 16] raw Fr limb scalars -> (k1_mag [n, 16], k1_neg [n],
    k2_mag [n, 16], k2_neg [n]) with k1 + k2*lambda = k (mod r) and
    magnitudes < 2^128 (top 8 limbs zero).

    Pure jnp (XLA fuses the limb arithmetic); runs on any backend.
    """
    import jax.numpy as jnp

    consts, v1n, v2n = _device_consts()
    n = scalars.shape[0]

    def quotient(mult_limbs):
        # t = k * |mult| + r//2  (26 limbs is plenty: < 2^382 + r)
        t = _mul_const(scalars, list(mult_limbs), 25)
        t = _add_limbs(
            t,
            jnp.broadcast_to(
                jnp.asarray(
                    np.pad(consts["half_r"], (0, 25 - 16)).astype(np.uint32)
                ),
                t.shape,
            ),
        )
        # q = (t * m) >> S ; keep limbs [S/16, S/16 + 9)
        shift_limbs = BARRETT_S // LIMB_BITS  # 34
        full = _mul_const(t, list(consts["m"]), shift_limbs + 9)
        return full[..., shift_limbs:]  # [n, 9] (magnitude of the rounded c)

    c1 = quotient(consts["mul1"])  # sign: consts["mul1_neg"]
    c2 = quotient(consts["mul2"])  # sign: consts["mul2_neg"]

    W = 16  # work width: 256-bit two's complement

    def signed_term(c_mag, c_neg, coef_mag: int, coef_neg: bool):
        prod = _mul_const(c_mag, list(_int_limbs(coef_mag, 9)), W)
        if c_neg != coef_neg:
            prod = _neg_limbs(prod)
        return prod

    kW = jnp.concatenate(
        [scalars, jnp.zeros((n, W - 16), dtype=jnp.uint32)], axis=-1
    ) if scalars.shape[-1] < W else scalars[..., :W]

    # k1 = k - c1*a1 - c2*a2
    k1 = _add_limbs(
        kW,
        _neg_limbs(
            _add_limbs(
                signed_term(c1, consts["mul1_neg"], consts["a1"], consts["a1_neg"]),
                signed_term(c2, consts["mul2_neg"], consts["a2"], consts["a2_neg"]),
            )
        ),
    )
    # k2 = -(c1*b1 + c2*b2)
    k2 = _neg_limbs(
        _add_limbs(
            signed_term(c1, consts["mul1_neg"], consts["b1"], consts["b1_neg"]),
            signed_term(c2, consts["mul2_neg"], consts["b2"], consts["b2_neg"]),
        )
    )

    def split(v):
        neg = v[..., W - 1] >= (1 << 15)
        mag = jnp.where(neg[..., None], _neg_limbs(v), v)
        return mag, neg

    k1_mag, k1_neg = split(k1)
    k2_mag, k2_neg = split(k2)
    return k1_mag, k1_neg, k2_mag, k2_neg
