"""Host-side BN254 group arithmetic over Python ints.

This is the slow-but-exact layer used for: SRS generation bookkeeping, G2
arithmetic (tiny — 2 points per SRS), keygen of small fixtures, the verifier's
pairing check, and as ground truth for the JAX G1 kernels.  The device path
(ec/jax_g1.py, ec/msm.py) carries all bulk work.

Replaces the reference's external `halo2curves` group ops (SURVEY.md 2.2).
Curve: y^2 = x^3 + 3 over Fq; G2 twist: y^2 = x^3 + 3/(9+u) over Fq2.
"""

from __future__ import annotations

from ..field.bn254 import FQ_MOD as Q
from ..field.bn254 import FR_MOD as R
from ..field.bn254 import G1_GEN, G2_GEN_X, G2_GEN_Y

# native C++ acceleration for the hot G1 paths (scalar mul, small MSMs);
# pure-Python below stays the ground truth and the fallback.  Availability is
# checked lazily per call (native.lib() memoizes the load and honors
# HALO2_TPU_NO_NATIVE at call time, so tests can toggle it after import).


def _nat():
    try:
        from .. import native

        return native if native.lib() is not None else None
    except Exception:  # pragma: no cover - loader failures degrade to Python
        return None

# ---------------------------------------------------------------------------
# Fq2 = Fq[u] / (u^2 + 1), elements as (c0, c1)
# ---------------------------------------------------------------------------


def fq2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def fq2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def fq2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def fq2_mul(a, b):
    # (a0 + a1 u)(b0 + b1 u) with u^2 = -1
    t0 = a[0] * b[0] % Q
    t1 = a[1] * b[1] % Q
    t2 = (a[0] + a[1]) * (b[0] + b[1]) % Q
    return ((t0 - t1) % Q, (t2 - t0 - t1) % Q)


def fq2_sqr(a):
    return fq2_mul(a, a)


def fq2_scalar(a, k: int):
    return (a[0] * k % Q, a[1] * k % Q)


def fq2_inv(a):
    # 1/(a0 + a1 u) = (a0 - a1 u) / (a0^2 + a1^2)
    norm = (a[0] * a[0] + a[1] * a[1]) % Q
    ninv = pow(norm, -1, Q)
    return (a[0] * ninv % Q, (-a[1]) * ninv % Q)


def fq2_conj(a):
    return (a[0], (-a[1]) % Q)


FQ2_ONE = (1, 0)
FQ2_ZERO = (0, 0)
# 3 / (9 + u): the G2 curve constant b'
G2_B = fq2_mul((3, 0), fq2_inv((9, 1)))


# ---------------------------------------------------------------------------
# generic short-Weierstrass point ops, parametrized by the field ops
# (works for Fq ints and Fq2 pairs).  Affine points are (x, y); None = O.
# ---------------------------------------------------------------------------


class _Ops:
    def __init__(self, add, sub, mul, sqr, inv, neg, scalar, zero, one):
        self.add, self.sub, self.mul, self.sqr, self.inv = add, sub, mul, sqr, inv
        self.neg, self.scalar, self.zero, self.one = neg, scalar, zero, one


_FQ_OPS = _Ops(
    add=lambda a, b: (a + b) % Q,
    sub=lambda a, b: (a - b) % Q,
    mul=lambda a, b: a * b % Q,
    sqr=lambda a: a * a % Q,
    inv=lambda a: pow(a, -1, Q),
    neg=lambda a: (-a) % Q,
    scalar=lambda a, k: a * k % Q,
    zero=0,
    one=1,
)

_FQ2_OPS = _Ops(
    add=fq2_add,
    sub=fq2_sub,
    mul=fq2_mul,
    sqr=fq2_sqr,
    inv=fq2_inv,
    neg=fq2_neg,
    scalar=fq2_scalar,
    zero=FQ2_ZERO,
    one=FQ2_ONE,
)


def _pt_double(P, F: _Ops):
    if P is None:
        return None
    x, y = P
    if y == F.zero:
        return None
    lam = F.mul(F.scalar(F.sqr(x), 3), F.inv(F.scalar(y, 2)))
    x3 = F.sub(F.sqr(lam), F.scalar(x, 2))
    y3 = F.sub(F.mul(lam, F.sub(x, x3)), y)
    return (x3, y3)


def _pt_add(P, Qp, F: _Ops):
    if P is None:
        return Qp
    if Qp is None:
        return P
    x1, y1 = P
    x2, y2 = Qp
    if x1 == x2:
        if y1 == y2:
            return _pt_double(P, F)
        return None
    lam = F.mul(F.sub(y2, y1), F.inv(F.sub(x2, x1)))
    x3 = F.sub(F.sub(F.sqr(lam), x1), x2)
    y3 = F.sub(F.mul(lam, F.sub(x1, x3)), y1)
    return (x3, y3)


def _pt_mul(P, k: int, F: _Ops):
    k %= R
    acc = None
    while k:
        if k & 1:
            acc = _pt_add(acc, P, F)
        P = _pt_double(P, F)
        k >>= 1
    return acc


# ---- G1 ----------------------------------------------------------------------

G1 = G1_GEN


def g1_add(P, Qp):
    return _pt_add(P, Qp, _FQ_OPS)


def g1_double(P):
    return _pt_double(P, _FQ_OPS)


def g1_mul(P, k: int):
    _native = _nat()
    if _native is not None:
        return _native.jac_to_affine(_native.g1_mul_jac(P, k % R))
    return _pt_mul(P, k, _FQ_OPS)


def g1_neg(P):
    return None if P is None else (P[0], (-P[1]) % Q)


def g1_is_on_curve(P) -> bool:
    if P is None:
        return True
    x, y = P
    return (y * y - x * x * x - 3) % Q == 0


def g1_msm_host(points, scalars):
    """Tiny reference MSM (for tests / ground truth only)."""
    _native = _nat()
    if _native is not None:
        return _native.g1_msm(list(points), [s % R for s in scalars])
    acc = None
    for P, s in zip(points, scalars):
        acc = g1_add(acc, g1_mul(P, s))
    return acc


# ---- G2 ----------------------------------------------------------------------

G2 = (G2_GEN_X, G2_GEN_Y)


def g2_add(P, Qp):
    return _pt_add(P, Qp, _FQ2_OPS)


def g2_mul(P, k: int):
    return _pt_mul(P, k, _FQ2_OPS)


def g2_neg(P):
    return None if P is None else (P[0], fq2_neg(P[1]))


def g2_is_on_curve(P) -> bool:
    if P is None:
        return True
    x, y = P
    lhs = fq2_sqr(y)
    rhs = fq2_add(fq2_mul(fq2_sqr(x), x), G2_B)
    return lhs == rhs


# ---------------------------------------------------------------------------
# serialization — halo2curves-compatible byte layout
# ---------------------------------------------------------------------------
# G1 compressed (32B), halo2curves 9f5c508 (0.3.2) GroupEncoding layout (the
# layout the reference's proof stream uses, SURVEY.md 7.3 #1): x as LE bytes,
# sign flag at byte 31 BIT 6 = y parity (Fq is 254-bit so bits 6-7 of the top
# byte are always free; bit 6 is the convention the Rust proof fixture uses —
# confirmed byte-level against the wasm prover's output, round 5); the
# identity is ALL-ZERO bytes (x = 0, sign 0).  G1 uncompressed (64B):
# x || y LE.  G2 doubles the widths with each Fq2 coordinate as c0 || c1.


def g1_to_bytes(P) -> bytes:
    if P is None:
        return bytes(32)
    x, y = P
    b = bytearray(int(x).to_bytes(32, "little"))
    if y & 1:
        b[31] |= 0x40
    return bytes(b)


def g1_from_bytes(b: bytes):
    b = bytearray(b)
    ysign = (b[31] >> 6) & 1
    b[31] &= 0x3F
    x = int.from_bytes(bytes(b), "little")
    if x >= Q:
        raise ValueError("G1 x coordinate out of range")
    if x == 0 and not ysign:
        return None
    yy = (x * x * x + 3) % Q
    y = _sqrt_fq(yy)
    if y is None:
        raise ValueError("invalid G1 compressed point")
    if (y & 1) != ysign:
        y = Q - y
    return (x, y)


# raw (Montgomery-form) layout — what halo2_proofs rev 6b43b6b ParamsKZG
# write()/read() actually uses (verified against setup() output of the
# reference's wasm artifact): each coordinate is the internal Montgomery
# residue v*R mod p as 32 LE bytes; the identity is (0, 0).

_R_FQ = (1 << 256) % Q


def g1_to_raw_bytes(P) -> bytes:
    if P is None:
        return bytes(64)
    x, y = P
    return (x * _R_FQ % Q).to_bytes(32, "little") + (y * _R_FQ % Q).to_bytes(
        32, "little"
    )


def g1_from_raw_bytes(b: bytes):
    rinv = pow(_R_FQ, -1, Q)
    xm = int.from_bytes(b[:32], "little")
    ym = int.from_bytes(b[32:64], "little")
    if xm == 0 and ym == 0:
        return None
    if xm >= Q or ym >= Q:
        raise ValueError("raw coordinate out of range")
    P = (xm * rinv % Q, ym * rinv % Q)
    if not g1_is_on_curve(P):
        raise ValueError("point not on curve")
    return P


def g2_to_raw_bytes(P) -> bytes:
    if P is None:
        return bytes(128)
    (x0, x1), (y0, y1) = P
    out = b""
    for v in (x0, x1, y0, y1):
        out += (v * _R_FQ % Q).to_bytes(32, "little")
    return out


def g2_from_raw_bytes(b: bytes):
    rinv = pow(_R_FQ, -1, Q)
    vals = [
        int.from_bytes(b[i * 32 : (i + 1) * 32], "little") * rinv % Q
        for i in range(4)
    ]
    P = ((vals[0], vals[1]), (vals[2], vals[3]))
    if not g2_is_on_curve(P):
        raise ValueError("G2 point not on curve")
    return P


def g1_to_uncompressed(P) -> bytes:
    if P is None:
        return bytes(64)
    x, y = P
    return int(x).to_bytes(32, "little") + int(y).to_bytes(32, "little")


def g1_from_uncompressed(b: bytes):
    x = int.from_bytes(b[:32], "little")
    y = int.from_bytes(b[32:64], "little")
    if x == 0 and y == 0:
        return None
    P = (x, y)
    if not g1_is_on_curve(P):
        raise ValueError("point not on curve")
    return P


def g2_to_uncompressed(P) -> bytes:
    if P is None:
        return bytes(128)
    (x0, x1), (y0, y1) = P
    return b"".join(int(v).to_bytes(32, "little") for v in (x0, x1, y0, y1))


def g2_from_uncompressed(b: bytes):
    v = [int.from_bytes(b[32 * i : 32 * (i + 1)], "little") for i in range(4)]
    if all(c == 0 for c in v):
        return None
    P = ((v[0], v[1]), (v[2], v[3]))
    if not g2_is_on_curve(P):
        raise ValueError("G2 point not on curve")
    return P


def _sqrt_fq(a: int):
    """Square root in Fq (q ≡ 3 mod 4): a^((q+1)/4)."""
    r = pow(a, (Q + 1) // 4, Q)
    if r * r % Q != a % Q:
        return None
    return r


def g1_jacobian_to_affine(x: int, y: int, z: int):
    """Host Jacobian -> affine (or None for Z = 0)."""
    if z % Q == 0:
        return None
    zinv = pow(z, -1, Q)
    zinv2 = zinv * zinv % Q
    return (x * zinv2 % Q, y * zinv2 % Q * zinv % Q)
