"""BN254 pairing on the host (verifier-side only).

The reference's verify path performs a single pairing check inside the
external `halo2_proofs` KZG verifier (SURVEY.md 2.2, utils.rs:125-158).  The
pairing is tiny and serial, so it stays host-side in the TPU framework (the
bulk verifier work — recomputing commitments/evals — is device work).

Implementation: Tate pairing e(P, Q) = f_{r,P}(psi(Q))^((q^12-1)/r) over the
tower Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - xi), xi = 9 + u,
Fq12 = Fq6[w]/(w^2 - v), with the D-type untwist psi(x, y) = (x w^2, y w^3).
The Tate pairing is bilinear and non-degenerate, which is all the KZG check
e(A, B) == e(C, D) needs; both our prover and verifier use it consistently.
TODO(perf): optimal ate + Frobenius-powered final exponentiation.
"""

from __future__ import annotations

from ..field.bn254 import FQ_MOD as Q
from ..field.bn254 import FR_MOD as R
from . import host
from .host import FQ2_ONE, FQ2_ZERO, fq2_add, fq2_inv, fq2_mul, fq2_neg, fq2_sub

XI = (9, 1)  # the sextic-twist constant xi = 9 + u

# ---------------------------------------------------------------------------
# Fq6 arithmetic: (c0, c1, c2) meaning c0 + c1 v + c2 v^2, v^3 = xi
# ---------------------------------------------------------------------------

FQ6_ZERO = (FQ2_ZERO, FQ2_ZERO, FQ2_ZERO)
FQ6_ONE = (FQ2_ONE, FQ2_ZERO, FQ2_ZERO)


def fq6_add(a, b):
    return tuple(fq2_add(x, y) for x, y in zip(a, b))


def fq6_sub(a, b):
    return tuple(fq2_sub(x, y) for x, y in zip(a, b))


def fq6_neg(a):
    return tuple(fq2_neg(x) for x in a)


def fq6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = fq2_mul(a0, b0)
    t1 = fq2_mul(a1, b1)
    t2 = fq2_mul(a2, b2)
    # Karatsuba-style cross terms
    c0 = fq2_add(t0, fq2_mul(XI, fq2_sub(fq2_mul(fq2_add(a1, a2), fq2_add(b1, b2)), fq2_add(t1, t2))))
    c1 = fq2_add(
        fq2_sub(fq2_mul(fq2_add(a0, a1), fq2_add(b0, b1)), fq2_add(t0, t1)),
        fq2_mul(XI, t2),
    )
    c2 = fq2_add(fq2_sub(fq2_mul(fq2_add(a0, a2), fq2_add(b0, b2)), fq2_add(t0, t2)), t1)
    return (c0, c1, c2)


def fq6_mul_by_v(a):
    """a * v with v^3 = xi."""
    return (fq2_mul(XI, a[2]), a[0], a[1])


def fq6_inv(a):
    a0, a1, a2 = a
    # standard formulas: c0 = a0^2 - xi a1 a2, etc.
    c0 = fq2_sub(fq2_mul(a0, a0), fq2_mul(XI, fq2_mul(a1, a2)))
    c1 = fq2_sub(fq2_mul(XI, fq2_mul(a2, a2)), fq2_mul(a0, a1))
    c2 = fq2_sub(fq2_mul(a1, a1), fq2_mul(a0, a2))
    t = fq2_add(
        fq2_mul(a0, c0),
        fq2_mul(XI, fq2_add(fq2_mul(a2, c1), fq2_mul(a1, c2))),
    )
    tinv = fq2_inv(t)
    return (fq2_mul(c0, tinv), fq2_mul(c1, tinv), fq2_mul(c2, tinv))


# ---------------------------------------------------------------------------
# Fq12 arithmetic: (c0, c1) meaning c0 + c1 w, w^2 = v
# ---------------------------------------------------------------------------

FQ12_ONE = (FQ6_ONE, FQ6_ZERO)
FQ12_ZERO = (FQ6_ZERO, FQ6_ZERO)


def fq12_add(a, b):
    return (fq6_add(a[0], b[0]), fq6_add(a[1], b[1]))


def fq12_sub(a, b):
    return (fq6_sub(a[0], b[0]), fq6_sub(a[1], b[1]))


def fq12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = fq6_mul(a0, b0)
    t1 = fq6_mul(a1, b1)
    c1 = fq6_sub(fq6_mul(fq6_add(a0, a1), fq6_add(b0, b1)), fq6_add(t0, t1))
    c0 = fq6_add(t0, fq6_mul_by_v(t1))
    return (c0, c1)


def fq12_sqr(a):
    return fq12_mul(a, a)


def fq12_inv(a):
    a0, a1 = a
    t = fq6_sub(fq6_mul(a0, a0), fq6_mul_by_v(fq6_mul(a1, a1)))
    tinv = fq6_inv(t)
    return (fq6_mul(a0, tinv), fq6_neg(fq6_mul(a1, tinv)))


def fq12_pow(a, e: int):
    result = FQ12_ONE
    base = a
    while e:
        if e & 1:
            result = fq12_mul(result, base)
        base = fq12_sqr(base)
        e >>= 1
    return result


def fq12_eq_one(a):
    return a == FQ12_ONE


# ---------------------------------------------------------------------------
# embedding of points into E(Fq12) and the Miller loop
# ---------------------------------------------------------------------------


def _embed_g1(P):
    """(x, y) in Fq -> ((x,0,...), (y,0,...)) coordinates in Fq12."""
    x, y = P
    X = (((x, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)
    Y = (((y, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)
    return (X, Y)


def _untwist_g2(Qp):
    """psi(x, y) = (x w^2, y w^3) = (x v, y v w) as Fq12 coordinates."""
    (x, y) = Qp
    X = ((FQ2_ZERO, x, FQ2_ZERO), FQ6_ZERO)  # x * v in the c0 (even) part
    Y = (FQ6_ZERO, (FQ2_ZERO, y, FQ2_ZERO))  # y * v * w
    return (X, Y)


def _line_eval_fq12(x1, y1, lam_or_none, X, Y):
    """Evaluate the line through the current G1 point at (X, Y) in Fq12.

    lam_or_none = slope in Fq for a chord/tangent, or None for the vertical
    line x = x1.
    """
    x1_12 = (((x1, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)
    if lam_or_none is None:
        return fq12_sub(X, x1_12)
    y1_12 = (((y1, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)
    lam_12 = (((lam_or_none, 0), FQ2_ZERO, FQ2_ZERO), FQ6_ZERO)
    return fq12_sub(fq12_mul(lam_12, fq12_sub(X, x1_12)), fq12_sub(Y, y1_12))


FINAL_EXP = (Q**12 - 1) // R


def miller_loop_tate(P, Qp):
    """f_{r,P} evaluated at psi(Q); P in G1 affine, Q in G2 affine."""
    if P is None or Qp is None:
        return FQ12_ONE
    X, Y = _untwist_g2(Qp)
    f = FQ12_ONE
    T = P
    xP, yP = P
    bits = bin(R)[2:]
    for bit in bits[1:]:
        # tangent at T
        xT, yT = T
        lam = (3 * xT * xT) * pow(2 * yT % Q, -1, Q) % Q
        f = fq12_mul(fq12_sqr(f), _line_eval_fq12(xT, yT, lam, X, Y))
        # vertical at 2T
        T2 = host.g1_double(T)
        if T2 is None:
            T = None
            break
        f = fq12_mul(f, fq12_inv(_line_eval_fq12(T2[0], T2[1], None, X, Y)))
        T = T2
        if bit == "1":
            xT, yT = T
            if xT == xP:
                # vertical chord: T = -P (final addition to infinity)
                f = fq12_mul(f, _line_eval_fq12(xP, yP, None, X, Y))
                T = None
            else:
                lam = (yP - yT) * pow((xP - xT) % Q, -1, Q) % Q
                f = fq12_mul(f, _line_eval_fq12(xT, yT, lam, X, Y))
                TA = host.g1_add(T, P)
                f = fq12_mul(f, fq12_inv(_line_eval_fq12(TA[0], TA[1], None, X, Y)))
                T = TA
    return f


def pairing(P, Qp):
    """Full Tate pairing into the r-th roots of unity in Fq12."""
    f = miller_loop_tate(P, Qp)
    return fq12_pow(f, FINAL_EXP)


def pairing_product_is_one(pairs) -> bool:
    """Check prod e(P_i, Q_i) == 1 with a single shared final exponentiation."""
    f = FQ12_ONE
    for P, Qp in pairs:
        f = fq12_mul(f, miller_loop_tate(P, Qp))
    return fq12_eq_one(fq12_pow(f, FINAL_EXP))
