"""BN254 G1 Jacobian ops over the limb-major vec layout (field/vec.py).

Same formulas and edge-case select logic as jax_g1.py (validated against the
host implementation), but every field op is a fused Pallas kernel over
[16, rows, 128] Fq arrays — the compute path of the production MSM.

A point batch is (X, Y, Z) vec arrays; Z == 0 encodes the identity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..field import vec as fv
from ..field.bn254 import FQ_MOD
from ..field.limbs import int_to_mont_limbs
from ..field.mont import FQ

_ONE_COL = int_to_mont_limbs(1, FQ_MOD).reshape(16, 1, 1)  # [16,1,1] broadcast


def videntity(rows: int):
    one = jnp.broadcast_to(jnp.asarray(_ONE_COL), (16, rows, fv.LANES))
    zero = jnp.zeros((16, rows, fv.LANES), dtype=jnp.uint32)
    return (one, one, zero)


def vis_zero(a):
    """[16, rows, 128] -> bool [rows, 128]."""
    return jnp.all(a == 0, axis=0)


def vselect(cond, P, Q):
    """cond [rows,128] ? P : Q over point tuples."""
    return tuple(jnp.where(cond[None, :, :], a, b) for a, b in zip(P, Q))


def _mul(a, b):
    return fv.vmul(FQ, a, b)


def _sqr(a):
    return fv.vmul(FQ, a, a)


def _add(a, b):
    return fv.vadd(FQ, a, b)


def _sub(a, b):
    return fv.vsub(FQ, a, b)


def _dbl(a):
    return fv.vadd(FQ, a, a)


def vpdouble(P):
    """Jacobian doubling (a = 0 curve), identical math to jax_g1.pdouble."""
    X, Y, Z = P
    A = _sqr(X)
    B = _sqr(Y)
    C = _sqr(B)
    D = _dbl(_sub(_sqr(_add(X, B)), _add(A, C)))
    E = _add(_dbl(A), A)
    F = _sqr(E)
    X3 = _sub(F, _dbl(D))
    eight_c = _dbl(_dbl(_dbl(C)))
    Y3 = _sub(_mul(E, _sub(D, X3)), eight_c)
    Z3 = _dbl(_mul(Y, Z))
    return (X3, Y3, Z3)


def vpadd(P, Q):
    """Full Jacobian addition, identical select logic to jax_g1.padd."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = _sqr(Z1)
    Z2Z2 = _sqr(Z2)
    U1 = _mul(X1, Z2Z2)
    U2 = _mul(X2, Z1Z1)
    S1 = _mul(Y1, _mul(Z2, Z2Z2))
    S2 = _mul(Y2, _mul(Z1, Z1Z1))
    H = _sub(U2, U1)
    r = _sub(S2, S1)
    HH = _sqr(H)
    HHH = _mul(H, HH)
    V = _mul(U1, HH)
    X3 = _sub(_sub(_sqr(r), HHH), _dbl(V))
    Y3 = _sub(_mul(r, _sub(V, X3)), _mul(S1, HHH))
    Z3 = _mul(_mul(Z1, Z2), H)
    out = (X3, Y3, Z3)

    p_inf = vis_zero(Z1)
    q_inf = vis_zero(Z2)
    h_zero = vis_zero(H)
    r_zero = vis_zero(r)
    finite = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    same = jnp.logical_and(jnp.logical_and(h_zero, r_zero), finite)
    opp = jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)), finite)

    out = vselect(same, vpdouble(P), out)
    out = vselect(opp, videntity(Z1.shape[1]), out)
    out = vselect(q_inf, P, out)
    out = vselect(p_inf, Q, out)
    return out


def vpneg(P):
    """(X, Y, Z) -> (X, -Y, Z); identity maps to itself (0 - 0 = 0... -Y of 0
    stays 0 because vsub(0, 0) = 0)."""
    X, Y, Z = P
    zero = jnp.zeros_like(Y)
    return (X, fv.vsub(FQ, zero, Y), Z)
