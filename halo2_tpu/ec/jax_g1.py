"""Batched BN254 G1 arithmetic on device (Jacobian coordinates over Fq limbs).

Replaces the reference's external `halo2curves` G1 group ops for all bulk
work (SURVEY.md 2.2).  A point batch is a tuple (X, Y, Z) of [..., 16]
Montgomery Fq limb arrays; Z == 0 encodes the identity.  All ops are
branchless (selects) so they vectorize over arbitrary batch shapes and sit
inside scans/collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import FQ, mont
from ..field.bn254 import FQ_MOD
from ..field.limbs import int_to_mont_limbs, ints_to_mont_limbs, mont_limbs_to_int

_ONE = int_to_mont_limbs(1, FQ_MOD)


def identity(shape=()):
    one = jnp.broadcast_to(jnp.asarray(_ONE), tuple(shape) + (16,))
    zero = jnp.zeros(tuple(shape) + (16,), dtype=jnp.uint32)
    return (one, one, zero)


def is_identity(P):
    return mont.is_zero(P[2])


def select_point(cond, P, Q):
    """cond ? P : Q, batched over the point batch shape."""
    return tuple(mont.select(cond, a, b) for a, b in zip(P, Q))


def pdouble(P):
    """Jacobian doubling (a = 0 curve): 2M + 5S, no branches.

    Identity and 2-torsion inputs flow to Z3 = 0 automatically.
    """
    X, Y, Z = P
    A = mont.square(FQ, X)
    B = mont.square(FQ, Y)
    C = mont.square(FQ, B)
    D = mont.dbl(FQ, mont.sub(FQ, mont.square(FQ, mont.add(FQ, X, B)), mont.add(FQ, A, C)))
    E = mont.add(FQ, mont.dbl(FQ, A), A)
    F = mont.square(FQ, E)
    X3 = mont.sub(FQ, F, mont.dbl(FQ, D))
    eight_c = mont.dbl(FQ, mont.dbl(FQ, mont.dbl(FQ, C)))
    Y3 = mont.sub(FQ, mont.mul(FQ, E, mont.sub(FQ, D, X3)), eight_c)
    Z3 = mont.dbl(FQ, mont.mul(FQ, Y, Z))
    return (X3, Y3, Z3)


def padd(P, Q):
    """Full Jacobian addition with all edge cases resolved by selects."""
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    Z1Z1 = mont.square(FQ, Z1)
    Z2Z2 = mont.square(FQ, Z2)
    U1 = mont.mul(FQ, X1, Z2Z2)
    U2 = mont.mul(FQ, X2, Z1Z1)
    S1 = mont.mul(FQ, Y1, mont.mul(FQ, Z2, Z2Z2))
    S2 = mont.mul(FQ, Y2, mont.mul(FQ, Z1, Z1Z1))
    H = mont.sub(FQ, U2, U1)
    r = mont.sub(FQ, S2, S1)
    HH = mont.square(FQ, H)
    HHH = mont.mul(FQ, H, HH)
    V = mont.mul(FQ, U1, HH)
    X3 = mont.sub(FQ, mont.sub(FQ, mont.square(FQ, r), HHH), mont.dbl(FQ, V))
    Y3 = mont.sub(
        FQ, mont.mul(FQ, r, mont.sub(FQ, V, X3)), mont.mul(FQ, S1, HHH)
    )
    Z3 = mont.mul(FQ, mont.mul(FQ, Z1, Z2), H)
    out = (X3, Y3, Z3)

    p_inf = mont.is_zero(Z1)
    q_inf = mont.is_zero(Z2)
    h_zero = mont.is_zero(H)
    r_zero = mont.is_zero(r)
    finite = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    same = jnp.logical_and(jnp.logical_and(h_zero, r_zero), finite)
    opp = jnp.logical_and(jnp.logical_and(h_zero, jnp.logical_not(r_zero)), finite)

    out = select_point(same, pdouble(P), out)
    out = select_point(opp, identity(Z1.shape[:-1]), out)
    out = select_point(q_inf, P, out)
    out = select_point(p_inf, Q, out)
    return out


@jax.jit
def to_affine_batch(P):
    """Jacobian batch -> (x, y, is_inf) with a single batched inversion."""
    X, Y, Z = P
    zinv = mont.batch_inv(FQ, Z.reshape(-1, 16)).reshape(Z.shape)
    zinv2 = mont.square(FQ, zinv)
    zinv3 = mont.mul(FQ, zinv2, zinv)
    return (
        mont.mul(FQ, X, zinv2),
        mont.mul(FQ, Y, zinv3),
        mont.is_zero(Z),
    )


# ---- host <-> device -----------------------------------------------------------


def points_to_device(points):
    """List of host affine points (or None) -> (X, Y, Z) device arrays."""
    xs, ys, zs = [], [], []
    for P in points:
        if P is None:
            xs.append(1)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(P[0])
            ys.append(P[1])
            zs.append(1)
    X = jnp.asarray(ints_to_mont_limbs(xs, FQ_MOD))
    Y = jnp.asarray(ints_to_mont_limbs(ys, FQ_MOD))
    Z = jnp.asarray(ints_to_mont_limbs(zs, FQ_MOD))
    return (X, Y, Z)


def point_to_host(P):
    """Single device Jacobian point (shape [16] coords) -> host affine/None."""
    x, y, inf = to_affine_batch(tuple(c.reshape(1, 16) for c in P))
    if bool(np.asarray(inf)[0]):
        return None
    return (
        mont_limbs_to_int(np.asarray(x)[0], FQ_MOD),
        mont_limbs_to_int(np.asarray(y)[0], FQ_MOD),
    )
