"""Host-side conversions between Python ints and the device limb layout.

Device representation: an element of a <=256-bit field is a length-16 vector
of uint32 values, each holding a 16-bit limb, little-endian limb order.
Batches put the limb axis LAST: shape [..., 16].  All device math is done in
Montgomery form (x * 2^256 mod p); these helpers do the (cheap, host-side)
form conversions for constants, test vectors, and transcript I/O.
"""

from __future__ import annotations

import numpy as np

from .bn254 import LIMB_BITS, LIMB_MASK, N_LIMBS, R

__all__ = [
    "int_to_limbs",
    "ints_to_limbs",
    "limbs_to_int",
    "limbs_to_ints",
    "int_to_mont_limbs",
    "ints_to_mont_limbs",
    "mont_limbs_to_int",
    "mont_limbs_to_ints",
]


def int_to_limbs(x: int) -> np.ndarray:
    """One integer -> [16] uint32 limb vector."""
    out = np.empty((N_LIMBS,), dtype=np.uint32)
    for i in range(N_LIMBS):
        out[i] = x & LIMB_MASK
        x >>= LIMB_BITS
    return out


def ints_to_limbs(xs) -> np.ndarray:
    """Iterable of ints -> [n, 16] uint32."""
    xs = list(xs)
    out = np.empty((len(xs), N_LIMBS), dtype=np.uint32)
    for r, x in enumerate(xs):
        for i in range(N_LIMBS):
            out[r, i] = x & LIMB_MASK
            x >>= LIMB_BITS
    return out


def limbs_to_int(a) -> int:
    a = np.asarray(a, dtype=np.uint64).reshape(-1)
    x = 0
    for i in range(N_LIMBS - 1, -1, -1):
        x = (x << LIMB_BITS) | int(a[i])
    return x


def limbs_to_ints(a) -> list:
    a = np.asarray(a, dtype=np.uint64)
    flat = a.reshape(-1, N_LIMBS)
    out = []
    for row in flat:
        x = 0
        for i in range(N_LIMBS - 1, -1, -1):
            x = (x << LIMB_BITS) | int(row[i])
        out.append(x)
    return out


def int_to_mont_limbs(x: int, p: int) -> np.ndarray:
    return int_to_limbs((x * R) % p)


def ints_to_mont_limbs(xs, p: int) -> np.ndarray:
    return ints_to_limbs([(x * R) % p for x in xs])


def mont_limbs_to_int(a, p: int) -> int:
    rinv = pow(R, -1, p)
    return (limbs_to_int(a) * rinv) % p


def mont_limbs_to_ints(a, p: int) -> list:
    rinv = pow(R, -1, p)
    return [(x * rinv) % p for x in limbs_to_ints(a)]
