"""Blake2b transcript with 255-bit challenge squeezing.

Host-side (tiny + serial) equivalent of the reference's external
`Blake2bWrite/Blake2bRead/Challenge255` (SURVEY.md 2.2; used at
reference: circuits/src/utils.rs:105-120,131-139).  Protocol:

  * state = Blake2b-512 keyed with personalization "Halo2-Transcript";
  * domain-separation prefix bytes: 0 = challenge squeeze, 1 = point,
    2 = scalar;
  * common_point absorbs the affine x||y 32-byte LE reprs (identity is an
    error); common_scalar absorbs the 32-byte LE repr;
  * squeeze: absorb [0], fork the state, take the 64-byte digest, reduce the
    little-endian 512-bit integer mod r (Fr::from_bytes_wide semantics);
  * the proof stream carries compressed points (32B) and scalar reprs (32B).
"""

from __future__ import annotations

import hashlib

from ..ec import host as ec
from ..field import bn254

PERSONALIZATION = b"Halo2-Transcript"
PREFIX_CHALLENGE = b"\x00"
PREFIX_POINT = b"\x01"
PREFIX_SCALAR = b"\x02"


def _new_state():
    return hashlib.blake2b(digest_size=64, person=PERSONALIZATION)


class Blake2bWrite:
    """Prover-side transcript: absorbs commitments/evals, emits proof bytes."""

    def __init__(self) -> None:
        self._state = _new_state()
        self._proof = bytearray()

    # -- absorption (affects challenges, not the proof stream) --------------
    def common_point(self, point) -> None:
        if point is None:
            raise ValueError("cannot absorb the point at infinity")
        x, y = point
        self._state.update(PREFIX_POINT)
        self._state.update(bn254.fq_to_bytes(x))
        self._state.update(bn254.fq_to_bytes(y))

    def common_scalar(self, scalar: int) -> None:
        self._state.update(PREFIX_SCALAR)
        self._state.update(bn254.fr_to_bytes(scalar))

    # -- proof stream --------------------------------------------------------
    def write_point(self, point) -> None:
        self.common_point(point)
        self._proof += ec.g1_to_bytes(point)

    def write_scalar(self, scalar: int) -> None:
        self.common_scalar(scalar)
        self._proof += bn254.fr_to_bytes(scalar)

    # -- challenges ------------------------------------------------------------
    def squeeze_challenge(self) -> int:
        self._state.update(PREFIX_CHALLENGE)
        digest = self._state.copy().digest()
        return bn254.fr_from_u512(digest)

    def finalize(self) -> bytes:
        return bytes(self._proof)


class Blake2bRead:
    """Verifier-side transcript: re-absorbs the proof stream, re-derives
    challenges; any decode failure is an invalid proof."""

    def __init__(self, proof: bytes) -> None:
        self._state = _new_state()
        self._proof = memoryview(bytes(proof))
        self._pos = 0

    def _take(self, n: int) -> bytes:
        if self._pos + n > len(self._proof):
            raise ValueError("proof too short")
        out = bytes(self._proof[self._pos : self._pos + n])
        self._pos += n
        return out

    def common_point(self, point) -> None:
        if point is None:
            raise ValueError("cannot absorb the point at infinity")
        x, y = point
        self._state.update(PREFIX_POINT)
        self._state.update(bn254.fq_to_bytes(x))
        self._state.update(bn254.fq_to_bytes(y))

    def common_scalar(self, scalar: int) -> None:
        self._state.update(PREFIX_SCALAR)
        self._state.update(bn254.fr_to_bytes(scalar))

    def read_point(self):
        point = ec.g1_from_bytes(self._take(32))
        self.common_point(point)
        return point

    def read_scalar(self) -> int:
        scalar = bn254.fr_from_bytes(self._take(32))
        self.common_scalar(scalar)
        return scalar

    def squeeze_challenge(self) -> int:
        self._state.update(PREFIX_CHALLENGE)
        digest = self._state.copy().digest()
        return bn254.fr_from_u512(digest)

    def assert_consumed(self) -> None:
        if self._pos != len(self._proof):
            raise ValueError("proof has trailing bytes")
