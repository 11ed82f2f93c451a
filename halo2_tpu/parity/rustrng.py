"""RNG that replays the exact byte stream the Rust wasm prover sees.

The parity harness (bindgen.RandomStream) feeds the wasm's OsRng from a
seeded Blake2b stream: each `getRandomValues` call with an n-byte view
consumes ONE 64-byte block blake2b(seed || ctr_le64, person=b"wasmrt-getrandom")
and returns its first n bytes.

Inside the Rust stack (rand_core OsRng + halo2curves 0.3.2), every
`Fr::random` is 8 × `next_u64`, and each `next_u64` is an 8-byte getrandom
call — so one field element consumes 8 consecutive blocks, first 8 bytes of
each, assembled as little-endian u64 limbs into a 512-bit integer reduced
mod r (`Fr::from_u512`).

With this RNG plugged into our prover (which mirrors halo2 create_proof's
draw order, including the Blind draws KZG ignores — see
`DeterministicRng.unused_blind` call sites in plonk/prover.py), our proof
bytes are directly comparable to the wasm prover's output for the same seed:
the byte-identity ground-truth test in tests/test_parity_wasm.py.
"""

from __future__ import annotations

import hashlib

from ..field.bn254 import FR_MOD


class RustStreamRng:
    """Mimics bindgen.RandomStream + OsRng + Fr::random, element for element."""

    def __init__(self, seed: bytes = b"halo2-parity"):
        self._seed = seed
        self._ctr = 0

    def _next_u64(self) -> int:
        block = hashlib.blake2b(
            self._seed + self._ctr.to_bytes(8, "little"),
            digest_size=64,
            person=b"wasmrt-getrandom",
        ).digest()
        self._ctr += 1
        return int.from_bytes(block[:8], "little")

    def field_elements(self, count: int) -> list[int]:
        out = []
        for _ in range(count):
            v = 0
            for i in range(8):
                v |= self._next_u64() << (64 * i)
            out.append(v % FR_MOD)
        return out

    def unused_blind(self, count: int = 1) -> None:
        """halo2 draws `Blind(Fr::random(rng))` values that ParamsKZG::commit
        ignores; they still advance the stream."""
        self.field_elements(count)

    def random_poly_coeffs(self, n: int) -> list[int]:
        """The vanishing argument's random poly at this rev: per worker
        thread, a 32-byte OsRng seed creates a ChaCha20Rng which generates
        the thread's chunk of coefficients.  The wasm build is single-
        threaded -> ONE 32-byte getrandom (one stream block) then n
        Fr::random draws from the ChaCha20 keystream (verified against the
        harness's logged getrandom call pattern: [..., 32, 8 x (blinds)])."""
        block = hashlib.blake2b(
            self._seed + self._ctr.to_bytes(8, "little"),
            digest_size=64,
            person=b"wasmrt-getrandom",
        ).digest()
        self._ctr += 1
        chacha = ChaCha20Rng(block[:32])
        return [chacha.field_element() for _ in range(n)]


def _quarter(st, a, b, c, d):
    st[a] = (st[a] + st[b]) & 0xFFFFFFFF
    st[d] ^= st[a]
    st[d] = ((st[d] << 16) | (st[d] >> 16)) & 0xFFFFFFFF
    st[c] = (st[c] + st[d]) & 0xFFFFFFFF
    st[b] ^= st[c]
    st[b] = ((st[b] << 12) | (st[b] >> 20)) & 0xFFFFFFFF
    st[a] = (st[a] + st[b]) & 0xFFFFFFFF
    st[d] ^= st[a]
    st[d] = ((st[d] << 8) | (st[d] >> 24)) & 0xFFFFFFFF
    st[c] = (st[c] + st[d]) & 0xFFFFFFFF
    st[b] ^= st[c]
    st[b] = ((st[b] << 7) | (st[b] >> 25)) & 0xFFFFFFFF


class ChaCha20Rng:
    """rand_chacha 0.3 ChaCha20Rng (djb variant: 64-bit block counter at
    words 12-13, 64-bit stream id = 0 at words 14-15), exposing the
    `next_u64` word-pairing BlockRng semantics that `Fr::random` consumes."""

    def __init__(self, seed: bytes):
        assert len(seed) == 32
        self._key = [int.from_bytes(seed[i : i + 4], "little") for i in range(0, 32, 4)]
        self._counter = 0
        self._buf: list[int] = []
        self._idx = 0

    def _block(self, counter: int) -> list[int]:
        init = (
            [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
            + self._key
            + [counter & 0xFFFFFFFF, (counter >> 32) & 0xFFFFFFFF, 0, 0]
        )
        st = list(init)
        for _ in range(10):
            _quarter(st, 0, 4, 8, 12)
            _quarter(st, 1, 5, 9, 13)
            _quarter(st, 2, 6, 10, 14)
            _quarter(st, 3, 7, 11, 15)
            _quarter(st, 0, 5, 10, 15)
            _quarter(st, 1, 6, 11, 12)
            _quarter(st, 2, 7, 8, 13)
            _quarter(st, 3, 4, 9, 14)
        return [(s + i) & 0xFFFFFFFF for s, i in zip(st, init)]

    def _refill(self):
        # rand_chacha generates 4 consecutive blocks per buffer
        self._buf = []
        for j in range(4):
            self._buf.extend(self._block(self._counter + j))
        self._counter += 4
        self._idx = 0

    def next_u64(self) -> int:
        if self._idx + 1 >= len(self._buf):
            if self._idx >= len(self._buf):
                self._refill()
            else:  # odd straddle (not hit for whole-u64 consumption)
                lo = self._buf[-1]
                self._refill()
                return (self._buf[0] << 32) | lo
        lo, hi = self._buf[self._idx], self._buf[self._idx + 1]
        self._idx += 2
        return (hi << 32) | lo

    def field_element(self) -> int:
        v = 0
        for i in range(8):
            v |= self.next_u64() << (64 * i)
        return v % FR_MOD
