"""Grain LFSR (self-shrinking mode) for Poseidon constant generation.

Behavioral re-implementation of the reference's vendored generator
(reference: circuits/src/poseidon/primitives/grain.rs:53-167): 80-bit LFSR
seeded from (field tag, sbox tag, n_bits, t, R_F, R_P) in MSB order, 160
discarded warm-up bits, self-shrinking pair sampling, and MSB-first field
sampling with or without rejection.
"""

from __future__ import annotations

STATE = 80

FIELD_PRIME_ORDER = 1
SBOX_POW = 0


class Grain:
    def __init__(self, p: int, n_bits: int, t: int, r_f: int, r_p: int,
                 sbox_tag: int = SBOX_POW, field_tag: int = FIELD_PRIME_ORDER):
        self.p = p
        self.n_bits = n_bits
        state = [1] * STATE

        def set_bits(offset: int, length: int, value: int) -> None:
            for i in range(length):
                state[offset + length - 1 - i] = (value >> i) & 1

        set_bits(0, 2, field_tag)
        set_bits(2, 4, sbox_tag)
        set_bits(6, 12, n_bits)
        set_bits(18, 12, t)
        set_bits(30, 10, r_f)
        set_bits(40, 10, r_p)
        self.state = state
        self.next_bit = STATE

        # discard the first 160 bits (20 rounds of 8)
        for _ in range(20):
            self._load_next_8_bits()
            self.next_bit = STATE

    def _load_next_8_bits(self) -> None:
        s = self.state
        new_bits = [
            s[i + 62] ^ s[i + 51] ^ s[i + 38] ^ s[i + 23] ^ s[i + 13] ^ s[i]
            for i in range(8)
        ]
        self.state = s[8:] + new_bits  # rotate left 8, install fresh bits
        self.next_bit -= 8

    def _get_next_bit(self) -> int:
        if self.next_bit == STATE:
            self._load_next_8_bits()
        ret = self.state[self.next_bit]
        self.next_bit += 1
        return ret

    def next_stream_bit(self) -> int:
        """Self-shrinking: emit the 2nd bit of each (1, b) pair."""
        while not self._get_next_bit():
            self._get_next_bit()
        return self._get_next_bit()

    def _take_bits_msb(self) -> int:
        """Take n_bits stream bits, interpreted MSB-first (reference order)."""
        v = 0
        for _ in range(self.n_bits):
            v = (v << 1) | self.next_stream_bit()
        return v

    def next_field_element(self) -> int:
        """Rejection-sampled canonical field element (round constants)."""
        while True:
            v = self._take_bits_msb()
            if v < self.p:
                return v

    def next_field_element_without_rejection(self) -> int:
        """Non-rejecting sample: reduce the n_bits-wide value mod p (MDS)."""
        return self._take_bits_msb() % self.p
