"""Base64 -> decimal-string decoding (reference: circuits/src/unstringify.rs).

The reference ships circomlib Poseidon constants as base64 strings and
converts them to decimal strings via an intermediate hex string with
schoolbook base conversion (`unstringifyHex`, unstringify.rs:6-48) before
parsing into Fr.  Same surface here; Python's bignums make the conversion
direct, but `hex_to_decimal` keeps the digit-by-digit algorithm shape for
parity with `hexToDecimal`.
"""

from __future__ import annotations

import base64

__all__ = ["unstringify_hex", "hex_to_decimal"]


def hex_to_decimal(hex_str: str) -> str:
    """Hex digit string (no 0x prefix) -> decimal string (schoolbook:
    result = result * 16 + digit, reference unstringify.rs:50-61)."""
    acc = 0
    for ch in hex_str:
        acc = acc * 16 + int(ch, 16)
    return str(acc)


def unstringify_hex(b64: str) -> str:
    """Base64 -> big-endian hex -> decimal string (unstringify.rs:6-48)."""
    raw = base64.b64decode(b64)
    return hex_to_decimal(raw.hex())
