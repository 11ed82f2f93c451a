from . import grain, mds, poseidon
from .poseidon import PoseidonSpec, hash_constant_length, permute, wasm_spec

__all__ = [
    "grain",
    "mds",
    "poseidon",
    "PoseidonSpec",
    "permute",
    "hash_constant_length",
    "wasm_spec",
]
