"""Parity harness: executes the reference's CHECKED-IN wasm artifact
(the actual Rust halo2 prover/verifier compiled to wasm32) inside this
repo's own wasm->Python transpiler, giving ground-truth byte vectors and
cross-verification without a Rust toolchain (SURVEY.md §7.3 hard part #1;
BASELINE.md "verifies under the Rust verifier")."""

from .reference import ReferenceWasm  # noqa: F401
