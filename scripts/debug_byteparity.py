"""Byte-level differential: our prover with the Rust-mimic RNG stream vs the
wasm prover's committed fixture proof.  First divergent byte localizes any
remaining transcript/commitment divergence to a phase.

Proof layout for the arithmetic circuit at k=4 (GWC):
    0..96     advice commitments (3 x 32B compressed)
   96..224    permutation z commitments (4 chunks)
  224..256    vanishing random commitment
  256..320    h pieces (2)
  320..1088   24 evals (3 advice, 5 fixed, random, 4 sigma, 11 z)
 1088..1184   GWC witness points (3: x, x_next, x_last)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

FIX = "/root/repo/tests/fixtures"
ARITH_INPUT = json.dumps({"x": 3, "y": 4, "constant": 5, "z": 149})


def main():
    from halo2_tpu.commit.srs import ParamsKZG
    from halo2_tpu.circuits.arithmetic import create_circuit_from_string, empty_circuit
    from halo2_tpu.parity.rustrng import RustStreamRng
    from halo2_tpu.plonk.keygen import keygen
    from halo2_tpu.plonk.prover import create_proof

    rust = open(f"{FIX}/rust_proof_arith_k4.bin", "rb").read()
    params = ParamsKZG.read(open(f"{FIX}/rust_params_k4.bin", "rb").read())
    pk = keygen(params, empty_circuit(5))
    circuit = create_circuit_from_string(ARITH_INPUT)
    ours = create_proof(
        params, pk, circuit, [[5, 149]], scheme="gwc",
        rng=RustStreamRng(b"halo2-parity"),
    )
    print(f"ours len={len(ours)} rust len={len(rust)}")
    if ours == rust:
        print("BYTE-IDENTICAL")
        return
    sections = [
        (0, "advice commitments"), (96, "z commitments"), (224, "random commitment"),
        (256, "h pieces"), (320, "evals"), (1088, "gwc w points"), (1184, "end"),
    ]
    for i in range(min(len(ours), len(rust))):
        if ours[i] != rust[i]:
            sec = [name for off, name in sections if off <= i][-1]
            print(f"first divergence at byte {i} ({sec})")
            lo = (i // 32) * 32
            print(f"  rust[{lo}:{lo+32}] = {rust[lo:lo+32].hex()}")
            print(f"  ours[{lo}:{lo+32}] = {ours[lo:lo+32].hex()}")
            break
    # report which 32-byte words match overall
    good = [i for i in range(0, 1184, 32) if ours[i:i+32] == rust[i:i+32]]
    print(f"matching 32B words: {len(good)}/37 -> offsets {good}")


if __name__ == "__main__":
    main()
