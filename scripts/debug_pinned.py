"""Recover the ACTUAL pinned-vk Debug string from the Rust wasm prover's
linear memory and diff it against our pinned_vk_repr rendering.

The wasm formats `format!("{:?}", vk.pinned())` into a heap String during
keygen_vk; dlmalloc doesn't wipe freed blocks, so after wasm_generate_proof
returns, the bytes are still in linear memory.  We scan for the marker.
"""

import difflib
import json
import os
import sys

sys.path.insert(0, "/root/repo")

FIX = "/root/repo/tests/fixtures"
ARITH_INPUT = json.dumps({"x": 3, "y": 4, "constant": 5, "z": 149})


def rust_pinned_strings():
    """Run the wasm prover while a monitor thread snapshots linear memory,
    catching the transient formatted pinned-vk string."""
    import threading

    from halo2_tpu.parity.reference import ReferenceWasm

    ref = ReferenceWasm(verbose=True)
    with open(os.path.join(FIX, "rust_params_k4.bin"), "rb") as f:
        params = f.read()

    captures: dict[str, None] = {}
    stop = threading.Event()
    marker = b"PinnedVerificationKey {"

    def monitor():
        mem = ref._b.mem
        while not stop.is_set():
            s = bytes(mem)
            start = 0
            while True:
                i = s.find(marker, start)
                if i < 0:
                    break
                j = i
                while j < len(s) and 0x20 <= s[j] < 0x7F:
                    j += 1
                captures.setdefault(s[i:j].decode("ascii"))
                start = i + 1

    t = threading.Thread(target=monitor, daemon=True)
    t.start()
    try:
        proof = ref._call(ref._b.wasm_generate_proof, params, ARITH_INPUT, 1)
    finally:
        stop.set()
        t.join()
    print(f"[rust] proof len = {len(proof)}", file=sys.stderr)
    with open("/tmp/rust_proof_fresh.bin", "wb") as f:
        f.write(proof)
    return list(captures)


def our_pinned_string():
    from halo2_tpu.commit.srs import ParamsKZG
    from halo2_tpu.plonk.keygen import keygen
    from halo2_tpu.plonk.pinned import pinned_vk_repr
    from halo2_tpu.circuits.arithmetic import empty_circuit

    with open(os.path.join(FIX, "rust_params_k4.bin"), "rb") as f:
        params = ParamsKZG.read(f.read())
    pk = keygen(params, empty_circuit(5))
    vk = pk.vk
    return pinned_vk_repr(
        vk.k,
        vk.domain.extended_k,
        vk.domain.omega,
        vk.cs,
        vk.fixed_commitments,
        vk.permutation_commitments,
    )


def main():
    ours = our_pinned_string()
    with open("/tmp/pinned_ours.txt", "w") as f:
        f.write(ours)
    print(f"[ours] len = {len(ours)}", file=sys.stderr)

    theirs = rust_pinned_strings()
    print(f"[rust] found {len(theirs)} candidate strings", file=sys.stderr)
    for idx, s in enumerate(theirs):
        with open(f"/tmp/pinned_rust_{idx}.txt", "w") as f:
            f.write(s)
        print(f"[rust] candidate {idx}: len = {len(s)}", file=sys.stderr)

    if not theirs:
        print("NO PINNED STRING FOUND IN MEMORY", file=sys.stderr)
        return

    best = max(theirs, key=len)
    if best == ours:
        print("IDENTICAL")
        return
    print("DIFFER — first divergence:")
    n = min(len(best), len(ours))
    for i in range(n):
        if best[i] != ours[i]:
            print(f"  at char {i}:")
            print(f"  rust: ...{best[max(0,i-80):i+120]!r}...")
            print(f"  ours: ...{ours[max(0,i-80):i+120]!r}...")
            break
    else:
        print(f"  common prefix, lengths {len(best)} vs {len(ours)}")
        print(f"  rust tail: {best[n:n+200]!r}")
        print(f"  ours tail: {ours[n:n+200]!r}")
    sm = difflib.SequenceMatcher(None, best, ours, autojunk=False)
    print(f"  similarity: {sm.ratio():.4f}")


if __name__ == "__main__":
    main()
