"""Command-line interface: `python -m halo2_tpu.cli <command>`.

Covers both reference entry surfaces:
  * the WASM API (setup / simulate / prove / verify / count —
    reference circuits/src/wasm.rs:48-184) with the same JSON input formats
    ({"x":..,"y":..,"constant":..,"z":..}, {"x":[...]},
     {"x":[...],"output":"0x.."}) and circuit indices 0/1/2;
  * the native binary (layout SVGs for all three circuits —
    reference circuits/src/main.rs:14-34) via `draw`.

Params and proofs are files (the web UI kept them in localStorage as
comma-joined bytes, Circuits.tsx:89-116; files are the CLI analog).
"""

from __future__ import annotations

import argparse
import sys
import time


def _read(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _write(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def cmd_setup(args) -> int:
    from . import api

    t0 = time.time()
    params = api.setup(args.k)
    _write(args.out, params)
    print(f"wrote {len(params)} bytes of params (k={args.k}) "
          f"to {args.out} in {time.time()-t0:.1f}s")
    return 0


def cmd_simulate(args) -> int:
    from . import api

    print(api.simulate_circuit(args.input, args.circuit))
    return 0


def cmd_prove(args) -> int:
    from . import api

    t0 = time.time()
    seed = args.seed.encode() if args.seed else None
    proof = api.generate_proof(_read(args.params), args.input, args.circuit,
                               rng_seed=seed)
    _write(args.out, proof)
    print(f"wrote {len(proof)}-byte proof to {args.out} "
          f"in {time.time()-t0:.1f}s")
    return 0


def cmd_verify(args) -> int:
    from . import api

    ok = api.verify_proof(_read(args.params), _read(args.proof), args.input,
                          args.circuit)
    print("Valid Proof" if ok else "Invalid Proof")
    return 0 if ok else 1


def cmd_count(_args) -> int:
    from . import api

    print(api.get_circuit_count())
    return 0


def cmd_draw(args) -> int:
    """Render the three layout SVGs (reference main.rs: arithmetic k=4,
    collatz k=10, poseidon k=6)."""
    import os

    from .circuits import arithmetic, collatz, poseidon_circuit
    from .viz import render_layout

    os.makedirs(args.out_dir, exist_ok=True)
    jobs = [
        ("arithmetic_circuit.svg", 4, arithmetic.empty_circuit(7)),
        ("collatz.svg", 10, collatz.create_circuit(collatz.collatz_conjecture(4))),
        # reference main.rs:25-34 draws WIDTH=12 RATE=11 L=11 at k=6 on a
        # random message; fixed message here for deterministic output
        (
            "poseidon.svg",
            6,
            poseidon_circuit.make_circuit_class(12, 11, 11)(
                [i + 1 for i in range(11)]
            ),
        ),
    ]
    for name, k, circuit in jobs:
        path = f"{args.out_dir}/{name}"
        render_layout(k, circuit, path)
        print(f"wrote {path}")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="halo2_tpu",
                                description="TPU-native halo2 prover")
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("setup", help="generate SRS params (wasm.rs setup)")
    s.add_argument("-k", type=int, default=10)
    s.add_argument("-o", "--out", default="params.bin")
    s.set_defaults(fn=cmd_setup)

    s = sub.add_parser("simulate", help="witness-only evaluation")
    s.add_argument("circuit", type=int, choices=(0, 1, 2))
    s.add_argument("input", help="JSON input string")
    s.set_defaults(fn=cmd_simulate)

    s = sub.add_parser("prove", help="generate a proof")
    s.add_argument("circuit", type=int, choices=(0, 1, 2))
    s.add_argument("input", help="JSON input string")
    s.add_argument("-p", "--params", default="params.bin")
    s.add_argument("-o", "--out", default="proof.bin")
    s.add_argument("--seed", default=None,
                   help="deterministic blinding seed (default: random)")
    s.set_defaults(fn=cmd_prove)

    s = sub.add_parser("verify", help="verify a proof (prints Valid/Invalid)")
    s.add_argument("circuit", type=int, choices=(0, 1, 2))
    s.add_argument("input", help="JSON input string")
    s.add_argument("-p", "--params", default="params.bin")
    s.add_argument("-f", "--proof", default="proof.bin")
    s.set_defaults(fn=cmd_verify)

    s = sub.add_parser("count", help="number of circuits")
    s.set_defaults(fn=cmd_count)

    s = sub.add_parser("draw", help="render circuit layout SVGs (main.rs)")
    s.add_argument("-d", "--out-dir", default="img")
    s.set_defaults(fn=cmd_draw)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
