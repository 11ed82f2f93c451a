"""Layout renderer tests (the reference's draw_graph/CircuitLayout analog,
utils.rs:25-40 + main.rs:14-34)."""

from halo2_tpu.circuits import arithmetic, collatz, poseidon_circuit
from halo2_tpu.viz import render_layout


def test_render_all_three(tmp_path):
    jobs = [
        ("arithmetic_circuit.svg", 4, arithmetic.empty_circuit(7)),
        ("collatz.svg", 10, collatz.create_circuit(collatz.collatz_conjecture(4))),
        ("poseidon.svg", 6, poseidon_circuit.create_circuit([1, 2])),
    ]
    for name, k, circuit in jobs:
        path = tmp_path / name
        svg = render_layout(k, circuit, str(path))
        assert path.exists()
        assert svg.startswith("<svg") and svg.endswith("</svg>")
        assert "<rect" in svg


def test_regions_recorded():
    from halo2_tpu.frontend import ConstraintSystem
    from halo2_tpu.frontend.layouter import synthesize

    circuit = arithmetic.create_circuit(3, 4, 7)
    cs = ConstraintSystem()
    config = type(circuit).configure(cs)
    asg = synthesize(circuit, cs, config, 4)
    assert asg.regions, "layouter must record region metadata for the viz"
    name, start, row_count, cols = asg.regions[0]
    assert row_count >= 1 and cols
