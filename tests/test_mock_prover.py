"""MockProver tests for the arithmetic and Collatz circuits — mirrors the
reference's primary test style (SURVEY.md section 4)."""

import pytest

from halo2_tpu.circuits import arithmetic, collatz
from halo2_tpu.frontend import MockProver


def test_arithmetic_mock_satisfied():
    x, y, constant = 3, 4, 7
    z = x * x * y * y + constant
    circuit = arithmetic.create_circuit(x, y, constant)
    prover = MockProver.run(4, circuit, instances=[[constant, z]])
    prover.assert_satisfied()


def test_arithmetic_mock_bad_instance_fails():
    x, y, constant = 3, 4, 7
    z_bad = x * x * y * y + constant + 1
    circuit = arithmetic.create_circuit(x, y, constant)
    failures = MockProver.run(4, circuit, instances=[[constant, z_bad]]).verify()
    assert any(f.kind == "copy" for f in failures)


def test_arithmetic_mock_bad_witness_fails():
    circuit = arithmetic.ArithmeticCircuit(x=3, y=4, constant=7)
    circuit.x = 3
    # tamper: claim z for different x
    bad = arithmetic.create_circuit(5, 4, 7)
    z = 3 * 3 * 4 * 4 + 7
    failures = MockProver.run(4, bad, instances=[[7, z]]).verify()
    assert failures


def test_collatz_mock_satisfied():
    seq = collatz.collatz_conjecture(9)
    assert len(seq) == 32 and seq[-1] == 1
    circuit = collatz.create_circuit(seq)
    MockProver.run(10, circuit, instances=[]).assert_satisfied()


def test_collatz_mock_bad_step_fails():
    seq = collatz.collatz_conjecture(9)
    seq[3] += 1  # break a step
    circuit = collatz.create_circuit(seq)
    failures = MockProver.run(10, circuit, instances=[]).verify()
    assert any(f.kind == "gate" for f in failures)


def test_collatz_mock_not_reaching_one_fails():
    seq = [7] * 32  # constant sequence, final != 1
    circuit = collatz.create_circuit(seq)
    failures = MockProver.run(10, circuit, instances=[]).verify()
    assert failures


def test_collatz_needs_k10_layout():
    # the sparse SimpleFloorPlanner layout must exceed k=9 (reference quirk)
    seq = collatz.collatz_conjecture(9)
    circuit = collatz.create_circuit(seq)
    with pytest.raises(ValueError):
        MockProver.run(9, circuit, instances=[])
    p = MockProver.run(10, circuit, instances=[])
    assert p.asg.max_row_touched > 511


def test_poseidon_mock_satisfied():
    from halo2_tpu.circuits import poseidon_circuit as pc

    msg = [1, 2]
    out = pc.poseidon_solution(msg)
    circuit = pc.create_circuit(msg)
    MockProver.run(7, circuit, instances=[[out]]).assert_satisfied()


def test_poseidon_mock_wrong_output_fails():
    from halo2_tpu.circuits import poseidon_circuit as pc

    msg = [1, 2]
    out = pc.poseidon_solution(msg) + 1
    circuit = pc.create_circuit(msg)
    failures = MockProver.run(7, circuit, instances=[[out]]).verify()
    assert failures


def test_poseidon_mock_width12_satisfied():
    # reference main.rs:25-34 instantiates WIDTH=12 RATE=11 L=11 at k=6
    from halo2_tpu.circuits import poseidon_circuit as pc
    from halo2_tpu.hashes.poseidon import PoseidonSpec, hash_constant_length

    msg = [i + 1 for i in range(11)]
    spec = PoseidonSpec.make(12, 11)
    out = hash_constant_length(spec, msg)
    circuit = pc.make_circuit_class(12, 11, 11)(msg)
    MockProver.run(6, circuit, instances=[[out]]).assert_satisfied()
