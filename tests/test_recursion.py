"""Recursive-verifier tests: a real proof satisfies the verification
circuit; a tampered proof does not (recursion.rs:135-164 negative shape)."""
import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk import prover
from zklc_tpu.plonk.witness import generate_witness, WitnessConflict
from zklc_tpu.plonk.testing import check_constraints
from zklc_tpu.plonk.recursion import RecursiveVerifier, recursive_proof_circuit


@pytest.fixture(scope="module")
def inner():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    z = b.mul_add(x, y, x)
    for t in (x, y, z):
        b.register_public_input(t)
    data = b.build()
    proof = prover.prove(data, {x: 3, y: 4})
    prover.ensure_constants_sigmas_commitment(data)
    return data, proof


@pytest.fixture(scope="module")
def recursion_circuit(inner):
    data, _ = inner
    rb, pt = recursive_proof_circuit(data.common, data.verifier_only)
    return rb.build(), pt


def test_recursive_verifier_accepts(inner, recursion_circuit):
    _, proof = inner
    rdata, pt = recursion_circuit
    inputs = {}
    RecursiveVerifier.set_proof_targets(pt, proof, inputs)
    wr = generate_witness(rdata, inputs)
    check_constraints(rdata, wr)
    assert [int(wr.get(t)) for t in rdata.public_input_targets] == [3, 4, 15]


def test_recursive_verifier_rejects_tampered_pi(inner, recursion_circuit):
    _, proof = inner
    rdata, pt = recursion_circuit
    import copy
    bad = copy.copy(proof)
    bad.public_inputs = proof.public_inputs.copy()
    bad.public_inputs[2] = 16        # 3*4+3 != 16
    inputs = {}
    RecursiveVerifier.set_proof_targets(pt, bad, inputs)
    with pytest.raises((WitnessConflict, AssertionError)):
        wr = generate_witness(rdata, inputs)
        check_constraints(rdata, wr)


def test_recursive_verifier_rejects_tampered_opening(inner, recursion_circuit):
    _, proof = inner
    rdata, pt = recursion_circuit
    import copy
    bad = copy.deepcopy(proof)
    bad.openings.wires[0] = np.array(
        [(int(bad.openings.wires[0][0]) + 1) % 0xFFFFFFFF00000001,
         int(bad.openings.wires[0][1])], dtype=np.uint64)
    inputs = {}
    RecursiveVerifier.set_proof_targets(pt, bad, inputs)
    with pytest.raises((WitnessConflict, AssertionError)):
        wr = generate_witness(rdata, inputs)
        check_constraints(rdata, wr)
