"""End-to-end prove/verify tests for the plonk layer."""
import numpy as np
import pytest

from zklc_tpu.field import gl64
from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk import prover, verifier
from zklc_tpu.plonk.verifier import VerificationError

pytestmark = pytest.mark.smoke



def build_mul_add_circuit():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    z = b.mul_add(x, y, x)          # z = x*y + x
    b.register_public_input(x)
    b.register_public_input(y)
    b.register_public_input(z)
    data = b.build()
    return data, (x, y)


class TestProveVerify:
    def setup_method(self):
        self.data, (self.x, self.y) = build_mul_add_circuit()

    def test_prove_and_verify(self):
        proof = prover.prove(self.data, {self.x: 3, self.y: 4})
        assert list(proof.public_inputs) == [3, 4, 15]
        assert verifier.verify(proof, self.data.verifier_only, self.data.common)

    def test_tampered_public_input_fails(self):
        proof = prover.prove(self.data, {self.x: 3, self.y: 4})
        proof.public_inputs = proof.public_inputs.copy()
        proof.public_inputs[2] = 16
        with pytest.raises(VerificationError):
            verifier.verify(proof, self.data.verifier_only, self.data.common)

    def test_tampered_opening_fails(self):
        proof = prover.prove(self.data, {self.x: 3, self.y: 4})
        proof.openings.wires = proof.openings.wires.copy()
        proof.openings.wires[0, 0] = np.uint64(
            (int(proof.openings.wires[0, 0]) + 1) % gl64.P)
        with pytest.raises(VerificationError):
            verifier.verify(proof, self.data.verifier_only, self.data.common)


def test_constraints_satisfied_on_witness():
    """Debug-level check: every gate constraint vanishes on every row."""
    from zklc_tpu.plonk.witness import generate_witness
    from zklc_tpu.plonk.algebra import HostBase, EvalVars
    from zklc_tpu.plonk import gates as G

    data, (x, y) = build_mul_add_circuit()
    wr = generate_witness(data, {x: 5, y: 7})
    wires = wr.wires
    common = data.common
    alg = HostBase()
    n = common.degree
    num_sel = common.num_selectors
    consts = data.constants_rows
    pi = np.array([wr.get(t) for t in data.public_input_targets],
                  dtype=np.uint64)
    from zklc_tpu.hash import poseidon as pos
    pi_hash = pos.hash_no_pad(pi)
    vars_ = EvalVars(
        local_constants=[consts[:, num_sel + i]
                         for i in range(common.num_constants - num_sel)],
        local_wires=[wires[:, i] for i in range(common.config.num_wires)],
        public_inputs_hash=[np.uint64(h) for h in pi_hash],
    )
    many = num_sel > 1
    for gi, gate in enumerate(common.gate_types):
        si = common.selector_indices[gi]
        start, end = common.selector_groups[si]
        s = consts[:, si]
        filt = np.ones(n, dtype=np.uint64)
        for k in range(start, end):
            if k == gi:
                continue
            filt = gl64.mul(filt, gl64.sub(np.uint64(k), s))
        if many:
            filt = gl64.mul(filt, gl64.sub(np.uint64(G.UNUSED_SELECTOR), s))
        for ci, c in enumerate(gate.eval_unfiltered(alg, vars_)):
            vals = gl64.mul(np.asarray(c, dtype=np.uint64) % np.uint64(gl64.P)
                            if False else np.asarray(c, dtype=np.uint64), filt)
            assert not vals.any(), f"{gate.id()} constraint {ci} nonzero"
