"""BN128-transcript wrap proofs verified by the in-repo gnark oracle.

The wrap stage of bin/prove_block.rs:279-300: re-prove the final proof
under PoseidonBN128GoldilocksConfig (crypto/plonky2_bn128/src/config.rs:21)
and check the artifacts with wrap/gnark_oracle.py — the CPU replay of the
gnark circuit that consumes them (itself pinned against the reference's
testdata in test_gnark_oracle.py).
"""
import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk import prover, serialization as S
from zklc_tpu.wrap.wrap import wrap_proof, wrap_and_verify, \
    assert_gnark_gate_set
from zklc_tpu.wrap.gnark_oracle import GnarkOracle, OracleError
from zklc_tpu.wrap import api

pytestmark = pytest.mark.heavy



@pytest.fixture(scope="module")
def inner():
    """A 16-u32-word-PI inner circuit (the deployed wrap interface shape:
    web-api.go:50-66 packs exactly 16 GL words into 4 BN254 inputs)."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    ts = b.add_virtual_targets(16)
    for t in ts:
        b.split_le(t, 32)
    b.register_public_inputs(ts)
    data = b.build()
    vals = [np.uint64((i * 0x9E3779B9) & 0xFFFFFFFF) for i in range(16)]
    proof = prover.prove(data, dict(zip(ts, vals)))
    return data, proof


@pytest.fixture(scope="module")
def wrapped(inner):
    data, proof = inner
    return wrap_and_verify(data, proof)


def test_wrap_proof_accepted_by_gnark_oracle(wrapped, inner):
    wdata, wproof = wrapped
    # PIs re-registered verbatim (prove_block.rs:293-299)
    assert [int(x) for x in wproof.public_inputs] == \
        [int(x) for x in inner[1].public_inputs]
    # restricted to the gnark-evaluable gate set
    assert_gnark_gate_set(wdata.common)


def test_wrap_pi_packing_e2e(wrapped):
    """16 GL words -> 4 BN254 public inputs, byte-for-byte the packing the
    web-api performs before proving CircuitFixed."""
    _, wproof = wrapped
    packed = api.pack_public_inputs(wproof.public_inputs)
    assert len(packed) == 4
    for j in range(4):
        limbs = bytearray(16)
        for i in range(4):
            limbs[i * 4: i * 4 + 4] = \
                int(wproof.public_inputs[j * 4 + i]).to_bytes(4, "big")
        assert packed[j] == int.from_bytes(bytes(limbs), "big")


def test_wrap_tamper_rejected(wrapped):
    wdata, wproof = wrapped
    pj = S.proof_to_json(wproof, wdata.common)
    vj = S.verifier_only_to_json(wdata.verifier_only)
    cj = S.common_data_to_json(wdata.common)
    oracle = GnarkOracle(cj)
    assert oracle.verify(pj, vj)
    # tamper a public input -> transcript diverges -> reject
    bad = {**pj, "public_inputs": list(pj["public_inputs"])}
    bad["public_inputs"][0] = (bad["public_inputs"][0] + 1) % (2**32)
    with pytest.raises((OracleError, AssertionError)):
        oracle.verify(bad, vj)
    # tamper a wires-cap Fr digest -> reject
    bad2 = {**pj, "proof": {**pj["proof"],
                            "wires_cap": list(pj["proof"]["wires_cap"])}}
    bad2["proof"]["wires_cap"][0] = str(int(bad2["proof"]["wires_cap"][0]) ^ 1)
    with pytest.raises((OracleError, AssertionError)):
        oracle.verify(bad2, vj)


def test_gnark_gate_set_guard():
    from zklc_tpu.gadgets.u32 import U32Ops
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    ops = U32Ops(b)
    x = ops.add_virtual_u32()
    y = ops.add_virtual_u32()
    ops.add_u32(x, y)
    b.register_public_input(x)
    data = b.build()
    with pytest.raises(ValueError, match="no gnark evaluator"):
        assert_gnark_gate_set(data.common)
