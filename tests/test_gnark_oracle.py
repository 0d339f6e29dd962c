"""The gnark CPU-replay oracle must accept the reference's own testdata
proof (gnark-plonky2-verifier/testdata/test_circuit) — this pins the BN128
transcript, all 13 core gate evaluators, selector filters, vanishing
combination and FRI semantics bit-exactly to the Go implementation — and
must reject tampered variants."""
import copy
import json
import os

import pytest

from zklc_tpu.wrap.gnark_oracle import GnarkOracle, OracleError

TESTDATA = "/root/reference/gnark-plonky2-verifier/testdata/test_circuit"


def _load():
    def rd(name):
        with open(os.path.join(TESTDATA, name)) as f:
            return json.load(f)
    return (rd("proof_with_public_inputs.json"),
            rd("verifier_only_circuit_data.json"),
            rd("common_circuit_data.json"))


def test_oracle_accepts_reference_proof():
    pj, vj, cj = _load()
    assert GnarkOracle(cj).verify(pj, vj)


def test_oracle_rejects_tampered_public_input():
    pj, vj, cj = _load()
    pj = copy.deepcopy(pj)
    pj["public_inputs"][0] ^= 1
    with pytest.raises(OracleError):
        GnarkOracle(cj).verify(pj, vj)


def test_oracle_rejects_tampered_opening():
    pj, vj, cj = _load()
    pj = copy.deepcopy(pj)
    pj["proof"]["openings"]["wires"][0][0] ^= 1
    with pytest.raises(OracleError):
        GnarkOracle(cj).verify(pj, vj)


def test_oracle_rejects_tampered_cap():
    pj, vj, cj = _load()
    pj = copy.deepcopy(pj)
    cap = int(pj["proof"]["wires_cap"][0]) ^ 1
    pj["proof"]["wires_cap"][0] = str(cap)
    with pytest.raises(OracleError):
        GnarkOracle(cj).verify(pj, vj)


def test_oracle_rejects_tampered_merkle_sibling():
    pj, vj, cj = _load()
    pj = copy.deepcopy(pj)
    qr = pj["proof"]["opening_proof"]["query_round_proofs"][0]
    sibs = qr["initial_trees_proof"]["evals_proofs"][0][1]["siblings"]
    sibs[0] = str(int(sibs[0]) ^ 1)
    with pytest.raises(OracleError):
        GnarkOracle(cj).verify(pj, vj)
