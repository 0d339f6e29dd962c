"""Serialization interop with the gnark wrapper (VERDICT round-1 #3).

The unforgiving oracle is gnark-plonky2-verifier's JSON schema
(types/deserialize.go:11-42, variables/deserialize.go): caps / siblings /
circuit_digest are DECIMAL STRINGS, openings and public inputs are u64
numbers.  These tests byte-round-trip the reference's real testdata through
the repo-side parser + serializer — identity modulo whitespace proves both
directions implement the same schema (the round-1 key-names-only test let an
int-vs-string encoding bug through).
"""
import json
import os
from types import SimpleNamespace

import pytest

from zklc_tpu.plonk import serialization as S

pytestmark = pytest.mark.smoke


TESTDATA = "/root/reference/gnark-plonky2-verifier/testdata/test_circuit"


def _load(name):
    with open(os.path.join(TESTDATA, name)) as f:
        return json.load(f)


def test_proof_round_trips_reference_testdata():
    d = _load("proof_with_public_inputs.json")
    proof = S.proof_from_json(d)
    out = S.proof_to_json(proof, None)
    assert out == d


def test_verifier_only_round_trips_reference_testdata():
    d = _load("verifier_only_circuit_data.json")
    cap, digest = S.verifier_only_from_json(d)
    vdata = SimpleNamespace(constants_sigmas_cap=cap, circuit_digest=digest)
    assert S.verifier_only_to_json(vdata) == d


def test_caps_and_siblings_are_decimal_strings():
    """A repo-produced proof must emit string-typed hashes (the exact bug
    class: Go json rejects numbers where `[]string` is declared)."""
    import numpy as np
    from zklc_tpu.plonk.builder import CircuitBuilder
    from zklc_tpu.plonk.config import CircuitConfig
    from zklc_tpu.plonk import prover
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.arithmetic(1, 1, x, x, b.one())     # y = x^2 + 1
    b.register_public_input(y)
    data = b.build()
    proof = prover.prove(data, {x: np.uint64(7)})
    prover.ensure_constants_sigmas_commitment(data)
    pj = S.proof_to_json(proof, data.common)
    assert all(isinstance(h, str) for h in pj["proof"]["wires_cap"])
    qr = pj["proof"]["opening_proof"]["query_round_proofs"][0]
    leaf, mp = qr["initial_trees_proof"]["evals_proofs"][0]
    assert all(isinstance(s, str) for s in mp["siblings"])
    assert all(isinstance(v, int) for v in leaf)
    vj = S.verifier_only_to_json(data.verifier_only)
    assert isinstance(vj["circuit_digest"], str)
    assert all(isinstance(h, str) for h in vj["constants_sigmas_cap"])
    # and it parses back through the repo-side gnark-schema parser
    rt = S.proof_from_json(json.loads(json.dumps(pj)))
    assert S.proof_to_json(rt, None) == pj


def test_common_data_parses_reference_testdata():
    d = _load("common_circuit_data.json")
    c = S.common_data_from_json(d)
    assert c["num_public_inputs"] == 16
    assert c["gates"][0] == "NoopGate"
    assert c["degree_bits"] == d["fri_params"]["degree_bits"]
    assert len(c["k_is"]) == c["num_routed_wires"]
