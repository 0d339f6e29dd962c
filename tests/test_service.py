"""Service-layer tests: task contracts, work queue semantics, status store,
and proof-JSON schema shape vs the gnark testdata."""
import json
import os

import pytest

from zklc_tpu.service.tasks import InputTask, OutputTask
from zklc_tpu.service.queue import run_queue, TaskFailed
from zklc_tpu.service.orchestrator import StatusStore, ProofStatus

pytestmark = pytest.mark.smoke



def test_task_json_round_trip():
    t = InputTask(message=b"m", approval=b"a" * 65, validator=b"v" * 80,
                  signature_index=7)
    assert InputTask.from_json(t.to_json()) == t
    o = OutputTask(proof=b"p" * 100, verifier_data=b"d", signature_index=7)
    assert OutputTask.from_json(o.to_json()) == o


def test_queue_folds_all_results():
    out = run_queue(list(range(20)), lambda x: x * x, num_workers=4,
                    fold=lambda acc, r: acc + r, fold_init=0)
    assert out == sum(x * x for x in range(20))


def test_queue_retries_then_fails():
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        raise RuntimeError("boom")

    with pytest.raises(TaskFailed):
        run_queue([1], flaky, num_workers=1, max_retries=2)
    assert calls["n"] == 3          # initial + 2 retries


def test_queue_recovers_transient_failure():
    calls = {"n": 0}

    def flaky(x):
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("transient")
        return x + 1

    assert run_queue([41], flaky, num_workers=1, max_retries=2) == [42]


def test_status_store(tmp_path):
    store = StatusStore(str(tmp_path / "status.json"))
    store.set("h1", status=ProofStatus.IN_PROCESSING, height=5)
    store.set("h1", status=ProofStatus.DONE)
    row = store.get("h1")
    assert row["status"] == ProofStatus.DONE and row["height"] == 5
    assert store.get("nope") is None


def test_proof_json_schema_matches_testdata():
    """Serialize one of our proofs; its key structure must match the gnark
    testdata schema (the interop oracle)."""
    ref_path = ("/root/reference/gnark-plonky2-verifier/testdata/"
                "test_circuit/proof_with_public_inputs.json")
    if not os.path.exists(ref_path):
        pytest.skip("reference testdata not mounted")
    from zklc_tpu.plonk.builder import CircuitBuilder
    from zklc_tpu.plonk import prover
    from zklc_tpu.plonk.serialization import (proof_to_json,
                                              verifier_only_to_json,
                                              common_data_to_json)
    b = CircuitBuilder()
    x = b.add_virtual_target()
    y = b.mul_add(x, x, x)
    b.register_public_input(y)
    data = b.build()
    proof = prover.prove(data, {x: 3})
    prover.ensure_constants_sigmas_commitment(data)
    ours = proof_to_json(proof, data.common)
    ref = json.load(open(ref_path))

    def keys(d):
        if not isinstance(d, dict):
            return None
        return {k: keys(v) for k, v in d.items()}

    assert set(ours["proof"].keys()) == set(ref["proof"].keys())
    assert set(ours["proof"]["openings"].keys()) == \
        set(ref["proof"]["openings"].keys())
    assert set(ours["proof"]["opening_proof"].keys()) == \
        set(ref["proof"]["opening_proof"].keys())
    q_ref = ref["proof"]["opening_proof"]["query_round_proofs"][0]
    q_our = ours["proof"]["opening_proof"]["query_round_proofs"][0]
    assert set(q_our.keys()) == set(q_ref.keys())
    if q_our["steps"]:          # tiny circuits have no FRI fold rounds
        assert set(q_our["steps"][0].keys()) == set(q_ref["steps"][0].keys())
    vd = verifier_only_to_json(data.verifier_only)
    assert set(vd.keys()) == {"constants_sigmas_cap", "circuit_digest"}
    ref_common = json.load(open(ref_path.replace(
        "proof_with_public_inputs", "common_circuit_data")))
    ours_common = common_data_to_json(data.common)
    assert set(ours_common.keys()) == set(ref_common.keys())
