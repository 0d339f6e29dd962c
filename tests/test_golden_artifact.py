"""Golden-artifact regression: the round-4 REAL 5-block BFT proof of
mainnet block E1FbdJ7M4FwqhUT8u8uasuobvnZZ6ymm6vgHvA29SbRW — proved end to
end on the real TPU chip — is checked into `proofs/random/` the way the
reference treats `near_bft_finality/proofs/` as goldens (SURVEY.md §2.4).

These tests re-verify the checked-in artifacts from cold JSON on every
run: the BN128-transcript wrap proof must be accepted by the gnark replay
oracle (the interop pin for gnark-plonky2-verifier/verifier/verifier.go),
the artifact layout must match bin/prove_block.rs:302-458, and the public
inputs must bind the block hash.  A regression in the transcript, gate
evaluators, FRI semantics, or serialization shows up here as a golden
reject."""
import json
import os

import pytest

from zklc_tpu.wrap.gnark_oracle import GnarkOracle, OracleError

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "proofs", "random",
    "E1FbdJ7M4FwqhUT8u8uasuobvnZZ6ymm6vgHvA29SbRW")
BLOCK_HASH_B58 = "E1FbdJ7M4FwqhUT8u8uasuobvnZZ6ymm6vgHvA29SbRW"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(GOLDEN), reason="golden artifact not present")


def _rd(*parts):
    with open(os.path.join(GOLDEN, *parts)) as f:
        return json.load(f)


def test_golden_wrap_proof_verifies():
    """The final BN128-transcript wrap proof of the real block is accepted
    by the full gnark replay verifier (challenges, gate constraints,
    vanishing combination, FRI, PoW)."""
    proof = _rd("proof.json")
    vdata = _rd("verifier_data.json")
    common = _rd("common_data.json")
    assert GnarkOracle(common).verify(proof, vdata)


def test_golden_wrap_rejects_tampered_public_input():
    proof = _rd("proof.json")
    vdata = _rd("verifier_data.json")
    common = _rd("common_data.json")
    proof["public_inputs"][5] = (proof["public_inputs"][5] + 1) % 256
    with pytest.raises(OracleError):
        GnarkOracle(common).verify(proof, vdata)


def test_golden_public_inputs_bind_block_hash():
    """PI layout: the target block hash bytes ride the public inputs of
    both the inner aggregation proof and the outer wrap — and hash.json
    names the same block (prove_block.rs:302-458 artifact contract)."""
    from zklc_tpu.near.types import b58decode
    assert _rd("hash.json") == BLOCK_HASH_B58
    hb = b58decode(BLOCK_HASH_B58)
    outer = _rd("proof.json")["public_inputs"]
    inner = _rd("inner", "proof.json")["public_inputs"]
    assert outer == inner, "wrap must carry the aggregation PIs verbatim"
    assert bytes(outer[1:33]) == hb


def test_golden_inner_artifacts_roundtrip():
    """The inner (pre-wrap) aggregation artifacts deserialize through the
    gnark-JSON layer and describe the expected circuit family."""
    from zklc_tpu.plonk import serialization as S
    common = S.common_data_from_json(_rd("inner", "common_data.json"))
    proof = S.proof_from_json(_rd("inner", "proof.json"))
    caps, digest = S.verifier_only_from_json(_rd("inner",
                                                 "verifier_data.json"))
    assert common["num_public_inputs"] == 97
    assert len(caps) == 1 << common["cap_height"]
    assert proof is not None and digest > 0


def test_golden_wrap_checkpoint_matches_artifact():
    """The durable wrap checkpoint written by the pipeline run must be the
    same proof object the artifact set ships."""
    ck = os.path.join(os.path.dirname(__file__), "..", "proofs",
                      "checkpoints", "random",
                      f"wrap_{BLOCK_HASH_B58}.json")
    if not os.path.exists(ck):
        pytest.skip("wrap checkpoint not present")
    with open(ck) as f:
        doc = json.load(f)
    outer = _rd("proof.json")
    assert doc["public_inputs"] == outer["public_inputs"]
    assert doc["proof"] == outer["proof"]
