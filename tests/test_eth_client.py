"""Ethereum submission edge: ABI calldata round trip against the
behavioral-twin contract (eth-helper.ts:384-470 surface), plus export_vk."""
import random

import numpy as np
import pytest

from zklc_tpu.service.eth_client import (EthHelper, ModelTransport,
                                         calldata_verify_and_save,
                                         selector, SIG_VERIFY_AND_SAVE)
from zklc_tpu.utils.keccak import keccak256
from zklc_tpu.wrap import groth16
from zklc_tpu.wrap.contracts_model import (Groth16VerifierModel,
                                           NearBlockVerificationModel,
                                           InvalidProof, NotOwner)

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def proof_setup():
    rng = random.Random(5)
    r1cs, assign = groth16.pi_packing_r1cs()
    words = [rng.randrange(1 << 32) for _ in range(16)]
    z = assign(words)
    pk, vk = groth16.setup(r1cs, rng=lambda: rng.randrange(1, groth16.R))
    proof8, pubs = groth16.prove(pk, r1cs, z,
                                 rng=lambda: rng.randrange(groth16.R))
    return vk, proof8, pubs


def test_selector_matches_keccak():
    assert selector(SIG_VERIFY_AND_SAVE) == \
        keccak256(b"verifyAndSaveProof(uint256[4],uint256[8])")[:4]


def test_execute_proof_saving_roundtrip(proof_setup):
    vk, proof8, pubs = proof_setup
    model = NearBlockVerificationModel(Groth16VerifierModel(vk))
    helper = EthHelper(ModelTransport(model, sender="deployer"))
    receipt = helper.execute_proof_saving(pubs, proof8)
    assert receipt["status"] == 1
    # isProofedHash over the calldata-encoded path
    block_hash = pubs[0].to_bytes(16, "big") + pubs[1].to_bytes(16, "big")
    assert helper.is_proofed_hash(block_hash)
    assert not helper.is_proofed_hash(b"\x00" * 32)


def test_execute_proof_saving_rejects_bad_proof(proof_setup):
    vk, proof8, pubs = proof_setup
    model = NearBlockVerificationModel(Groth16VerifierModel(vk))
    helper = EthHelper(ModelTransport(model))
    bad = list(proof8)
    bad[0] = (bad[0] + 1) % groth16.C.P
    with pytest.raises(InvalidProof):
        helper.execute_proof_saving(pubs, bad)


def test_checkpoint_round_trip(proof_setup):
    vk, _, _ = proof_setup
    model = NearBlockVerificationModel(Groth16VerifierModel(vk))
    helper = EthHelper(ModelTransport(model, sender="deployer"))
    assert helper.get_latest_checkpoint() == 0
    prev, cur = bytes(range(32)), bytes(range(32, 64))
    from zklc_tpu.near.types import b58encode
    helper.save_epoch_hashes_and_set_checkpoint(
        b58encode(prev), b58encode(cur), 43200)
    assert helper.get_latest_checkpoint() == 43200
    p58, c58 = helper.get_epoch_hashes_by_height(43200)
    assert (p58, c58) == (b58encode(prev), b58encode(cur))
    # only-owner enforced through the calldata path
    intruder = EthHelper(ModelTransport(model, sender="mallory"))
    with pytest.raises(NotOwner):
        intruder.save_epoch_hashes_and_set_checkpoint(
            b58encode(prev), b58encode(cur), 43201)


def test_export_vk(proof_setup, tmp_path):
    from zklc_tpu.bins.export_vk import export_vk, vk_from_dict
    vk, proof8, pubs = proof_setup
    d = export_vk(vk, str(tmp_path))
    vk2 = vk_from_dict(d)
    assert groth16.verify(vk2, proof8, pubs)
    sol = (tmp_path / "verifier_constants.sol").read_text()
    assert f"uint256 constant ALPHA_X = {vk.alpha1[0]};" in sol
    assert f"uint256 constant IC{len(vk.ic)-1}_X" in sol
