"""Groth16 over BN254 + the L7 contract state machine.

Covers the reference's forge suite surface (contracts/foundry/verifier/
test/NearBlockVerification.t.sol, 292 LoC) through the behavioral twin in
wrap/contracts_model.py, with the REAL pairing-equation verifier
(wrap/groth16.verify == Verifier.sol's precompile-0x08 check) underneath.
"""
import random

import pytest

from zklc_tpu.wrap import bn254 as C
from zklc_tpu.wrap import groth16 as G
from zklc_tpu.wrap.contracts_model import (
    Groth16VerifierModel, NearBlockVerificationModel,
    NotOwner, ContractPaused, InvalidProof)


def _rng():
    r = random.Random(1234)
    return lambda: r.randrange(1, G.R)


@pytest.fixture(scope="module")
def pairing_sanity():
    e1 = C.pairing(C.g2_mul(C.G2_GEN, 5), C.g1_mul(C.G1_GEN, 7))
    e2 = C.pairing(C.G2_GEN, C.g1_mul(C.G1_GEN, 35))
    assert e1 == e2, "bilinearity"
    assert C.f12_pow(e1, C.R) == C.F12_ONE, "r-torsion"
    return True


@pytest.fixture(scope="module")
def toy():
    """x*y = out (pub), x+y = s (pub); 4-input variant padded to the
    deployed 4-PI interface."""
    r1cs = G.R1CS(num_vars=7, num_pub=4,
                  a=[{5: 1}, {5: 1, 6: 1}],
                  b=[{6: 1}, {0: 1}],
                  c=[{1: 1}, {2: 1}])
    z = [1, 77, 18, 0, 0, 7, 11]
    assert r1cs.satisfied(z)
    rfn = _rng()
    pk, vk = G.setup(r1cs, rng=rfn)
    proof8, pub = G.prove(pk, r1cs, z, rng=rfn)
    return r1cs, pk, vk, proof8, pub


def test_groth16_roundtrip(pairing_sanity, toy):
    _r1cs, _pk, vk, proof8, pub = toy
    assert G.verify(vk, proof8, pub)


def test_groth16_rejects_wrong_public_input(toy):
    _r1cs, _pk, vk, proof8, pub = toy
    assert not G.verify(vk, proof8, [pub[0] + 1] + pub[1:])


def test_groth16_rejects_corrupt_proof(toy):
    _r1cs, _pk, vk, proof8, pub = toy
    for i in (0, 2, 6):
        bad = list(proof8)
        bad[i] ^= 1
        assert not G.verify(vk, bad, pub)


def test_groth16_rejects_out_of_range(toy):
    _r1cs, _pk, vk, proof8, pub = toy
    bad = list(proof8)
    bad[0] += C.P
    assert not G.verify(vk, bad, pub)
    assert not G.verify(vk, proof8, [pub[0] + G.R] + pub[1:])


# -- NearBlockVerification.t.sol surface --------------------------------------

@pytest.fixture(scope="module")
def contract(toy):
    _r1cs, _pk, vk, proof8, pub = toy
    c = NearBlockVerificationModel(Groth16VerifierModel(vk))
    return c, proof8, pub


def test_verify_and_save_proof(contract):
    c, proof8, pub = contract
    c.verify_and_save_proof(pub, proof8)
    assert c.is_proofed([pub[0], pub[1]])
    block_hash = pub[0].to_bytes(16, "big") + pub[1].to_bytes(16, "big")
    assert c.is_proofed_hash(block_hash)
    assert not c.is_proofed_hash(bytes(32))
    assert c.events[-1][0] == "ProofVerifiedAndSaved"


def test_invalid_proof_reverts(contract):
    c, proof8, pub = contract
    bad = list(proof8)
    bad[6] ^= 2
    with pytest.raises(InvalidProof):
        c.verify_and_save_proof(pub, bad)


def test_pause_and_owner_guards(contract):
    c, proof8, pub = contract
    with pytest.raises(NotOwner):
        c.set_paused(True, sender="mallory")
    c.set_paused(True, sender="deployer")
    with pytest.raises(ContractPaused):
        c.verify_and_save_proof(pub, proof8)
    c.set_paused(False, sender="deployer")


def test_epoch_checkpoint_storage(contract):
    c, _proof8, _pub = contract
    with pytest.raises(NotOwner):
        c.save_epoch_hashes_and_set_checkpoint(7, (b"a" * 32, b"b" * 32),
                                               sender="mallory")
    c.save_epoch_hashes_and_set_checkpoint(7, (b"a" * 32, b"b" * 32),
                                           sender="deployer")
    c.save_epoch_hashes_and_set_checkpoint(5, (b"c" * 32, b"d" * 32),
                                           sender="deployer")
    assert c.latest_checkpoint == 7
    assert c.epoch_hashes[5] == (b"c" * 32, b"d" * 32)


@pytest.mark.heavy
def test_pi_packing_statement_groth16():
    """The deployed-interface statement (16 u32 words -> 4 BN254 PIs,
    web-api.go:50-66) proven and verified under Groth16 for real."""
    rfn = _rng()
    r1cs, assign = G.pi_packing_r1cs()
    words = [(i * 0x9E3779B9) & 0xFFFFFFFF for i in range(16)]
    z = assign(words)
    assert r1cs.satisfied(z)
    pk, vk = G.setup(r1cs, rng=rfn)
    proof8, pub = G.prove(pk, r1cs, z, rng=rfn)
    from zklc_tpu.wrap.api import pack_public_inputs
    assert pub == pack_public_inputs(words)
    assert G.verify(vk, proof8, pub)
    assert not G.verify(vk, proof8, [pub[0] ^ 1] + pub[1:])
