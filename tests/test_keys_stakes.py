"""Keys & stakes circuit + bp_hash binding (VERDICT round-1 soundness fix).

Covers near_bft_finality/src/prove_block_data/keys_stakes.rs:18 +
header_bphash.rs:125 semantics: the circuit now computes
sha256(u32-LE count || concat(borsh(validators))) IN-CIRCUIT and exposes the
digest as public inputs; an aggregation connects it to the epoch header's
next_bp_hash PIs, so a fabricated validator set (e.g. one inflated stake)
cannot satisfy the statement.
"""
import hashlib

import numpy as np
import pytest

from zklc_tpu.plonk import prover, verifier
from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk.recursion import RecursiveVerifier
from zklc_tpu.plonk.witness import generate_witness, WitnessConflict
from zklc_tpu.plonk.testing import check_constraints
from zklc_tpu.near import bft
from zklc_tpu.near.keys_stakes import build_keys_stakes_circuit
from zklc_tpu.near.utils import Validator


def _mk_validators(stakes):
    return [Validator(account_id=f"val{i}.near",
                      public_key=b"\x00" + bytes([i + 1] * 32),
                      stake=s)
            for i, s in enumerate(stakes)]


def _bp_hash(borsh_rows):
    data = len(borsh_rows).to_bytes(4, "little") + b"".join(borsh_rows)
    return hashlib.sha256(data).digest()


def _prove_ks(validators, valid_indices):
    borsh = [v.serialize() for v in validators]
    data, (vk_t, val_t, bp_t) = build_keys_stakes_circuit(
        tuple(len(x) for x in borsh), valid_indices)
    valid_keys = b"".join(bytes([i]) + validators[i].public_key[1:]
                          for i in valid_indices)
    inputs = {}
    for t, v in zip(vk_t, valid_keys):
        inputs[t] = np.uint64(v)
    for row_t, row_v in zip(val_t, borsh):
        for t, v in zip(row_t, row_v):
            inputs[t] = np.uint64(v)
    proof = prover.prove(data, inputs)
    return data, proof, borsh


@pytest.mark.heavy
def test_keys_stakes_digest_public_inputs():
    vals = _mk_validators([700, 100, 300])
    data, proof, borsh = _prove_ks(vals, (0, 2))
    assert verifier.verify(proof, data.verifier_only, data.common)
    digest = bytes(int(x) for x in proof.public_inputs[-32:])
    assert digest == _bp_hash(borsh)


class _StubEpochHeader:
    """Minimal object satisfying header_hash.expected_public_inputs(epoch)."""

    def __init__(self, next_bp_hash):
        self.hash = b"\x11" * 32
        self.next_bp_hash = next_bp_hash
        self.next_epoch_id = b"\x22" * 32


def _bind_agg(ks_data, ks_proof, ep_data, ep_proof, n_vk_pis, n_val_pis):
    """Tiny aggregation: verify both proofs, connect digest <-> next_bp_hash
    (the same wiring bft.prove_block_bft applies, bft.py bind_bp_hash)."""
    prover.ensure_constants_sigmas_commitment(ks_data)
    prover.ensure_constants_sigmas_commitment(ep_data)
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    rv1 = RecursiveVerifier(b, ks_data.common, ks_data.verifier_only)
    ks_pt = rv1.add_virtual_proof()
    rv1.verify_proof(ks_pt)
    rv2 = RecursiveVerifier(b, ep_data.common, ep_data.verifier_only)
    ep_pt = rv2.add_virtual_proof()
    rv2.verify_proof(ep_pt)
    bp_off = n_vk_pis + n_val_pis
    for k in range(32):
        b.connect(ks_pt.public_inputs[bp_off + k],
                  ep_pt.public_inputs[32 + k])
    agg = b.build()
    inputs = {}
    RecursiveVerifier.set_proof_targets(ks_pt, ks_proof, inputs)
    RecursiveVerifier.set_proof_targets(ep_pt, ep_proof, inputs)
    wr = generate_witness(agg, inputs)
    check_constraints(agg, wr)


@pytest.mark.heavy
def test_bp_hash_binding_accepts_committed_validators():
    vals = _mk_validators([700, 100, 300])
    ks_data, ks_proof, borsh = _prove_ks(vals, (0, 2))
    hdr = _StubEpochHeader(_bp_hash(borsh))
    ep_data, ep_proof = bft.prove_header_dev(hdr, "epoch")
    _bind_agg(ks_data, ks_proof, ep_data, ep_proof,
              2 * 33, sum(len(x) for x in borsh))


@pytest.mark.heavy
def test_bp_hash_binding_rejects_inflated_stake():
    """VERDICT #2 negative test: inflate a signer's stake (2/3 still holds,
    so the two-thirds constraint alone would NOT catch it) — the digest no
    longer equals the committed next_bp_hash and the binding must fail."""
    vals = _mk_validators([700, 100, 300])
    committed = _bp_hash([v.serialize() for v in vals])
    vals[0].stake = 10**6                       # fabricated stake
    ks_data, ks_proof, _ = _prove_ks(vals, (0, 2))
    hdr = _StubEpochHeader(committed)
    ep_data, ep_proof = bft.prove_header_dev(hdr, "epoch")
    borsh = [v.serialize() for v in vals]
    with pytest.raises((WitnessConflict, AssertionError)):
        _bind_agg(ks_data, ks_proof, ep_data, ep_proof,
                  2 * 33, sum(len(x) for x in borsh))


def test_keys_stakes_rejects_insufficient_stake():
    vals = _mk_validators([100, 700, 300])      # claimed: 400 < 2/3 * 1100
    with pytest.raises((WitnessConflict, AssertionError, Exception)):
        _prove_ks(vals, (0, 2))
