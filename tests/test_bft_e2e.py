"""End-to-end five-block BFT finality (dev-mode leaves, check_only).

Validates the whole aggregation statement of prove_bft/bft.rs:38 +
block_finality.rs:200 on real mainnet fixtures: header-hash PI layouts,
consecutive-heights chain, doomslug/BFT hash links, epoch linkage
(epoch_id(B_i) == hash(Block_n-1(E-2))), signature fold tree, keys&stakes
2/3 binding, and the final [tag || block_hash || epoch hashes] PI assembly.

Dev-mode leaves (RISC0_DEV_MODE pattern) + check_only keep it CPU-tractable;
validators are a stake-dominant subset of the 100-validator fixture (the
positions of approvals are preserved so signature pairing stays intact).
"""
import os.path as p

import numpy as np
import pytest

from zklc_tpu.near import utils as U, bft as B, signatures as S



pytestmark = pytest.mark.heavy

class _ApprovalsView:
    """Header proxy replacing the approvals list (subset testing)."""

    def __init__(self, header, approvals):
        self._h = header
        self._apr = approvals

    def __getattr__(self, k):
        return getattr(self._h, k)

    @property
    def approvals(self):
        return self._apr


def test_bft_e2e_dev_random_mode():
    eps = U.ordered_epochs()
    assert len(eps) >= 3
    epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3])
    allv = U.load_validators(
        p.join(U.epoch_dir(eps[-1]), "validators.json"))
    b_i, b_next = blocks[4], blocks[3]
    msg = S.generate_signed_message(b_i.height, b_next.height, b_i.hash)
    apr = b_next.approvals
    chk_full = S.check_approvals(msg, apr, allv)
    valid = chk_full.valid_indices
    nonvalid = [i for i in range(len(allv)) if i not in valid]
    sel = sorted(valid[:3] + nonvalid[-1:])
    vals = [allv[i] for i in sel]
    apr_sub = [apr[i] for i in sel]
    sub = S.check_approvals(msg, apr_sub, vals)
    assert 3 * sub.valid_stake >= 2 * sub.total_stake, \
        "fixture subset lost 2/3 stake dominance"

    blocks2 = list(blocks)
    blocks2[3] = _ApprovalsView(blocks[3], apr_sub)
    # bind_bp_hash=False: the subset's digest cannot equal the committed
    # next_bp_hash; the binding itself is covered by test_keys_stakes.py
    # and the real full-validator run (scripts/real_bft_prove.py).
    res = B.prove_block_bft(epoch_blocks, blocks2, vals,
                            dev_mode=True, check_only=True, mode="random",
                            bind_bp_hash=False)
    want = [B.TAG_RANDOM] + list(b_i.hash) \
        + list(epoch_blocks[1][1].hash) + list(epoch_blocks[0][1].hash)
    assert res.public_inputs == want


def test_bft_rejects_misordered_epochs():
    """Mis-ordered epoch inputs must fail the epoch-linkage copy constraint
    (epoch_id(B_i) != hash(Block_n-1(E-2)))."""
    from zklc_tpu.plonk.witness import WitnessConflict
    eps = U.ordered_epochs()
    # wrong order: swap E-1 and E-2 (both have the stored-hash fixtures)
    epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-3], eps[-2])
    allv = U.load_validators(
        p.join(U.epoch_dir(eps[-1]), "validators.json"))
    b_i, b_next = blocks[4], blocks[3]
    msg = S.generate_signed_message(b_i.height, b_next.height, b_i.hash)
    apr = b_next.approvals
    chk_full = S.check_approvals(msg, apr, allv)
    valid = chk_full.valid_indices
    nonvalid = [i for i in range(len(allv)) if i not in valid]
    sel = sorted(valid[:3] + nonvalid[-1:])
    vals = [allv[i] for i in sel]
    blocks2 = list(blocks)
    blocks2[3] = _ApprovalsView(blocks[3], [apr[i] for i in sel])
    with pytest.raises((WitnessConflict, AssertionError)):
        B.prove_block_bft(epoch_blocks, blocks2, vals,
                          dev_mode=True, check_only=True, mode="random",
                          bind_bp_hash=False)


def _dominant_subset(msg, approvals, allv):
    """Stake-dominant validator subset preserving approval positions."""
    chk = S.check_approvals(msg, approvals, allv)
    valid = chk.valid_indices
    nonvalid = [i for i in range(len(allv)) if i not in valid]
    sel = sorted(valid[:3] + nonvalid[-1:])
    vals = [allv[i] for i in sel]
    apr = [approvals[i] for i in sel]
    sub = S.check_approvals(msg, apr, vals)
    assert 3 * sub.valid_stake >= 2 * sub.total_stake
    return vals, apr


def test_bft_e2e_dev_epoch_mode():
    """Epoch mode (bft.rs:394-559): 6-block shape proving Block_0(E_i) and
    Block_n-1(E_i-1), with the three-epoch-block linkage and per-epoch
    validator sets."""
    eps = U.ordered_epochs()
    assert len(eps) >= 4
    epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3], eps[-4])
    assert len(blocks) == 6 and len(epoch_blocks) == 3
    allv = U.load_validators(p.join(U.epoch_dir(eps[-1]), "validators.json"))
    allv_n1 = U.load_validators(
        p.join(U.epoch_dir(eps[-2]), "validators.json"))

    b0, b1, bn1 = blocks[4], blocks[3], blocks[5]
    msg_a = S.generate_signed_message(b0.height, b1.height, b0.hash)
    vals_a, apr_a = _dominant_subset(msg_a, b1.approvals, allv)
    msg_b = S.generate_signed_message(bn1.height, b0.height, bn1.hash)
    vals_b, apr_b = _dominant_subset(msg_b, b0.approvals, allv_n1)

    blocks2 = list(blocks)
    blocks2[3] = _ApprovalsView(b1, apr_a)
    blocks2[4] = _ApprovalsView(b0, apr_b)
    res_a, res_b = B.prove_block_bft(
        epoch_blocks, blocks2, vals_a, dev_mode=True, check_only=True,
        mode="epoch", bind_bp_hash=False, validators_n_1=vals_b)
    assert res_a.public_inputs == [B.TAG_EPOCH] + list(b0.hash) + \
        list(epoch_blocks[1][1].hash) + list(epoch_blocks[0][1].hash)
    assert res_b.public_inputs == [B.TAG_EPOCH] + list(bn1.hash) + \
        list(epoch_blocks[2][1].hash) + list(epoch_blocks[1][1].hash)


def test_stored_hash_mismatch_rejected():
    """utils.rs:340-355: a wrong _STORED trusted hash must be rejected."""
    eps = U.ordered_epochs()
    epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3])
    bad = [(bytes(32), epoch_blocks[0][1])] + epoch_blocks[1:]
    allv = U.load_validators(p.join(U.epoch_dir(eps[-1]), "validators.json"))
    with pytest.raises(ValueError, match="stored trusted hash"):
        B.prove_block_bft(bad, blocks, allv[:4],
                          dev_mode=True, check_only=True, mode="random",
                          bind_bp_hash=False)
