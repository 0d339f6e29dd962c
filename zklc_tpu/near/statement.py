"""The BFT-finality statement as a native executable program — the
second, independent implementation of what the circuits prove.

Equivalent of the near_risc0 zkVM guest (near_risc0/methods/guest/src/
main.rs:10 + lib/src/verification.rs): re-derive every check natively —
header hashes, consecutive heights, doomslug/BFT hash links, prev_hash
chain, epoch_id linkage, next_bp_hash, signatures with the 2/3-stake
threshold — and commit an ABI-encoded journal (PublicValuesRandom /
PublicValuesEpoch, lib/src/types/types.rs:193-209).

Two uses, mirroring the reference:
  * cross-validation: tests run BOTH this executor and the circuit pipeline
    on the same fixtures and compare the committed values;
  * a fast dev backend for the service layer (RISC0_DEV_MODE pattern).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

from .signatures import generate_signed_message
from .utils import Validator
from ..gadgets import ed25519_native as ed


class StatementError(AssertionError):
    pass


def _require(cond: bool, msg: str):
    if not cond:
        raise StatementError(msg)


def compute_bp_hash(validators: list[Validator]) -> bytes:
    """verification.rs:161 — sha256(u32-LE count || borsh(stake)*)."""
    out = len(validators).to_bytes(4, "little")
    for v in validators:
        out += v.serialize()
    return hashlib.sha256(out).digest()


def check_hashes(blocks):
    """verification.rs:70: recompute each header hash from its borsh
    pieces (sha256(sha256(inner_lite)||sha256(inner_rest)) || prev_hash)."""
    for b in blocks:
        _require(b.computed_hash() == b.hash,
                 f"header hash mismatch at height {b.height}")


def check_heights(blocks):
    """verification.rs:100 via guest main.rs:50: B4..B2 consecutive."""
    h4, h3, h2 = blocks[0].height, blocks[1].height, blocks[2].height
    _require(h2 + 1 == h3, "heights not consecutive (B2, B3)")
    _require(h3 + 1 == h4, "heights not consecutive (B3, B4)")


def check_ds_links(blocks):
    """guest main.rs:54-90: last_ds(B4)==hash(B3); last_ds(B3)==hash(B2);
    last_final(B4)==hash(B2)."""
    _require(blocks[0].last_ds_final_block == blocks[1].hash,
             "last_ds_final(B4) != hash(B3)")
    _require(blocks[1].last_ds_final_block == blocks[2].hash,
             "last_ds_final(B3) != hash(B2)")
    _require(blocks[0].last_final_block == blocks[2].hash,
             "last_final(B4) != hash(B2)")


def check_prev_hashes(blocks):
    """verification.rs:114: prev_hash chain from the last block upward."""
    cur = blocks[-1].hash
    for b in reversed(blocks[:-1]):
        _require(b.prev_hash == cur, f"prev_hash broken at {b.height}")
        cur = b.hash


def check_epoch_id(epoch_blocks, blocks):
    """verification.rs:134."""
    ep_hash = epoch_blocks[1][1].hash
    for b in blocks[:5]:
        _require(b.epoch_id == ep_hash, "epoch_id(Bi) != hash(Bn-1 E-2)")
    if len(blocks) == 6:
        _require(blocks[5].epoch_id == epoch_blocks[2][1].hash,
                 "epoch_id(Bn-1) != hash(Bn-1 E-3)")


def check_bp_hash(epoch_blocks, validators, validators_n_1=None):
    """verification.rs:176: the validator lists hash to the committed
    next_bp_hash of the epoch blocks."""
    _require(epoch_blocks[0][1].next_bp_hash == compute_bp_hash(validators),
             "next_bp_hash mismatch for Epoch_i validators")
    if validators_n_1 is not None:
        _require(epoch_blocks[1][1].next_bp_hash ==
                 compute_bp_hash(validators_n_1),
                 "next_bp_hash mismatch for Epoch_i-1 validators")


def sig_verify(msg: bytes, approvals, validators, fallback=None):
    """verification.rs:223: verify each present approval; 2/3 stake.

    fallback: second validator list tried per-position when the primary
    key rejects (BlockType::BLOCK — the epoch-boundary block's approvals
    may be signed by either epoch's producer set)."""
    total = 0
    counted = 0
    for pos, v in enumerate(validators):
        apr = approvals[pos] if pos < len(approvals) else None
        if apr is not None:
            raw = apr[1:] if len(apr) == 65 else apr
            ok = ed.verify_message(msg, raw, v.public_key[1:])
            if not ok and fallback is not None:
                ok = ed.verify_message(msg, raw,
                                       fallback[pos].public_key[1:])
            _require(ok, f"invalid signature at validator {pos}")
            counted += v.stake
        total += v.stake
    _require(3 * counted >= 2 * total, "less than 2/3 stake signed")


def check_signatures(blocks, validators, validators_n_1=None):
    """verification.rs:261."""
    if len(blocks) == 5:
        bi, bi_1 = blocks[4], blocks[3]
        msg = generate_signed_message(bi.height, bi_1.height, bi_1.prev_hash)
        sig_verify(msg, bi_1.approvals, validators)
    else:
        bn_1, b0 = blocks[5], blocks[4]
        msg = generate_signed_message(bn_1.height, b0.height, b0.prev_hash)
        sig_verify(msg, b0.approvals, validators_n_1, fallback=validators)
        b1 = blocks[3]
        msg = generate_signed_message(b0.height, b1.height, b1.prev_hash)
        sig_verify(msg, b1.approvals, validators,
                   fallback=validators_n_1)


@dataclass
class PublicValuesRandom:
    selector: int
    current_block_hash: bytes
    current_epoch_hash: bytes
    previous_epoch_hash: bytes

    def abi_encode(self) -> bytes:
        """alloy sol tuple (uint32, bytes32, bytes32, bytes32)."""
        return (self.selector.to_bytes(32, "big")
                + self.current_block_hash
                + self.current_epoch_hash
                + self.previous_epoch_hash)


@dataclass
class PublicValuesEpoch:
    selector: int
    current_block_hash: bytes
    previous_block_hash: bytes
    current_block_height: int
    previous_block_height: int

    def abi_encode(self) -> bytes:
        """alloy sol tuple (uint32, bytes32, bytes32, uint64, uint64)."""
        return (self.selector.to_bytes(32, "big")
                + self.current_block_hash
                + self.previous_block_hash
                + self.current_block_height.to_bytes(32, "big")
                + self.previous_block_height.to_bytes(32, "big"))


def execute(epoch_blocks, blocks, validators, validators_n_1=None):
    """The guest program (main.rs:10): run all checks, return the journal.

    epoch_blocks: [(stored_hash|None, BlockHeader)] x 2..3;
    blocks: 5 (random) or 6 (epoch) parsed headers.
    """
    _require(2 <= len(epoch_blocks) <= 3, "bad epoch_blocks length")
    _require(5 <= len(blocks) <= 6, "bad blocks length")
    _require(len(validators) > 0, "empty validator list")
    if len(blocks) == 6:
        _require(validators_n_1 is not None,
                 "epoch mode needs validators_n_1")

    check_hashes([eb[1] for eb in epoch_blocks])
    check_hashes(blocks[0:3])
    check_heights(blocks)
    check_ds_links(blocks)
    check_hashes(blocks[3:])
    check_prev_hashes(blocks)
    check_epoch_id(epoch_blocks, blocks)
    check_bp_hash(epoch_blocks, validators,
                  validators_n_1 if len(blocks) == 6 else None)
    check_signatures(blocks, validators, validators_n_1)

    if len(blocks) == 5:
        return PublicValuesRandom(
            selector=0,
            current_block_hash=blocks[4].hash,
            current_epoch_hash=epoch_blocks[1][1].hash,
            previous_epoch_hash=epoch_blocks[0][1].hash)
    return PublicValuesEpoch(
        selector=1,
        current_block_hash=blocks[4].hash,
        previous_block_hash=blocks[5].hash,
        current_block_height=blocks[4].height,
        previous_block_height=blocks[5].height)
