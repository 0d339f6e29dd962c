"""Validator approval messages + native signature validation.

Equivalent of near_bft_finality/src/prove_block_data/signatures.rs:
  - `generate_signed_message` (:24): borsh(ApprovalInner) || target_height
    LE — Endorsement(prev_hash) for consecutive heights, Skip(height)
    otherwise;
  - the native pre-check each approval gets before proving (:79), plus the
    valid-keys / stake accumulation the aggregation binds to its public
    inputs (valid_keys = [idx || pk]* hashed with SHA-256).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..gadgets import ed25519_native as ed
from .utils import Validator


def generate_signed_message(ch_height: int, nx_height: int,
                            nx_hash: bytes) -> bytes:
    """signatures.rs:24 — the byte message each validator signs."""
    if ch_height + 1 == nx_height:
        inner = b"\x00" + nx_hash                      # Endorsement(prev_hash)
    else:
        inner = b"\x01" + ch_height.to_bytes(8, "little")  # Skip(height)
    return inner + nx_height.to_bytes(8, "little")


@dataclass
class ApprovalCheck:
    valid_indices: list
    valid_stake: int
    total_stake: int
    valid_keys_bytes: bytes     # concat of (u8 idx || 32-byte pk), index order
    valid_keys_hash: bytes


def check_approvals(message: bytes, approvals: list,
                    validators: list[Validator]) -> ApprovalCheck:
    """Native verification of every approval; mirrors the stake/valid-keys
    bookkeeping of `prove_approvals` (signatures.rs:43-140)."""
    valid = []
    valid_stake = 0
    total_stake = 0
    keys_bytes = b""
    for idx, v in enumerate(validators):
        total_stake += v.stake
        sig = approvals[idx] if idx < len(approvals) else None
        if sig is None:
            continue
        raw_sig = sig[1:] if len(sig) == 65 else sig   # strip borsh tag
        pk = v.public_key[1:]                           # strip borsh tag
        if ed.verify_message(message, raw_sig, pk):
            valid.append(idx)
            valid_stake += v.stake
            keys_bytes += bytes([idx]) + pk
    return ApprovalCheck(
        valid_indices=valid,
        valid_stake=valid_stake,
        total_stake=total_stake,
        valid_keys_bytes=keys_bytes,
        valid_keys_hash=hashlib.sha256(keys_bytes).digest(),
    )


def has_bft_finality(check: ApprovalCheck) -> bool:
    """3 * valid >= 2 * total (the two-thirds statement)."""
    return 3 * check.valid_stake >= 2 * check.total_stake
