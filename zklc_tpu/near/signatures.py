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

import numpy as np

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


# ---------------------------------------------------------------------------
# In-circuit approval proving: per-signature proofs folded by a balanced
# recursion TREE (the reference folds sequentially, signatures.rs:97-106 —
# SURVEY.md §3.1 marks that chain as the serialization bottleneck; a
# log-depth tree preserves the PI semantics and parallelizes across chips).
# ---------------------------------------------------------------------------

_eddsa_circuit_cache: dict = {}
_dev_leaf_cache: dict = {}
_agg_circuit_cache: dict = {}


# EdDSA slots per leaf circuit (~14k rows each; 4 fill the 2^16-row
# lookup-padded shape).  ZKLC_BATCH_K overrides for batch-size sweeps
# (K=8 -> 2^17 rows: more HBM + a fresh compile, higher sig/s ceiling).
import os as _os

BATCH_K = int(_os.environ.get("ZKLC_BATCH_K", "4"))


def get_ed25519_circuit(msg_len: int, k: int = 1):
    """Build-once cache keyed by (message byte length, batch size) — the
    cache discipline of prove_crypto/ed25519.rs:18, extended with the batch
    axis (k slots per circuit fill the 16-bit-lookup-table padding)."""
    key = (msg_len, k)
    if key in _eddsa_circuit_cache:
        return _eddsa_circuit_cache[key]
    from ..plonk.builder import CircuitBuilder
    from ..plonk.config import CircuitConfig
    from ..gadgets.eddsa import EddsaOps
    b = CircuitBuilder(CircuitConfig.wide_lookup_config())
    ops = EddsaOps(b)
    tgs = ops.ed25519_batch_circuit(msg_len, k)
    data = b.build()
    _eddsa_circuit_cache[key] = (data, ops, tgs)
    return data, ops, tgs


def prove_signature(message: bytes, sig: bytes, pk: bytes):
    """One real EdDSA proof (ed25519_proof_reuse_circuit, ed25519.rs:44)."""
    from ..plonk import prover
    from ..gadgets.eddsa import EddsaOps
    data, ops, tgs = get_ed25519_circuit(len(message))
    inputs: dict = {}
    EddsaOps.fill_eddsa(tgs[0], message, sig, pk, inputs)
    proof = prover.prove(data, inputs)
    return data, proof


def prove_signature_batch(message: bytes, sig_pks: list,
                          ckpt_key: str | None = None):
    """One proof covering len(sig_pks) <= BATCH_K signatures of the same
    approval message; sig_pks: [(sig64, pk32)]."""
    from ..plonk import checkpoint
    from ..gadgets.eddsa import EddsaOps
    data, ops, tgs = get_ed25519_circuit(len(message), len(sig_pks))
    inputs: dict = {}
    for tg, (sig, pk) in zip(tgs, sig_pks):
        EddsaOps.fill_eddsa(tg, message, sig, pk, inputs)
    proof = checkpoint.prove(ckpt_key, data, inputs)
    return data, proof


def prove_signature_dev(message: bytes, sig: bytes, pk: bytes):
    """DEV-MODE leaf: a small circuit with the SAME public-input layout as
    the real EdDSA circuit (padded sha-512 transcript words), but no curve
    math — the aggregation/fold topology testing analogue of risc0's
    RISC0_DEV_MODE fake prover (SURVEY.md §4).  NOT sound; test-only."""
    from ..plonk import prover
    from ..plonk.builder import CircuitBuilder
    from ..plonk.config import CircuitConfig
    from ..gadgets.sha512 import sha512_pad
    msg_len = len(message)
    total = 64 + msg_len
    blocks = (total * 8 + 1 + 128 + 1023) // 1024
    key = (msg_len,)
    if key not in _dev_leaf_cache:
        b = CircuitBuilder(CircuitConfig.standard_recursion_config())
        words = [(b.add_virtual_target(), b.add_virtual_target())
                 for _ in range(16 * blocks)]
        for lo, hi in words:
            b.register_public_input(hi)
            b.register_public_input(lo)
        _dev_leaf_cache[key] = (b.build(), words)
    data, words = _dev_leaf_cache[key]
    padded = sha512_pad(sig[:32] + pk + message, blocks)
    inputs = {}
    for i, (lo, hi) in enumerate(words):
        word = int.from_bytes(padded[8 * i: 8 * i + 8], "big")
        inputs[lo] = np.uint64(word & 0xFFFFFFFF)
        inputs[hi] = np.uint64(word >> 32)
    proof = prover.prove(data, inputs)
    return data, proof


def _fold_circuit(dl, dr):
    """The two-proof aggregation circuit for a shape pair (cached)."""
    from ..plonk import prover
    from ..plonk.recursion import recursive_aggregate_circuit
    prover.ensure_constants_sigmas_commitment(dl)
    prover.ensure_constants_sigmas_commitment(dr)
    key = (id(dl), id(dr))
    if key not in _agg_circuit_cache:
        rb, pts = recursive_aggregate_circuit(
            [(dl.common, dl.verifier_only), (dr.common, dr.verifier_only)])
        _agg_circuit_cache[key] = (rb.build(), pts)
    return _agg_circuit_cache[key]


def _fold_pair(left, right, ckpt_key: str | None = None):
    """Aggregate two (data, proof) pairs into one (cache per shape pair)."""
    from ..plonk import checkpoint
    from ..plonk.recursion import RecursiveVerifier
    dl, pl = left
    dr, pr = right
    rdata, pts = _fold_circuit(dl, dr)
    inputs: dict = {}
    RecursiveVerifier.set_proof_targets(pts[0], pl, inputs)
    RecursiveVerifier.set_proof_targets(pts[1], pr, inputs)
    return rdata, checkpoint.prove(ckpt_key, rdata, inputs)


def fold_proof_tree(leaves: list, devices=None,
                    ckpt_prefix: str | None = None):
    """Balanced binary reduction over (data, proof) pairs.  Arrival-order
    insensitive like the reference's fold (SURVEY.md §2.7), log depth.
    Each tree LEVEL is embarrassingly parallel: with >1 chip the per-level
    proves are dispatched round-robin across devices
    (parallel.sharded.prove_level_parallel — the mesh-native replacement of
    the reference's NATS per-signature workers, signatures.rs:144-274)."""
    import jax
    from ..parallel.sharded import prove_level_parallel
    devices = devices if devices is not None else jax.devices()
    level = list(leaves)
    depth = 0
    while len(level) > 1:
        pairs = [(level[i], level[i + 1])
                 for i in range(0, len(level) - 1, 2)]
        # prime the per-shape aggregation circuit caches sequentially
        # (circuit build is not thread-safe; proves are)
        for left, right in pairs:
            _fold_circuit(left[0], right[0])
        jobs = [
            (lambda lr=pair, k=(f"{ckpt_prefix}_L{depth}_{i}"
                                if ckpt_prefix else None):
             _fold_pair(*lr, ckpt_key=k))
            for i, pair in enumerate(pairs)]
        nxt = prove_level_parallel(jobs, devices=devices)
        if len(level) % 2:
            nxt.append(level[-1])
        level = nxt
        depth += 1
    return level[0]


def prove_approvals(message: bytes, approvals: list,
                    validators: list[Validator], dev_mode: bool = False,
                    client=None):
    """signatures.rs:43 `prove_approvals`, tree-shaped.

    Returns (data, proof, ApprovalCheck): the aggregate proof whose PIs are
    the concatenated leaf transcripts (leaf order = ascending validator
    index); the valid-keys digest binding is applied by
    block_finality.prove_valid_keys_digest on top.

    With `client` (a transport.QueueClient), leaf proving fans out to
    worker processes through the broker — the prove_approvals_with_client
    flavor (signatures.rs:144; near/distributed.py)."""
    if client is not None:
        from .distributed import prove_approvals_distributed
        return prove_approvals_distributed(message, approvals, validators,
                                           client, dev_mode=dev_mode)
    check = check_approvals(message, approvals, validators)
    sig_pks = []
    for idx in check.valid_indices:
        sig = approvals[idx]
        raw_sig = sig[1:] if len(sig) == 65 else sig
        sig_pks.append((raw_sig, validators[idx].public_key[1:]))
    # checkpoint namespace: digest of (message, signer set) — deterministic
    # across runs, distinct per statement
    pref = hashlib.sha256(
        message + check.valid_keys_bytes).hexdigest()[:12]
    leaves = []
    if dev_mode:
        leaves = [prove_signature_dev(message, s, p) for s, p in sig_pks]
    else:
        # batch leaves: BATCH_K signatures per proof (same flat PI layout
        # as K folded singles — slot order == ascending validator index)
        for start in range(0, len(sig_pks), BATCH_K):
            leaves.append(prove_signature_batch(
                message, sig_pks[start: start + BATCH_K],
                ckpt_key=f"leaf_{pref}_{start:03d}"))
    if not leaves:
        raise ValueError("no valid approvals to prove")
    data, proof = fold_proof_tree(leaves, ckpt_prefix=f"fold_{pref}")
    return data, proof, check
