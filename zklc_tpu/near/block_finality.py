"""Block finality: one aggregation circuit verifying all component proofs
with direct public-input wire links.

Equivalent of near_bft_finality/src/prove_bft/block_finality.rs:200
`prove_block_finality`, restructured for this framework's concat-PI
recursion tree: where the reference glues proofs with ~10 sequential
recursive folds and links statements through re-registered hash PIs
(sha256(valid_keys), prove_eq_array proofs), here ONE aggregation circuit
verifies the component proofs and CONNECTS the related public-input wires
directly:

  * signed message bytes <-> header hash/height bytes (the approval message
    for B_i is Endorsement(B_i hash) || height(B_i)+2-or-+1, signatures.rs:24);
  * each signature leaf's pk transcript words <-> keys_stakes valid_keys pk
    bytes (replaces the reference's sha256(valid_keys) digest link);
  * header epoch_id bytes <-> epoch-block hash bytes (replaces
    prove_eq_array aggregation folds, block_finality.rs:325).

Final public inputs follow the reference: [block_hash || epoch_i-2 hash ||
epoch_i-1 hash] bytes (the BFT tag byte is prepended by the bft driver).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from ..plonk.config import CircuitConfig
from ..plonk import prover
from ..plonk.recursion import RecursiveVerifier
from .signatures import prove_approvals, ApprovalCheck
from .keys_stakes import build_keys_stakes_circuit
from . import keys_stakes as KS


def _pack_word_be(b: CircuitBuilder, byte_targets):
    """4 byte targets -> u32 word target (BE), plain arithmetic."""
    acc = b.zero()
    for byte in byte_targets:
        acc = b.arithmetic(256, 1, acc, b.one(), byte)
    return acc


@dataclass
class FinalityProof:
    data: object
    proof: object
    check: ApprovalCheck


def prove_block_finality(header_proof, msg_to_sign: bytes, approvals: list,
                         validators: list, epoch_proofs: list,
                         dev_mode: bool = False) -> FinalityProof:
    """header_proof: (ProverData, proof) from header_hash.py (finality mode:
    PIs = hash(32) | height(8) | epoch_id(32) | ...).
    epoch_proofs: [(data, proof)] for Block_n-1(E-2) [, Block_0(E-1)] whose
    PIs start with the 32-byte block hash.
    """
    hdr_data, hdr_proof = header_proof

    # 1. per-signature proofs + balanced fold
    sig_data, sig_proof, check = prove_approvals(
        msg_to_sign, approvals, validators, dev_mode=dev_mode)

    # 2. keys & stakes (per-instance circuit, indices hardwired)
    borsh = [v.serialize() for v in validators]
    ks_data, (vk_t, val_t) = build_keys_stakes_circuit(
        tuple(len(x) for x in borsh), tuple(check.valid_indices))
    ks_inputs: dict = {}
    for t, v in zip(vk_t, check.valid_keys_bytes):
        ks_inputs[t] = np.uint64(v)
    for row_t, row_v in zip(val_t, borsh):
        for t, v in zip(row_t, row_v):
            ks_inputs[t] = np.uint64(v)
    ks_proof = prover.prove(ks_data, ks_inputs)

    # 3. the linking aggregation circuit
    inners = [(hdr_data.common, hdr_data.verifier_only),
              (sig_data.common, sig_data.verifier_only),
              (ks_data.common, ks_data.verifier_only)]
    for ed, _ep in epoch_proofs:
        prover.ensure_constants_sigmas_commitment(ed)
        inners.append((ed.common, ed.verifier_only))
    prover.ensure_constants_sigmas_commitment(hdr_data)
    prover.ensure_constants_sigmas_commitment(sig_data)
    prover.ensure_constants_sigmas_commitment(ks_data)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pts = []
    for common, vdata in inners:
        rv = RecursiveVerifier(b, common, vdata)
        pt = rv.add_virtual_proof()
        rv.verify_proof(pt)
        pts.append(pt)
    hdr_pt, sig_pt, ks_pt = pts[0], pts[1], pts[2]

    # --- links ---
    # header PI layout: hash 0..32 | height 32..40 | epoch_id 40..72 | ...
    hash_bytes = hdr_pt.public_inputs[0:32]

    # (i) signed message binds to the header: msg layout (signatures.rs:24)
    #   Endorsement: 0x00 | prev_hash(=B_i hash) 32 | target_height 8 LE
    # Each signature leaf's transcript words 8.. are the padded message; the
    # message bytes start at sha byte 64 => word index 8.  Leaf PI vector =
    # [hi, lo] per word.  Recombine header-linked words and connect to EVERY
    # leaf (all leaves share one message — also enforced transitively here).
    n_words = _leaf_word_count(msg_to_sign)
    pi_per_leaf = 2 * n_words
    n_leaves = len(check.valid_indices)
    assert len(sig_pt.public_inputs) == pi_per_leaf * n_leaves
    is_endorsement = msg_to_sign[0] == 0
    msg_const_bytes = _padded_message_bytes(msg_to_sign, is_endorsement)
    # height binding: Endorsement msg = 0x00|hash|target_height LE with
    # target_height = header height + 1 — constrain the header's height PI
    # bytes to the build-time constants implied by the message.
    if is_endorsement:
        target_height = int.from_bytes(msg_to_sign[33:41], "little")
        for k, byte in enumerate((target_height - 1).to_bytes(8, "little")):
            b.connect(hdr_pt.public_inputs[32 + k], b.constant(byte))
    for leaf in range(n_leaves):
        base = leaf * pi_per_leaf
        # connect word-by-word: words fully inside the message region
        for wi in range(8, n_words):
            hi_t = sig_pt.public_inputs[base + 2 * wi]
            lo_t = sig_pt.public_inputs[base + 2 * wi + 1]
            exp_hi = _word_from_sources(b, msg_const_bytes, hash_bytes,
                                        8 * (wi - 8), 4)
            exp_lo = _word_from_sources(b, msg_const_bytes, hash_bytes,
                                        8 * (wi - 8) + 4, 4)
            b.connect(hi_t, exp_hi)
            b.connect(lo_t, exp_lo)

    # (ii) leaf pk words <-> keys_stakes valid_keys pk bytes
    # keys_stakes PIs: valid_keys bytes first: 33 per claimed key
    for leaf in range(n_leaves):
        base = leaf * pi_per_leaf
        vk_base = leaf * 33
        for wi in range(4, 8):              # pk = sha words 4..7
            pk_byte0 = (wi - 4) * 8
            exp_hi = _pack_word_be(
                b, [ks_pt.public_inputs[vk_base + 1 + pk_byte0 + k]
                    for k in range(4)])
            exp_lo = _pack_word_be(
                b, [ks_pt.public_inputs[vk_base + 1 + pk_byte0 + 4 + k]
                    for k in range(4)])
            b.connect(sig_pt.public_inputs[base + 2 * wi], exp_hi)
            b.connect(sig_pt.public_inputs[base + 2 * wi + 1], exp_lo)

    # (iii) epoch_id == hash(Block_n-1(E-2)) (block_finality.rs:325)
    if epoch_proofs:
        ep_pt = pts[3]
        for k in range(32):
            b.connect(hdr_pt.public_inputs[40 + k], ep_pt.public_inputs[k])

    # final PIs: block hash, then each epoch proof's hash
    b.register_public_inputs(hash_bytes)
    for pt in pts[3:]:
        b.register_public_inputs(pt.public_inputs[0:32])
    agg_data = b.build()

    inputs: dict = {}
    RecursiveVerifier.set_proof_targets(hdr_pt, hdr_proof, inputs)
    RecursiveVerifier.set_proof_targets(sig_pt, sig_proof, inputs)
    RecursiveVerifier.set_proof_targets(ks_pt, ks_proof, inputs)
    for pt, (_ed, ep) in zip(pts[3:], epoch_proofs):
        RecursiveVerifier.set_proof_targets(pt, ep, inputs)
    agg_proof = prover.prove(agg_data, inputs)
    return FinalityProof(agg_data, agg_proof, check)


def _leaf_word_count(msg: bytes) -> int:
    total = 64 + len(msg)
    blocks = (total * 8 + 1 + 128 + 1023) // 1024
    return 16 * blocks


def _padded_message_bytes(msg: bytes, is_endorsement: bool):
    """The approval message region with PLACEHOLDERS (None) where the block
    hash bytes go (Endorsement bytes 1..33), plus sha padding as constants."""
    from ..gadgets.sha512 import sha512_pad
    total = 64 + len(msg)
    blocks = (total * 8 + 1 + 128 + 1023) // 1024
    padded = sha512_pad(b"\x00" * 64 + msg, blocks)[64:]
    out: list = list(padded)
    if is_endorsement:
        for k in range(32):
            out[1 + k] = None    # hash bytes come from the header proof
    return out


def _word_from_sources(b: CircuitBuilder, msg_bytes: list, hash_bytes: list,
                       start: int, n: int):
    """Pack n message-region bytes (constants or header-hash wires) into a
    field target = big-endian base-256 accumulation."""
    acc = b.zero()
    for k in range(start, start + n):
        v = msg_bytes[k] if k < len(msg_bytes) else 0
        if v is None:
            byte_t = hash_bytes[k - 1]      # message byte 1+j = hash[j]
        else:
            byte_t = b.constant(int(v))
        acc = b.arithmetic(256, 1, acc, b.one(), byte_t)
    return acc
