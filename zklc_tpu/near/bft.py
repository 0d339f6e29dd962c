"""Five-block BFT finality driver.

Equivalent of near_bft_finality/src/prove_bft/bft.rs:38 `prove_block_bft`
(scheme: near_bft_finality/Scheme_overview.md / BFT.md): prove headers for
B_i+4 .. B_i plus the trusted epoch blocks, prove the target block's
approvals and stake threshold, and link everything.

Framework redesign (cf. block_finality.py): the reference's ~10 sequential
recursive folds + prove_eq_array / prove_consecutive_heights glue proofs
(block_finality.rs:294-731, bft.rs:181-315) become ONE aggregation circuit
that verifies all component proofs and connects their public-input wires:

  * consecutive heights B_i+4 .. B_i  (primitives.rs:32 statement, applied
    directly on the header proofs' height PI bytes);
  * prev_hash chain: prev_hash(B_j) == hash(B_{j+1});
  * doomslug / BFT links: last_ds_final(B_i+1) == hash(B_i),
    last_final(B_i+2) == hash(B_i);
  * epoch links: epoch_id(B_i) == hash(Block_n-1(E-2));
  * approval message <-> B_i hash/height; signer pks <-> keys_stakes rows.

Final PIs mirror bft.rs:377-390: [tag || hash(B_i) || hash(Bn-1 E-2) ||
hash(B0 E-1)] as byte field elements.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from ..plonk.config import CircuitConfig
from ..plonk import prover
from ..plonk.recursion import RecursiveVerifier
from ..plonk.witness import generate_witness
from .signatures import prove_approvals, generate_signed_message
from .keys_stakes import build_keys_stakes_circuit
from .primitives import consecutive_heights_circuit
from .block_finality import (_pack_word_be, _padded_message_bytes,
                             _leaf_word_count)
from . import header_hash as HH

# PI tag bytes (bft.rs final PI assembly)
TAG_RANDOM = 0
TAG_EPOCH = 1

# header-proof PI offsets (header_hash.py finality mode)
OFF_HASH = 0
OFF_HEIGHT = 32
OFF_EPOCH_ID = 40
OFF_PREV_HASH = 72
OFF_LAST_DS = 104
OFF_LAST_FINAL = 136


def prove_header(header, mode: str = "finality"):
    """Real header-hash proof (header_hash.py single-circuit DAG)."""
    kw = {}
    if mode == "finality":
        lds, lf = HH.rest_field_offsets(header)
        kw = dict(last_ds_off=lds, last_final_off=lf)
    data, tg = HH.build_header_hash_circuit(len(header.inner_rest), mode, **kw)
    inputs: dict = {}
    HH.set_header_hash_inputs(tg, header, inputs)
    proof = prover.prove(data, inputs)
    return data, proof


_dev_header_cache: dict = {}


def prove_header_dev(header, mode: str = "finality"):
    """DEV-MODE header proof: same PI layout, no hashing (test-only)."""
    pis = HH.expected_public_inputs(header, mode)
    key = (mode, len(pis))
    if key not in _dev_header_cache:
        b = CircuitBuilder(CircuitConfig.standard_recursion_config())
        ts = b.add_virtual_targets(len(pis))
        b.register_public_inputs(ts)
        _dev_header_cache[key] = (b.build(), ts)
    data, ts = _dev_header_cache[key]
    inputs = {t: np.uint64(v) for t, v in zip(ts, pis)}
    proof = prover.prove(data, inputs)
    return data, proof


@dataclass
class BftProof:
    data: object            # None in check_only mode
    proof: object           # None in check_only mode
    public_inputs: list     # expected/actual final PI bytes
    check: object


def prove_block_bft(epoch_blocks: list, blocks: list, validators: list,
                    dev_mode: bool = False, check_only: bool = False,
                    mode: str = "random", bind_bp_hash: bool = True) -> BftProof:
    """blocks: [B_i+4, B_i+3, B_i+2, B_i+1, B_i] parsed headers
    (utils.set_blocks order); epoch_blocks: [(stored_hash, Block_0(E-1)),
    (stored_hash, Block_n-1(E-2))].

    check_only: build the aggregation circuit, generate its witness and
    check constraints without producing the outer FRI proof (fast path for
    CPU tests; the full prove is the TPU path).

    bind_bp_hash (default ON, matching header_bphash.rs:125 +
    block_finality.rs:347-370): the keys_stakes circuit computes
    sha256(u32-LE count || borsh(validators)) in-circuit and the
    aggregation connects that digest to the next_bp_hash PIs of the
    Block_0(E-1) epoch header proof, so `validators` MUST be the full
    block-producer set of B_i's epoch.  Only tests that substitute a
    stake-dominant validator subset may disable it.
    """
    assert len(blocks) == 5
    prove_hdr = prove_header_dev if dev_mode else prove_header

    # 1. component proofs
    hdr = [prove_hdr(h, "finality") for h in blocks]
    ep_hdr = [prove_hdr(eb[1], "epoch") for eb in epoch_blocks]

    b_i = blocks[4]
    b_next = blocks[3]
    msg = generate_signed_message(b_i.height, b_next.height, b_i.hash)
    sig_data, sig_proof, check = prove_approvals(
        msg, b_next.approvals, validators, dev_mode=dev_mode)

    borsh = [v.serialize() for v in validators]
    ks_data, (vk_t, val_t, _bp_t) = build_keys_stakes_circuit(
        tuple(len(x) for x in borsh), tuple(check.valid_indices),
        bind_bp_hash=bind_bp_hash)
    ks_inputs: dict = {}
    for t, v in zip(vk_t, check.valid_keys_bytes):
        ks_inputs[t] = np.uint64(v)
    for row_t, row_v in zip(val_t, borsh):
        for t, v in zip(row_t, row_v):
            ks_inputs[t] = np.uint64(v)
    ks_proof = prover.prove(ks_data, ks_inputs)

    # 2. aggregation circuit
    component = hdr + ep_hdr + [(sig_data, sig_proof), (ks_data, ks_proof)]
    for d, _p in component:
        prover.ensure_constants_sigmas_commitment(d)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pts = []
    for d, _p in component:
        rv = RecursiveVerifier(b, d.common, d.verifier_only)
        pt = rv.add_virtual_proof()
        rv.verify_proof(pt)
        pts.append(pt)
    hdr_pts = pts[:5]
    ep_pts = pts[5:5 + len(ep_hdr)]
    sig_pt = pts[5 + len(ep_hdr)]
    ks_pt = pts[6 + len(ep_hdr)]

    def pis(pt, off, n):
        return pt.public_inputs[off: off + n]

    # consecutive heights + prev_hash chain over B_i+4 .. B_i
    for j in range(4):
        consecutive_heights_circuit(
            b, pis(hdr_pts[j], OFF_HEIGHT, 8), pis(hdr_pts[j + 1], OFF_HEIGHT, 8))
        for k in range(32):
            b.connect(hdr_pts[j].public_inputs[OFF_PREV_HASH + k],
                      hdr_pts[j + 1].public_inputs[OFF_HASH + k])

    # doomslug/BFT links: B_i+1.last_ds_final == hash(B_i);
    # B_i+2.last_final == hash(B_i)
    for k in range(32):
        b.connect(hdr_pts[3].public_inputs[OFF_LAST_DS + k],
                  hdr_pts[4].public_inputs[OFF_HASH + k])
        b.connect(hdr_pts[2].public_inputs[OFF_LAST_FINAL + k],
                  hdr_pts[4].public_inputs[OFF_HASH + k])

    # epoch link: epoch_id(B_i) == hash(Block_n-1(E-2)) (epoch_blocks[1])
    if len(ep_pts) >= 2:
        for k in range(32):
            b.connect(hdr_pts[4].public_inputs[OFF_EPOCH_ID + k],
                      ep_pts[1].public_inputs[k])

    # bp_hash binding (header_bphash.rs:125 / block_finality.rs:347-370):
    # the keys_stakes circuit's in-circuit sha256(count || borsh(validators))
    # digest PIs must equal next_bp_hash of Block_0(E-1) — epoch-mode header
    # PI layout is hash(32) | next_bp_hash(32) | next_epoch_id(32).
    if bind_bp_hash:
        bp_off = len(check.valid_keys_bytes) + sum(len(x) for x in borsh)
        for k in range(32):
            b.connect(ks_pt.public_inputs[bp_off + k],
                      ep_pts[0].public_inputs[32 + k])

    # signature links (see block_finality.py)
    hash_bytes = pis(hdr_pts[4], OFF_HASH, 32)
    n_words = _leaf_word_count(msg)
    pi_per_leaf = 2 * n_words
    n_leaves = len(check.valid_indices)
    is_endorsement = msg[0] == 0
    msg_const = _padded_message_bytes(msg, is_endorsement)
    if is_endorsement:
        target_height = int.from_bytes(msg[33:41], "little")
        for k, byte in enumerate((target_height - 1).to_bytes(8, "little")):
            b.connect(hdr_pts[4].public_inputs[OFF_HEIGHT + k],
                      b.constant(byte))

    def word_from(msg_bytes, start):
        acc = b.zero()
        for k in range(start, start + 4):
            v = msg_bytes[k] if k < len(msg_bytes) else 0
            byte_t = hash_bytes[k - 1] if v is None else b.constant(int(v))
            acc = b.arithmetic(256, 1, acc, b.one(), byte_t)
        return acc

    for leaf in range(n_leaves):
        base = leaf * pi_per_leaf
        for wi in range(8, n_words):
            b.connect(sig_pt.public_inputs[base + 2 * wi],
                      word_from(msg_const, 8 * (wi - 8)))
            b.connect(sig_pt.public_inputs[base + 2 * wi + 1],
                      word_from(msg_const, 8 * (wi - 8) + 4))
        vk_base = leaf * 33
        for wi in range(4, 8):
            pk0 = (wi - 4) * 8
            b.connect(sig_pt.public_inputs[base + 2 * wi], _pack_word_be(
                b, [ks_pt.public_inputs[vk_base + 1 + pk0 + k]
                    for k in range(4)]))
            b.connect(sig_pt.public_inputs[base + 2 * wi + 1], _pack_word_be(
                b, [ks_pt.public_inputs[vk_base + 1 + pk0 + 4 + k]
                    for k in range(4)]))

    # final PIs: [tag || hash(B_i) || hash(Bn-1 E-2) || hash(B0 E-1)]
    tag = TAG_EPOCH if mode == "epoch" else TAG_RANDOM
    b.register_public_input(b.constant(tag))
    b.register_public_inputs(hash_bytes)
    if len(ep_pts) >= 2:
        b.register_public_inputs(ep_pts[1].public_inputs[0:32])
        b.register_public_inputs(ep_pts[0].public_inputs[0:32])

    agg_data = b.build()
    inputs: dict = {}
    for pt, (_d, p) in zip(pts, component):
        RecursiveVerifier.set_proof_targets(pt, p, inputs)

    expected_pis = [tag] + list(b_i.hash)
    if len(epoch_blocks) >= 2:
        expected_pis += list(epoch_blocks[1][1].hash)
        expected_pis += list(epoch_blocks[0][1].hash)

    if check_only:
        from ..plonk.testing import check_constraints
        wr = generate_witness(agg_data, inputs)
        check_constraints(agg_data, wr)
        got = [int(wr.get(t)) for t in agg_data.public_input_targets]
        assert got == expected_pis, "final PI mismatch"
        return BftProof(None, None, got, check)

    agg_proof = prover.prove(agg_data, inputs)
    return BftProof(agg_data, agg_proof,
                    [int(x) for x in agg_proof.public_inputs], check)
