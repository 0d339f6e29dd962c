"""Five/six-block BFT finality driver.

Equivalent of near_bft_finality/src/prove_bft/bft.rs:38 `prove_block_bft`
(scheme: near_bft_finality/Scheme_overview.md / BFT.md): prove headers for
B_i+4 .. B_i plus the trusted epoch blocks, prove the target block's
approvals and stake threshold, and link everything.

Framework redesign (cf. block_finality.py): the reference's ~10 sequential
recursive folds + prove_eq_array / prove_consecutive_heights glue proofs
(block_finality.rs:294-731, bft.rs:181-315) become ONE aggregation circuit
per target block that verifies all component proofs and connects their
public-input wires:

  * consecutive heights B_i+4 .. B_i  (primitives.rs:32 statement, applied
    directly on the header proofs' height PI bytes);
  * prev_hash chain: prev_hash(B_j) == hash(B_{j+1});
  * doomslug / BFT links: last_ds_final(B_i+1) == hash(B_i),
    last_final(B_i+2) == hash(B_i);
  * epoch links: epoch_id(target) == hash(epoch slot-0 block);
  * bp_hash: keys_stakes' in-circuit validator digest == next_bp_hash PI of
    the epoch slot-1 block (header_bphash.rs:125);
  * approval message <-> target hash/height; signer pks <-> keys_stakes.

Random mode (blocks.len()==5, bft.rs:319-391) proves B_i; epoch mode
(blocks.len()==6, bft.rs:394-559) proves Block_0(E_i) AND Block_n-1(E_i-1).
Final PIs mirror bft.rs:377-390/528-557: [tag || hash(target) ||
hash(epoch slot-0) || hash(epoch slot-1)] as byte field elements.
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
    """Real header-hash proof (header_hash.py single-circuit DAG), using
    the BUCKETED variable-length circuit cache (one circuit per
    rest-block bucket, not per header — SURVEY.md §7.4.6).  Checkpointed
    per (block hash, mode) when a checkpoint store is active."""
    from ..plonk import checkpoint
    from .types import b58encode
    data, tg = HH.get_header_circuit(header, mode)
    inputs: dict = {}
    HH.set_header_hash_inputs(tg, header, inputs)
    proof = checkpoint.prove(f"hdr_{b58encode(header.hash)}_{mode}",
                             data, inputs)
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


def _prove_sig_and_keys(b_target, b_next, validators, dev_mode,
                        bind_bp_hash, sig_client=None):
    """Approvals on b_next's header endorse b_target; returns the signature
    fold proof, the keys&stakes proof, the ApprovalCheck, and the borsh
    rows (signatures.rs:43 + keys_stakes.rs:18)."""
    msg = generate_signed_message(b_target.height, b_next.height,
                                  b_target.hash)
    sig_data, sig_proof, check = prove_approvals(
        msg, b_next.approvals, validators, dev_mode=dev_mode,
        client=sig_client)

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
    from ..plonk import checkpoint
    from .types import b58encode
    ks_key = (f"ks_{b58encode(b_target.hash)}_"
              f"{int(bind_bp_hash)}")
    ks_proof = checkpoint.prove(ks_key, ks_data, ks_inputs)
    return msg, (sig_data, sig_proof), (ks_data, ks_proof), check, borsh


def _wire_signature_links(b, sig_pt, ks_pt, hash_bytes, target_hdr_pt,
                          next_hdr_pt, msg, check, borsh, bind_bp_hash,
                          ep0_pt):
    """Connect the signature fold transcript words to the approval message
    and the keys_stakes pk rows; bind the validator digest to next_bp_hash
    of the epoch slot-1 header proof (block_finality.rs:347-370).

    The hash AND height bytes of the approval message are wired from the
    header proofs' public inputs (not baked as circuit constants), so the
    aggregation circuit is height-agnostic — one compile serves every
    block of the same shape class (VERDICT round-1 weak #7)."""
    n_words = _leaf_word_count(msg)
    pi_per_leaf = 2 * n_words
    n_leaves = len(check.valid_indices)
    is_endorsement = msg[0] == 0
    msg_src: list = _padded_message_bytes(msg, is_endorsement)
    if is_endorsement:
        # bytes 33..41: target_height LE = next block's height PIs
        for k in range(8):
            msg_src[33 + k] = ("t",
                               next_hdr_pt.public_inputs[OFF_HEIGHT + k])
    else:
        # Skip(h): bytes 1..9 = target height, 9..17 = next height
        for k in range(8):
            msg_src[1 + k] = ("t",
                              target_hdr_pt.public_inputs[OFF_HEIGHT + k])
            msg_src[9 + k] = ("t",
                              next_hdr_pt.public_inputs[OFF_HEIGHT + k])

    def word_from(msg_bytes, start):
        acc = b.zero()
        for k in range(start, start + 4):
            v = msg_bytes[k] if k < len(msg_bytes) else 0
            if v is None:
                byte_t = hash_bytes[k - 1]
            elif isinstance(v, tuple):
                byte_t = v[1]
            else:
                byte_t = b.constant(int(v))
            acc = b.arithmetic(256, 1, acc, b.one(), byte_t)
        return acc

    for leaf in range(n_leaves):
        base = leaf * pi_per_leaf
        for wi in range(8, n_words):
            b.connect(sig_pt.public_inputs[base + 2 * wi],
                      word_from(msg_src, 8 * (wi - 8)))
            b.connect(sig_pt.public_inputs[base + 2 * wi + 1],
                      word_from(msg_src, 8 * (wi - 8) + 4))
        vk_base = leaf * 33
        for wi in range(4, 8):
            pk0 = (wi - 4) * 8
            b.connect(sig_pt.public_inputs[base + 2 * wi], _pack_word_be(
                b, [ks_pt.public_inputs[vk_base + 1 + pk0 + k]
                    for k in range(4)]))
            b.connect(sig_pt.public_inputs[base + 2 * wi + 1], _pack_word_be(
                b, [ks_pt.public_inputs[vk_base + 1 + pk0 + 4 + k]
                    for k in range(4)]))

    # bp_hash binding (header_bphash.rs:125): the keys_stakes circuit's
    # in-circuit sha256(count || borsh(validators)) digest PIs must equal
    # next_bp_hash of the slot-1 epoch block — epoch-mode header PI layout
    # is hash(32) | next_bp_hash(32) | next_epoch_id(32).
    if bind_bp_hash:
        bp_off = len(check.valid_keys_bytes) + sum(len(x) for x in borsh)
        for k in range(32):
            b.connect(ks_pt.public_inputs[bp_off + k],
                      ep0_pt.public_inputs[32 + k])


def _aggregate_target(target_hdr, ds_hdr, final_hdr, chain_hdrs,
                      ep_slot0, ep_slot1, sig, ks, msg, check, borsh,
                      tag, bind_bp_hash, check_only,
                      boundary_prev: bool = False,
                      ckpt_key: str | None = None):
    """Build + prove the single linking aggregation circuit for one target.

    target_hdr: (data, proof) of the target block's finality-mode header.
    ds_hdr / final_hdr: header proofs whose last_ds_final / last_final PIs
      must equal the target hash (B_i+1 / B_i+2 — or B_0 / B_1 in epoch
      mode's boundary target).
    chain_hdrs: the 5-header window [(data,proof) B_i+4..B_i] whose
      consecutive-heights + prev_hash chain is enforced here; [] when the
      chain was already enforced by the sibling aggregation.
    ep_slot0: epoch block whose HASH must equal the target's epoch_id
      (block_finality.rs:322-346); ep_slot1: epoch block whose next_bp_hash
      PI binds the validator digest (:347-370).
    boundary_prev: also enforce prev_hash(ds_hdr) == hash(target) (the
      epoch-boundary link for Block_n-1, block_finality.rs:571-580).
    """
    component = list(chain_hdrs)
    seen_ids = {id(p) for _d, p in component}
    for extra in (target_hdr, ds_hdr, final_hdr):
        if id(extra[1]) not in seen_ids:
            component.append(extra)
            seen_ids.add(id(extra[1]))
    component += [ep_slot0, ep_slot1, sig, ks]
    for d, _p in component:
        prover.ensure_constants_sigmas_commitment(d)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pts = {}
    for d, p in component:
        rv = RecursiveVerifier(b, d.common, d.verifier_only)
        pt = rv.add_virtual_proof()
        rv.verify_proof(pt)
        pts[id(p)] = pt

    def pt_of(pair):
        return pts[id(pair[1])]

    def pis(pt, off, n):
        return pt.public_inputs[off: off + n]

    tgt = pt_of(target_hdr)
    hash_bytes = pis(tgt, OFF_HASH, 32)

    # consecutive heights + prev_hash chain over the 5-block window
    if chain_hdrs:
        cpts = [pt_of(h) for h in chain_hdrs]
        for j in range(len(cpts) - 1):
            consecutive_heights_circuit(
                b, pis(cpts[j], OFF_HEIGHT, 8), pis(cpts[j + 1], OFF_HEIGHT, 8))
            for k in range(32):
                b.connect(cpts[j].public_inputs[OFF_PREV_HASH + k],
                          cpts[j + 1].public_inputs[OFF_HASH + k])

    # doomslug/BFT links: last_ds_final(ds_hdr) == hash(target);
    # last_final(final_hdr) == hash(target)
    for k in range(32):
        b.connect(pt_of(ds_hdr).public_inputs[OFF_LAST_DS + k],
                  hash_bytes[k])
        b.connect(pt_of(final_hdr).public_inputs[OFF_LAST_FINAL + k],
                  hash_bytes[k])
    if boundary_prev:
        for k in range(32):
            b.connect(pt_of(ds_hdr).public_inputs[OFF_PREV_HASH + k],
                      hash_bytes[k])

    # epoch link: epoch_id(target) == hash(ep_slot0)
    for k in range(32):
        b.connect(tgt.public_inputs[OFF_EPOCH_ID + k],
                  pt_of(ep_slot0).public_inputs[k])

    _wire_signature_links(b, pt_of(sig), pt_of(ks), hash_bytes, tgt,
                          pt_of(ds_hdr), msg, check, borsh, bind_bp_hash,
                          pt_of(ep_slot1))

    # final PIs: [tag || hash(target) || hash(ep_slot0) || hash(ep_slot1)]
    b.register_public_input(b.constant(tag))
    b.register_public_inputs(hash_bytes)
    b.register_public_inputs(pt_of(ep_slot0).public_inputs[0:32])
    b.register_public_inputs(pt_of(ep_slot1).public_inputs[0:32])

    agg_data = b.build()
    inputs: dict = {}
    seen = set()
    for d, p in component:
        if id(p) in seen:
            continue
        seen.add(id(p))
        RecursiveVerifier.set_proof_targets(pts[id(p)], p, inputs)

    if check_only:
        from ..plonk.testing import check_constraints
        wr = generate_witness(agg_data, inputs)
        check_constraints(agg_data, wr)
        got = [int(wr.get(t)) for t in agg_data.public_input_targets]
        return BftProof(None, None, got, check)

    from ..plonk import checkpoint
    agg_proof = checkpoint.prove(ckpt_key, agg_data, inputs)
    return BftProof(agg_data, agg_proof,
                    [int(x) for x in agg_proof.public_inputs], check)


def _check_stored_hashes(epoch_blocks):
    """utils.rs:340-355: the _STORED trusted hash of each epoch block must
    match its recomputed header hash."""
    for stored, hdr in epoch_blocks:
        if stored is not None and bytes(stored) != bytes(hdr.hash):
            raise ValueError(
                f"stored trusted hash mismatch for epoch block at height "
                f"{hdr.height}")


def prove_block_bft(epoch_blocks: list, blocks: list, validators: list,
                    dev_mode: bool = False, check_only: bool = False,
                    mode: str = "random", bind_bp_hash: bool = True,
                    validators_n_1: list | None = None, sig_client=None):
    """Random mode — blocks: [B_i+4 .. B_i] (5 headers, utils.set_blocks
    order); epoch_blocks: [(stored_hash, Block_0(E-1)),
    (stored_hash, Block_n-1(E-2))]; returns BftProof for B_i.

    Epoch mode (bft.rs:394-559) — blocks: [B_4 .. B_0 of E_i,
    Block_n-1(E_i-1)] (6 headers); epoch_blocks additionally carries
    (stored_hash, Block_n-1(E_i-3)) in slot 2; `validators` is E_i's
    producer set (signs B_0), `validators_n_1` is E_i-1's (signs B_n-1).
    Returns (BftProof for Block_0(E_i), BftProof for Block_n-1(E_i-1)).

    check_only: build the aggregation circuit(s), generate witnesses and
    check constraints without producing the outer FRI proofs (fast path for
    CPU tests; the full prove is the TPU path).

    bind_bp_hash (default ON, matching header_bphash.rs:125 +
    block_finality.rs:347-370): the keys_stakes circuit computes
    sha256(u32-LE count || borsh(validators)) in-circuit and the
    aggregation connects that digest to the next_bp_hash PIs of the slot-1
    epoch header proof, so the validator lists MUST be the full
    block-producer sets.  Only tests that substitute a stake-dominant
    validator subset may disable it.
    """
    _check_stored_hashes(epoch_blocks)
    prove_hdr = prove_header_dev if dev_mode else prove_header

    if mode == "epoch":
        assert len(blocks) == 6 and len(epoch_blocks) >= 3
        assert validators_n_1 is not None, \
            "epoch mode needs the E_i-1 validator set for Block_n-1"
    else:
        assert len(blocks) == 5

    # headers for the 5-block window (B_4..B_0 / B_i+4..B_i)
    hdr = [prove_hdr(h, "finality") for h in blocks[:5]]
    ep_hdr = [prove_hdr(eb[1], "epoch") for eb in epoch_blocks]

    # target A: B_i (random) / Block_0(E_i) (epoch) = blocks[4]
    b_t, b_next = blocks[4], blocks[3]
    msg, sig, ks, check, borsh = _prove_sig_and_keys(
        b_t, b_next, validators, dev_mode, bind_bp_hash,
        sig_client=sig_client)
    tag = TAG_EPOCH if mode == "epoch" else TAG_RANDOM
    from .types import b58encode
    res_a = _aggregate_target(
        target_hdr=hdr[4], ds_hdr=hdr[3], final_hdr=hdr[2],
        chain_hdrs=hdr, ep_slot0=ep_hdr[1], ep_slot1=ep_hdr[0],
        sig=sig, ks=ks, msg=msg, check=check, borsh=borsh,
        tag=tag, bind_bp_hash=bind_bp_hash, check_only=check_only,
        ckpt_key=f"agg_{b58encode(b_t.hash)}_{tag}")
    expected_a = [tag] + list(b_t.hash) + \
        list(epoch_blocks[1][1].hash) + list(epoch_blocks[0][1].hash)
    if check_only:
        assert res_a.public_inputs == expected_a, "final PI mismatch (A)"
    if mode != "epoch":
        return res_a

    # target B: Block_n-1(E_i-1) = blocks[5] (bft.rs:470-559): approvals on
    # B_0's header endorse it; links prev_hash(B_0)==hash(B_n-1),
    # last_ds(B_0)==hash(B_n-1), last_final(B_1)==hash(B_n-1); epoch_id ==
    # hash(Block_n-1(E_i-3)); validator digest == next_bp_hash of
    # Block_n-1(E_i-2).
    bn1 = blocks[5]
    hdr_bn1 = prove_hdr(bn1, "finality")
    msg_b, sig_b, ks_b, check_b, borsh_b = _prove_sig_and_keys(
        bn1, blocks[4], validators_n_1, dev_mode, bind_bp_hash,
        sig_client=sig_client)
    res_b = _aggregate_target(
        target_hdr=hdr_bn1, ds_hdr=hdr[4], final_hdr=hdr[3],
        chain_hdrs=[], ep_slot0=ep_hdr[2], ep_slot1=ep_hdr[1],
        sig=sig_b, ks=ks_b, msg=msg_b, check=check_b, borsh=borsh_b,
        tag=TAG_EPOCH, bind_bp_hash=bind_bp_hash, check_only=check_only,
        boundary_prev=True,
        ckpt_key=f"agg_{b58encode(bn1.hash)}_{TAG_EPOCH}")
    expected_b = [TAG_EPOCH] + list(bn1.hash) + \
        list(epoch_blocks[2][1].hash) + list(epoch_blocks[1][1].hash)
    if check_only:
        assert res_b.public_inputs == expected_b, "final PI mismatch (B)"
    return res_a, res_b
