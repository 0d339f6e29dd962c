"""NEAR header-hash circuit: the whole hash DAG in ONE proof.

NEAR block hash = sha256(sha256(sha256(inner_lite) || sha256(inner_rest))
                          || prev_hash).

The reference builds this from four separate proofs glued by three recursive
aggregations (near_bft_finality/src/prove_block_data/header_bphash.rs:34-108,
via prove_crypto/sha256.rs:105 `prove_sub_hashes_u32`).  TPU-first redesign:
one circuit computes all four hashes with digest limbs wired directly into
the next hash's input words — no recursion needed at this level, ~4x less
proving work, and (unlike the reference, which re-registers host-supplied
PIs via recursion — block_finality.rs:118-154) every public input here is
BOUND in-circuit to the actual header bytes.

Public-input layout mirrors prove_block_header (block_finality.rs:118-154),
all values as byte field elements:
  finality mode: hash(32) | height(8 LE) | epoch_id(32) | prev_hash(32)
                 | last_ds_final(32) | last_final(32)
  epoch mode:    hash(32) | next_bp_hash(32) | next_epoch_id(32)

inner_lite layout (types.rs:7-21 consts; borsh BlockHeaderInnerLite):
  height u64 LE @0 | epoch_id @8 | next_epoch_id @40 | prev_state_root @72
  | outcome_root @104 | timestamp @136 | next_bp_hash @144
  | block_merkle_root @176   (total 208)
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from ..plonk.config import CircuitConfig
from ..gadgets.sha256 import Sha256Ops, HashInputTarget
from .types import INNER_LITE_BYTES

HEIGHT_OFF = 0
EPOCH_ID_OFF = 8
NEXT_EPOCH_ID_OFF = 40
NEXT_BP_HASH_OFF = 144

# inner_rest SHA-block bucket granularity (SURVEY.md §7.4.6 shape
# bucketing): headers with block counts in the same bucket share ONE
# circuit — one witness-tape compile and one XLA kernel set per bucket
# instead of per block.
REST_BUCKET_BLOCKS = 16


@dataclass
class HeaderHashTargets:
    lite_input: HashInputTarget
    rest_input: HashInputTarget
    prev_hash_limbs: list          # 8 u32 targets (BE words of prev_hash)
    hash_limbs: list               # 8 u32 targets (the block hash digest)
    mode: str
    rest_len: int                  # capacity in bytes (bucketed circuits)
    sel_bits: list = None          # one-hot block-count selector (bucketed)


class _ByteCache:
    """Per-word byte extraction with memoization (split once per word)."""

    def __init__(self, b: CircuitBuilder):
        self.b = b
        self.cache: dict[int, list[int]] = {}

    def bytes_be(self, word_t: int) -> list[int]:
        """u32 target -> [b0, b1, b2, b3] byte targets, big-endian order."""
        if word_t in self.cache:
            return self.cache[word_t]
        b = self.b
        bits = b.split_le(word_t, 32)
        out = []
        for k in range(4):          # byte k (BE) = bits 24-8k .. 31-8k
            lo_bit = 8 * (3 - k)
            out.append(b.le_sum(bits[lo_bit: lo_bit + 8]))
        self.cache[word_t] = out
        return out


def _message_bytes(bc: _ByteCache, words: list[int], start: int,
                   length: int) -> list[int]:
    """Byte targets [start, start+length) of a BE-word message."""
    out = []
    for off in range(start, start + length):
        w = words[off // 4]
        out.append(bc.bytes_be(w)[off % 4])
    return out


def build_header_hash_circuit(rest_len: int, mode: str = "finality",
                              last_ds_off: int | None = None,
                              last_final_off: int | None = None,
                              config: CircuitConfig | None = None,
                              variable_rest: bool = False):
    """Returns (builder-built ProverData, HeaderHashTargets).

    mode "finality" requires the inner_rest byte offsets of last_final_block
    / last_ds_final_block (they sit after variable-length vectors, so they
    are build-time parameters — circuits are cached per shape, the same
    bucketing as the reference's per-length circuit cache, ed25519.rs:18).

    variable_rest: rest_len is a bucket CAPACITY; the circuit hashes a
    witness-selected number of blocks (hash_sha256_variable), so one
    circuit serves every header whose padded inner_rest fits the bucket.
    """
    b = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    sha = Sha256Ops(b)
    bc = _ByteCache(b)

    lite_blocks = Sha256Ops.num_blocks_for(INNER_LITE_BYTES)
    rest_blocks = Sha256Ops.num_blocks_for(rest_len)
    lite_in = sha.add_virtual_hash_input_target(lite_blocks)
    rest_in = sha.add_virtual_hash_input_target(rest_blocks)
    prev_limbs = sha.add_virtual_hash256_target()

    h_lite = sha.hash_sha256(lite_in)
    sel_bits = None
    if variable_rest:
        h_rest, sel_bits = sha.hash_sha256_variable(rest_in)
    else:
        h_rest = sha.hash_sha256(rest_in)
    inner = sha.two_to_one_sha256(h_lite.limbs, h_rest.limbs)
    hash_limbs = sha.two_to_one_sha256(inner, prev_limbs)

    # public inputs — bytes, in the reference's prove_block_header order
    pis: list[int] = []
    for limb in hash_limbs:
        pis += bc.bytes_be(limb)
    lite_words = lite_in.input.limbs
    if mode == "finality":
        pis += _message_bytes(bc, lite_words, HEIGHT_OFF, 8)
        pis += _message_bytes(bc, lite_words, EPOCH_ID_OFF, 32)
        for limb in prev_limbs:
            pis += bc.bytes_be(limb)
        assert last_ds_off is not None and last_final_off is not None
        rest_words = rest_in.input.limbs
        pis += _message_bytes(bc, rest_words, last_ds_off, 32)
        pis += _message_bytes(bc, rest_words, last_final_off, 32)
    elif mode == "epoch":
        pis += _message_bytes(bc, lite_words, NEXT_BP_HASH_OFF, 32)
        pis += _message_bytes(bc, lite_words, NEXT_EPOCH_ID_OFF, 32)
    else:
        raise ValueError(mode)
    b.register_public_inputs(pis)

    data = b.build()
    targets = HeaderHashTargets(
        lite_input=lite_in, rest_input=rest_in, prev_hash_limbs=prev_limbs,
        hash_limbs=hash_limbs, mode=mode, rest_len=rest_len,
        sel_bits=sel_bits)
    return data, targets


_bucket_cache: dict = {}


def rest_bucket_bytes(rest_len: int) -> int:
    """Bucket capacity in message bytes: the largest length whose padded
    block count equals the bucketed count."""
    blocks = Sha256Ops.num_blocks_for(rest_len)
    bucket = ((blocks + REST_BUCKET_BLOCKS - 1)
              // REST_BUCKET_BLOCKS) * REST_BUCKET_BLOCKS
    return bucket * 64 - 9     # max bytes fitting bucket blocks w/ padding


def get_header_circuit(header, mode: str = "finality"):
    """Build-once bucketed circuit for a header's shape class:
    key = (rest-block bucket, mode, last_ds/last_final offsets)."""
    if mode == "finality":
        lds, lf = rest_field_offsets(header)
    else:
        lds = lf = None
    cap = rest_bucket_bytes(len(header.inner_rest))
    key = (cap, mode, lds, lf)
    if key not in _bucket_cache:
        _bucket_cache[key] = build_header_hash_circuit(
            cap, mode, last_ds_off=lds, last_final_off=lf,
            variable_rest=True)
    return _bucket_cache[key]


def rest_field_offsets(header) -> tuple[int, int]:
    """(last_ds_off, last_final_off) inside a header's inner_rest bytes.

    borsh layout (types.py serialize_inner_rest): last_final_block then
    last_ds_final_block sit right before block_ordinal; locate them by
    scanning for the known byte values (unambiguous for 32-byte hashes)."""
    rest = header.inner_rest
    lf = header.last_final_block
    lds = header.last_ds_final_block
    lf_off = rest.index(lf)
    lds_off = rest.index(lds, lf_off + 32 - 4) if lds != lf else lf_off + 32
    # canonical layout: last_final immediately followed by last_ds_final
    assert lds_off == lf_off + 32, "unexpected inner_rest layout"
    return lds_off, lf_off


def set_header_hash_inputs(targets: HeaderHashTargets, header, inputs: dict):
    """Witness assignment from a parsed BlockHeader (near/types.py)."""
    sha_dummy = Sha256Ops.__new__(Sha256Ops)  # only static methods used
    lite_words = Sha256Ops.sha256_pad_words(
        header.inner_lite, targets.lite_input.input_bits)
    for t, w in zip(targets.lite_input.input.limbs, lite_words):
        inputs[t] = np.uint64(w)
    if targets.sel_bits is None:
        rest_words = Sha256Ops.sha256_pad_words(
            header.inner_rest, targets.rest_input.input_bits)
    else:
        blocks = Sha256Ops.num_blocks_for(len(header.inner_rest))
        rest_words = Sha256Ops.sha256_pad_words(
            header.inner_rest, blocks * 512)
        rest_words += [0] * (targets.rest_input.input_bits // 32
                             - len(rest_words))
        for j, t in enumerate(targets.sel_bits):
            inputs[t] = np.uint64(1 if j + 1 == blocks else 0)
    for t, w in zip(targets.rest_input.input.limbs, rest_words):
        inputs[t] = np.uint64(w)
    for i, t in enumerate(targets.prev_hash_limbs):
        inputs[t] = np.uint64(
            int.from_bytes(header.prev_hash[4 * i: 4 * i + 4], "big"))


def expected_public_inputs(header, mode: str = "finality") -> list[int]:
    """Verifier-side expected PI byte vector."""
    out = list(header.hash)
    if mode == "finality":
        out += list(header.height.to_bytes(8, "little"))
        out += list(header.epoch_id)
        out += list(header.prev_hash)
        out += list(header.last_ds_final_block)
        out += list(header.last_final_block)
    else:
        out += list(header.next_bp_hash)
        out += list(header.next_epoch_id)
    return out
