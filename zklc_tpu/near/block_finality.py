"""Block-finality statement helpers: approval-message word binding.

The reference's `prove_block_finality` (near_bft_finality/src/prove_bft/
block_finality.rs:200) glues component proofs with ~10 sequential recursive
folds and links statements through re-registered hash PIs.  This framework
expresses the whole statement as ONE aggregation circuit — `bft.py:
prove_block_bft` — that verifies the component proofs and CONNECTS the
related public-input wires directly:

  * signed message bytes <-> header hash/height bytes (the approval message
    for B_i is Endorsement(B_i hash) || height(B_i)+1, signatures.rs:24);
  * each signature leaf's pk transcript words <-> keys_stakes valid_keys pk
    bytes (replaces the reference's sha256(valid_keys) digest link);
  * keys_stakes bp_hash digest <-> Block_0(E-1) next_bp_hash PIs
    (header_bphash.rs:125 / block_finality.rs:347-370);
  * header epoch_id bytes <-> epoch-block hash bytes (replaces
    prove_eq_array aggregation folds, block_finality.rs:325).

This module holds the byte/word plumbing those links share.  The EdDSA leaf
transcript is SHA-512(R || A || M): padded words [hi, lo] are leaf PIs, so
word 4..7 carry the signer pk and words 8.. carry the approval message.
"""
from __future__ import annotations

from ..plonk.builder import CircuitBuilder


def _pack_word_be(b: CircuitBuilder, byte_targets):
    """4 byte targets -> u32 word target (BE), plain arithmetic."""
    acc = b.zero()
    for byte in byte_targets:
        acc = b.arithmetic(256, 1, acc, b.one(), byte)
    return acc


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
