"""NEAR block-header byte layouts (borsh), re-derived from scratch.

The reference leans on the `near-primitives` crate
(near_bft_finality/src/types.rs:7-21 layout constants;
utils.rs:53 `BlockHeader::from(BlockHeaderView)` + borsh).  Here the borsh
layout is re-implemented directly and validated against the fixtures: the
recomputed header hash must equal the `hash` field of every checked-in
header JSON (data/*.json, data/epochs/*) — byte-exactness by construction.

Header hash rule: sha256( sha256(inner_lite) || sha256(inner_rest) ) folded
with prev_hash: hash = sha256(inner_hash || prev_hash).

Layout constants (types.rs):
  TYPE_BYTE=1, PROTOCOL_VERSION_BYTES=4, BLOCK_HEIGHT_BYTES=8,
  STAKE_BYTES=16, PK_HASH_BYTES=32, SIG_BYTES=64, INNER_LITE_BYTES=208,
  EPOCH_DURATION=43200.
"""
from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass

TYPE_BYTE = 1
PROTOCOL_VERSION_BYTES = 4
BLOCK_HEIGHT_BYTES = 8
STAKE_BYTES = 16
PK_HASH_BYTES = 32
SIG_BYTES = 64
INNER_LITE_BYTES = 208
EPOCH_DURATION = 43200

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def b58decode(s: str) -> bytes:
    num = 0
    for ch in s:
        num = num * 58 + _B58_INDEX[ch]
    raw = num.to_bytes((num.bit_length() + 7) // 8, "big") if num else b""
    pad = 0
    for ch in s:
        if ch == "1":
            pad += 1
        else:
            break
    return b"\x00" * pad + raw


def b58encode(data: bytes) -> str:
    num = int.from_bytes(data, "big")
    out = ""
    while num:
        num, rem = divmod(num, 58)
        out = _B58_ALPHABET[rem] + out
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + out


def decode_hash(s: str) -> bytes:
    out = b58decode(s)
    assert len(out) == 32, f"hash {s!r} decodes to {len(out)} bytes"
    return out


def decode_signature(s: str) -> bytes:
    """'ed25519:<b58>' -> borsh bytes: tag 0 + 64 bytes."""
    kind, _, payload = s.partition(":")
    assert kind == "ed25519", f"unsupported signature type {kind}"
    raw = b58decode(payload)
    assert len(raw) == 64
    return b"\x00" + raw


def decode_public_key(s: str) -> bytes:
    kind, _, payload = s.partition(":")
    assert kind == "ed25519", f"unsupported key type {kind}"
    raw = b58decode(payload)
    assert len(raw) == 32
    return b"\x00" + raw


def _u32(v: int) -> bytes:
    return int(v).to_bytes(4, "little")


def _u64(v: int) -> bytes:
    return int(v).to_bytes(8, "little")


def _u128(v: int) -> bytes:
    return int(v).to_bytes(16, "little")


def _vec(items: list[bytes]) -> bytes:
    return _u32(len(items)) + b"".join(items)


def _option(b: bytes | None) -> bytes:
    return b"\x00" if b is None else b"\x01" + b


def _string(s: str) -> bytes:
    raw = s.encode()
    return _u32(len(raw)) + raw


def serialize_validator_stake(account_id: str, public_key: str,
                              stake: int) -> bytes:
    """borsh(ValidatorStake::V1): enum tag 0 + account_id + pk + stake u128
    (reference: near-primitives ValidatorStakeView -> ValidatorStake)."""
    return b"\x00" + _string(account_id) + decode_public_key(public_key) + \
        _u128(stake)


@dataclass
class BlockHeader:
    """Parsed header with byte-level borsh pieces."""
    hash: bytes
    prev_hash: bytes
    inner_lite: bytes
    inner_rest: bytes
    signature: bytes      # borsh: tag + 64
    version_tag: int      # borsh enum tag of the BlockHeader variant
    view: dict            # raw JSON fields

    @property
    def height(self) -> int:
        return int(self.view["height"])

    @property
    def epoch_id(self) -> bytes:
        return decode_hash(self.view["epoch_id"])

    @property
    def next_epoch_id(self) -> bytes:
        return decode_hash(self.view["next_epoch_id"])

    @property
    def next_bp_hash(self) -> bytes:
        return decode_hash(self.view["next_bp_hash"])

    @property
    def last_final_block(self) -> bytes:
        return decode_hash(self.view["last_final_block"])

    @property
    def last_ds_final_block(self) -> bytes:
        return decode_hash(self.view["last_ds_final_block"])

    @property
    def approvals(self) -> list[bytes | None]:
        out = []
        for a in self.view["approvals"]:
            out.append(None if a is None else decode_signature(a))
        return out

    def full_bytes(self) -> bytes:
        """borsh(BlockHeader): [tag][prev_hash][inner_lite][inner_rest][sig]"""
        return bytes([self.version_tag]) + self.prev_hash + self.inner_lite \
            + self.inner_rest + self.signature

    def computed_hash(self) -> bytes:
        inner = hashlib.sha256(
            hashlib.sha256(self.inner_lite).digest()
            + hashlib.sha256(self.inner_rest).digest()).digest()
        return hashlib.sha256(inner + self.prev_hash).digest()


def serialize_inner_lite(v: dict) -> bytes:
    """BlockHeaderInnerLite: height, epoch_id, next_epoch_id,
    prev_state_root, outcome_root, timestamp, next_bp_hash,
    block_merkle_root  (8 + 6*32 + 8 = 208 bytes)."""
    out = _u64(v["height"])
    out += decode_hash(v["epoch_id"])
    out += decode_hash(v["next_epoch_id"])
    out += decode_hash(v["prev_state_root"])
    out += decode_hash(v["outcome_root"])
    out += _u64(int(v.get("timestamp_nanosec", v["timestamp"])))
    out += decode_hash(v["next_bp_hash"])
    out += decode_hash(v["block_merkle_root"])
    assert len(out) == INNER_LITE_BYTES
    return out


def serialize_inner_rest(v: dict) -> tuple[bytes, int]:
    """BlockHeaderInnerRest V3/V4 borsh; returns (bytes, header_version_tag).

    V4 (has block_body_hash; protocol >= 63-era headers) prepends
    block_body_hash; otherwise V3.  Enum tags: V1=0, V2=1, V3=2, V4=3.
    """
    has_body_hash = v.get("block_body_hash") is not None
    out = b""
    if has_body_hash:
        out += decode_hash(v["block_body_hash"])
    out += decode_hash(v["chunk_receipts_root"])
    out += decode_hash(v["chunk_headers_root"])
    out += decode_hash(v["chunk_tx_root"])
    out += decode_hash(v["challenges_root"])
    out += decode_hash(v["random_value"])
    out += _vec([serialize_validator_stake(p["account_id"], p["public_key"],
                                           int(p["stake"]))
                 for p in v.get("validator_proposals", [])])
    out += _vec([b"\x01" if m else b"\x00" for m in v["chunk_mask"]])
    out += _u128(int(v["gas_price"]))
    out += _u128(int(v["total_supply"]))
    out += _vec([])  # challenges_result (always empty in practice)
    assert v.get("challenges_result", []) == []
    out += decode_hash(v["last_final_block"])
    out += decode_hash(v["last_ds_final_block"])
    out += _u64(v["block_ordinal"])
    out += _u64(v["prev_height"])
    esd = v.get("epoch_sync_data_hash")
    out += _option(None if esd is None else decode_hash(esd))
    out += _vec([_option(None if a is None else decode_signature(a))
                 for a in v["approvals"]])
    out += _u32(v["latest_protocol_version"])
    return out, (3 if has_body_hash else 2)


def header_from_view(view: dict) -> BlockHeader:
    inner_lite = serialize_inner_lite(view)
    inner_rest, tag = serialize_inner_rest(view)
    h = BlockHeader(
        hash=decode_hash(view["hash"]),
        prev_hash=decode_hash(view["prev_hash"]),
        inner_lite=inner_lite,
        inner_rest=inner_rest,
        signature=decode_signature(view["signature"]),
        version_tag=tag,
        view=view,
    )
    return h


def load_block_header(path: str) -> BlockHeader:
    """Equivalent of near_bft_finality/src/utils.rs:53."""
    with open(path) as f:
        view = json.load(f)
    if "result" in view:
        view = view["result"]
    if "header" in view:
        view = view["header"]
    return header_from_view(view)
