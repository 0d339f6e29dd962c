"""Fixture / RPC IO layer (equivalent of near_bft_finality/src/utils.rs).

Loads the reference's checked-in mainnet fixtures (data/epochs/<epoch_id>/
{block-0..4,block-last,random-0..4,validators}.json plus <epoch_id>_STORED
hash folders) — the byte-exactness test vectors for this framework
(SURVEY.md §2.9 "fixtures").  RPC loading mirrors utils.rs:78-143 but is
gated behind env config (zero-egress environments skip it).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

from .types import (BlockHeader, load_block_header, decode_hash,
                    decode_public_key, serialize_validator_stake, b58decode)

DEFAULT_DATA_DIR = "/root/reference/data"


@dataclass
class Validator:
    account_id: str
    public_key: bytes      # borsh: tag + 32
    stake: int

    def serialize(self) -> bytes:
        """borsh(ValidatorStake::V1) — the layout hashed into next_bp_hash."""
        from .types import _string, _u128
        return b"\x00" + _string(self.account_id) + self.public_key + \
            _u128(self.stake)


def load_block_hash(path: str) -> bytes:
    """utils.rs:36: the _STORED folders hold bare base58 hash strings."""
    with open(path) as f:
        return decode_hash(json.load(f))


def load_validators(path: str) -> list[Validator]:
    """utils.rs:209: validators.json -> ordered validator list."""
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, dict) and "result" in raw:
        raw = raw["result"]
    out = []
    for v in raw:
        out.append(Validator(
            account_id=v["account_id"],
            public_key=decode_public_key(v["public_key"]),
            stake=int(v["stake"]),
        ))
    return out


def epoch_dir(epoch_id: str, data_dir: str = DEFAULT_DATA_DIR) -> str:
    return os.path.join(data_dir, "epochs", epoch_id)


def load_epoch_block(epoch_id: str, name: str,
                     data_dir: str = DEFAULT_DATA_DIR) -> BlockHeader:
    return load_block_header(os.path.join(epoch_dir(epoch_id, data_dir),
                                          f"{name}.json"))


def load_stored_hash(epoch_id: str, name: str,
                     data_dir: str = DEFAULT_DATA_DIR) -> bytes:
    return load_block_hash(os.path.join(data_dir, "epochs",
                                        epoch_id + "_STORED", f"{name}.json"))


def set_blocks(epoch_id_i: str, epoch_id_i_1: str, epoch_id_i_2: str,
               epoch_id_i_3: str | None = None,
               data_dir: str = DEFAULT_DATA_DIR):
    """utils.rs:318 `set_blocks`: returns (epoch_blocks, blocks).

    epoch_blocks: [(stored_hash, BlockHeader)] for Block_0(E_i-1),
    Block_n-1(E_i-2) [, Block_n-1(E_i-3) in epoch mode].
    blocks: five consecutive headers [B_i+4 .. B_i] (+ Block_n-1 last in
    epoch mode), from `block-*` (epoch mode) or `random-*` files.
    """
    epoch_blocks = []
    epoch_blocks.append((load_stored_hash(epoch_id_i_1, "block-0", data_dir),
                         load_epoch_block(epoch_id_i_1, "block-0", data_dir)))
    epoch_blocks.append((load_stored_hash(epoch_id_i_2, "block-last", data_dir),
                         load_epoch_block(epoch_id_i_2, "block-last", data_dir)))
    if epoch_id_i_3 is not None:
        epoch_blocks.append(
            (load_stored_hash(epoch_id_i_3, "block-last", data_dir),
             load_epoch_block(epoch_id_i_3, "block-last", data_dir)))
    prefix = "block" if epoch_id_i_3 is not None else "random"
    blocks = [load_epoch_block(epoch_id_i, f"{prefix}-{4 - i}", data_dir)
              for i in range(5)]
    if epoch_id_i_3 is not None:
        # the sixth block is Block_n-1(E_i-1) — utils.rs:415-420
        blocks.append(load_epoch_block(epoch_id_i_1, "block-last", data_dir))
    return epoch_blocks, blocks


def ordered_epochs(data_dir: str = DEFAULT_DATA_DIR) -> list[str]:
    """Epoch ids in CHAIN order (ascending block-0 height) — set_blocks
    wants (E_i, E_i-1, E_i-2); directory listing order is alphabetical and
    the BFT linking circuit rejects mis-ordered epochs."""
    out = []
    for e in list_epochs(data_dir):
        try:
            out.append((load_epoch_block(e, "block-0", data_dir).height, e))
        except OSError:
            continue
    return [e for _, e in sorted(out)]


def list_epochs(data_dir: str = DEFAULT_DATA_DIR) -> list[str]:
    root = os.path.join(data_dir, "epochs")
    return sorted(d for d in os.listdir(root) if not d.endswith("_STORED"))
