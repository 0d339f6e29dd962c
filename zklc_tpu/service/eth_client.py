"""Ethereum submission edge: ABI encoding + checkpoint client.

The equivalent of backend/src/eth-helper.ts:384-470
(`getLatestCheckpointFromContract`, `getEpochHashesByHeight`,
`saveEpochHashesAndSetCheckpoint`, `executeProofSaving`): real calldata
ABI encoding against the deployed interface
(contracts/NearBlockVerification.sol), with the TRANSPORT pluggable —
this environment has no egress, so the default transport decodes calldata
and dispatches to the behavioral-twin contract model
(wrap/contracts_model.NearBlockVerificationModel), closing the round trip
calldata -> decode -> contract semantics -> storage reads the reference
exercises against Sepolia.  A JSON-RPC transport drops in by implementing
`call(data) / send(data)`.
"""
from __future__ import annotations

from dataclasses import dataclass

from ..utils.keccak import keccak256
from ..near.types import b58decode, b58encode


# -- minimal ABI codec --------------------------------------------------------

def selector(sig: str) -> bytes:
    return keccak256(sig.encode())[:4]


def enc_uint(v: int) -> bytes:
    return int(v).to_bytes(32, "big")


def enc_uint_array_static(vals) -> bytes:
    return b"".join(enc_uint(v) for v in vals)


def enc_bytes(b: bytes) -> bytes:
    """Dynamic `bytes` tail: length + right-padded data."""
    pad = (-len(b)) % 32
    return enc_uint(len(b)) + b + b"\x00" * pad


def encode_call(sig: str, static_parts: list, dynamic_parts: list) -> bytes:
    """Head/tail encoding: static_parts are (encoded_bytes | None) in
    argument order, None marking a dynamic slot filled from dynamic_parts
    in order."""
    heads, tails = [], []
    n_head = sum(32 if p is None else len(p) for p in static_parts)
    offset = n_head
    di = 0
    for p in static_parts:
        if p is None:
            heads.append(enc_uint(offset))
            tail = dynamic_parts[di]
            di += 1
            tails.append(tail)
            offset += len(tail)
        else:
            heads.append(p)
    return selector(sig) + b"".join(heads) + b"".join(tails)


def dec_uint(data: bytes, slot: int = 0) -> int:
    return int.from_bytes(data[32 * slot:32 * (slot + 1)], "big")


def dec_bytes(data: bytes, head_slot: int) -> bytes:
    off = dec_uint(data, head_slot)
    ln = int.from_bytes(data[off:off + 32], "big")
    return data[off + 32: off + 32 + ln]


# -- calldata builders for the deployed interface -----------------------------

SIG_VERIFY_AND_SAVE = "verifyAndSaveProof(uint256[4],uint256[8])"
SIG_SAVE_EPOCH = "saveEpochHashesAndSetCheckpoint(bytes,bytes,uint256)"
SIG_GET_CHECKPOINT = "getLatestCheckpoint()"
SIG_GET_EPOCH_HASHES = "getEpochHashesByHeight(uint256)"
SIG_IS_PROOFED_HASH = "isProofedHash(bytes)"


def calldata_verify_and_save(input4: list, proof8: list) -> bytes:
    return encode_call(SIG_VERIFY_AND_SAVE,
                       [enc_uint_array_static(input4),
                        enc_uint_array_static(proof8)], [])


def calldata_save_epoch(prev_hash: bytes, cur_hash: bytes,
                        height: int) -> bytes:
    return encode_call(SIG_SAVE_EPOCH, [None, None, enc_uint(height)],
                       [enc_bytes(prev_hash), enc_bytes(cur_hash)])


def calldata_is_proofed_hash(h: bytes) -> bytes:
    return encode_call(SIG_IS_PROOFED_HASH, [None], [enc_bytes(h)])


# -- transports ---------------------------------------------------------------

class ModelTransport:
    """Offline node: decodes calldata and runs the behavioral twin —
    the send/call surface of web3.eth.sendSignedTransaction/call."""

    def __init__(self, model, sender: str = "owner"):
        self.model = model
        self.sender = sender

    def send(self, data: bytes) -> dict:
        sel, args = data[:4], data[4:]
        if sel == selector(SIG_VERIFY_AND_SAVE):
            input4 = [dec_uint(args, i) for i in range(4)]
            proof8 = [dec_uint(args, 4 + i) for i in range(8)]
            self.model.verify_and_save_proof(input4, proof8)
            return {"status": 1}
        if sel == selector(SIG_SAVE_EPOCH):
            prev = dec_bytes(args, 0)
            cur = dec_bytes(args, 1)
            height = dec_uint(args, 2)
            self.model.save_epoch_hashes_and_set_checkpoint(
                height, (prev, cur), sender=self.sender)
            return {"status": 1}
        raise ValueError(f"unknown selector {sel.hex()}")

    def call(self, data: bytes) -> bytes:
        sel, args = data[:4], data[4:]
        if sel == selector(SIG_GET_CHECKPOINT):
            return enc_uint(self.model.latest_checkpoint)
        if sel == selector(SIG_GET_EPOCH_HASHES):
            height = dec_uint(args, 0)
            prev, cur = self.model.get_epoch_hashes_by_height(height)
            ep = enc_bytes(prev)
            return enc_uint(64) + enc_uint(64 + len(ep)) + ep \
                + enc_bytes(cur)
        if sel == selector(SIG_IS_PROOFED_HASH):
            h = dec_bytes(args, 0)
            return enc_uint(1 if self.model.is_proofed_hash(h) else 0)
        raise ValueError(f"unknown selector {sel.hex()}")


# -- the helper (eth-helper.ts surface) ---------------------------------------

@dataclass
class EthHelper:
    transport: object

    def get_latest_checkpoint(self) -> int:
        """eth-helper.ts:384 getLatestCheckpointFromContract."""
        out = self.transport.call(selector(SIG_GET_CHECKPOINT))
        return dec_uint(out)

    def get_epoch_hashes_by_height(self, height: int):
        """eth-helper.ts:396 — returns base58 pair like the reference."""
        out = self.transport.call(
            encode_call(SIG_GET_EPOCH_HASHES, [enc_uint(height)], []))
        prev = dec_bytes(out, 0)
        cur = dec_bytes(out, 1)
        return b58encode(prev), b58encode(cur)

    def save_epoch_hashes_and_set_checkpoint(self, prev_b58: str,
                                             cur_b58: str, height: int):
        """eth-helper.ts:420 — base58 in, hex calldata out."""
        data = calldata_save_epoch(b58decode(prev_b58), b58decode(cur_b58),
                                   height)
        return self.transport.send(data)

    def execute_proof_saving(self, input4: list, proof8: list):
        """eth-helper.ts:451 executeProofSaving."""
        return self.transport.send(calldata_verify_and_save(input4, proof8))

    def is_proofed_hash(self, block_hash: bytes) -> bool:
        out = self.transport.call(calldata_is_proofed_hash(block_hash))
        return dec_uint(out) == 1
