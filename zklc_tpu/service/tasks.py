"""Task/result contracts for distributed signature proving.

Byte-compatible JSON schemas of the reference's NATS messages
(near_bft_finality/src/types.rs:172-192 `InputTask` / `OutputTask`): proofs
cross process boundaries as serialized bytes and are reassembled on the
coordinator.  Transport here is pluggable (in-process asyncio queue by
default; any at-least-once queue can carry these dicts).
"""
from __future__ import annotations

import base64
import json
from dataclasses import dataclass, asdict


@dataclass
class InputTask:
    """types.rs:172 — one signature-proving work item."""
    message: bytes
    approval: bytes
    validator: bytes          # borsh validator row (pk + stake inside)
    signature_index: int

    def to_json(self) -> str:
        d = asdict(self)
        for k in ("message", "approval", "validator"):
            d[k] = base64.b64encode(d[k]).decode()
        return json.dumps(d)

    @staticmethod
    def from_json(s: str) -> "InputTask":
        d = json.loads(s)
        return InputTask(
            message=base64.b64decode(d["message"]),
            approval=base64.b64decode(d["approval"]),
            validator=base64.b64decode(d["validator"]),
            signature_index=int(d["signature_index"]))


@dataclass
class OutputTask:
    """types.rs:183 — a finished signature proof."""
    proof: bytes              # serialized proof JSON (plonk/serialization.py)
    verifier_data: bytes
    signature_index: int

    def to_json(self) -> str:
        return json.dumps({
            "proof": base64.b64encode(self.proof).decode(),
            "verifier_data": base64.b64encode(self.verifier_data).decode(),
            "signature_index": self.signature_index,
        })

    @staticmethod
    def from_json(s: str) -> "OutputTask":
        d = json.loads(s)
        return OutputTask(
            proof=base64.b64decode(d["proof"]),
            verifier_data=base64.b64decode(d["verifier_data"]),
            signature_index=int(d["signature_index"]))


# Queue subject names (docker-compose topology, SURVEY.md §2.7)
PROVE_SIGNATURE = "PROVE_SIGNATURE"
PROCESS_SIGNATURE_RESULT = "PROCESS_SIGNATURE_RESULT"
PROVE_RANDOM = "PROVE_RANDOM"
RANDOM_PROVING_RESULT = "RANDOM_PROVING_RESULT"
