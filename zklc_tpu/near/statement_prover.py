"""Receipt-producing backend for the second implementation.

The reference ships a SECOND proving stack: a risc0 zkVM guest whose host
emits a receipt — journal (ABI-encoded public values) + seal (Groth16
proof of guest execution) — and serves it over a proving service
(near_risc0/host/src/service.rs:60-86, host/src/bin/proving_server.rs:36).
Its tests run with RISC0_DEV_MODE=1 (host/tests/tests.rs:16-17), where the
prover executes the guest natively and returns a FAKE seal that verifies
only while dev mode is on.

This module is the TPU-framework analogue: `near/statement.py` is the
guest (a native executor of the BFT statement); here we wrap its committed
journal into a `Receipt` whose dev-mode seal flows through the service
layer exactly like a proof object.  The REAL prover for this framework is
the plonky2-style circuit pipeline (near/bft.py) — `dev_mode=False` here
routes callers there rather than pretending the executor is sound.
"""
from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from . import statement

# risc0's encode_seal prepends a 4-byte verifier selector to the seal
# bytes; dev-mode (fake) receipts use a reserved selector that on-chain
# verifiers reject unless dev mode is explicitly allowed
# (risc0-ethereum contracts encode_seal pattern, service.rs:99).
DEV_SELECTOR = bytes.fromhex("deafbeef")


class SealError(Exception):
    pass


@dataclass
class Receipt:
    """journal + seal, the shape service.rs hands to its callers."""
    journal: bytes
    seal: bytes

    @property
    def selector(self) -> bytes:
        return self.seal[:4]

    def verify(self, allow_dev: bool | None = None) -> bool:
        """Dev receipts verify iff dev mode is allowed (the
        RISC0_DEV_MODE gate: a fake receipt must never pass in a
        production-configured verifier)."""
        if allow_dev is None:
            allow_dev = os.environ.get("ZKLC_DEV_MODE", "") == "1"
        if self.selector == DEV_SELECTOR:
            if not allow_dev:
                raise SealError("dev-mode receipt rejected: set "
                                "ZKLC_DEV_MODE=1 (RISC0_DEV_MODE pattern)")
            if self.seal[4:] != _dev_seal_body(self.journal):
                raise SealError("dev seal does not commit this journal")
            return True
        raise SealError(f"unknown seal selector {self.selector.hex()}; "
                        "real proofs come from the circuit pipeline "
                        "(near/bft.py)")


def _dev_seal_body(journal: bytes) -> bytes:
    return hashlib.sha256(DEV_SELECTOR + journal).digest()


def prove(epoch_blocks, blocks, validators, validators_n_1=None,
          dev_mode: bool = True) -> Receipt:
    """Execute the guest statement and emit a receipt.

    dev_mode=True — native execution + fake seal (default_prover under
    RISC0_DEV_MODE, tests.rs:17).  dev_mode=False — this backend has no
    zkVM; the sound prover is the circuit pipeline, so refuse loudly
    instead of producing an unsound seal."""
    if not dev_mode:
        raise SealError("statement backend has no production prover; use "
                        "the circuit pipeline (near/bft.prove_block_bft)")
    out = statement.execute(epoch_blocks, blocks, validators,
                            validators_n_1=validators_n_1)
    journal = out.abi_encode()
    return Receipt(journal=journal, seal=DEV_SELECTOR +
                   _dev_seal_body(journal))


def generate_random_proof(epoch_blocks, blocks, validators,
                          allow_dev: bool = True) -> dict:
    """service.rs:59-113 generate_random_proof: prove, verify the receipt,
    decode the journal, return the hex-encoded proof + journal row."""
    receipt = prove(epoch_blocks, blocks[:5], validators)
    receipt.verify(allow_dev=allow_dev)
    j = receipt.journal
    if len(j) != 4 * 32:
        raise SealError(f"random journal must be 4 words, got {len(j)}")
    from .types import b58encode
    return {
        "block_hash": b58encode(j[32:64]),
        "status": "OK",
        "proof": "0x" + receipt.seal.hex(),
        "journal": "0x" + j.hex(),
    }


def generate_epoch_proof(epoch_blocks, blocks, validators, validators_n_1,
                         allow_dev: bool = True) -> dict:
    """service.rs:21-57 generate_epoch_proof equivalent (6-block input,
    dual target blocks; journal = PublicValuesEpoch)."""
    receipt = prove(epoch_blocks, blocks, validators,
                    validators_n_1=validators_n_1)
    receipt.verify(allow_dev=allow_dev)
    j = receipt.journal
    if len(j) != 5 * 32:
        raise SealError(f"epoch journal must be 5 words, got {len(j)}")
    from .types import b58encode
    return {
        "block_hash_n_0": b58encode(j[32:64]),
        "block_hash_n_1": b58encode(j[64:96]),
        "block_height_n_0": int.from_bytes(j[96:128], "big"),
        "status": "OK",
        "proof": "0x" + receipt.seal.hex(),
        "journal": "0x" + j.hex(),
    }
