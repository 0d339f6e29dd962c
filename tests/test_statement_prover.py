"""The second implementation as a receipt-producing backend: dev-mode
seals flowing through the service layer — the RISC0_DEV_MODE
proving-server alternative (near_risc0/host/src/service.rs:60-86,
host/src/bin/proving_server.rs:36, host/tests/tests.rs:16-17)."""
import json
import os
import os.path as p

import pytest

from zklc_tpu.near import statement_prover as SP
from zklc_tpu.near import utils as U
from zklc_tpu.near.types import b58encode

pytestmark = pytest.mark.smoke


def _random_inputs():
    eps = U.ordered_epochs()
    epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3])
    validators = U.load_validators(
        p.join(U.epoch_dir(eps[-1]), "validators.json"))
    return epoch_blocks, blocks, validators


def _epoch_inputs():
    eps = U.ordered_epochs()
    epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3], eps[-4])
    validators = U.load_validators(
        p.join(U.epoch_dir(eps[-1]), "validators.json"))
    validators_n_1 = U.load_validators(
        p.join(U.epoch_dir(eps[-2]), "validators.json"))
    return epoch_blocks, blocks, validators, validators_n_1


def test_dev_receipt_roundtrip_and_gating():
    epoch_blocks, blocks, validators = _random_inputs()
    receipt = SP.prove(epoch_blocks, blocks[:5], validators)
    # dev seal verifies only when dev mode is allowed (RISC0_DEV_MODE gate)
    assert receipt.verify(allow_dev=True)
    with pytest.raises(SP.SealError):
        receipt.verify(allow_dev=False)
    # a tampered journal must not verify against the seal
    bad = SP.Receipt(journal=receipt.journal[:-1] + b"\x00",
                     seal=receipt.seal)
    with pytest.raises(SP.SealError):
        bad.verify(allow_dev=True)


def test_no_production_prover_refuses():
    epoch_blocks, blocks, validators = _random_inputs()
    with pytest.raises(SP.SealError):
        SP.prove(epoch_blocks, blocks[:5], validators, dev_mode=False)


def test_generate_random_proof_row():
    epoch_blocks, blocks, validators = _random_inputs()
    row = SP.generate_random_proof(epoch_blocks, blocks, validators)
    assert row["status"] == "OK"
    assert row["block_hash"] == b58encode(blocks[4].hash)
    assert row["proof"].startswith("0x" + SP.DEV_SELECTOR.hex())
    assert len(bytes.fromhex(row["journal"][2:])) == 4 * 32


def test_generate_epoch_proof_row():
    epoch_blocks, blocks, validators, vn1 = _epoch_inputs()
    row = SP.generate_epoch_proof(epoch_blocks, blocks, validators, vn1)
    assert row["status"] == "OK"
    assert row["block_hash_n_0"] == b58encode(blocks[4].hash)
    assert row["block_hash_n_1"] == b58encode(blocks[5].hash)
    assert row["block_height_n_0"] == blocks[4].height
    assert len(bytes.fromhex(row["journal"][2:])) == 5 * 32


def test_statement_backend_through_service_layer(tmp_path):
    """An Orchestrator configured with backend='statement' proves a block
    through the second implementation: receipt artifacts on disk, DONE
    status row, submit hook fed the journal — the service.rs flow."""
    from zklc_tpu.service.orchestrator import Orchestrator
    epoch_blocks, blocks, validators = _random_inputs()
    submitted = []
    orch = Orchestrator(proofs_dir=str(tmp_path), backend="statement",
                        submit_fn=lambda journal, d:
                        submitted.append((journal, d)))
    row = orch.generate_proof(epoch_blocks, blocks[:5], validators,
                              mode="random")
    assert row["status"] == "DONE"
    assert row["backend"] == "statement"
    with open(os.path.join(row["artifacts"], "receipt.json")) as f:
        receipt_row = json.load(f)
    assert receipt_row["block_hash"] == b58encode(blocks[4].hash)
    assert submitted and submitted[0][0] == receipt_row["journal"]
    # the receipt re-verifies from its persisted hex encoding
    rec = SP.Receipt(
        journal=bytes.fromhex(receipt_row["journal"][2:]),
        seal=bytes.fromhex(receipt_row["proof"][2:]))
    assert rec.verify(allow_dev=True)
