"""NEAR layer tests: borsh byte-exactness vs fixtures + primitives."""
import hashlib
import os

import numpy as np
import pytest

from zklc_tpu.near import types as T
from zklc_tpu.near import utils as U
from zklc_tpu.near import primitives as PR
from zklc_tpu.plonk import verifier
from zklc_tpu.plonk.witness import WitnessConflict

DATA = "/root/reference/data"
pytestmark = pytest.mark.skipif(not os.path.isdir(DATA),
                                reason="reference fixtures not mounted")


def test_header_hash_byte_exact():
    """Recomputed header hashes must equal the fixture `hash` fields."""
    paths = [f"{DATA}/block_header_small.json", f"{DATA}/block_header.json",
             f"{DATA}/prev_epoch_block_header_small.json"]
    for e in U.list_epochs():
        paths.append(os.path.join(U.epoch_dir(e), "block-0.json"))
        paths.append(os.path.join(U.epoch_dir(e), "block-last.json"))
    for p in paths:
        h = T.load_block_header(p)
        assert h.computed_hash() == h.hash, f"hash mismatch for {p}"
        assert len(h.inner_lite) == T.INNER_LITE_BYTES


def test_bp_hash_matches_fixtures():
    """sha256(u32-LE count || borsh(validators)) chains across epochs
    (header_bphash.rs:125 statement, checked natively)."""
    epochs = U.list_epochs()
    matched = 0
    for e in epochs:
        vals = U.load_validators(os.path.join(U.epoch_dir(e), "validators.json"))
        data = len(vals).to_bytes(4, "little") + b"".join(
            v.serialize() for v in vals)
        bp = hashlib.sha256(data).digest()
        for e2 in epochs:
            h = U.load_epoch_block(e2, "block-0")
            if h.next_bp_hash == bp:
                matched += 1
    assert matched >= 4


def test_set_blocks_random_mode():
    epochs = U.list_epochs()
    # find a consistent triple: epoch order 89PT -> 3JM -> HPi -> CRTZ -> 4RjX
    eb, blocks = U.set_blocks(
        "4RjXBrNcu39wutFTuFpnRHgNqgHxLMcGBKNEQdtkSBhy",
        "4RjXBrNcu39wutFTuFpnRHgNqgHxLMcGBKNEQdtkSBhy",
        "CRTZ7cQd77rvfS57Y7M36P1vLhran9HyQFEpTLxHRf9t")
    assert len(eb) == 2 and len(blocks) == 5
    # five consecutive heights, descending B_i+4 .. B_i
    heights = [b.height for b in blocks]
    assert all(heights[i] == heights[i + 1] + 1 for i in range(4))
    # each block's prev_hash links to the next in the list
    for i in range(4):
        assert blocks[i].view["prev_hash"] == blocks[i + 1].view["hash"]


def test_prove_consecutive_heights():
    h1 = (105971807).to_bytes(8, "little")
    h2 = (105971806).to_bytes(8, "little")
    data, proof = PR.prove_consecutive_heights(h1, h2)
    assert bytes(int(x) for x in proof.public_inputs) == h1 + h2
    assert verifier.verify(proof, data.verifier_only, data.common)


def test_prove_consecutive_heights_carry():
    """0x...FF + 1 crosses byte boundaries."""
    h2 = (0xFFFFFFFF).to_bytes(8, "little")
    h1 = (0x100000000).to_bytes(8, "little")
    data, proof = PR.prove_consecutive_heights(h1, h2)
    assert verifier.verify(proof, data.verifier_only, data.common)


def test_prove_consecutive_heights_rejects_gap():
    h1 = (105971808).to_bytes(8, "little")
    h2 = (105971806).to_bytes(8, "little")
    with pytest.raises(WitnessConflict):
        PR.prove_consecutive_heights(h1, h2)


def test_two_thirds():
    v1 = (670).to_bytes(16, "little")
    v2 = (1000).to_bytes(16, "little")
    data, proof = PR.two_thirds(v1, v2)
    assert verifier.verify(proof, data.verifier_only, data.common)


def test_two_thirds_rejects_insufficient_stake():
    v1 = (666).to_bytes(16, "little")   # 3*666 = 1998 < 2000
    v2 = (1000).to_bytes(16, "little")
    with pytest.raises(WitnessConflict):
        PR.two_thirds(v1, v2)


def test_two_thirds_large_random():
    import random
    rng = random.Random(5)
    for _ in range(2):
        total = rng.randrange(1, 2**100)
        v2 = total
        v1 = (2 * total + 2) // 3 + 1
        data, proof = PR.two_thirds(v1.to_bytes(16, "little"),
                                    v2.to_bytes(16, "little"))
        assert verifier.verify(proof, data.verifier_only, data.common)


def test_prove_eq_array():
    arr = U.load_epoch_block(U.list_epochs()[0], "block-0").epoch_id
    data, proof = PR.prove_eq_array(arr, arr)
    assert verifier.verify(proof, data.verifier_only, data.common)


def test_prove_eq_array_rejects_unequal():
    with pytest.raises(WitnessConflict):
        PR.prove_eq_array(b"\x01" + b"\x00" * 31, b"\x02" + b"\x00" * 31)
