"""Golden test for the REAL Groth16 wrap artifact (proofs/groth16/):
the 8-word proof of the 5.1M-constraint wrap statement for mainnet block
E1Fbd... must re-verify from cold JSON through the pairing check, the
emitted Verifier.sol text twin, and the compressed 4-word format —
the reference's end product (gnark-plonky2-verifier cmd/compile.go:20,
web-api.go:78-105, 256-byte proof served over POST /proof)."""
import json
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
G16 = os.path.join(ROOT, "proofs", "groth16")
BLOCK = "E1FbdJ7M4FwqhUT8u8uasuobvnZZ6ymm6vgHvA29SbRW"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(G16, "proof8.json")),
    reason="real groth16 artifact not present")


@pytest.fixture(scope="module")
def artifact():
    with open(os.path.join(G16, "proof8.json")) as f:
        d = json.load(f)
    with open(os.path.join(G16, "vk.json")) as f:
        vkj = json.load(f)
    from zklc_tpu.bins.export_vk import vk_from_dict
    return (vk_from_dict(vkj), [int(v) for v in d["proof"]],
            [int(v) for v in d["inputs"]], d["statement"])


def test_real_groth16_proof_verifies(artifact):
    from zklc_tpu.wrap import groth16 as G
    vk, proof8, pubs, statement = artifact
    assert statement == f"near_bft_random_{BLOCK}"
    assert len(proof8) == 8 and len(pubs) == 25
    assert G.verify(vk, proof8, pubs)


def test_real_groth16_tamper_rejected(artifact):
    from zklc_tpu.wrap import groth16 as G
    vk, proof8, pubs, _ = artifact
    bad = list(pubs)
    bad[0] ^= 1
    assert not G.verify(vk, proof8, bad)


def test_real_groth16_inputs_bind_block_hash(artifact):
    """The 25 packed words carry ALL 97 inner PIs (tag || block_hash ||
    epoch hashes) as big-endian 32-bit lanes, 4 per word, short last word
    (verifier_r1cs.py:595-605)."""
    from zklc_tpu.near.types import b58decode
    _, _, pubs, _ = artifact
    inner = []
    for j, w in enumerate(pubs):
        k = min(4, 97 - 4 * j)
        inner.extend([(w >> (32 * (k - 1 - i))) & 0xFFFFFFFF
                      for i in range(k)])
    hb = b58decode(BLOCK)
    assert bytes(inner[1:33]) == hb


def test_real_groth16_twin_executes_emitted_contract(artifact):
    from zklc_tpu.wrap import sol_twin as ST
    _, proof8, pubs, _ = artifact
    with open(os.path.join(G16, "Verifier_deployed.sol")) as f:
        src = f.read()
    assert ST.verify_via_contract_text(src, pubs, proof8)


def test_real_groth16_compressed_roundtrip(artifact):
    from zklc_tpu.wrap import compress as Z
    from zklc_tpu.wrap import groth16 as G
    vk, proof8, pubs, _ = artifact
    proof4 = Z.compress_proof(proof8)
    assert Z.decompress_proof(proof4) == proof8
    assert G.verify(vk, Z.decompress_proof(proof4), pubs)
