"""Generated-contract execution tests (bins/export_vk deployable output +
wrap/sol_twin text interpreter) on the REAL demo Groth16 artifacts.

The environment has no Solidity toolchain; the twin recovers the program
from the emitted contract TEXT (constants, vk_x wiring, pairs[] layout,
bounds checks) and executes it against the in-repo BN254 pairing — so a
generator bug that would ship a broken contract fails here."""
import json
import os.path as p

import pytest

from zklc_tpu.bins import export_vk as EV
from zklc_tpu.wrap import sol_twin as ST
from zklc_tpu.wrap import groth16 as G

pytestmark = pytest.mark.smoke

ROOT = p.dirname(p.dirname(p.abspath(__file__)))
DEMO = p.join(ROOT, "proofs", "groth16_demo")


@pytest.fixture(scope="module")
def vk():
    with open(p.join(DEMO, "vk.json")) as f:
        return EV.vk_from_dict(json.load(f))


@pytest.fixture(scope="module")
def demo_proof():
    with open(p.join(DEMO, "proof8.json")) as f:
        d = json.load(f)
    return [int(v) for v in d["inputs"]], [int(v) for v in d["proof"]]


@pytest.fixture(scope="module")
def contract(vk):
    return EV.deployable_contract(vk)


def test_no_placeholders_and_complete(contract, vk):
    assert "MUST be replaced at deployment" not in contract
    assert "GENERATED CONTRACT" in contract
    assert contract.count("{") == contract.count("}")
    for i in range(len(vk.ic)):
        assert f"IC{i}_X" in contract
    # no zero-valued constants survived
    import re
    assert not re.search(r"constant \w+ =\s*\n?\s*0;", contract)


def test_contract_text_accepts_real_proof(contract, demo_proof):
    inputs, proof8 = demo_proof
    assert ST.verify_via_contract_text(contract, inputs, proof8) is True


def test_contract_text_matches_groth16_verify(contract, vk, demo_proof):
    """Twin-of-twin: the text-interpreted program agrees with
    wrap/groth16.verify on accept AND reject."""
    inputs, proof8 = demo_proof
    assert G.verify(vk, proof8, inputs) is True
    bad = list(proof8)
    bad[6] = (bad[6] + 1) % ST.C.P          # C.x off the curve point
    try:
        got = ST.verify_via_contract_text(contract, inputs, bad)
    except ST.SolError:
        got = False
    assert got is False and G.verify(vk, bad, inputs) is False


def test_tampered_input_rejected(contract, demo_proof):
    inputs, proof8 = demo_proof
    bad = list(inputs)
    bad[0] = (bad[0] + 1) % ST.R
    assert ST.verify_via_contract_text(contract, bad, proof8) is False


def test_out_of_range_input_reverts(contract, demo_proof):
    inputs, proof8 = demo_proof
    bad = list(inputs)
    bad[0] = ST.R                           # == R: contract reverts
    with pytest.raises(ST.SolError, match="InvalidInput"):
        ST.verify_via_contract_text(contract, bad, proof8)
    badp = list(proof8)
    badp[0] = ST.C.P
    with pytest.raises(ST.SolError, match="InvalidProof"):
        ST.verify_via_contract_text(contract, inputs, badp)


def test_wrong_arity_rejected(contract, demo_proof):
    inputs, proof8 = demo_proof
    with pytest.raises(ST.SolError, match="arity"):
        ST.verify_via_contract_text(contract, inputs + [1], proof8)


def test_generator_corruption_detected(vk, demo_proof):
    """A generator that swapped IM/RE in a G2 constant must fail the
    pairing (the exact bug class a compile check would miss anyway)."""
    import dataclasses
    bad_vk = dataclasses.replace(
        vk, beta2=((vk.beta2[0][1], vk.beta2[0][0]), vk.beta2[1]))
    inputs, proof8 = demo_proof
    try:
        src = EV.deployable_contract(bad_vk)
        got = ST.verify_via_contract_text(src, inputs, proof8)
    except ST.SolError:
        got = False
    assert got is False


# ---- compressed path (Verifier.sol:102 verifyCompressedProof) ----------

def test_contract_text_accepts_compressed_proof(contract, demo_proof):
    from zklc_tpu.wrap import compress as Z
    inputs, proof8 = demo_proof
    proof4 = Z.compress_proof(proof8)
    assert ST.verify_compressed_via_contract_text(contract, inputs, proof4)
    # decompression recovered through the TEXT matches the direct one
    assert ST.decompress_via_contract_text(contract, proof4) == proof8


def test_compressed_tamper_rejected(contract, demo_proof):
    from zklc_tpu.wrap import compress as Z
    inputs, proof8 = demo_proof
    proof4 = Z.compress_proof(proof8)
    bad = list(proof4)
    bad[0] ^= 1                     # flip A's sign bit -> pairing fails
    assert not ST.verify_compressed_via_contract_text(contract, inputs, bad)


def test_compressed_constant_corruption_detected(vk, demo_proof):
    """A corrupted EXP_SQRT splice must be caught by the twin's
    cross-check, not silently produce wrong decompressions."""
    from zklc_tpu.wrap import compress as Z
    inputs, proof8 = demo_proof
    proof4 = Z.compress_proof(proof8)
    src = EV.deployable_contract(vk)
    import re
    src_bad = re.sub(r"(EXP_SQRT =\s*\n?\s*)\d+", r"\g<1>12345", src)
    with pytest.raises(ST.SolError, match="EXP_SQRT"):
        ST.verify_compressed_via_contract_text(src_bad, inputs, proof4)
