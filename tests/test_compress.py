"""BN254 proof compression (Verifier.sol:102,197-360 — the 128-byte
compressed Groth16 format): G1/G2 point round-trips over random curve
points (both sqrt hint branches), the demo artifact proof end-to-end
through verifyCompressedProof, and malformed-input rejection."""
import json
import os

import pytest

from zklc_tpu.wrap import bn254 as C
from zklc_tpu.wrap import compress as Z

pytestmark = pytest.mark.smoke

DEMO = os.path.join(os.path.dirname(__file__), "..", "proofs",
                    "groth16_demo")


def test_g1_roundtrip_random_points():
    for k in range(1, 40):
        x, y = C.g1_mul(C.G1_GEN, 12345 + k * 977)
        c = Z.compress_g1(x, y)
        assert Z.decompress_g1(c) == (x, y)
        # the negated point flips only the sign bit
        cn = Z.compress_g1(x, (C.P - y) % C.P)
        assert cn == c ^ 1


def test_g2_roundtrip_random_points_covers_both_hints():
    hints = set()
    for k in range(1, 60):
        (x0, x1), (y0, y1) = C.g2_mul(C.G2_GEN, 31337 + k * 1009)
        c0, c1 = Z.compress_g2(x0, x1, y0, y1)
        hints.add(bool(c0 & 2))
        assert Z.decompress_g2(c0, c1) == (x0, x1, y0, y1)
    assert hints == {True, False}, "need both sqrt_Fp2 hint branches"


def test_infinity_encodings():
    assert Z.compress_g1(0, 0) == 0
    assert Z.decompress_g1(0) == (0, 0)
    assert Z.compress_g2(0, 0, 0, 0) == (0, 0)
    assert Z.decompress_g2(0, 0) == (0, 0, 0, 0)


def test_off_curve_and_out_of_field_reject():
    with pytest.raises(Z.CompressionError):
        Z.compress_g1(5, 7)                       # not on curve
    with pytest.raises(Z.CompressionError):
        Z.compress_g1(C.P, 2)                     # x not in field
    with pytest.raises(Z.CompressionError):
        Z.decompress_g1(C.P << 1)                 # x not in field
    # x=4: x^3+3=67 is not a QR mod P -> decompression must fail
    with pytest.raises(Z.CompressionError):
        Z.decompress_g1(4 << 1)
    with pytest.raises(Z.CompressionError):
        Z.compress_g2(1, 2, 3, 4)                 # not on curve


def test_demo_proof_compress_verify_roundtrip():
    """The checked-in demo Groth16 proof compresses to 4 words, verifies
    through the contract model's verifyCompressedProof path, and the
    compressed save-entry emits the reference's event."""
    from zklc_tpu.wrap import groth16 as G
    from zklc_tpu.wrap.contracts_model import (Groth16VerifierModel,
                                               InvalidProof,
                                               NearBlockVerificationModel)
    with open(os.path.join(DEMO, "proof8.json")) as f:
        d = json.load(f)
    with open(os.path.join(DEMO, "vk.json")) as f:
        vkj = json.load(f)
    proof8 = [int(v) for v in d["proof"]]
    pubs = [int(v) for v in d["inputs"]]
    vk = G.VerifyingKey(
        alpha1=tuple(int(v) for v in vkj["alpha1"]),
        beta2=tuple(tuple(int(v) for v in row) for row in vkj["beta2"]),
        gamma2=tuple(tuple(int(v) for v in row) for row in vkj["gamma2"]),
        delta2=tuple(tuple(int(v) for v in row) for row in vkj["delta2"]),
        ic=[tuple(int(v) for v in pt) for pt in vkj["ic"]])
    model = Groth16VerifierModel(vk)

    proof4 = model.compress_proof(proof8)
    assert len(proof4) == 4
    assert Z.decompress_proof(proof4) == proof8
    assert model.verify_compressed_proof(proof4, pubs)

    near = NearBlockVerificationModel(model)
    near.verify_and_save_compressed_proof(pubs, proof4)
    assert near.is_proofed(pubs[:2])
    assert near.events[-1][0] == "CompressedProofVerifiedAndSaved"

    # tampering any compressed word must reject (decompression or pairing)
    bad = list(proof4)
    bad[0] ^= 1
    with pytest.raises(InvalidProof):
        if not model.verify_compressed_proof(bad, pubs):
            raise InvalidProof()
