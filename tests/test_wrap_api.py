"""Wrap-layer PI packing: byte-exact vs the gnark web-api repacking."""
import pytest

from zklc_tpu.wrap.api import pack_public_inputs, build_proof_request


def test_pack_public_inputs_matches_go_semantics():
    # emulate web-api.go:50-66 byte packing on a known vector
    pis = list(range(1, 17))
    out = pack_public_inputs(pis)
    for j in range(4):
        limbs = b"".join((j * 4 + i + 1).to_bytes(4, "big") for i in range(4))
        assert out[j] == int.from_bytes(limbs, "big")


def test_pack_rejects_wide_words():
    with pytest.raises(AssertionError):
        pack_public_inputs([1 << 32] + [0] * 15)
    with pytest.raises(AssertionError):
        pack_public_inputs([0] * 15)


def test_build_proof_request_shape():
    req = build_proof_request({"proof": {}}, {"vd": 1}, "abc")
    assert set(req.keys()) == {"id", "proofWithPis", "verifierData"}
    assert isinstance(req["proofWithPis"], list)
