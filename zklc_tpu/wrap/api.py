"""SNARK-wrap interface: hand a (BN128-transcript) proof to the BN254
Groth16 wrapper and repack public inputs the way its circuit expects.

Equivalent of the L5 boundary (SURVEY.md §2.5): the reference's gnark
web-api (`cmd/web-api.go:113`, `POST /proof`) consumes the proof/verifier
JSON artifacts and re-packs the 16 Goldilocks public-input words into 4
BN254 field elements (web-api.go:50-66) before proving `CircuitFixed`.
This module provides:

  * `pack_public_inputs`: the exact 16-GL-word -> 4-bigint packing;
  * `build_proof_request`: the ProofRequest JSON body (web-api.go:106-110);
  * `WrapClient`: goApiRequest equivalent (backend/src/go-helper.ts:4) —
    POSTs to a running gnark wrapper and returns {inputs[4], proof[8]}.

The Go service itself is external (as in the reference's docker topology);
artifacts written by plonk/serialization.py are its wire format.
"""
from __future__ import annotations

import json
import urllib.request


def pack_public_inputs(pis_16_words) -> list[int]:
    """web-api.go:50-66: each group of four u32 PI words packs big-endian
    into one 16-byte integer; returns the 4 BN254 public inputs."""
    pis = [int(x) for x in pis_16_words]
    assert len(pis) == 16, "wrap circuit expects exactly 16 PI words"
    out = []
    for j in range(4):
        limbs = bytearray(16)
        for i in range(4):
            w = pis[j * 4 + i]
            assert 0 <= w < (1 << 32), "wrap PIs must be u32 words"
            limbs[i * 4: i * 4 + 4] = w.to_bytes(4, "big")
        out.append(int.from_bytes(bytes(limbs), "big"))
    return out


def build_proof_request(proof_json: dict, verifier_json: dict,
                        request_id: str = "0") -> dict:
    """ProofRequest body (web-api.go:106-110): artifact JSONs as bytes."""
    return {
        "id": request_id,
        "proofWithPis": list(json.dumps(proof_json).encode()),
        "verifierData": list(json.dumps(verifier_json).encode()),
    }


class WrapClient:
    """POST /proof to a gnark wrapper instance; GET /health gate."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def health(self) -> bool:
        try:
            with urllib.request.urlopen(self.base_url + "/health",
                                        timeout=10) as r:
                return r.status == 200
        except Exception:
            return False

    def prove(self, proof_json: dict, verifier_json: dict,
              request_id: str = "0", timeout_s: float = 600.0) -> dict:
        body = json.dumps(build_proof_request(
            proof_json, verifier_json, request_id)).encode()
        req = urllib.request.Request(
            self.base_url + "/proof", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=timeout_s) as r:
            out = json.loads(r.read())
        assert set(out.keys()) >= {"inputs", "proof"}
        assert len(out["inputs"]) == 4 and len(out["proof"]) == 8
        return out
