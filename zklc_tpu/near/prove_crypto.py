"""SHA-256 proving stage of the NEAR pipeline.

Equivalent of near_bft_finality/src/prove_crypto/sha256.rs:
  - `sha256_proof_u32` (:62): build (or reuse) a circuit for the message's
    block count, register the digest limbs as public inputs, prove.
  - circuit caching per length bucket mirrors the reference's ed25519 cache
    pattern (prove_crypto/ed25519.rs:18) — here keyed by block count, which
    is also the XLA-friendly shape-bucketing strategy (SURVEY.md §7.4.6).
"""
from __future__ import annotations

import hashlib

import numpy as np

from ..plonk.builder import CircuitBuilder, ProverData
from ..plonk.config import CircuitConfig
from ..plonk import prover, verifier
from ..gadgets.sha256 import Sha256Ops, HashInputTarget

_sha_circuit_cache: dict[int, tuple] = {}


def get_sha256_circuit(blocks_num: int) -> tuple[ProverData, Sha256Ops,
                                                 HashInputTarget]:
    """Build-once cache keyed by 512-bit block count."""
    if blocks_num in _sha_circuit_cache:
        return _sha_circuit_cache[blocks_num]
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    sha = Sha256Ops(b)
    hin = sha.add_virtual_hash_input_target(blocks_num)
    digest = sha.hash_sha256(hin)
    for t in digest.limbs:
        b.register_public_input(t)
    data = b.build()
    _sha_circuit_cache[blocks_num] = (data, sha, hin)
    return data, sha, hin


def sha256_proof_u32(message: bytes):
    """prove_crypto/sha256.rs:62: returns (proof, prover_data).

    The proof's 8 public inputs are the digest words (big-endian u32s).
    """
    blocks_num = (len(message) * 8 + 64 + 512) // 512
    data, sha, hin = get_sha256_circuit(blocks_num)
    inputs: dict = {}
    sha.set_sha256_input(hin, message, inputs)
    proof = prover.prove(data, inputs)
    digest = b"".join(int(x).to_bytes(4, "big") for x in proof.public_inputs)
    assert digest == hashlib.sha256(message).digest(), \
        "prover produced wrong digest"
    return proof, data


def verify_sha256_proof(proof, data: ProverData) -> bool:
    return verifier.verify(proof, data.verifier_only, data.common)


def digest_from_proof(proof) -> bytes:
    return b"".join(int(x).to_bytes(4, "big") for x in proof.public_inputs)
