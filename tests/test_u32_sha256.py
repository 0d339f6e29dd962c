"""u32 gadget + SHA-256 circuit tests (config 1 of BASELINE.json)."""
import hashlib

import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk import prover, verifier
from zklc_tpu.plonk.witness import generate_witness
from zklc_tpu.gadgets.u32 import U32Ops
from zklc_tpu.gadgets.sha256 import Sha256Ops


def test_u32_ops_witness_semantics():
    b = CircuitBuilder()
    u = U32Ops(b)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    lo, hi = u.mul_add_u32(x, y, x)
    s, c = u.add_u32(x, y)
    d, brw = u.sub_u32(x, y, u.zero_u32())
    xr = u.xor_u32(x, y)
    ar = u.and_u32(x, y)
    rot = u.rrot_u32(x, 7)
    sh = u.rsh_u32(x, 3)
    nt = u.not_u32(x)
    for t in (lo, hi, s, c, d, brw, xr, ar, rot, sh, nt):
        b.register_public_input(t)
    data = b.build()
    xv, yv = 0xDEADBEEF, 0x12345678
    wr = generate_witness(data, {x: xv, y: yv})
    got = [int(wr.get(t)) for t in data.public_input_targets]
    total = xv * yv + xv
    diff = xv - yv
    expect = [total & 0xFFFFFFFF, total >> 32,
              (xv + yv) & 0xFFFFFFFF, (xv + yv) >> 32,
              diff & 0xFFFFFFFF, 1 if diff < 0 else 0,
              xv ^ yv, xv & yv,
              ((xv >> 7) | (xv << 25)) & 0xFFFFFFFF,
              xv >> 3, 0xFFFFFFFF - xv]
    assert got == expect


def test_u32_circuit_proves():
    b = CircuitBuilder()
    u = U32Ops(b)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    xr = u.xor_u32(x, y)
    lo, hi = u.mul_u32(x, y)
    for t in (xr, lo, hi):
        b.register_public_input(t)
    data = b.build()
    proof = prover.prove(data, {x: 0xFFFFFFFF, y: 0xA5A5A5A5})
    assert int(proof.public_inputs[0]) == 0xFFFFFFFF ^ 0xA5A5A5A5
    prod = 0xFFFFFFFF * 0xA5A5A5A5
    assert int(proof.public_inputs[1]) == prod & 0xFFFFFFFF
    assert int(proof.public_inputs[2]) == prod >> 32
    assert verifier.verify(proof, data.verifier_only, data.common)


def build_sha256_circuit(msg_len: int):
    b = CircuitBuilder()
    sha = Sha256Ops(b)
    blocks = sha.num_blocks_for(msg_len)
    hin = sha.add_virtual_hash_input_target(blocks)
    digest = sha.hash_sha256(hin)
    for t in digest.limbs:
        b.register_public_input(t)
    data = b.build()
    return data, sha, hin


def test_sha256_witness_matches_hashlib():
    msg = b"abc"
    data, sha, hin = build_sha256_circuit(len(msg))
    inputs = {}
    sha.set_sha256_input(hin, msg, inputs)
    wr = generate_witness(data, inputs)
    got = b"".join(int(wr.get(t)).to_bytes(4, "big")
                   for t in data.public_input_targets)
    assert got == hashlib.sha256(msg).digest()


def test_sha256_proof_short_message():
    """BASELINE config 1 (reduced): prove SHA-256 digest as public inputs."""
    msg = b"NEAR light client"
    data, sha, hin = build_sha256_circuit(len(msg))
    inputs = {}
    sha.set_sha256_input(hin, msg, inputs)
    proof = prover.prove(data, inputs)
    got = b"".join(int(x).to_bytes(4, "big") for x in proof.public_inputs)
    assert got == hashlib.sha256(msg).digest()
    assert verifier.verify(proof, data.verifier_only, data.common)
