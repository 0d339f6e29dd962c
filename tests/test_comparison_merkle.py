"""ComparisonGate / list_le gadgets + SHA-256 Merkle proof gadgets
(reference: crypto/plonky2_u32/src/gates/comparison.rs,
gadgets/multiple_comparison.rs, crypto/plonky2_sha256_u32/src/sha256_merkle.rs).
"""
import hashlib

import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk import prover, verifier
from zklc_tpu.plonk.witness import generate_witness
from zklc_tpu.plonk.testing import check_constraints
from zklc_tpu.gadgets.u32 import U32Ops
from zklc_tpu.gadgets.sha256 import Sha256Ops


def _le_circuit(num_bits):
    b = CircuitBuilder()
    u = U32Ops(b)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    r = u.le_bits(x, y, num_bits)
    b.register_public_input(r)
    return b.build(), x, y


@pytest.mark.parametrize("xv,yv,expect", [
    (5, 9, 1), (9, 5, 0), (7, 7, 1), (0, 0, 1),
    (0xFFFFFFFF, 0xFFFFFFFF, 1), (0xFFFFFFFF, 0xFFFFFFFE, 0),
    (0x12345678, 0x12345679, 1),
])
def test_comparison_gate(xv, yv, expect):
    data, x, y = _le_circuit(32)
    wr = generate_witness(data, {x: xv, y: yv})
    check_constraints(data, wr)
    assert int(wr.get(data.public_input_targets[0])) == expect


def test_comparison_gate_proves():
    data, x, y = _le_circuit(32)
    proof = prover.prove(data, {x: 123, y: 456})
    assert int(proof.public_inputs[0]) == 1
    assert verifier.verify(proof, data.verifier_only, data.common)


def test_comparison_rejects_forged_result():
    """Forcing the result bit to the wrong value must break a constraint."""
    b = CircuitBuilder()
    u = U32Ops(b)
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    r = u.le_bits(x, y, 32)
    b.connect(r, b.one())          # claim x <= y
    data = b.build()
    from zklc_tpu.plonk.witness import WitnessConflict
    with pytest.raises((WitnessConflict, AssertionError)):
        wr = generate_witness(data, {x: 9, y: 5})   # but x > y
        check_constraints(data, wr)


@pytest.mark.parametrize("a,b_,expect", [
    ([1, 2], [1, 2], 1),       # equal
    ([0, 1], [0xFFFFFFFF, 0], 0),  # a = 2^32 > b
    ([0xFFFFFFFF, 0], [0, 1], 1),  # a < b = 2^32
])
def test_list_le_u32(a, b_, expect):
    b = CircuitBuilder()
    u = U32Ops(b)
    ats = [b.add_virtual_target() for _ in a]
    bts = [b.add_virtual_target() for _ in b_]
    r = u.list_le_u32(ats, bts)
    b.register_public_input(r)
    data = b.build()
    inputs = {t: v for t, v in zip(ats, a)}
    inputs.update({t: v for t, v in zip(bts, b_)})
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    assert int(wr.get(data.public_input_targets[0])) == expect


# --- SHA-256 Merkle gadget -------------------------------------------------

def _sha256_pair(l: bytes, r: bytes) -> bytes:
    return hashlib.sha256(l + r).digest()


def test_sha256_merkle_proof_gadget():
    height = 3
    leaves = [hashlib.sha256(bytes([i])).digest() for i in range(1 << height)]
    level = list(leaves)
    levels = [level]
    while len(level) > 1:
        level = [_sha256_pair(level[i], level[i + 1])
                 for i in range(0, len(level), 2)]
        levels.append(level)
    root = levels[-1][0]
    index = 5
    siblings = []
    idx = index
    for lvl in levels[:-1]:
        siblings.append(lvl[idx ^ 1])
        idx >>= 1

    b = CircuitBuilder()
    sha = Sha256Ops(b)
    root_t, value_t, sib_ts, index_t = sha.add_merkle_proof_gadget(height)
    b.register_public_inputs(root_t)
    data = b.build()

    inputs: dict = {index_t: np.uint64(index)}
    Sha256Ops.set_hash256_target(value_t, leaves[index], inputs)
    for st, sv in zip(sib_ts, siblings):
        Sha256Ops.set_hash256_target(st, sv, inputs)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    got = b"".join(int(wr.get(t)).to_bytes(4, "big")
                   for t in data.public_input_targets)
    assert got == root


def test_sha256_delta_merkle_proof_gadget():
    height = 2
    old_leaves = [hashlib.sha256(bytes([i])).digest() for i in range(4)]
    index = 2
    new_leaf = hashlib.sha256(b"updated").digest()

    def build_root(leaves):
        lvl = list(leaves)
        levels = [lvl]
        while len(lvl) > 1:
            lvl = [_sha256_pair(lvl[i], lvl[i + 1])
                   for i in range(0, len(lvl), 2)]
            levels.append(lvl)
        return levels

    old_levels = build_root(old_leaves)
    new_leaves = list(old_leaves)
    new_leaves[index] = new_leaf
    new_levels = build_root(new_leaves)
    siblings = []
    idx = index
    for lvl in old_levels[:-1]:
        siblings.append(lvl[idx ^ 1])
        idx >>= 1

    b = CircuitBuilder()
    sha = Sha256Ops(b)
    (old_root_t, old_value_t, new_root_t, new_value_t,
     sib_ts, index_t) = sha.add_delta_merkle_proof_gadget(height)
    b.register_public_inputs(old_root_t)
    b.register_public_inputs(new_root_t)
    data = b.build()

    inputs: dict = {index_t: np.uint64(index)}
    Sha256Ops.set_hash256_target(old_value_t, old_leaves[index], inputs)
    Sha256Ops.set_hash256_target(new_value_t, new_leaf, inputs)
    for st, sv in zip(sib_ts, siblings):
        Sha256Ops.set_hash256_target(st, sv, inputs)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    pis = [int(wr.get(t)) for t in data.public_input_targets]
    got_old = b"".join(v.to_bytes(4, "big") for v in pis[:8])
    got_new = b"".join(v.to_bytes(4, "big") for v in pis[8:])
    assert got_old == old_levels[-1][0]
    assert got_new == new_levels[-1][0]
