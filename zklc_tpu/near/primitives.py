"""Byte-level statement primitives of the NEAR pipeline.

Equivalents of near_bft_finality/src/prove_block_data/primitives.rs:
  - `prove_consecutive_heights` (:32) — h1 == h2 + 1 over 8-byte LE heights,
  - `prove_eq_array` (:126)           — byte-array equality,
  - `two_thirds` (:176)               — 3*v1 >= 2*v2 over 16-byte LE stakes.

Statements are re-expressed TPU-first on the u32 gadget layer (pack bytes
into u32 limbs; multiply/compare through carry/borrow chains) instead of the
reference's per-byte select cascades — same public-input statements, far
fewer rows.  Each primitive exists both as a composable circuit gadget and
as a standalone (circuit, proof) producer mirroring the reference API.
"""
from __future__ import annotations

import numpy as np

from ..plonk.builder import CircuitBuilder, ProverData
from ..plonk.config import CircuitConfig
from ..plonk import prover
from ..gadgets.u32 import U32Ops

STAKE_BYTES = 16
BLOCK_HEIGHT_BYTES = 8


def add_byte_targets(b: CircuitBuilder, n: int) -> list[int]:
    """Virtual targets range-checked to 8 bits."""
    ts = b.add_virtual_targets(n)
    for t in ts:
        b.split_le(t, 8)
    return ts


def pack_bytes_to_u32(b: CircuitBuilder, bytes_t: list[int]) -> list[int]:
    """Pack range-checked LE bytes into u32 limbs (4 per limb)."""
    limbs = []
    for i in range(0, len(bytes_t), 4):
        chunk = bytes_t[i: i + 4]
        acc = b.zero()
        for byte in reversed(chunk):
            acc = b.arithmetic(256, 1, acc, b.one(), byte)
        limbs.append(acc)
    return limbs


def consecutive_heights_circuit(b: CircuitBuilder, h1_bytes: list[int],
                                h2_bytes: list[int]):
    """Constrain h1 == h2 + 1 (8-byte LE heights)."""
    u = U32Ops(b)
    l1 = pack_bytes_to_u32(b, h1_bytes)
    l2 = pack_bytes_to_u32(b, h2_bytes)
    carry = b.one()
    for a, c in zip(l2, l1):
        s, carry = u.add_u32s_with_carry([a], carry)
        b.connect(s, c)
    b.assert_zero(carry)


def eq_array_circuit(b: CircuitBuilder, a_bytes: list[int],
                     b_bytes: list[int]):
    assert len(a_bytes) == len(b_bytes)
    for x, y in zip(a_bytes, b_bytes):
        b.connect(x, y)


def two_thirds_circuit(b: CircuitBuilder, v1_bytes: list[int],
                       v2_bytes: list[int]):
    """Constrain 3*v1 >= 2*v2 for 16-byte LE stake values."""
    assert len(v1_bytes) == STAKE_BYTES and len(v2_bytes) == STAKE_BYTES
    u = U32Ops(b)
    l1 = pack_bytes_to_u32(b, v1_bytes)
    l2 = pack_bytes_to_u32(b, v2_bytes)
    three = b.constant(3)
    two = b.constant(2)
    z = u.zero_u32()

    def scale(limbs, k):
        out = []
        carry = z
        for limb in limbs:
            lo, hi = u.mul_add_u32(limb, k, carry)
            out.append(lo)
            carry = hi
        out.append(carry)
        return out

    v1x3 = scale(l1, three)
    v2x2 = scale(l2, two)
    # 3*v1 - 2*v2 must not borrow
    borrow = z
    for a, c in zip(v1x3, v2x2):
        _, borrow = u.sub_u32(a, c, borrow)
    b.assert_zero(borrow)


def _bytes_pis(b, arrays):
    for arr in arrays:
        b.register_public_inputs(arr)


def _inputs_from_bytes(targets, data: bytes, inputs: dict):
    for t, v in zip(targets, data):
        inputs[t] = np.uint64(v)


def prove_consecutive_heights(height1: bytes, height2: bytes):
    """primitives.rs:32; PIs = h1 bytes ++ h2 bytes."""
    assert len(height1) == len(height2) == BLOCK_HEIGHT_BYTES
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    h1 = add_byte_targets(b, BLOCK_HEIGHT_BYTES)
    h2 = add_byte_targets(b, BLOCK_HEIGHT_BYTES)
    consecutive_heights_circuit(b, h1, h2)
    _bytes_pis(b, [h1, h2])
    data = b.build()
    inputs: dict = {}
    _inputs_from_bytes(h1, height1, inputs)
    _inputs_from_bytes(h2, height2, inputs)
    proof = prover.prove(data, inputs)
    return data, proof


def prove_eq_array(array1: bytes, array2: bytes):
    """primitives.rs:126; PIs = array1 ++ array2."""
    assert len(array1) == len(array2)
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a1 = add_byte_targets(b, len(array1))
    a2 = add_byte_targets(b, len(array2))
    eq_array_circuit(b, a1, a2)
    _bytes_pis(b, [a1, a2])
    data = b.build()
    inputs: dict = {}
    _inputs_from_bytes(a1, array1, inputs)
    _inputs_from_bytes(a2, array2, inputs)
    proof = prover.prove(data, inputs)
    return data, proof


def two_thirds(value1: bytes, value2: bytes):
    """primitives.rs:176: prove 3*value1 >= 2*value2 (16-byte LE stakes);
    PIs = value1 ++ value2."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    v1 = add_byte_targets(b, STAKE_BYTES)
    v2 = add_byte_targets(b, STAKE_BYTES)
    two_thirds_circuit(b, v1, v2)
    _bytes_pis(b, [v1, v2])
    data = b.build()
    inputs: dict = {}
    _inputs_from_bytes(v1, value1[:STAKE_BYTES], inputs)
    _inputs_from_bytes(v2, value2[:STAKE_BYTES], inputs)
    proof = prover.prove(data, inputs)
    return data, proof
