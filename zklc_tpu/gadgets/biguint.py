"""BigUint gadget: arbitrary-precision values as vectors of u32 limb targets.

Mirrors the load-bearing surface of
crypto/plonky2_ecdsa/src/gadgets/biguint.rs:23-85 (`BigUintTarget`,
add/sub/mul/cmp/div-rem) — the base layer for SHA input handling and for
the nonnative ed25519 field arithmetic.
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from .u32 import U32Ops


@dataclass
class BigUintTarget:
    limbs: list  # of u32 targets, little-endian

    @property
    def num_limbs(self):
        return len(self.limbs)


class BigUintOps:
    def __init__(self, b: CircuitBuilder, u32: U32Ops | None = None):
        self.b = b
        self.u32 = u32 or U32Ops(b)

    def add_virtual_biguint_target(self, num_limbs: int,
                                   range_check: bool = True) -> BigUintTarget:
        limbs = [self.b.add_virtual_target() for _ in range(num_limbs)]
        if range_check and num_limbs:
            self.u32.range_check_u32(limbs)
        return BigUintTarget(limbs)

    def constant_biguint(self, value: int) -> BigUintTarget:
        limbs = []
        v = int(value)
        while True:
            limbs.append(self.u32.constant_u32(v & 0xFFFFFFFF))
            v >>= 32
            if v == 0:
                break
        return BigUintTarget(limbs)

    def zero_biguint(self) -> BigUintTarget:
        return BigUintTarget([self.u32.zero_u32()])

    def connect_biguint(self, a: BigUintTarget, bt: BigUintTarget):
        n = min(a.num_limbs, bt.num_limbs)
        z = self.b.zero()
        for i in range(n):
            self.b.connect(a.limbs[i], bt.limbs[i])
        for i in range(n, a.num_limbs):
            self.b.connect(a.limbs[i], z)
        for i in range(n, bt.num_limbs):
            self.b.connect(bt.limbs[i], z)

    def add_biguint(self, a: BigUintTarget, bt: BigUintTarget) -> BigUintTarget:
        n = max(a.num_limbs, bt.num_limbs)
        z = self.u32.zero_u32()
        out = []
        carry = z
        for i in range(n):
            ai = a.limbs[i] if i < a.num_limbs else z
            bi = bt.limbs[i] if i < bt.num_limbs else z
            s, carry = self.u32.add_u32s_with_carry([ai, bi], carry)
            out.append(s)
        out.append(carry)
        return BigUintTarget(out)

    def sub_biguint(self, a: BigUintTarget, bt: BigUintTarget) -> BigUintTarget:
        """a - b assuming a >= b (borrow chain; final borrow forced 0)."""
        n = max(a.num_limbs, bt.num_limbs)
        z = self.u32.zero_u32()
        out = []
        borrow = z
        for i in range(n):
            ai = a.limbs[i] if i < a.num_limbs else z
            bi = bt.limbs[i] if i < bt.num_limbs else z
            d, borrow = self.u32.sub_u32(ai, bi, borrow)
            out.append(d)
        self.b.assert_zero(borrow)
        return BigUintTarget(out)

    MAX_ADDENDS = 15  # U32AddManyGate carry is 4 bits -> sum of <=16 u32s

    def mul_biguint(self, a: BigUintTarget, bt: BigUintTarget) -> BigUintTarget:
        """Schoolbook limb multiply: per-column add-many with carry folding."""
        total = a.num_limbs + bt.num_limbs
        z = self.u32.zero_u32()
        to_add = [[] for _ in range(total + 1)]
        for i in range(a.num_limbs):
            for j in range(bt.num_limbs):
                lo, hi = self.u32.mul_u32(a.limbs[i], bt.limbs[j])
                to_add[i + j].append(lo)
                to_add[i + j + 1].append(hi)
        out = []
        for col in range(total):
            pending = to_add[col]
            if not pending:
                out.append(z)
                continue
            while len(pending) > 1:
                chunk = pending[: self.MAX_ADDENDS]
                pending = pending[self.MAX_ADDENDS:]
                s, c = self.u32.add_many_u32(chunk)
                pending.insert(0, s)
                if col + 1 <= total:
                    to_add[col + 1].append(c)
            out.append(pending[0])
        return BigUintTarget(out)

    def cmp_biguint(self, a: BigUintTarget, bt: BigUintTarget) -> int:
        """Returns a boolean target: a <= b."""
        n = max(a.num_limbs, bt.num_limbs)
        z = self.u32.zero_u32()
        borrow = z
        for i in range(n):
            ai = a.limbs[i] if i < a.num_limbs else z
            bi = bt.limbs[i] if i < bt.num_limbs else z
            _, borrow = self.u32.sub_u32(bi, ai, borrow)
        return self.b.sub(self.b.one(), borrow)

    # witness helpers ----------------------------------------------------
    @staticmethod
    def set_biguint_inputs(target: BigUintTarget, value: int, inputs: dict):
        v = int(value)
        for t in target.limbs:
            inputs[t] = np.uint64(v & 0xFFFFFFFF)
            v >>= 32
        assert v == 0, "value too large for target limbs"
