"""Nonnative field arithmetic: Ed25519Base (2^255 - 19) / Ed25519Scalar.

Mirrors the statement surface of
crypto/plonky2_ed25519/src/gadgets/nonnative.rs:23-130 (`NonNativeTarget`,
add/sub/mul/neg/inv/reduce): a foreign-field element is a BigUintTarget of
eight u32 limbs, and every operation follows the reference's
"hint + constrain" pattern (nonnative.rs:455-664) — the witness generator
computes quotient/remainder natively with Python big ints, the circuit
constrains the defining identity over biguint limbs:

    op(a, b) = q * modulus + r,   r < modulus,   limbs range-checked.

This framework reduces eagerly after every mul (simpler bound discipline
than the reference's deferred reduction; soundness identical).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from .u32 import U32Ops
from .biguint import BigUintOps, BigUintTarget

ED25519_BASE_P = (1 << 255) - 19
# order of the prime subgroup: 2^252 + 27742317777372353535851937790883648493
ED25519_SCALAR_L = (1 << 252) + 27742317777372353535851937790883648493


@dataclass
class NonNativeTarget:
    value: BigUintTarget        # 8 u32 limbs, canonical (< modulus)
    modulus: int


class NonNativeOps:
    def __init__(self, b: CircuitBuilder, modulus: int,
                 big: BigUintOps | None = None):
        self.b = b
        self.modulus = modulus
        self.big = big or BigUintOps(b)
        self.u32 = self.big.u32
        self.num_limbs = (modulus.bit_length() + 31) // 32
        self._mod_const = None
        # lookup mode: one-row foreign-field gates (gates_lookup.py) instead
        # of the reference-style u32-limb decomposition chains
        self.lk = b.config.lookup is not None
        if self.lk:
            from ..plonk import gates_lookup as GL
            assert self.num_limbs <= 8
            self._mul_gate = GL.ForeignFieldMulGate(modulus, b.config)
            self._add_gate = GL.ForeignFieldAddGate(modulus, False, b.config)
            self._sub_gate = GL.ForeignFieldAddGate(modulus, True, b.config)

    def _ff_mul_slot(self, a_limbs, c_limbs):
        g = self._mul_gate
        row, _, g = self.b.find_slot(g)
        for j in range(8):
            self.b.connect(a_limbs[j], self.b.wire_t(row, g.w_a + j))
            self.b.connect(c_limbs[j], self.b.wire_t(row, g.w_b + j))
        return [self.b.wire_t(row, g.w_r + j) for j in range(8)]

    def _ff_addsub_slot(self, gate, a_limbs, c_limbs):
        row, i, g = self.b.find_slot(gate)
        for j in range(8):
            self.b.connect(a_limbs[j], self.b.wire_t(row, g.w_a(i, j)))
            self.b.connect(c_limbs[j], self.b.wire_t(row, g.w_b(i, j)))
        return [self.b.wire_t(row, g.w_r(i, j)) for j in range(8)]

    def _pad8(self, t: BigUintTarget) -> list:
        limbs = list(t.limbs[:8])
        while len(limbs) < 8:
            limbs.append(self.u32.zero_u32())
        return limbs

    # -- construction ------------------------------------------------------
    def mod_const(self) -> BigUintTarget:
        if self._mod_const is None:
            limbs = self.big.constant_biguint(self.modulus).limbs
            limbs += [self.u32.zero_u32()] * (self.num_limbs - len(limbs))
            self._mod_const = BigUintTarget(limbs[: self.num_limbs])
        return self._mod_const

    def add_virtual_nonnative(self, range_check: bool = True) -> NonNativeTarget:
        v = self.big.add_virtual_biguint_target(self.num_limbs, range_check)
        if range_check:
            self.assert_lt_modulus(v)
        return NonNativeTarget(v, self.modulus)

    def constant_nonnative(self, value: int) -> NonNativeTarget:
        value %= self.modulus
        limbs = []
        for _ in range(self.num_limbs):
            limbs.append(self.u32.constant_u32(value & 0xFFFFFFFF))
            value >>= 32
        return NonNativeTarget(BigUintTarget(limbs), self.modulus)

    def zero(self) -> NonNativeTarget:
        return self.constant_nonnative(0)

    def connect_nonnative(self, a: NonNativeTarget, c: NonNativeTarget):
        for x, y in zip(a.value.limbs, c.value.limbs):
            self.b.connect(x, y)

    def assert_lt_modulus(self, v: BigUintTarget):
        """v < modulus via (modulus-1) - v borrow-free comparison."""
        le = self.big.cmp_biguint(
            BigUintTarget(v.limbs[: self.num_limbs]),
            self.big.constant_biguint(self.modulus - 1))
        self.b.assert_one(le)

    # -- hint machinery ----------------------------------------------------
    def _hint_biguint(self, num_limbs: int, deps: list, fn) -> BigUintTarget:
        """Allocate limbs, range-check them, fill from fn(dep_values)->int."""
        out = self.big.add_virtual_biguint_target(num_limbs, range_check=True)

        def gen(vals, n=num_limbs):
            v = int(fn(vals))
            res = []
            for _ in range(n):
                res.append(np.uint64(v & 0xFFFFFFFF))
                v >>= 32
            assert v == 0
            return res

        self.b.add_generator(deps, list(out.limbs), gen)
        return out

    @staticmethod
    def _limbs_to_int(vals) -> int:
        v = 0
        for i, x in enumerate(vals):
            v |= int(x) << (32 * i)
        return v

    def _mod_op(self, raw: BigUintTarget, deps: list, native_fn,
                q_limbs: int) -> NonNativeTarget:
        """Constrain raw = q * modulus + r with hinted q, r; return r."""
        m = self.modulus

        def q_fn(vals):
            return native_fn(vals) // m

        def r_fn(vals):
            return native_fn(vals) % m

        q = self._hint_biguint(q_limbs, deps, q_fn)
        r = self._hint_biguint(self.num_limbs, deps, r_fn)
        self.assert_lt_modulus(r)
        qm = self.big.mul_biguint(q, self.mod_const())
        rhs = self.big.add_biguint(qm, r)
        self.big.connect_biguint(raw, rhs)
        return NonNativeTarget(r, m)

    # -- field operations ---------------------------------------------------
    def add_nonnative(self, a: NonNativeTarget, c: NonNativeTarget) -> NonNativeTarget:
        if self.lk:
            r = self._ff_addsub_slot(self._add_gate, self._pad8(a.value),
                                     self._pad8(c.value))
            return NonNativeTarget(BigUintTarget(r[: self.num_limbs]),
                                   self.modulus)
        raw = self.big.add_biguint(a.value, c.value)
        deps = list(a.value.limbs) + list(c.value.limbs)
        na, nc = a.value.num_limbs, c.value.num_limbs

        def native(vals, na=na):
            return (self._limbs_to_int(vals[:na])
                    + self._limbs_to_int(vals[na:]))

        return self._mod_op(raw, deps, native, q_limbs=1)

    def sub_nonnative(self, a: NonNativeTarget, c: NonNativeTarget) -> NonNativeTarget:
        """a - c mod m as a + (m - c_value)... constrained via a + m - c."""
        if self.lk:
            r = self._ff_addsub_slot(self._sub_gate, self._pad8(a.value),
                                     self._pad8(c.value))
            return NonNativeTarget(BigUintTarget(r[: self.num_limbs]),
                                   self.modulus)
        m_plus_a = self.big.add_biguint(
            a.value, self.big.constant_biguint(self.modulus))
        raw = self.big.sub_biguint(m_plus_a, c.value)
        deps = list(a.value.limbs) + list(c.value.limbs)
        na = a.value.num_limbs
        m = self.modulus

        def native(vals, na=na, m=m):
            return (self._limbs_to_int(vals[:na]) + m
                    - self._limbs_to_int(vals[na:]))

        return self._mod_op(raw, deps, native, q_limbs=1)

    def mul_nonnative(self, a: NonNativeTarget, c: NonNativeTarget) -> NonNativeTarget:
        if self.lk:
            r = self._ff_mul_slot(self._pad8(a.value), self._pad8(c.value))
            return NonNativeTarget(BigUintTarget(r[: self.num_limbs]),
                                   self.modulus)
        raw = self.big.mul_biguint(a.value, c.value)
        deps = list(a.value.limbs) + list(c.value.limbs)
        na = a.value.num_limbs

        def native(vals, na=na):
            return (self._limbs_to_int(vals[:na])
                    * self._limbs_to_int(vals[na:]))

        return self._mod_op(raw, deps, native, q_limbs=self.num_limbs + 1)

    def neg_nonnative(self, a: NonNativeTarget) -> NonNativeTarget:
        return self.sub_nonnative(self.zero(), a)

    def inv_nonnative(self, a: NonNativeTarget) -> NonNativeTarget:
        """Hint a^-1, constrain a * inv == 1 (a must be nonzero)."""
        m = self.modulus
        deps = list(a.value.limbs)

        def inv_fn(vals, m=m):
            v = self._limbs_to_int(vals) % m
            return pow(v, m - 2, m)

        inv = self._hint_biguint(self.num_limbs, deps, inv_fn)
        self.assert_lt_modulus(inv)
        inv_t = NonNativeTarget(inv, m)
        prod = self.mul_nonnative(a, inv_t)
        one = self.constant_nonnative(1)
        self.connect_nonnative(prod, one)
        return inv_t

    def div_nonnative(self, a: NonNativeTarget, c: NonNativeTarget) -> NonNativeTarget:
        return self.mul_nonnative(a, self.inv_nonnative(c))

    def reduce_biguint(self, big_val: BigUintTarget) -> NonNativeTarget:
        """Arbitrary-width biguint -> canonical nonnative (nonnative.rs:105)."""
        if self.lk:
            assert big_val.num_limbs <= 16
            limbs = list(big_val.limbs)
            while len(limbs) < 16:
                limbs.append(self.u32.zero_u32())
            lo = NonNativeTarget(BigUintTarget(limbs[:8]), self.modulus)
            hi = NonNativeTarget(BigUintTarget(limbs[8:]), self.modulus)
            shift = self.constant_nonnative((1 << 256) % self.modulus)
            # lo may be >= modulus (any 256-bit value): canonicalize by a
            # mul-by-1 (FFMul only requires inputs < 2^256, output < m)
            lo_c = self.mul_nonnative(lo, self.constant_nonnative(1))
            return self.add_nonnative(self.mul_nonnative(hi, shift), lo_c)
        deps = list(big_val.limbs)
        q_limbs = max(1, big_val.num_limbs - self.num_limbs + 1)

        def native(vals):
            return self._limbs_to_int(vals)

        return self._mod_op(big_val, deps, native, q_limbs=q_limbs)

    # -- bit access ----------------------------------------------------------
    def bits_le(self, a: NonNativeTarget) -> list:
        """Little-endian bit targets of the canonical value
        (nonnative.rs:112 split_nonnative_to_bits equivalent)."""
        bits = []
        for limb in a.value.limbs:
            bits += self.b.split_le(limb, 32)
        return bits

    # -- witness --------------------------------------------------------------
    def set_nonnative_inputs(self, t: NonNativeTarget, value: int, inputs: dict):
        BigUintOps.set_biguint_inputs(t.value, value % self.modulus, inputs)
