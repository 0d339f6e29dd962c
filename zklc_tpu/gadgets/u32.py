"""u32 gadget API: CircuitBuilderU32 + CircuitBuilderB32 equivalents.

Mirrors the trait surface of crypto/plonky2_u32/src/gadgets/
{arithmetic_u32.rs:24, interleaved_u32.rs:16} — u32 arithmetic with
carries/borrows, and the interleave trick that turns AND/XOR into one field
add (bit i spread to position 2i; sum's even positions = XOR, odd = AND).

Targets are plain builder target ints; a "u32 target" is one whose value is
guaranteed < 2^32 by the producing gate.
"""
from __future__ import annotations

from ..field import gl64
from ..plonk.builder import CircuitBuilder
from ..plonk import gates_u32 as GU


class U32Ops:
    """u32/b32 operations over a CircuitBuilder."""

    def __init__(self, b: CircuitBuilder):
        self.b = b
        self._lk_range_gate = None

    # -- basics -----------------------------------------------------------
    def add_virtual_u32(self) -> int:
        return self.b.add_virtual_target()

    def constant_u32(self, v: int) -> int:
        assert 0 <= v <= GU.U32_MAX
        return self.b.constant(v)

    def zero_u32(self) -> int:
        return self.b.zero()

    # -- arithmetic (U32ArithmeticGate / AddMany / Subtraction) -----------
    def mul_add_u32(self, x: int, y: int, z: int) -> tuple[int, int]:
        """x*y + z -> (lo, hi)."""
        gate = GU.U32ArithmeticGate.from_config(self.b.config)
        row, i, gate = self.b.find_slot(gate)
        self.b.connect(x, self.b.wire_t(row, gate.w_mul0(i)))
        self.b.connect(y, self.b.wire_t(row, gate.w_mul1(i)))
        self.b.connect(z, self.b.wire_t(row, gate.w_addend(i)))
        return (self.b.wire_t(row, gate.w_out_lo(i)),
                self.b.wire_t(row, gate.w_out_hi(i)))

    def mul_u32(self, x: int, y: int) -> tuple[int, int]:
        return self.mul_add_u32(x, y, self.zero_u32())

    def add_u32s_with_carry(self, addends: list[int], carry: int) -> tuple[int, int]:
        gate = GU.U32AddManyGate.from_config(self.b.config, len(addends))
        row, i, gate = self.b.find_slot(gate)
        for j, a in enumerate(addends):
            self.b.connect(a, self.b.wire_t(row, gate.w_addend(i, j)))
        self.b.connect(carry, self.b.wire_t(row, gate.w_carry(i)))
        return (self.b.wire_t(row, gate.w_result(i)),
                self.b.wire_t(row, gate.w_out_carry(i)))

    def add_u32(self, a: int, b: int) -> tuple[int, int]:
        return self.add_u32s_with_carry([a, b], self.zero_u32())

    def add_many_u32(self, addends: list[int]) -> tuple[int, int]:
        return self.add_u32s_with_carry(addends, self.zero_u32())

    def sub_u32(self, x: int, y: int, borrow: int) -> tuple[int, int]:
        gate = GU.U32SubtractionGate.from_config(self.b.config)
        row, i, gate = self.b.find_slot(gate)
        self.b.connect(x, self.b.wire_t(row, gate.w_x(i)))
        self.b.connect(y, self.b.wire_t(row, gate.w_y(i)))
        self.b.connect(borrow, self.b.wire_t(row, gate.w_borrow(i)))
        return (self.b.wire_t(row, gate.w_result(i)),
                self.b.wire_t(row, gate.w_out_borrow(i)))

    def range_check_u32(self, targets: list[int]):
        """crypto/plonky2_u32/src/gadgets/range_check.rs:12 (chunked so each
        gate row fits num_wires: 17 wires per checked limb).  In lookup mode
        each check costs two 16-bit lanes via LookupU32RangeGate slots."""
        if self.b.config.lookup is not None:
            from ..plonk import gates_lookup as GL
            if self._lk_range_gate is None:
                self._lk_range_gate = GL.LookupU32RangeGate(
                    GL.LookupU32RangeGate.max_ops(self.b.config),
                    self.b.config)
            for t in targets:
                row, i, g = self.b.find_slot(self._lk_range_gate)
                self.b.connect(t, self.b.wire_t(row, g.w_input(i)))
            return
        per_gate = max(1, self.b.config.num_wires // 17)
        for start in range(0, len(targets), per_gate):
            chunk = targets[start: start + per_gate]
            gate = GU.U32RangeCheckGate(len(chunk))
            row = self.b.add_gate(gate)
            for i, t in enumerate(chunk):
                self.b.connect(t, self.b.wire_t(row, gate.w_input(i)))

    # -- bitwise via interleaving (CircuitBuilderB32) ---------------------
    def not_u32(self, x: int) -> int:
        ff = self.constant_u32(0xFFFFFFFF)
        return self.sub_u32(ff, x, self.zero_u32())[0]

    def lsh_u32(self, x: int, n: int) -> int:
        if n == 0:
            return x
        return self.mul_u32(x, self.constant_u32(1 << n))[0]

    def rsh_u32(self, x: int, n: int) -> int:
        if n == 0:
            return x
        return self.mul_u32(x, self.constant_u32(1 << (32 - n)))[1]

    def lrot_u32(self, x: int, n: int) -> int:
        n = n % 32
        if n == 0:
            return x
        lo, hi = self.mul_u32(x, self.constant_u32(1 << n))
        return self.add_u32(lo, hi)[0]

    def rrot_u32(self, x: int, n: int) -> int:
        return self.lrot_u32(x, (32 - n) % 32)

    def interleave_u32(self, x: int) -> int:
        gate = GU.U32InterleaveGate.from_config(self.b.config)
        row, i, gate = self.b.find_slot(gate)
        self.b.connect(x, self.b.wire_t(row, gate.w_x(i)))
        return self.b.wire_t(row, gate.w_x_interleaved(i))

    def uninterleave_to_u32(self, x: int) -> tuple[int, int]:
        """Returns (evens, odds) = (AND word, XOR word) of an interleaved sum."""
        gate = GU.UninterleaveToU32Gate.from_config(self.b.config)
        row, i, gate = self.b.find_slot(gate)
        self.b.connect(x, self.b.wire_t(row, gate.w_x_interleaved(i)))
        return (self.b.wire_t(row, gate.w_evens(i)),
                self.b.wire_t(row, gate.w_odds(i)))

    def uninterleave_to_b32(self, x: int) -> tuple[int, int]:
        gate = GU.UninterleaveToB32Gate.from_config(self.b.config)
        row, i, gate = self.b.find_slot(gate)
        self.b.connect(x, self.b.wire_t(row, gate.w_x_interleaved(i)))
        return (self.b.wire_t(row, gate.w_evens(i)),
                self.b.wire_t(row, gate.w_odds(i)))

    def and_xor_b32(self, x: int, y: int) -> tuple[int, int]:
        return self.uninterleave_to_b32(self.b.add(x, y))

    def and_xor_u32(self, x: int, y: int) -> tuple[int, int]:
        return self.and_xor_b32(self.interleave_u32(x), self.interleave_u32(y))

    def and_xor_b32_to_u32(self, x: int, y: int) -> tuple[int, int]:
        return self.uninterleave_to_u32(self.b.add(x, y))

    def and_xor_u32_to_u32(self, x: int, y: int) -> tuple[int, int]:
        return self.and_xor_b32_to_u32(self.interleave_u32(x),
                                       self.interleave_u32(y))

    def and_u32(self, x: int, y: int) -> int:
        return self.and_xor_u32_to_u32(x, y)[0]

    def xor_u32(self, x: int, y: int) -> int:
        return self.and_xor_u32_to_u32(x, y)[1]

    def unsafe_xor_many_u32(self, xs: list[int]) -> int:
        """3-way interleaved adds per uninterleave; see the reference's
        soundness caveat (interleaved_u32.rs:131-141)."""
        n = len(xs)
        if n == 0:
            return self.zero_u32()
        if n == 1:
            return xs[0]
        if n == 2:
            return self.xor_u32(xs[0], xs[1])
        if n == 3:
            return self.xor_u32(self.xor_u32(xs[0], xs[1]), xs[2])
        r = self.interleave_u32(xs[0])
        for i in range((n - 3) // 2):
            i1 = self.interleave_u32(xs[1 + 2 * i])
            i2 = self.interleave_u32(xs[2 + 2 * i])
            t = self.b.add(self.b.add(r, i1), i2)
            r = self.uninterleave_to_b32(t)[1]
        if n % 2 == 0:
            xm3 = self.interleave_u32(xs[n - 3])
            r = self.and_xor_b32(r, xm3)[1]
        xm2 = self.interleave_u32(xs[n - 2])
        xm1 = self.interleave_u32(xs[n - 1])
        t = self.b.add(self.b.add(r, xm2), xm1)
        return self.uninterleave_to_u32(t)[1]

    def conditional_u32(self, x: int, y: int, sel: int) -> int:
        """sel ? x : y (sel boolean)."""
        return self.b.select(sel, x, y)

    # -- comparisons (ComparisonGate; multiple_comparison.rs:15-78) -------
    def le_bits(self, a: int, b: int, num_bits: int) -> int:
        """Boolean target: a <= b, both range-checked to num_bits."""
        nc = (num_bits + 1) // 2
        gate = GU.ComparisonGate(num_bits, nc)
        row = self.b.add_gate(gate)
        self.b.connect(a, self.b.wire_t(row, gate.w_first()))
        self.b.connect(b, self.b.wire_t(row, gate.w_second()))
        return self.b.wire_t(row, gate.w_result())

    def list_le(self, a: list[int], b: list[int], num_bits: int) -> int:
        """Boolean: a <= b as base-2^num_bits limb lists (limb 0 least
        significant).  Range-checks all inputs.  Mirrors
        multiple_comparison.rs:15 list_le_circuit."""
        assert len(a) == len(b)
        one = self.b.one()
        result = one
        for x, y in zip(a, b):
            a_le_b = self.le_bits(x, y, num_bits)
            b_le_a = self.le_bits(y, x, num_bits)
            limbs_equal = self.b.mul(a_le_b, b_le_a)
            limbs_less = self.b.sub(one, b_le_a)
            result = self.b.mul_add(limbs_equal, result, limbs_less)
        return result

    def list_le_u32(self, a: list[int], b: list[int]) -> int:
        """multiple_comparison.rs:69 list_le_u32_circuit."""
        return self.list_le(a, b, 32)
