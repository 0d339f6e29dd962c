"""u32 custom gate library (the L2 layer of SURVEY.md §2.2).

Constraint polynomials and wire layouts re-derived from
crypto/plonky2_u32/src/gates/*.rs (cited per gate); the evaluators follow
the same algebra-generic pattern as plonk/gates.py so they run vectorized
over LDE points.

Conventions shared by all gates here: 32-bit values are decomposed into
2-bit limbs with degree-4 range products; the interleave family stores bit
decompositions BIG-endian.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from .gates import Gate, Generator, reduce_with_powers

U32_MAX = (1 << 32) - 1


def _limb_range_product(alg, limb, max_limb):
    acc = limb
    for j in range(1, max_limb):
        acc = alg.mul(acc, alg.sub(limb, alg.const(j)))
    return acc


class U32ArithmeticGate(Gate):
    """x*y + z -> (out_lo, out_hi) with 2-bit-limb range decomposition.

    Wire layout: crypto/plonky2_u32/src/gates/arithmetic_u32.rs:48-90;
    constraints :110-165 (canonicity check via inverse witness, combined
    output, 32 limb products, limb recombination)."""

    LIMB_BITS = 2
    NUM_LIMBS = 32
    ROUTED_PER_OP = 6

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config):
        wires_per_op = U32ArithmeticGate.ROUTED_PER_OP + U32ArithmeticGate.NUM_LIMBS
        return U32ArithmeticGate(min(config.num_wires // wires_per_op,
                                     config.num_routed_wires // 6))

    def id(self):
        return f"U32ArithmeticGate {{ num_ops: {self.num_ops} }}"

    def num_wires(self):
        return self.num_ops * (self.ROUTED_PER_OP + self.NUM_LIMBS)

    def degree(self):
        return 1 << self.LIMB_BITS

    def num_constraints(self):
        return self.num_ops * (4 + self.NUM_LIMBS)

    # wires
    def w_mul0(self, i):
        return 6 * i

    def w_mul1(self, i):
        return 6 * i + 1

    def w_addend(self, i):
        return 6 * i + 2

    def w_out_lo(self, i):
        return 6 * i + 3

    def w_out_hi(self, i):
        return 6 * i + 4

    def w_inverse(self, i):
        return 6 * i + 5

    def w_limb(self, i, j):
        return 6 * self.num_ops + self.NUM_LIMBS * i + j

    def op_input_wires(self, i):
        return [self.w_mul0(i), self.w_mul1(i), self.w_addend(i)]

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        out = []
        base32 = alg.const(1 << 32)
        limb_base = alg.const(1 << self.LIMB_BITS)
        for i in range(self.num_ops):
            m0, m1, ad = w[self.w_mul0(i)], w[self.w_mul1(i)], w[self.w_addend(i)]
            computed = alg.add(alg.mul(m0, m1), ad)
            lo, hi = w[self.w_out_lo(i)], w[self.w_out_hi(i)]
            inv = w[self.w_inverse(i)]
            diff = alg.sub(alg.const(U32_MAX), hi)
            hi_not_max = alg.sub(alg.mul(inv, diff), alg.one())
            out.append(alg.mul(hi_not_max, lo))
            combined = alg.add(alg.mul(hi, base32), lo)
            out.append(alg.sub(combined, computed))
            comb_lo = alg.zero()
            comb_hi = alg.zero()
            mid = self.NUM_LIMBS // 2
            for j in reversed(range(self.NUM_LIMBS)):
                limb = w[self.w_limb(i, j)]
                out.append(_limb_range_product(alg, limb, 1 << self.LIMB_BITS))
                if j < mid:
                    comb_lo = alg.add(alg.mul(limb_base, comb_lo), limb)
                else:
                    comb_hi = alg.add(alg.mul(limb_base, comb_hi), limb)
            out.append(alg.sub(comb_lo, lo))
            out.append(alg.sub(comb_hi, hi))
        return out

    def generators(self, builder, row, constants):
        gens = []
        for i in range(self.num_ops):
            deps = [builder.wire_t(row, c) for c in self.op_input_wires(i)]
            outs = [builder.wire_t(row, self.w_out_lo(i)),
                    builder.wire_t(row, self.w_out_hi(i)),
                    builder.wire_t(row, self.w_inverse(i))]
            outs += [builder.wire_t(row, self.w_limb(i, j))
                     for j in range(self.NUM_LIMBS)]

            def fn(vals):
                m0, m1, ad = (int(x) for x in vals)
                total = m0 * m1 + ad
                lo, hi = total & U32_MAX, total >> 32
                inv = 0 if hi == U32_MAX else pow(U32_MAX - hi, gl64.P - 2, gl64.P)
                res = [np.uint64(lo), np.uint64(hi), np.uint64(inv)]
                res += [np.uint64((total >> (2 * j)) & 3)
                        for j in range(self.NUM_LIMBS)]
                return res

            gens.append(Generator(deps, outs, fn, op=("U32_ARITH", [])))
        return gens


class U32AddManyGate(Gate):
    """sum(addends) + carry -> (result, output_carry), 2-bit limb checked.
    crypto/plonky2_u32/src/gates/add_many_u32.rs:43-150."""

    LIMB_BITS = 2
    RESULT_LIMBS = 16
    CARRY_LIMBS = 2  # ceil(LOG2_MAX_NUM_ADDENDS=4 / 2)

    def __init__(self, num_addends: int, num_ops: int):
        self.num_addends = num_addends
        self.num_ops = num_ops

    @staticmethod
    def from_config(config, num_addends):
        nl = U32AddManyGate.RESULT_LIMBS + U32AddManyGate.CARRY_LIMBS
        wires_per_op = (num_addends + 3) + nl
        return U32AddManyGate(num_addends,
                              min(config.num_wires // wires_per_op,
                                  config.num_routed_wires // (num_addends + 3)))

    def id(self):
        return (f"U32AddManyGate {{ num_addends: {self.num_addends}, "
                f"num_ops: {self.num_ops} }}")

    @property
    def num_limbs(self):
        return self.RESULT_LIMBS + self.CARRY_LIMBS

    def num_wires(self):
        return self.num_ops * ((self.num_addends + 3) + self.num_limbs)

    def degree(self):
        return 1 << self.LIMB_BITS

    def num_constraints(self):
        return self.num_ops * (3 + self.num_limbs)

    def w_addend(self, i, j):
        return (self.num_addends + 3) * i + j

    def w_carry(self, i):
        return (self.num_addends + 3) * i + self.num_addends

    def w_result(self, i):
        return (self.num_addends + 3) * i + self.num_addends + 1

    def w_out_carry(self, i):
        return (self.num_addends + 3) * i + self.num_addends + 2

    def w_limb(self, i, j):
        return (self.num_addends + 3) * self.num_ops + self.num_limbs * i + j

    def op_input_wires(self, i):
        return [self.w_addend(i, j) for j in range(self.num_addends)] + \
            [self.w_carry(i)]

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        out = []
        base32 = alg.const(1 << 32)
        limb_base = alg.const(1 << self.LIMB_BITS)
        for i in range(self.num_ops):
            computed = w[self.w_addend(i, 0)]
            for j in range(1, self.num_addends):
                computed = alg.add(computed, w[self.w_addend(i, j)])
            computed = alg.add(computed, w[self.w_carry(i)])
            result = w[self.w_result(i)]
            out_carry = w[self.w_out_carry(i)]
            combined = alg.add(alg.mul(out_carry, base32), result)
            out.append(alg.sub(combined, computed))
            comb_res = alg.zero()
            comb_car = alg.zero()
            for j in reversed(range(self.num_limbs)):
                limb = w[self.w_limb(i, j)]
                out.append(_limb_range_product(alg, limb, 1 << self.LIMB_BITS))
                if j < self.RESULT_LIMBS:
                    comb_res = alg.add(alg.mul(limb_base, comb_res), limb)
                else:
                    comb_car = alg.add(alg.mul(limb_base, comb_car), limb)
            out.append(alg.sub(comb_res, result))
            out.append(alg.sub(comb_car, out_carry))
        return out

    def generators(self, builder, row, constants):
        gens = []
        for i in range(self.num_ops):
            deps = [builder.wire_t(row, c) for c in self.op_input_wires(i)]
            outs = [builder.wire_t(row, self.w_result(i)),
                    builder.wire_t(row, self.w_out_carry(i))]
            outs += [builder.wire_t(row, self.w_limb(i, j))
                     for j in range(self.num_limbs)]

            def fn(vals):
                total = sum(int(x) for x in vals)
                res, car = total & U32_MAX, total >> 32
                r = [np.uint64(res), np.uint64(car)]
                r += [np.uint64((total >> (2 * j)) & 3)
                      for j in range(self.num_limbs)]
                return r

            gens.append(Generator(deps, outs, fn, op=("U32_ADDMANY", [])))
        return gens


class U32SubtractionGate(Gate):
    """x - y - borrow -> (result, output_borrow).
    crypto/plonky2_u32/src/gates/subtraction_u32.rs:29-120."""

    LIMB_BITS = 2
    NUM_LIMBS = 16

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config):
        wires_per_op = 5 + U32SubtractionGate.NUM_LIMBS
        return U32SubtractionGate(min(config.num_wires // wires_per_op,
                                      config.num_routed_wires // 5))

    def id(self):
        return f"U32SubtractionGate {{ num_ops: {self.num_ops} }}"

    def num_wires(self):
        return self.num_ops * (5 + self.NUM_LIMBS)

    def degree(self):
        return 1 << self.LIMB_BITS

    def num_constraints(self):
        return self.num_ops * (3 + self.NUM_LIMBS)

    def w_x(self, i):
        return 5 * i

    def w_y(self, i):
        return 5 * i + 1

    def w_borrow(self, i):
        return 5 * i + 2

    def w_result(self, i):
        return 5 * i + 3

    def w_out_borrow(self, i):
        return 5 * i + 4

    def w_limb(self, i, j):
        return 5 * self.num_ops + self.NUM_LIMBS * i + j

    def op_input_wires(self, i):
        return [self.w_x(i), self.w_y(i), self.w_borrow(i)]

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        out = []
        base32 = alg.const(1 << 32)
        limb_base = alg.const(1 << self.LIMB_BITS)
        for i in range(self.num_ops):
            x, y, brw = w[self.w_x(i)], w[self.w_y(i)], w[self.w_borrow(i)]
            result_initial = alg.sub(alg.sub(x, y), brw)
            result = w[self.w_result(i)]
            out_borrow = w[self.w_out_borrow(i)]
            out.append(alg.sub(result,
                               alg.add(result_initial, alg.mul(base32, out_borrow))))
            comb = alg.zero()
            for j in reversed(range(self.NUM_LIMBS)):
                limb = w[self.w_limb(i, j)]
                out.append(_limb_range_product(alg, limb, 1 << self.LIMB_BITS))
                comb = alg.add(alg.mul(limb_base, comb), limb)
            out.append(alg.sub(comb, result))
            out.append(alg.mul(out_borrow, alg.sub(alg.one(), out_borrow)))
        return out

    def generators(self, builder, row, constants):
        gens = []
        for i in range(self.num_ops):
            deps = [builder.wire_t(row, c) for c in self.op_input_wires(i)]
            outs = [builder.wire_t(row, self.w_result(i)),
                    builder.wire_t(row, self.w_out_borrow(i))]
            outs += [builder.wire_t(row, self.w_limb(i, j))
                     for j in range(self.NUM_LIMBS)]

            def fn(vals):
                x, y, brw = (int(v) for v in vals)
                diff = x - y - brw
                ob = 1 if diff < 0 else 0
                res = diff + (ob << 32)
                r = [np.uint64(res), np.uint64(ob)]
                r += [np.uint64((res >> (2 * j)) & 3)
                      for j in range(self.NUM_LIMBS)]
                return r

            gens.append(Generator(deps, outs, fn, op=("U32_SUB", [])))
        return gens


class U32RangeCheckGate(Gate):
    """Range-check input limbs to 32 bits via base-4 aux decomposition.
    crypto/plonky2_u32/src/gates/range_check_u32.rs:24-90."""

    AUX_LIMB_BITS = 2
    BASE = 4
    AUX_PER_INPUT = 16

    def __init__(self, num_input_limbs: int):
        self.num_input_limbs = num_input_limbs
        self.num_ops = num_input_limbs  # for slot accounting (not slotted)

    def id(self):
        return f"U32RangeCheckGate {{ num_input_limbs: {self.num_input_limbs} }}"

    def num_wires(self):
        return self.num_input_limbs * (1 + self.AUX_PER_INPUT)

    def degree(self):
        return self.BASE

    def num_constraints(self):
        return self.num_input_limbs * (1 + self.AUX_PER_INPUT)

    def w_input(self, i):
        return i

    def w_aux(self, i, j):
        return self.num_input_limbs + self.AUX_PER_INPUT * i + j

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        out = []
        base = alg.const(self.BASE)
        for i in range(self.num_input_limbs):
            inp = w[self.w_input(i)]
            aux = [w[self.w_aux(i, j)] for j in range(self.AUX_PER_INPUT)]
            computed = reduce_with_powers(alg, aux, base)
            out.append(alg.sub(computed, inp))
            for a in aux:
                out.append(_limb_range_product(alg, a, self.BASE))
        return out

    def generators(self, builder, row, constants):
        gens = []
        for i in range(self.num_input_limbs):
            deps = [builder.wire_t(row, self.w_input(i))]
            outs = [builder.wire_t(row, self.w_aux(i, j))
                    for j in range(self.AUX_PER_INPUT)]

            def fn(vals):
                x = int(vals[0])
                return [np.uint64((x >> (2 * j)) & 3)
                        for j in range(self.AUX_PER_INPUT)]

            gens.append(Generator(deps, outs, fn, op=("U32_RANGECHECK", [])))
        return gens


class U32InterleaveGate(Gate):
    """Spread x's bits to even positions: x_interleaved = sum bit_i * 4^i.
    Bits stored big-endian.  crypto/plonky2_u32/src/gates/interleave_u32.rs:36-130."""

    NUM_BITS = 32
    B = 2

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config):
        wires_per_op = U32InterleaveGate.NUM_BITS + 2
        return U32InterleaveGate(min(config.num_wires // wires_per_op,
                                     config.num_routed_wires // 2))

    def id(self):
        return f"U32InterleaveGate {{ num_ops: {self.num_ops} }}"

    def num_wires(self):
        return self.num_ops * (self.NUM_BITS + 2)

    def degree(self):
        return self.B

    def num_constraints(self):
        return self.num_ops * (self.NUM_BITS + 2)

    def w_x(self, i):
        return 2 * i

    def w_x_interleaved(self, i):
        return 2 * i + 1

    def w_bit(self, i, j):
        """j-th big-endian bit."""
        return 2 * self.num_ops + self.NUM_BITS * i + j

    def op_input_wires(self, i):
        return [self.w_x(i)]

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        out = []
        for i in range(self.num_ops):
            x = w[self.w_x(i)]
            bits_be = [w[self.w_bit(i, j)] for j in range(self.NUM_BITS)]
            bits_le = bits_be[::-1]
            out.append(alg.sub(reduce_with_powers(alg, bits_le, alg.const(2)), x))
            x_int = w[self.w_x_interleaved(i)]
            out.append(alg.sub(reduce_with_powers(alg, bits_le, alg.const(4)), x_int))
            for b in bits_be:
                out.append(alg.mul(b, alg.sub(b, alg.one())))
        return out

    def generators(self, builder, row, constants):
        gens = []
        for i in range(self.num_ops):
            deps = [builder.wire_t(row, self.w_x(i))]
            outs = [builder.wire_t(row, self.w_x_interleaved(i))]
            outs += [builder.wire_t(row, self.w_bit(i, j))
                     for j in range(self.NUM_BITS)]

            def fn(vals):
                x = int(vals[0])
                inter = 0
                for b in range(32):
                    inter |= ((x >> b) & 1) << (2 * b)
                r = [np.uint64(inter)]
                r += [np.uint64((x >> (31 - j)) & 1) for j in range(32)]
                return r

            gens.append(Generator(deps, outs, fn, op=("U32_INTERLEAVE", [])))
        return gens


class _UninterleaveBase(Gate):
    """Common structure of UninterleaveToU32Gate / UninterleaveToB32Gate
    (crypto/plonky2_u32/src/gates/uninterleave_to_{u32,b32}.rs).

    Decomposes a 64-bit value into big-endian bits; 'evens' collects the
    big-endian-even-indexed bits (little-endian ODD positions = AND bits of
    an interleaved sum), 'odds' the XOR bits.  The b32 variant keeps outputs
    in spread (base-4) form.
    """

    NUM_BITS = 64
    B = 2
    SPREAD = False

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @classmethod
    def from_config(cls, config):
        wires_per_op = cls.NUM_BITS + 3
        return cls(min(config.num_wires // wires_per_op,
                       config.num_routed_wires // 3))

    def num_wires(self):
        return self.num_ops * (self.NUM_BITS + 3)

    def degree(self):
        return self.B

    def num_constraints(self):
        return self.num_ops * (self.NUM_BITS + 3)

    def w_x_interleaved(self, i):
        return 3 * i

    def w_evens(self, i):
        return 3 * i + 1

    def w_odds(self, i):
        return 3 * i + 2

    def w_bit(self, i, j):
        return 3 * self.num_ops + self.NUM_BITS * i + j

    def op_input_wires(self, i):
        return [self.w_x_interleaved(i)]

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        out = []
        half = self.NUM_BITS // 2
        for i in range(self.num_ops):
            x = w[self.w_x_interleaved(i)]
            bits_be = [w[self.w_bit(i, j)] for j in range(self.NUM_BITS)]
            bits_le = bits_be[::-1]
            out.append(alg.sub(reduce_with_powers(alg, bits_le, alg.const(2)), x))
            evens = alg.zero()
            odds = alg.zero()
            for j in range(half):
                shift = half - j - 1
                coeff = alg.const(1 << (2 * shift) if self.SPREAD else 1 << shift)
                evens = alg.add(evens, alg.mul(coeff, bits_be[2 * j]))
                odds = alg.add(odds, alg.mul(coeff, bits_be[2 * j + 1]))
            out.append(alg.sub(evens, w[self.w_evens(i)]))
            out.append(alg.sub(odds, w[self.w_odds(i)]))
            for b in bits_be:
                out.append(alg.mul(b, alg.sub(b, alg.one())))
        return out

    def generators(self, builder, row, constants):
        gens = []
        half = self.NUM_BITS // 2
        spread = self.SPREAD
        for i in range(self.num_ops):
            deps = [builder.wire_t(row, self.w_x_interleaved(i))]
            outs = [builder.wire_t(row, self.w_evens(i)),
                    builder.wire_t(row, self.w_odds(i))]
            outs += [builder.wire_t(row, self.w_bit(i, j))
                     for j in range(self.NUM_BITS)]

            def fn(vals, half=half, spread=spread):
                x = int(vals[0]) % gl64.P
                bits_be = [(x >> (self.NUM_BITS - 1 - j)) & 1
                           for j in range(self.NUM_BITS)]
                evens = odds = 0
                for j in range(half):
                    sh = (2 * (half - j - 1)) if spread else (half - j - 1)
                    evens += bits_be[2 * j] << sh
                    odds += bits_be[2 * j + 1] << sh
                return [np.uint64(evens), np.uint64(odds)] + \
                    [np.uint64(b) for b in bits_be]

            gens.append(Generator(deps, outs, fn,
                                  op=("UNINTERLEAVE", [1 if spread else 0])))
        return gens


class ComparisonGate(Gate):
    """first <= second over num_bits values via base-2^chunk_bits chunk
    comparison; result_bool = top bit of (2^chunk_bits + msd) where msd is
    the (field) difference at the most significant differing chunk.

    Wire layout and constraint set re-derived from
    crypto/plonky2_u32/src/gates/comparison.rs:37-195 (wires :50-95,
    constraints :118-195)."""

    def __init__(self, num_bits: int, num_chunks: int):
        self.num_bits = num_bits
        self.num_chunks = num_chunks

    @property
    def chunk_bits(self):
        return (self.num_bits + self.num_chunks - 1) // self.num_chunks

    def id(self):
        return (f"ComparisonGate {{ num_bits: {self.num_bits}, num_chunks: "
                f"{self.num_chunks}, _phantom: PhantomData"
                f"<plonky2_field::goldilocks_field::GoldilocksField> }}<D=2>")

    # wires (comparison.rs:50-95)
    def w_first(self):
        return 0

    def w_second(self):
        return 1

    def w_result(self):
        return 2

    def w_msd(self):
        return 3

    def w_first_chunk(self, c):
        return 4 + c

    def w_second_chunk(self, c):
        return 4 + self.num_chunks + c

    def w_eq_dummy(self, c):
        return 4 + 2 * self.num_chunks + c

    def w_chunks_equal(self, c):
        return 4 + 3 * self.num_chunks + c

    def w_intermediate(self, c):
        return 4 + 4 * self.num_chunks + c

    def w_msd_bit(self, i):
        return 4 + 5 * self.num_chunks + i

    def num_wires(self):
        return 4 + 5 * self.num_chunks + self.chunk_bits + 1

    def degree(self):
        return max(1 << self.chunk_bits, 3)

    def num_constraints(self):
        return 2 + 5 * self.num_chunks + (self.chunk_bits + 1) + 3

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        nc = self.num_chunks
        cb = self.chunk_bits
        chunk_base = alg.const(1 << cb)
        out = []
        first = w[self.w_first()]
        second = w[self.w_second()]
        fch = [w[self.w_first_chunk(c)] for c in range(nc)]
        sch = [w[self.w_second_chunk(c)] for c in range(nc)]
        out.append(alg.sub(reduce_with_powers(alg, fch, chunk_base), first))
        out.append(alg.sub(reduce_with_powers(alg, sch, chunk_base), second))
        msd_so_far = alg.zero()
        one = alg.one()
        for c in range(nc):
            out.append(_limb_range_product(alg, fch[c], 1 << cb))
            out.append(_limb_range_product(alg, sch[c], 1 << cb))
            diff = alg.sub(sch[c], fch[c])
            eqd = w[self.w_eq_dummy(c)]
            ceq = w[self.w_chunks_equal(c)]
            out.append(alg.sub(alg.mul(diff, eqd), alg.sub(one, ceq)))
            out.append(alg.mul(ceq, diff))
            inter = w[self.w_intermediate(c)]
            out.append(alg.sub(inter, alg.mul(ceq, msd_so_far)))
            msd_so_far = alg.add(inter, alg.mul(alg.sub(one, ceq), diff))
        msd = w[self.w_msd()]
        out.append(alg.sub(msd, msd_so_far))
        bits = [w[self.w_msd_bit(i)] for i in range(cb + 1)]
        for bit in bits:
            out.append(alg.mul(bit, alg.sub(one, bit)))
        combined = reduce_with_powers(alg, bits, alg.const(2))
        out.append(alg.sub(alg.add(alg.const(1 << cb), msd), combined))
        out.append(alg.sub(w[self.w_result()], bits[cb]))
        return out

    def generators(self, builder, row, constants):
        deps = [builder.wire_t(row, self.w_first()),
                builder.wire_t(row, self.w_second())]
        nc, cb = self.num_chunks, self.chunk_bits
        outs = [builder.wire_t(row, self.w_result()),
                builder.wire_t(row, self.w_msd())]
        outs += [builder.wire_t(row, self.w_first_chunk(c)) for c in range(nc)]
        outs += [builder.wire_t(row, self.w_second_chunk(c)) for c in range(nc)]
        outs += [builder.wire_t(row, self.w_eq_dummy(c)) for c in range(nc)]
        outs += [builder.wire_t(row, self.w_chunks_equal(c)) for c in range(nc)]
        outs += [builder.wire_t(row, self.w_intermediate(c)) for c in range(nc)]
        outs += [builder.wire_t(row, self.w_msd_bit(i)) for i in range(cb + 1)]

        def fn(vals, nc=nc, cb=cb):
            P = gl64.P
            first, second = int(vals[0]), int(vals[1])
            mask = (1 << cb) - 1
            fch = [(first >> (cb * c)) & mask for c in range(nc)]
            sch = [(second >> (cb * c)) & mask for c in range(nc)]
            eqd, ceq, inter = [], [], []
            msd = 0
            for c in range(nc):
                diff = (sch[c] - fch[c]) % P
                if diff == 0:
                    eqd.append(1)
                    ceq.append(1)
                else:
                    eqd.append(pow(diff, P - 2, P))
                    ceq.append(0)
                inter.append((ceq[c] * msd) % P)
                msd = (inter[c] + (1 - ceq[c]) * diff) % P
            combined = ((1 << cb) + msd) % P
            bits = [(combined >> i) & 1 for i in range(cb + 1)]
            out = [bits[cb], msd] + fch + sch + eqd + ceq + inter + bits
            return [np.uint64(x) for x in out]

        return [Generator(deps, outs, fn)]


class UninterleaveToU32Gate(_UninterleaveBase):
    SPREAD = False

    def id(self):
        return f"UninterleaveToU32Gate {{ num_ops: {self.num_ops} }}"


class UninterleaveToB32Gate(_UninterleaveBase):
    SPREAD = True

    def id(self):
        return f"UninterleaveToB32Gate {{ num_ops: {self.num_ops} }}"
