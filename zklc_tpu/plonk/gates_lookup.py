"""Lookup-lane gates: one-row foreign-field arithmetic + cheap u32 range
checks via the LogUp tables (plonk/lookup.py).

These replace the row-hungry u32-limb nonnative stack the reference uses
(crypto/plonky2_ecdsa/src/gadgets/biguint.rs mul_biguint +
crypto/plonky2_u32 arithmetic/range gates + the hint-and-constrain pattern
of crypto/plonky2_ed25519/src/gadgets/nonnative.rs:455-664): a full
"a * b mod M" — including canonicity r < M and implicit range checks of
a and b — costs ONE row here instead of ~50, because every 16-bit piece
rides a lookup lane instead of 16 base-4 aux wires.

Lane budget (CircuitConfig.wide_lookup_config: tables (16, 6), lanes
(110, 30), lanes at wire columns [94..234)):

  ForeignFieldMulGate   T16: a16/b16/q16/r16 (64) + carry-lo (30) + d (16)
                        T6 : carry-hi (30)
  ForeignFieldAddGate   T16: r16 (16) + d (16) per op, 3 ops/row
  LookupU32RangeGate    T16: (lo, hi) per checked u32, 55 per row
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from .gates import Gate, Generator

MASK16 = (1 << 16) - 1
CARRY_SHIFT = 1 << 21     # carries live in (-2^21, 2^21); shifted to [0, 2^22)


def _lane_base(config) -> int:
    """First lane column (lanes sit at the top of the wire space)."""
    return config.num_wires - config.lookup.total_lanes


def _t6_base(config) -> int:
    return config.num_wires - config.lookup.lanes[-1]


def _limbs16(v: int, n: int) -> list:
    return [(v >> (16 * i)) & MASK16 for i in range(n)]


class ForeignFieldMulGate(Gate):
    """a * b = q * M + r over 16-bit limbs, one op per row.

    Semantics of nonnative mul+reduce (plonky2_ed25519 nonnative.rs:455-563
    hint generators + biguint constraint chain), re-laid-out for lookup
    lanes.  Routed wires: a32[8] | b32[8] | r32[8].  The 16-bit pieces of
    a, b, q, r occupy T16 lanes (hence a, b, r < 2^256 is enforced HERE —
    callers need no separate range checks), conv carries are shifted into
    a 16-bit low piece (T16) and 6-bit high piece (T6), and r < M rides a
    borrow chain whose 16-bit differences are T16 lanes.
    """

    NL32 = 8
    NL16 = 16
    NCARRY = 2 * 16 - 2          # conv columns 0..30 -> carries c_0..c_29

    def __init__(self, modulus: int, config):
        assert modulus.bit_length() <= 256
        self.modulus = modulus
        self.config = config
        base = _lane_base(config)
        self.la = base            # a16 lanes
        self.lb = base + 16
        self.lq = base + 32
        self.lr = base + 48
        self.lcarry_lo = base + 64          # 30 lanes
        self.ld = base + 94                 # 16 lanes (r < M diffs)
        self.lcarry_hi = _t6_base(config)   # 30 T6 lanes
        # non-lane wires
        self.w_a = 0
        self.w_b = 8
        self.w_r = 16
        self.w_bor = 24          # 16 borrow bits
        self.mm16 = _limbs16(modulus - 1, 16)
        self.m16 = _limbs16(modulus, 16)

    num_ops = 1

    def id(self):
        return f"ForeignFieldMulGate {{ modulus: {self.modulus:#x} }}"

    def op_input_wires(self, i):
        return list(range(self.w_a, self.w_a + 8)) + \
            list(range(self.w_b, self.w_b + 8))

    def num_wires(self):
        return self.config.num_wires

    def num_constants(self):
        return 0

    def degree(self):
        return 2

    def uses_lookup(self):
        return True

    def num_constraints(self):
        return 24 + 31 + 16 + 16 + 1

    # -- constraint polynomials -------------------------------------------
    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        cons = []
        two16 = alg.const(1 << 16)
        # 32-bit limb <-> 16-bit piece links
        for base32, base16 in ((self.w_a, self.la), (self.w_b, self.lb),
                               (self.w_r, self.lr)):
            for j in range(8):
                lo = w[base16 + 2 * j]
                hi = w[base16 + 2 * j + 1]
                cons.append(alg.sub(w[base32 + j],
                                    alg.add(lo, alg.mul(two16, hi))))
        # carries (shifted): c_k = lo + 2^16*hi - 2^21
        shift = alg.const(CARRY_SHIFT)

        def carry(k):
            lo = w[self.lcarry_lo + k]
            hi = w[self.lcarry_hi + k]
            return alg.sub(alg.add(lo, alg.mul(two16, hi)), shift)

        # conv columns D_k = sum a16_i b16_j - sum q16_i M16_j - r16_k
        for k in range(31):
            d = alg.zero()
            for i in range(max(0, k - 15), min(16, k + 1)):
                j = k - i
                d = alg.add(d, alg.mul(w[self.la + i], w[self.lb + j]))
                d = alg.sub(d, alg.mul(alg.const(self.m16[j]),
                                       w[self.lq + i]))
            if k < 16:
                d = alg.sub(d, w[self.lr + k])
            if k > 0:
                d = alg.add(d, carry(k - 1))
            if k < 30:
                d = alg.sub(d, alg.mul(two16, carry(k)))
            cons.append(d)
        # r < M: (M-1) - r borrow chain, 16-bit diffs on lanes
        for k in range(16):
            bor = w[self.w_bor + k]
            prev = w[self.w_bor + k - 1] if k > 0 else alg.zero()
            t = alg.sub(alg.const(self.mm16[k]), w[self.lr + k])
            t = alg.sub(t, prev)
            t = alg.add(t, alg.mul(two16, bor))
            cons.append(alg.sub(t, w[self.ld + k]))
        for k in range(16):
            bor = w[self.w_bor + k]
            cons.append(alg.mul(bor, alg.sub(bor, alg.one())))
        cons.append(w[self.w_bor + 15])      # no final borrow -> r <= M-1
        return cons

    # -- witness ------------------------------------------------------------
    def generators(self, builder, row: int, constants) -> list:
        wt = builder.wire_t
        deps = [wt(row, self.w_a + j) for j in range(8)] + \
               [wt(row, self.w_b + j) for j in range(8)]
        outs = [wt(row, self.w_r + j) for j in range(8)]
        outs += [wt(row, self.la + i) for i in range(16)]
        outs += [wt(row, self.lb + i) for i in range(16)]
        outs += [wt(row, self.lq + i) for i in range(16)]
        outs += [wt(row, self.lr + i) for i in range(16)]
        outs += [wt(row, self.lcarry_lo + k) for k in range(30)]
        outs += [wt(row, self.lcarry_hi + k) for k in range(30)]
        outs += [wt(row, self.ld + k) for k in range(16)]
        outs += [wt(row, self.w_bor + k) for k in range(16)]
        modulus = self.modulus
        mm16 = self.mm16
        m16 = self.m16

        def fn(vals):
            a = sum(int(vals[j]) << (32 * j) for j in range(8))
            b = sum(int(vals[8 + j]) << (32 * j) for j in range(8))
            q, r = divmod(a * b, modulus)
            out = [(r >> (32 * j)) & 0xFFFFFFFF for j in range(8)]
            a16 = _limbs16(a, 16)
            b16 = _limbs16(b, 16)
            q16 = _limbs16(q, 16)
            r16 = _limbs16(r, 16)
            out += a16 + b16 + q16 + r16
            carries = []
            c = 0
            for k in range(30):
                d = -r16[k] if k < 16 else 0
                for i in range(max(0, k - 15), min(16, k + 1)):
                    d += a16[i] * b16[k - i] - q16[i] * m16[k - i]
                c = (d + c) >> 16
                assert -CARRY_SHIFT < c < CARRY_SHIFT
                carries.append(c + CARRY_SHIFT)
            out += [cv & MASK16 for cv in carries]
            out += [cv >> 16 for cv in carries]
            dlo, bor, prev = [], [], 0
            for k in range(16):
                t = mm16[k] - r16[k] - prev
                prev = 1 if t < 0 else 0
                dlo.append(t + (prev << 16))
                bor.append(prev)
            out += dlo + bor
            return [np.uint64(x) for x in out]

        mu = (1 << 512) // modulus
        params = list(self.m16) + list(self.mm16) + \
            [(modulus >> (32 * j)) & 0xFFFFFFFF for j in range(8)] + \
            [(mu >> (32 * j)) & 0xFFFFFFFF for j in range(17)]
        return [Generator(deps, outs, fn, op=("FFMUL", params))]


class ForeignFieldAddGate(Gate):
    """r = a +/- b mod M, several ops per row.

    Carries work at 32-bit limb granularity (tiny range, constrained by a
    degree-4 product); only r's 16-bit pieces and the r < M borrow diffs
    need lanes (a and b were range-checked where they were produced).
    add: r = a + b - q*M, q in {0,1}.   sub: r = a - b + q*M, q in {0,1}.
    Routed per op: a32[8] | b32[8] | r32[8].
    """

    ROUTED_PER_OP = 24
    LANES_PER_OP = 32            # r16 (16) + d (16)

    AUX_PER_OP = 1 + 7 + 16      # q, carries c0..c6, borrows

    def __init__(self, modulus: int, sub: bool, config):
        self.modulus = modulus
        self.sub_mode = sub
        self.config = config
        t16 = config.lookup.lanes[0]
        lane_base = _lane_base(config)
        per_op_nonlane = self.ROUTED_PER_OP + self.AUX_PER_OP
        self.num_ops = min(config.num_routed_wires // self.ROUTED_PER_OP,
                           t16 // self.LANES_PER_OP,
                           lane_base // per_op_nonlane)
        assert self.num_ops >= 1, "config too narrow for ForeignFieldAddGate"
        self.m32 = [(modulus >> (32 * j)) & 0xFFFFFFFF for j in range(8)]
        self.mm16 = _limbs16(modulus - 1, 16)
        self.lane0 = lane_base
        # non-lane aux wires packed after the ops' routed blocks:
        # per op [q, c0..c6, bor0..bor15]
        self.aux0 = self.ROUTED_PER_OP * self.num_ops

    def id(self):
        kind = "sub" if self.sub_mode else "add"
        return (f"ForeignFieldAddGate {{ modulus: {self.modulus:#x}, "
                f"kind: {kind}, num_ops: {self.num_ops} }}")

    def num_wires(self):
        return self.config.num_wires

    def degree(self):
        return 5                 # carry range product over {-2..2}

    def uses_lookup(self):
        return True

    def num_constraints(self):
        # per op: 8 limb eqs + 7 carry ranges + q bool + 8 r16 links +
        #         16 borrow-chain eqs + 16 borrow bools + final borrow
        return self.num_ops * (8 + 7 + 1 + 8 + 16 + 16 + 1)

    def op_input_wires(self, i):
        return [self.w_a(i, j) for j in range(8)] + \
            [self.w_b(i, j) for j in range(8)]

    def w_a(self, i, j):
        return self.ROUTED_PER_OP * i + j

    def w_b(self, i, j):
        return self.ROUTED_PER_OP * i + 8 + j

    def w_r(self, i, j):
        return self.ROUTED_PER_OP * i + 16 + j

    def w_q(self, i):
        return self.aux0 + self.AUX_PER_OP * i

    def w_c(self, i, j):
        return self.aux0 + self.AUX_PER_OP * i + 1 + j

    def w_bor(self, i, k):
        return self.aux0 + self.AUX_PER_OP * i + 8 + k

    def l_r16(self, i, k):
        return self.lane0 + self.LANES_PER_OP * i + k

    def l_d(self, i, k):
        return self.lane0 + self.LANES_PER_OP * i + 16 + k

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        cons = []
        two16 = alg.const(1 << 16)
        two32 = alg.const(1 << 32)
        sgn = -1 if self.sub_mode else 1
        for i in range(self.num_ops):
            q = w[self.w_q(i)]
            # limb equations with signed small carries
            for j in range(8):
                # D_j = a_j +/- b_j -/+ q*M_j - r_j + c_{j-1} - 2^32 c_j = 0
                d = w[self.w_a(i, j)]
                if self.sub_mode:
                    d = alg.sub(d, w[self.w_b(i, j)])
                    d = alg.add(d, alg.mul(alg.const(self.m32[j]), q))
                else:
                    d = alg.add(d, w[self.w_b(i, j)])
                    d = alg.sub(d, alg.mul(alg.const(self.m32[j]), q))
                d = alg.sub(d, w[self.w_r(i, j)])
                if j > 0:
                    d = alg.add(d, w[self.w_c(i, j - 1)])
                if j < 7:
                    d = alg.sub(d, alg.mul(two32, w[self.w_c(i, j)]))
                cons.append(d)
            # carries in {-2, -1, 0, 1, 2}
            for j in range(7):
                c = w[self.w_c(i, j)]
                prod = alg.mul(c, alg.sub(c, alg.one()))
                prod = alg.mul(prod, alg.add(c, alg.one()))
                prod = alg.mul(prod, alg.sub(c, alg.const(2)))
                prod = alg.mul(prod, alg.add(c, alg.const(2)))
                cons.append(prod)
            cons.append(alg.mul(q, alg.sub(q, alg.one())))
            # r16 piece links
            for j in range(8):
                lo = w[self.l_r16(i, 2 * j)]
                hi = w[self.l_r16(i, 2 * j + 1)]
                cons.append(alg.sub(w[self.w_r(i, j)],
                                    alg.add(lo, alg.mul(two16, hi))))
            # r < M borrow chain
            for k in range(16):
                bor = w[self.w_bor(i, k)]
                prev = w[self.w_bor(i, k - 1)] if k > 0 else alg.zero()
                t = alg.sub(alg.const(self.mm16[k]), w[self.l_r16(i, k)])
                t = alg.sub(t, prev)
                t = alg.add(t, alg.mul(two16, bor))
                cons.append(alg.sub(t, w[self.l_d(i, k)]))
            for k in range(16):
                bor = w[self.w_bor(i, k)]
                cons.append(alg.mul(bor, alg.sub(bor, alg.one())))
            cons.append(w[self.w_bor(i, 15)])
        return cons

    def generators(self, builder, row: int, constants) -> list:
        wt = builder.wire_t
        gens = []
        modulus = self.modulus
        mm16 = self.mm16
        sub_mode = self.sub_mode
        for i in range(self.num_ops):
            deps = [wt(row, self.w_a(i, j)) for j in range(8)] + \
                   [wt(row, self.w_b(i, j)) for j in range(8)]
            outs = [wt(row, self.w_r(i, j)) for j in range(8)]
            outs += [wt(row, self.w_q(i))]
            outs += [wt(row, self.w_c(i, j)) for j in range(7)]
            outs += [wt(row, self.l_r16(i, k)) for k in range(16)]
            outs += [wt(row, self.l_d(i, k)) for k in range(16)]
            outs += [wt(row, self.w_bor(i, k)) for k in range(16)]

            def fn(vals, sub_mode=sub_mode):
                a = sum(int(vals[j]) << (32 * j) for j in range(8))
                b = sum(int(vals[8 + j]) << (32 * j) for j in range(8))
                if sub_mode:
                    t = a - b
                    q = 1 if t < 0 else 0
                    r = t + modulus * q
                else:
                    t = a + b
                    q = 1 if t >= modulus else 0
                    r = t - modulus * q
                assert 0 <= r < modulus, "ffadd inputs out of range"
                out = [(r >> (32 * j)) & 0xFFFFFFFF for j in range(8)]
                out.append(q)
                # carries: D_j accumulation at 32-bit granularity
                carries = []
                c = 0
                mq = modulus * q
                for j in range(7):
                    aj = (a >> (32 * j)) & 0xFFFFFFFF
                    bj = (b >> (32 * j)) & 0xFFFFFFFF
                    mj = (mq >> (32 * j)) & 0xFFFFFFFF
                    rj = (r >> (32 * j)) & 0xFFFFFFFF
                    d = aj - bj + mj - rj + c if sub_mode \
                        else aj + bj - mj - rj + c
                    c = d >> 32
                    assert d == (c << 32), "non-exact 32-bit carry"
                    carries.append(c % gl64.P)
                out += carries
                r16 = _limbs16(r, 16)
                out += r16
                dlo, bor, prev = [], [], 0
                for k in range(16):
                    tt = mm16[k] - r16[k] - prev
                    prev = 1 if tt < 0 else 0
                    dlo.append(tt + (prev << 16))
                    bor.append(prev)
                out += dlo + bor
                return [np.uint64(x % gl64.P) for x in out]

            params = [1 if sub_mode else 0] + \
                [(modulus >> (32 * j)) & 0xFFFFFFFF for j in range(8)] + \
                list(mm16)
            gens.append(Generator(deps, outs, fn, op=("FFADD", params)))
        return gens


class LookupU32RangeGate(Gate):
    """Range-check u32 inputs via two 16-bit lane pieces each.

    Replaces U32RangeCheckGate's 16 base-4 aux wires per input
    (crypto/plonky2_u32/src/gates/range_check_u32.rs) with 2 lanes + one
    linear constraint.
    """

    def __init__(self, num_ops: int, config):
        self.num_ops = num_ops
        self.config = config
        self.lane0 = _lane_base(config)

    @staticmethod
    def max_ops(config) -> int:
        return min(config.num_routed_wires, config.lookup.lanes[0] // 2)

    def id(self):
        return f"LookupU32RangeGate {{ num_ops: {self.num_ops} }}"

    def num_wires(self):
        return self.config.num_wires

    def degree(self):
        return 1

    def uses_lookup(self):
        return True

    def num_constraints(self):
        return self.num_ops

    def w_input(self, i):
        return i

    def op_input_wires(self, i):
        return [self.w_input(i)]

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        two16 = alg.const(1 << 16)
        cons = []
        for i in range(self.num_ops):
            lo = w[self.lane0 + 2 * i]
            hi = w[self.lane0 + 2 * i + 1]
            cons.append(alg.sub(w[i], alg.add(lo, alg.mul(two16, hi))))
        return cons

    def generators(self, builder, row: int, constants) -> list:
        wt = builder.wire_t
        gens = []
        for i in range(self.num_ops):
            deps = [wt(row, i)]
            outs = [wt(row, self.lane0 + 2 * i), wt(row, self.lane0 + 2 * i + 1)]

            def fn(vals):
                x = int(vals[0])
                assert x < (1 << 32), f"u32 range check witness {x}"
                return [np.uint64(x & MASK16), np.uint64(x >> 16)]

            gens.append(Generator(deps, outs, fn, op=("LK_RANGE", [])))
        return gens
