"""Gate library: constraint evaluators + witness generators.

Each gate defines (a) its constraint polynomials, written once against the
algebra abstraction and evaluated vectorized over LDE points on device or at
zeta on host, and (b) witness generators that fill its wires from upstream
values.  Gate IDs follow the plonky2 textual format so common-data output is
directly comparable with the reference verifier's parser
(gnark-plonky2-verifier/plonk/gates/gates.go registry).

Wire layouts mirror plonky2 exactly (cited per gate); the evaluation code is
re-derived from the verifier specs in gnark-plonky2-verifier/plonk/gates/.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos

UNUSED_SELECTOR = (1 << 32) - 1


# ---------------------------------------------------------------------------
# Witness generator framework
# ---------------------------------------------------------------------------

class Generator:
    """deps -> fn(values) -> outs.  Targets are builder-encoded ints.

    `op` optionally names a typed opcode + u64 params for the native witness
    VM (zklc_tpu/native wit_execute); generators without one run as Python
    closures through the tape's PYTHON escape.
    """

    __slots__ = ("deps", "outs", "fn", "op")

    def __init__(self, deps, outs, fn, op=None):
        self.deps = deps
        self.outs = outs
        self.fn = fn
        self.op = op


def reduce_with_powers(alg, values, x):
    """sum_i values[i] * x^i (values[0] has power 0), via Horner."""
    acc = alg.zero()
    for v in reversed(values):
        acc = alg.add(alg.mul(acc, x), v)
    return acc


# ---------------------------------------------------------------------------
# Gate base
# ---------------------------------------------------------------------------

class Gate:
    def id(self) -> str:
        raise NotImplementedError

    def num_wires(self) -> int:
        raise NotImplementedError

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        raise NotImplementedError

    def num_constraints(self) -> int:
        raise NotImplementedError

    def eval_unfiltered(self, alg, v) -> list:
        """v: EvalVars. Returns list of algebra elements (constraints)."""
        raise NotImplementedError

    def generators(self, builder, row: int, constants) -> list:
        return []

    def uses_lookup(self) -> bool:
        """True if this gate places values in the circuit's lookup lanes
        (its rows get s=1 in the activity constant column; EVERY lane on
        such rows must then hold a table member — unused lanes default 0)."""
        return False

    # sort key used for selector grouping (deterministic)
    def sort_key(self):
        return (self.degree(), self.id())


class NoopGate(Gate):
    """plonky2 NoopGate: no wires, no constraints (padding rows)."""

    def id(self):
        return "NoopGate"

    def num_wires(self):
        return 0

    def degree(self):
        return 0

    def num_constraints(self):
        return 0

    def eval_unfiltered(self, alg, v):
        return []


class ConstantGate(Gate):
    """wire i == local_constant i (gnark constant_gate.go:60-75)."""

    def __init__(self, num_consts: int = 2):
        self.num_consts = num_consts

    def id(self):
        return f"ConstantGate {{ num_consts: {self.num_consts} }}"

    def num_wires(self):
        return self.num_consts

    def num_constants(self):
        return self.num_consts

    def degree(self):
        return 1

    def num_constraints(self):
        return self.num_consts

    def eval_unfiltered(self, alg, v):
        return [alg.sub(v.local_constants[i], v.local_wires[i])
                for i in range(self.num_consts)]

    def generators(self, builder, row, constants):
        outs = [builder.wire_t(row, i) for i in range(self.num_consts)]
        # `constants` is the live instance list (mutated later by the
        # builder's constant allocator) — read it at run time, not now.
        n = self.num_consts
        return [Generator([], outs,
                          lambda _v, cs=constants:
                          [np.uint64(int(c) % gl64.P) for c in cs[:n]])]


class PublicInputGate(Gate):
    """wires 0..3 == public-inputs hash (gnark public_input_gate.go:36-52)."""

    def id(self):
        return "PublicInputGate"

    def num_wires(self):
        return 4

    def degree(self):
        return 1

    def num_constraints(self):
        return 4

    def eval_unfiltered(self, alg, v):
        return [alg.sub(v.local_wires[i], v.public_inputs_hash[i])
                for i in range(4)]


class ArithmeticGate(Gate):
    """num_ops x (c0 * x * y + c1 * z == out), wires 4i..4i+3
    (gnark arithmetic_gate.go:46-85)."""

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config) -> "ArithmeticGate":
        return ArithmeticGate(config.num_routed_wires // 4)

    def id(self):
        return f"ArithmeticGate {{ num_ops: {self.num_ops} }}"

    def num_wires(self):
        return 4 * self.num_ops

    def num_constants(self):
        return 2

    def degree(self):
        return 3

    def num_constraints(self):
        return self.num_ops

    def eval_unfiltered(self, alg, v):
        c0 = v.local_constants[0]
        c1 = v.local_constants[1]
        out = []
        for i in range(self.num_ops):
            x = v.local_wires[4 * i]
            y = v.local_wires[4 * i + 1]
            z = v.local_wires[4 * i + 2]
            o = v.local_wires[4 * i + 3]
            computed = alg.add(alg.mul(alg.mul(x, y), c0), alg.mul(z, c1))
            out.append(alg.sub(o, computed))
        return out

    def generators(self, builder, row, constants):
        c0, c1 = np.uint64(constants[0]), np.uint64(constants[1])
        gens = []
        for i in range(self.num_ops):
            deps = [builder.wire_t(row, 4 * i), builder.wire_t(row, 4 * i + 1),
                    builder.wire_t(row, 4 * i + 2)]
            outs = [builder.wire_t(row, 4 * i + 3)]

            def fn(vals, c0=c0, c1=c1):
                x, y, z = vals
                return [gl64.add(gl64.mul(gl64.mul(x, y), c0), gl64.mul(z, c1))]

            gens.append(Generator(deps, outs, fn,
                                  op=("ARITH", [int(c0), int(c1)])))
        return gens


class BaseSumGate(Gate):
    """wire 0 = sum of wires [1..1+num_limbs) in base B; limbs range-checked
    by prod_{j<B}(limb - j) == 0.  plonky2 BaseSumGate semantics
    (gnark base_sum_gate.go)."""

    def __init__(self, num_limbs: int, base: int = 2):
        self.num_limbs = num_limbs
        self.base = base

    def id(self):
        return f"BaseSumGate {{ num_limbs: {self.num_limbs} }} + Base: {self.base}"

    def num_wires(self):
        return 1 + self.num_limbs

    def degree(self):
        return max(1, self.base)

    def num_constraints(self):
        return 1 + self.num_limbs

    def eval_unfiltered(self, alg, v):
        s = v.local_wires[0]
        limbs = [v.local_wires[1 + i] for i in range(self.num_limbs)]
        base_c = alg.const(self.base)
        computed = reduce_with_powers(alg, limbs, base_c)
        constraints = [alg.sub(computed, s)]
        for limb in limbs:
            acc = limb
            for j in range(1, self.base):
                acc = alg.mul(acc, alg.sub(limb, alg.const(j)))
            constraints.append(acc)
        return constraints

    def generators(self, builder, row, constants):
        deps = [builder.wire_t(row, 0)]
        outs = [builder.wire_t(row, 1 + i) for i in range(self.num_limbs)]
        base, n = self.base, self.num_limbs

        def fn(vals, base=base, n=n):
            x = int(vals[0])
            out = []
            for _ in range(n):
                out.append(np.uint64(x % base))
                x //= base
            return out

        return [Generator(deps, outs, fn, op=("BASE_SUM", [base, n]))]


class RandomAccessGate(Gate):
    """claimed == list[access_index] via a bit-select tree; layout and
    constraint order mirror plonky2 (gnark random_access_gate.go:77-190):
    per copy [access_index, claimed, list (2^bits)] routed, then
    num_extra_constants routed constant wires, then bits aux wires."""

    def __init__(self, bits: int, num_copies: int, num_extra_constants: int = 0):
        self.bits = bits
        self.num_copies = num_copies
        self.num_extra_constants = num_extra_constants

    @staticmethod
    def from_config(config, bits: int) -> "RandomAccessGate":
        vec_size = 1 << bits
        copies = max(1, config.num_routed_wires // (2 + vec_size))
        return RandomAccessGate(bits, copies)

    def id(self):
        return (f"RandomAccessGate {{ bits: {self.bits}, num_copies: "
                f"{self.num_copies}, num_extra_constants: "
                f"{self.num_extra_constants}, _phantom: PhantomData"
                f"<plonky2_field::goldilocks_field::GoldilocksField> }}<D=2>")

    @property
    def vec_size(self):
        return 1 << self.bits

    @property
    def num_ops(self):
        return self.num_copies

    def w_access_index(self, c):
        return (2 + self.vec_size) * c

    def w_claimed(self, c):
        return (2 + self.vec_size) * c + 1

    def w_list_item(self, i, c):
        return (2 + self.vec_size) * c + 2 + i

    def _start_extra_constants(self):
        return (2 + self.vec_size) * self.num_copies

    def num_routed(self):
        return self._start_extra_constants() + self.num_extra_constants

    def w_bit(self, i, c):
        return self.num_routed() + c * self.bits + i

    def num_wires(self):
        return self.num_routed() + self.num_copies * self.bits

    def num_constants(self):
        return self.num_extra_constants

    def degree(self):
        return self.bits + 1

    def num_constraints(self):
        return self.num_copies * (self.bits + 2) + self.num_extra_constants

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        two = alg.const(2)
        constraints = []
        for c in range(self.num_copies):
            items = [w[self.w_list_item(i, c)] for i in range(self.vec_size)]
            bits = [w[self.w_bit(i, c)] for i in range(self.bits)]
            for b in bits:
                constraints.append(alg.sub(alg.mul(b, b), b))
            recon = reduce_with_powers(alg, bits, two)
            constraints.append(alg.sub(recon, w[self.w_access_index(c)]))
            for b in bits:
                items = [alg.add(items[i],
                                 alg.mul(b, alg.sub(items[i + 1], items[i])))
                         for i in range(0, len(items), 2)]
            constraints.append(alg.sub(items[0], w[self.w_claimed(c)]))
        for i in range(self.num_extra_constants):
            constraints.append(alg.sub(v.local_constants[i],
                                       w[self._start_extra_constants() + i]))
        return constraints

    def op_input_wires(self, c):
        return ([self.w_access_index(c)]
                + [self.w_list_item(i, c) for i in range(self.vec_size)])

    def generators(self, builder, row, constants):
        gens = []
        for c in range(self.num_copies):
            deps = [builder.wire_t(row, self.w_access_index(c))]
            deps += [builder.wire_t(row, self.w_list_item(i, c))
                     for i in range(self.vec_size)]
            outs = [builder.wire_t(row, self.w_bit(i, c))
                    for i in range(self.bits)]
            outs.append(builder.wire_t(row, self.w_claimed(c)))
            nbits = self.bits

            def fn(vals, nbits=nbits):
                idx = int(vals[0])
                out = [np.uint64((idx >> i) & 1) for i in range(nbits)]
                out.append(np.uint64(vals[1 + idx]))
                return out

            gens.append(Generator(deps, outs, fn,
                                  op=("RANDOM_ACCESS", [nbits])))
        return gens


class PoseidonGate(Gate):
    """Full width-12 Poseidon permutation in one row, fast-partial-round
    formulation.  Wire layout identical to plonky2
    (gnark poseidon_gate.go:29-90): 12 in | 12 out | swap | 4 deltas |
    36 full0 s-box ins | 22 partial s-box ins | 48 full1 s-box ins = 135.
    """

    W = 12

    def id(self):
        return "PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH=12>"

    def num_wires(self):
        return self.wires_end()

    def degree(self):
        return 7

    def num_constraints(self):
        return 1 + 4 + (pos.HALF_N_FULL_ROUNDS - 1) * self.W + pos.N_PARTIAL_ROUNDS \
            + pos.HALF_N_FULL_ROUNDS * self.W + self.W

    # wire layout
    def wire_input(self, i):
        return i

    def wire_output(self, i):
        return self.W + i

    def wire_swap(self):
        return 2 * self.W

    def wire_delta(self, i):
        return 2 * self.W + 1 + i

    def _start_full0(self):
        return 2 * self.W + 5

    def wire_full_sbox_0(self, r, i):
        assert 1 <= r < pos.HALF_N_FULL_ROUNDS
        return self._start_full0() + (r - 1) * self.W + i

    def _start_partial(self):
        return self._start_full0() + (pos.HALF_N_FULL_ROUNDS - 1) * self.W

    def wire_partial_sbox(self, r):
        return self._start_partial() + r

    def _start_full1(self):
        return self._start_partial() + pos.N_PARTIAL_ROUNDS

    def wire_full_sbox_1(self, r, i):
        return self._start_full1() + r * self.W + i

    def wires_end(self):
        return self._start_full1() + pos.HALF_N_FULL_ROUNDS * self.W

    # algebra-generic permutation pieces (mirror hash/poseidon.py fast form)
    def _sbox(self, alg, x):
        x2 = alg.mul(x, x)
        x4 = alg.mul(x2, x2)
        x3 = alg.mul(x, x2)
        return alg.mul(x4, x3)

    def _constant_layer(self, alg, state, rc):
        return [alg.add(state[i],
                        alg.const(int(pos.ALL_ROUND_CONSTANTS[12 * rc + i])))
                for i in range(self.W)]

    def _mds_layer(self, alg, state):
        out = []
        for r in range(self.W):
            acc = alg.zero()
            for i in range(self.W):
                c = int(pos.MDS_CIRC[i])
                acc = alg.add(acc, alg.mul(state[(i + r) % self.W], alg.const(c)))
            acc = alg.add(acc, alg.mul(state[r], alg.const(int(pos.MDS_DIAG[r]))))
            out.append(acc)
        return out

    def _mds_partial_init(self, alg, state):
        out = [alg.zero() for _ in range(self.W)]
        out[0] = state[0]
        for r in range(1, self.W):
            for d in range(1, self.W):
                t = int(pos.FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1, d - 1])
                out[d] = alg.add(out[d], alg.mul(state[r], alg.const(t)))
        return out

    def _mds_partial_fast(self, alg, state, r):
        d = alg.mul(state[0], alg.const(int(pos.MDS0TO0)))
        for i in range(1, self.W):
            t = int(pos.FAST_PARTIAL_ROUND_W_HATS[r, i - 1])
            d = alg.add(d, alg.mul(state[i], alg.const(t)))
        out = [d]
        for i in range(1, self.W):
            t = int(pos.FAST_PARTIAL_ROUND_VS[r, i - 1])
            out.append(alg.add(alg.mul(state[0], alg.const(t)), state[i]))
        return out

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        constraints = []
        swap = w[self.wire_swap()]
        constraints.append(alg.mul(swap, alg.sub(swap, alg.one())))
        for i in range(4):
            delta = w[self.wire_delta(i)]
            diff = alg.sub(w[self.wire_input(i + 4)], w[self.wire_input(i)])
            constraints.append(alg.sub(alg.mul(swap, diff), delta))
        state = []
        for i in range(4):
            state.append(alg.add(w[self.wire_input(i)], w[self.wire_delta(i)]))
        for i in range(4):
            state.append(alg.sub(w[self.wire_input(i + 4)], w[self.wire_delta(i)]))
        for i in range(8, self.W):
            state.append(w[self.wire_input(i)])

        rc = 0
        for r in range(pos.HALF_N_FULL_ROUNDS):
            state = self._constant_layer(alg, state, rc)
            if r != 0:
                for i in range(self.W):
                    sbox_in = w[self.wire_full_sbox_0(r, i)]
                    constraints.append(alg.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = [self._sbox(alg, x) for x in state]
            state = self._mds_layer(alg, state)
            rc += 1

        state = [alg.add(state[i],
                         alg.const(int(pos.FAST_PARTIAL_FIRST_ROUND_CONSTANT[i])))
                 for i in range(self.W)]
        state = self._mds_partial_init(alg, state)
        for r in range(pos.N_PARTIAL_ROUNDS - 1):
            sbox_in = w[self.wire_partial_sbox(r)]
            constraints.append(alg.sub(state[0], sbox_in))
            s0 = self._sbox(alg, sbox_in)
            s0 = alg.add(s0, alg.const(int(pos.FAST_PARTIAL_ROUND_CONSTANTS[r])))
            state = [s0] + state[1:]
            state = self._mds_partial_fast(alg, state, r)
        sbox_in = w[self.wire_partial_sbox(pos.N_PARTIAL_ROUNDS - 1)]
        constraints.append(alg.sub(state[0], sbox_in))
        state = [self._sbox(alg, sbox_in)] + state[1:]
        state = self._mds_partial_fast(alg, state, pos.N_PARTIAL_ROUNDS - 1)
        rc += pos.N_PARTIAL_ROUNDS

        for r in range(pos.HALF_N_FULL_ROUNDS):
            state = self._constant_layer(alg, state, rc)
            for i in range(self.W):
                sbox_in = w[self.wire_full_sbox_1(r, i)]
                constraints.append(alg.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = [self._sbox(alg, x) for x in state]
            state = self._mds_layer(alg, state)
            rc += 1

        for i in range(self.W):
            constraints.append(alg.sub(state[i], w[self.wire_output(i)]))
        return constraints

    def generators(self, builder, row, constants):
        deps = [builder.wire_t(row, self.wire_input(i)) for i in range(self.W)]
        deps.append(builder.wire_t(row, self.wire_swap()))
        outs = []
        outs += [builder.wire_t(row, self.wire_delta(i)) for i in range(4)]
        for r in range(1, pos.HALF_N_FULL_ROUNDS):
            outs += [builder.wire_t(row, self.wire_full_sbox_0(r, i))
                     for i in range(self.W)]
        outs += [builder.wire_t(row, self.wire_partial_sbox(r))
                 for r in range(pos.N_PARTIAL_ROUNDS)]
        for r in range(pos.HALF_N_FULL_ROUNDS):
            outs += [builder.wire_t(row, self.wire_full_sbox_1(r, i))
                     for i in range(self.W)]
        outs += [builder.wire_t(row, self.wire_output(i)) for i in range(self.W)]

        def fn(vals):
            inputs = np.array(vals[: self.W], dtype=np.uint64)
            swap = int(vals[self.W])
            out_vals = []
            deltas = []
            state = inputs.copy()
            for i in range(4):
                d = gl64.mul(np.uint64(swap), gl64.sub(inputs[i + 4], inputs[i]))
                deltas.append(d)
                state[i] = gl64.add(inputs[i], d)
                state[i + 4] = gl64.sub(inputs[i + 4], d)
            out_vals += deltas
            with np.errstate(over="ignore"):
                st = state.copy()
                rc = 0
                for r in range(pos.HALF_N_FULL_ROUNDS):
                    st = pos._constant_layer(st, rc)
                    if r != 0:
                        out_vals += list(st)
                    st = pos._sbox(st)
                    st = pos._mds_layer(st)
                    rc += 1
                st = pos.partial_first_constant_layer(st)
                st = pos.mds_partial_layer_init(st)
                for r in range(pos.N_PARTIAL_ROUNDS):
                    out_vals.append(st[0])
                    st = st.copy()
                    st[0] = pos._sbox(np.uint64(st[0]))
                    st[0] = gl64.add(st[0], pos.FAST_PARTIAL_ROUND_CONSTANTS[r])
                    st = pos.mds_partial_layer_fast(st, r)
                rc += pos.N_PARTIAL_ROUNDS
                for r in range(pos.HALF_N_FULL_ROUNDS):
                    st = pos._constant_layer(st, rc)
                    out_vals += list(st)
                    st = pos._sbox(st)
                    st = pos._mds_layer(st)
                    rc += 1
            out_vals += list(st)
            return [np.uint64(x) for x in out_vals]

        return [Generator(deps, outs, fn, op=("POSEIDON", []))]
