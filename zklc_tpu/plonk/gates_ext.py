"""Extension-operand core gates + the gate-id factory.

Completes the plonky2 core gate set (the 16 evaluators the gnark wrapper
dispatches in gnark-plonky2-verifier/plonk/gates/evaluate_gates.go:105):
ArithmeticExtensionGate, MulExtensionGate, ReducingGate,
ReducingExtensionGate, PoseidonMdsGate, CosetInterpolationGate,
ExponentiationGate.  Wire layouts and constraint ORDER mirror plonky2
exactly (cited per gate against the gnark evaluator sources) so the
CPU-replay oracle (wrap/gnark_oracle.py) can verify reference-produced
proofs and gnark can verify ours.

Extension-operand gates treat pairs of wires as one F_{p^2} element.  Their
constraints are written against `ExtAlg`, the quadratic extension OVER the
evaluation algebra (base rows for the prover's quotient, F_{p^2} at zeta for
the verifier) — plonky2's "extension algebra" with X^2 = W = 7.
"""
from __future__ import annotations

import re

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from .gates import Gate, Generator

D = 2            # extension degree
W = gl64.EXT_W   # X^2 = 7


class ExtAlg:
    """F_{p^D} elements with coefficients in an evaluation algebra: values
    are [c0, c1] lists of algebra scalars (gnark
    goldilocks/quadratic_extension_algebra.go semantics)."""

    def __init__(self, alg):
        self.alg = alg
        self._w = alg.const(W)

    def from_wires(self, v, start):
        return [v.local_wires[start], v.local_wires[start + 1]]

    def from_scalar(self, s):
        """Lift one algebra scalar (an in-circuit ext VALUE) to the algebra
        diag embedding: [s, 0]."""
        return [s, self.alg.zero()]

    def zero(self):
        return [self.alg.zero(), self.alg.zero()]

    def one(self):
        return [self.alg.one(), self.alg.zero()]

    def add(self, a, b):
        return [self.alg.add(a[0], b[0]), self.alg.add(a[1], b[1])]

    def sub(self, a, b):
        return [self.alg.sub(a[0], b[0]), self.alg.sub(a[1], b[1])]

    def mul(self, a, b):
        alg = self.alg
        c0 = alg.add(alg.mul(a[0], b[0]),
                     alg.mul(self._w, alg.mul(a[1], b[1])))
        c1 = alg.add(alg.mul(a[0], b[1]), alg.mul(a[1], b[0]))
        return [c0, c1]

    def scalar_mul(self, s, a):
        """s: algebra scalar (ext variable), a: ExtAlg element."""
        return [self.alg.mul(s, a[0]), self.alg.mul(s, a[1])]


def _ext_np(vals):
    """Host-side F_{p^2} pair from two u64 values."""
    return np.array([int(vals[0]), int(vals[1])], dtype=np.uint64)


# ---------------------------------------------------------------------------
# ArithmeticExtensionGate (arithmetic_extension_gate.go:60-88)
# ---------------------------------------------------------------------------

class ArithmeticExtensionGate(Gate):
    """num_ops x (c0 * m0 * m1 + c1 * addend == out) over F_{p^2} operands;
    wires 8i .. 8i+7 = [m0, m1, addend, out] as D-pairs."""

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config):
        return ArithmeticExtensionGate(config.num_routed_wires // (4 * D))

    def id(self):
        return f"ArithmeticExtensionGate {{ num_ops: {self.num_ops} }}"

    def num_wires(self):
        return 4 * D * self.num_ops

    def num_constants(self):
        return 2

    def degree(self):
        return 3

    def num_constraints(self):
        return D * self.num_ops

    def eval_unfiltered(self, alg, v):
        ea = ExtAlg(alg)
        c0, c1 = v.local_constants[0], v.local_constants[1]
        out = []
        for i in range(self.num_ops):
            base = 4 * D * i
            m0 = ea.from_wires(v, base)
            m1 = ea.from_wires(v, base + D)
            addend = ea.from_wires(v, base + 2 * D)
            output = ea.from_wires(v, base + 3 * D)
            computed = ea.add(ea.scalar_mul(c0, ea.mul(m0, m1)),
                              ea.scalar_mul(c1, addend))
            diff = ea.sub(output, computed)
            out += [diff[0], diff[1]]
        return out

    def generators(self, builder, row, constants):
        c0 = _ext_np([constants[0], 0])
        c1 = _ext_np([constants[1], 0])
        gens = []
        for i in range(self.num_ops):
            base = 4 * D * i
            deps = [builder.wire_t(row, base + k) for k in range(3 * D)]
            outs = [builder.wire_t(row, base + 3 * D),
                    builder.wire_t(row, base + 3 * D + 1)]

            def fn(vals, c0=c0, c1=c1):
                m0 = _ext_np(vals[0:2])
                m1 = _ext_np(vals[2:4])
                ad = _ext_np(vals[4:6])
                r = gl64.ext_add(gl64.ext_mul(c0, gl64.ext_mul(m0, m1)),
                                 gl64.ext_mul(c1, ad))
                return [r[0], r[1]]

            gens.append(Generator(deps, outs, fn))
        return gens


# ---------------------------------------------------------------------------
# MulExtensionGate (multiplication_extension_gate.go:55-76)
# ---------------------------------------------------------------------------

class MulExtensionGate(Gate):
    """num_ops x (c0 * m0 * m1 == out) over F_{p^2}; wires 6i..6i+5."""

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def from_config(config):
        return MulExtensionGate(config.num_routed_wires // (3 * D))

    def id(self):
        return f"MulExtensionGate {{ num_ops: {self.num_ops} }}"

    def num_wires(self):
        return 3 * D * self.num_ops

    def num_constants(self):
        return 1

    def degree(self):
        return 3

    def num_constraints(self):
        return D * self.num_ops

    def eval_unfiltered(self, alg, v):
        ea = ExtAlg(alg)
        c0 = v.local_constants[0]
        out = []
        for i in range(self.num_ops):
            base = 3 * D * i
            m0 = ea.from_wires(v, base)
            m1 = ea.from_wires(v, base + D)
            output = ea.from_wires(v, base + 2 * D)
            diff = ea.sub(output, ea.scalar_mul(c0, ea.mul(m0, m1)))
            out += [diff[0], diff[1]]
        return out

    def generators(self, builder, row, constants):
        c0 = _ext_np([constants[0], 0])
        gens = []
        for i in range(self.num_ops):
            base = 3 * D * i
            deps = [builder.wire_t(row, base + k) for k in range(2 * D)]
            outs = [builder.wire_t(row, base + 2 * D),
                    builder.wire_t(row, base + 2 * D + 1)]

            def fn(vals, c0=c0):
                r = gl64.ext_mul(c0, gl64.ext_mul(_ext_np(vals[0:2]),
                                                  _ext_np(vals[2:4])))
                return [r[0], r[1]]

            gens.append(Generator(deps, outs, fn))
        return gens


# ---------------------------------------------------------------------------
# ReducingGate / ReducingExtensionGate (reducing_gate.go:70-105,
# reducing_extension_gate.go:74-107)
# ---------------------------------------------------------------------------

class ReducingGate(Gate):
    """acc_i = acc_{i-1} * alpha + coeff_i with BASE-field coeffs; wires
    [out(D) | alpha(D) | old_acc(D) | coeffs(num) | accs(D*(num-1))]."""

    def __init__(self, num_coeffs: int):
        self.num_coeffs = num_coeffs

    @staticmethod
    def from_config(config):
        # plonky2 max_coeffs_len: routed wires fit 3D + num, unrouted accs
        return ReducingGate((config.num_routed_wires - 3 * D))

    def id(self):
        return f"ReducingGate {{ num_coeffs: {self.num_coeffs} }}"

    def num_wires(self):
        return 3 * D + self.num_coeffs + D * (self.num_coeffs - 1)

    def degree(self):
        return 2

    def num_constraints(self):
        return D * self.num_coeffs

    def _acc_start(self):
        return 3 * D + self.num_coeffs

    def _acc_range(self, i):
        if i == self.num_coeffs - 1:
            return 0                      # wiresOutput
        return self._acc_start() + D * i

    def eval_unfiltered(self, alg, v):
        ea = ExtAlg(alg)
        alpha = ea.from_wires(v, D)
        acc = ea.from_wires(v, 2 * D)
        out = []
        for i in range(self.num_coeffs):
            coeff = ea.from_scalar(v.local_wires[3 * D + i])
            nxt = ea.from_wires(v, self._acc_range(i))
            diff = ea.sub(ea.add(ea.mul(acc, alpha), coeff), nxt)
            out += [diff[0], diff[1]]
            acc = nxt
        return out

    def generators(self, builder, row, constants):
        n = self.num_coeffs
        deps = [builder.wire_t(row, D + k) for k in range(2 * D)]       # alpha, old_acc
        deps += [builder.wire_t(row, 3 * D + i) for i in range(n)]      # coeffs
        outs = []
        for i in range(n):
            s = self._acc_range(i)
            outs += [builder.wire_t(row, s), builder.wire_t(row, s + 1)]

        def fn(vals, n=n):
            alpha = _ext_np(vals[0:2])
            acc = _ext_np(vals[2:4])
            out = []
            for i in range(n):
                coeff = _ext_np([vals[4 + i], 0])
                acc = gl64.ext_add(gl64.ext_mul(acc, alpha), coeff)
                out += [acc[0], acc[1]]
            return out

        return [Generator(deps, outs, fn)]


class ReducingExtensionGate(Gate):
    """Same reduction with F_{p^2} coeffs; wires
    [out(D) | alpha(D) | old_acc(D) | coeffs(D*num) | accs(D*(num-1))]."""

    def __init__(self, num_coeffs: int):
        self.num_coeffs = num_coeffs

    @staticmethod
    def from_config(config):
        return ReducingExtensionGate((config.num_routed_wires - 3 * D) // D)

    def id(self):
        return f"ReducingExtensionGate {{ num_coeffs: {self.num_coeffs} }}"

    def num_wires(self):
        return 3 * D + D * self.num_coeffs + D * (self.num_coeffs - 1)

    def degree(self):
        return 2

    def num_constraints(self):
        return D * self.num_coeffs

    def _acc_start(self):
        return 3 * D + D * self.num_coeffs

    def _acc_range(self, i):
        if i == self.num_coeffs - 1:
            return 0
        return self._acc_start() + D * i

    def eval_unfiltered(self, alg, v):
        ea = ExtAlg(alg)
        alpha = ea.from_wires(v, D)
        acc = ea.from_wires(v, 2 * D)
        out = []
        for i in range(self.num_coeffs):
            coeff = ea.from_wires(v, 3 * D + D * i)
            nxt = ea.from_wires(v, self._acc_range(i))
            diff = ea.sub(ea.add(ea.mul(acc, alpha), coeff), nxt)
            out += [diff[0], diff[1]]
            acc = nxt
        return out

    def generators(self, builder, row, constants):
        n = self.num_coeffs
        deps = [builder.wire_t(row, D + k) for k in range(2 * D)]
        deps += [builder.wire_t(row, 3 * D + k) for k in range(D * n)]
        outs = []
        for i in range(n):
            s = self._acc_range(i)
            outs += [builder.wire_t(row, s), builder.wire_t(row, s + 1)]

        def fn(vals, n=n):
            alpha = _ext_np(vals[0:2])
            acc = _ext_np(vals[2:4])
            out = []
            for i in range(n):
                coeff = _ext_np(vals[4 + 2 * i: 6 + 2 * i])
                acc = gl64.ext_add(gl64.ext_mul(acc, alpha), coeff)
                out += [acc[0], acc[1]]
            return out

        return [Generator(deps, outs, fn)]


# ---------------------------------------------------------------------------
# PoseidonMdsGate (poseidon_mds_gate.go:74-99)
# ---------------------------------------------------------------------------

class PoseidonMdsGate(Gate):
    """One width-12 Poseidon MDS layer over F_{p^2} state; wires
    [inputs 12*D | outputs 12*D]."""

    WIDTH = 12

    def id(self):
        return ("PoseidonMdsGate(PhantomData<plonky2_field::goldilocks_field"
                "::GoldilocksField>)<WIDTH=12>")

    def num_wires(self):
        return 2 * self.WIDTH * D

    def degree(self):
        return 2

    def num_constraints(self):
        return D * self.WIDTH

    def eval_unfiltered(self, alg, v):
        ea = ExtAlg(alg)
        w = self.WIDTH
        inputs = [ea.from_wires(v, i * D) for i in range(w)]
        out = []
        for r in range(w):
            res = ea.zero()
            for i in range(w):
                coeff = alg.const(int(pos.MDS_CIRC[i]))
                res = ea.add(res, ea.scalar_mul(coeff, inputs[(i + r) % w]))
            res = ea.add(res, ea.scalar_mul(alg.const(int(pos.MDS_DIAG[r])),
                                            inputs[r]))
            output = ea.from_wires(v, (w + r) * D)
            diff = ea.sub(output, res)
            out += [diff[0], diff[1]]
        return out

    def generators(self, builder, row, constants):
        w = self.WIDTH
        deps = [builder.wire_t(row, k) for k in range(w * D)]
        outs = [builder.wire_t(row, w * D + k) for k in range(w * D)]

        def fn(vals, w=w):
            st = [_ext_np(vals[2 * i: 2 * i + 2]) for i in range(w)]
            out = []
            for r in range(w):
                acc = np.zeros(2, dtype=np.uint64)
                for i in range(w):
                    c = _ext_np([pos.MDS_CIRC[i], 0])
                    acc = gl64.ext_add(acc, gl64.ext_mul(c, st[(i + r) % w]))
                acc = gl64.ext_add(
                    acc, gl64.ext_mul(_ext_np([pos.MDS_DIAG[r], 0]), st[r]))
                out += [acc[0], acc[1]]
            return out

        return [Generator(deps, outs, fn)]


# ---------------------------------------------------------------------------
# ExponentiationGate (exponentiation_gate.go:86-140)
# ---------------------------------------------------------------------------

class ExponentiationGate(Gate):
    """out = base^(sum bits 2^i); wires [base | bits LE (n) | out |
    intermediates (n)] — all base-field scalars."""

    def __init__(self, num_power_bits: int):
        self.num_power_bits = num_power_bits

    def id(self):
        return (f"ExponentiationGate {{ num_power_bits: {self.num_power_bits}"
                f", _phantom: PhantomData<plonky2_field::goldilocks_field::"
                f"GoldilocksField> }}<D=2>")

    def num_wires(self):
        return 2 + 2 * self.num_power_bits

    def degree(self):
        return 4

    def num_constraints(self):
        return self.num_power_bits + 1

    def eval_unfiltered(self, alg, v):
        n = self.num_power_bits
        base = v.local_wires[0]
        bits = [v.local_wires[1 + i] for i in range(n)]
        inter = [v.local_wires[2 + n + i] for i in range(n)]
        out = []
        prev = alg.one()
        for i in range(n):
            if i > 0:
                prev = alg.mul(inter[i - 1], inter[i - 1])
            cur_bit = bits[n - i - 1]
            # mul_by = cur_bit*base - (cur_bit - 1)
            mul_by = alg.sub(alg.mul(cur_bit, base),
                             alg.sub(cur_bit, alg.one()))
            out.append(alg.sub(alg.mul(prev, mul_by), inter[i]))
        out.append(alg.sub(v.local_wires[1 + n], inter[n - 1]))
        return out

    def generators(self, builder, row, constants):
        n = self.num_power_bits
        deps = [builder.wire_t(row, 0)] + \
            [builder.wire_t(row, 1 + i) for i in range(n)]
        outs = [builder.wire_t(row, 2 + n + i) for i in range(n)] + \
            [builder.wire_t(row, 1 + n)]

        def fn(vals, n=n):
            base = vals[0]
            bits = vals[1:]
            out = []
            acc = np.uint64(1)
            for i in range(n):
                acc = gl64.mul(acc, acc) if i else np.uint64(1)
                if int(bits[n - i - 1]):
                    acc = gl64.mul(acc, base)
                out.append(acc)
            return out + [out[-1]]

        return [Generator(deps, outs, fn)]


# ---------------------------------------------------------------------------
# CosetInterpolationGate (coset_interpolation_gate.go:148-230)
# ---------------------------------------------------------------------------

class CosetInterpolationGate(Gate):
    """Barycentric interpolation of 2^subgroup_bits values over a coset
    shift*H, evaluated at an F_{p^2} point, with intermediate (eval, prod)
    pairs bounding the constraint degree."""

    def __init__(self, subgroup_bits: int = 4, degree: int = 6,
                 barycentric_weights: list | None = None):
        self.subgroup_bits = subgroup_bits
        self.degree_param = degree
        n = 1 << subgroup_bits
        if barycentric_weights is None:
            barycentric_weights = _barycentric_weights(subgroup_bits)
        assert len(barycentric_weights) == n
        self.barycentric_weights = [int(x) for x in barycentric_weights]

    def id(self):
        ws = ", ".join(str(w) for w in self.barycentric_weights)
        return (f"CosetInterpolationGate {{ subgroup_bits: "
                f"{self.subgroup_bits}, degree: {self.degree_param}, "
                f"barycentric_weights: [{ws}], _phantom: PhantomData<plonky2"
                f"_field::goldilocks_field::GoldilocksField> }}<D=2>")

    def num_points(self):
        return 1 << self.subgroup_bits

    def num_intermediates(self):
        return (self.num_points() - 2) // (self.degree_param - 1)

    # wire layout (coset_interpolation_gate.go:80-147)
    def _start_eval_point(self):
        return 1 + self.num_points() * D

    def _start_eval_value(self):
        return self._start_eval_point() + D

    def _start_intermediates(self):
        return self._start_eval_value() + D

    def _shifted_point_start(self):
        return self._start_intermediates() + D * 2 * self.num_intermediates()

    def num_wires(self):
        return self._shifted_point_start() + D

    def degree(self):
        return self.degree_param

    def num_constraints(self):
        return D * (2 + 2 * self.num_intermediates())

    def eval_unfiltered(self, alg, v):
        ea = ExtAlg(alg)
        shift = v.local_wires[0]
        eval_point = ea.from_wires(v, self._start_eval_point())
        shifted_point = ea.from_wires(v, self._shifted_point_start())
        neg_shift = alg.mul(alg.const(gl64.P - 1), shift)
        tmp = ea.add(ea.scalar_mul(neg_shift, shifted_point), eval_point)
        constraints = [tmp[0], tmp[1]]

        domain = [int(x) for x in gl64.two_adic_subgroup(self.subgroup_bits)]
        values = [ea.from_wires(v, 1 + i * D)
                  for i in range(self.num_points())]
        weights = self.barycentric_weights
        deg = self.degree_param

        def partial(dom, vals, ws, eval_acc, prod_acc):
            for x, val, wgt in zip(dom, vals, ws):
                term = ea.sub(shifted_point, ea.from_scalar(alg.const(x)))
                weighted = ea.scalar_mul(alg.const(wgt), val)
                eval_acc = ea.add(ea.mul(eval_acc, term),
                                  ea.mul(weighted, prod_acc))
                prod_acc = ea.mul(prod_acc, term)
            return eval_acc, prod_acc

        comp_eval, comp_prod = partial(domain[:deg], values[:deg],
                                       weights[:deg], ea.zero(), ea.one())
        for i in range(self.num_intermediates()):
            s = self._start_intermediates()
            ie = ea.from_wires(v, s + D * i)
            ip = ea.from_wires(v, s + D * (self.num_intermediates() + i))
            d1 = ea.sub(ie, comp_eval)
            d2 = ea.sub(ip, comp_prod)
            constraints += [d1[0], d1[1], d2[0], d2[1]]
            start = 1 + (deg - 1) * (i + 1)
            end = min(start + deg - 1, self.num_points())
            comp_eval, comp_prod = partial(domain[start:end],
                                           values[start:end],
                                           weights[start:end], ie, ip)
        out_val = ea.from_wires(v, self._start_eval_value())
        d = ea.sub(out_val, comp_eval)
        constraints += [d[0], d[1]]
        return constraints

    def generators(self, builder, row, constants):
        npts = self.num_points()
        deps = [builder.wire_t(row, 0)]
        deps += [builder.wire_t(row, 1 + k) for k in range(npts * D)]
        deps += [builder.wire_t(row, self._start_eval_point() + k)
                 for k in range(D)]
        outs = [builder.wire_t(row, self._shifted_point_start() + k)
                for k in range(D)]
        s = self._start_intermediates()
        for i in range(self.num_intermediates()):
            outs += [builder.wire_t(row, s + D * i + k) for k in range(D)]
        for i in range(self.num_intermediates()):
            outs += [builder.wire_t(
                row, s + D * (self.num_intermediates() + i) + k)
                for k in range(D)]
        outs += [builder.wire_t(row, self._start_eval_value() + k)
                 for k in range(D)]

        domain = [int(x) for x in gl64.two_adic_subgroup(self.subgroup_bits)]
        weights = self.barycentric_weights
        deg = self.degree_param
        n_inter = self.num_intermediates()

        def fn(vals, npts=npts, deg=deg, n_inter=n_inter):
            shift = vals[0]
            values = [_ext_np(vals[1 + 2 * i: 3 + 2 * i]) for i in range(npts)]
            point = _ext_np(vals[1 + 2 * npts: 3 + 2 * npts])
            shift_inv = gl64.inv(np.uint64(shift))
            shifted = gl64.ext_mul(_ext_np([shift_inv, 0]), point)
            out = [shifted[0], shifted[1]]

            def partial(dom, vls, ws, ev, pr):
                for x, val, wgt in zip(dom, vls, ws):
                    term = gl64.ext_sub(shifted, _ext_np([x, 0]))
                    weighted = gl64.ext_mul(_ext_np([wgt, 0]), val)
                    ev = gl64.ext_add(gl64.ext_mul(ev, term),
                                      gl64.ext_mul(weighted, pr))
                    pr = gl64.ext_mul(pr, term)
                return ev, pr

            ev, pr = partial(domain[:deg], values[:deg], weights[:deg],
                             np.zeros(2, np.uint64), _ext_np([1, 0]))
            evs, prs = [], []
            for i in range(n_inter):
                evs += [ev[0], ev[1]]
                prs += [pr[0], pr[1]]
                start = 1 + (deg - 1) * (i + 1)
                end = min(start + deg - 1, npts)
                ev, pr = partial(domain[start:end], values[start:end],
                                 weights[start:end], ev, pr)
            return out + evs + prs + [ev[0], ev[1]]

        return [Generator(deps, outs, fn)]


def _barycentric_weights(subgroup_bits: int) -> list[int]:
    """w_i = prod_{j!=i} (x_i - x_j)^-1 over the two-adic subgroup — the
    values plonky2 bakes into the gate id."""
    xs = [int(x) for x in gl64.two_adic_subgroup(subgroup_bits)]
    n = len(xs)
    out = []
    for i in range(n):
        p = 1
        for j in range(n):
            if j != i:
                p = p * ((xs[i] - xs[j]) % gl64.P) % gl64.P
        out.append(pow(p, gl64.P - 2, gl64.P))
    return out


# ---------------------------------------------------------------------------
# Gate-id factory: plonky2 id string -> Gate instance (the repo-side mirror
# of gnark's regex registry, plonk/gates/gates.go)
# ---------------------------------------------------------------------------

def gate_from_id(gid: str) -> Gate:
    from . import gates as G
    if gid == "NoopGate":
        return G.NoopGate()
    if gid == "PublicInputGate":
        return G.PublicInputGate()
    m = re.fullmatch(r"ConstantGate \{ num_consts: (\d+) \}", gid)
    if m:
        return G.ConstantGate(int(m.group(1)))
    m = re.fullmatch(r"ArithmeticGate \{ num_ops: (\d+) \}", gid)
    if m:
        return G.ArithmeticGate(int(m.group(1)))
    m = re.fullmatch(r"BaseSumGate \{ num_limbs: (\d+) \} \+ Base: (\d+)", gid)
    if m:
        return G.BaseSumGate(int(m.group(1)), int(m.group(2)))
    m = re.fullmatch(
        r"RandomAccessGate \{ bits: (\d+), num_copies: (\d+), "
        r"num_extra_constants: (\d+), _phantom: .* \}<D=2>", gid)
    if m:
        return G.RandomAccessGate(int(m.group(1)), int(m.group(2)),
                                  int(m.group(3)))
    if gid.startswith("PoseidonGate("):
        return G.PoseidonGate()
    if gid.startswith("PoseidonMdsGate("):
        return PoseidonMdsGate()
    m = re.fullmatch(r"ArithmeticExtensionGate \{ num_ops: (\d+) \}", gid)
    if m:
        return ArithmeticExtensionGate(int(m.group(1)))
    m = re.fullmatch(r"MulExtensionGate \{ num_ops: (\d+) \}", gid)
    if m:
        return MulExtensionGate(int(m.group(1)))
    m = re.fullmatch(r"ReducingGate \{ num_coeffs: (\d+) \}", gid)
    if m:
        return ReducingGate(int(m.group(1)))
    m = re.fullmatch(r"ReducingExtensionGate \{ num_coeffs: (\d+) \}", gid)
    if m:
        return ReducingExtensionGate(int(m.group(1)))
    m = re.fullmatch(r"ExponentiationGate \{ num_power_bits: (\d+).*", gid)
    if m:
        return ExponentiationGate(int(m.group(1)))
    m = re.fullmatch(
        r"CosetInterpolationGate \{ subgroup_bits: (\d+), degree: (\d+), "
        r"barycentric_weights: \[([0-9, ]+)\], _phantom: .* \}<D=2>", gid)
    if m:
        ws = [int(x.strip()) for x in m.group(3).split(",")]
        return CosetInterpolationGate(int(m.group(1)), int(m.group(2)), ws)
    raise ValueError(f"unknown gate id: {gid}")
