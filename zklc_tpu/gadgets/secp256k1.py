"""secp256k1 curve gadget + GLV endomorphism decomposition.

Covers the curve surface of crypto/plonky2_ecdsa (reference):
  - native curve ops   (src/curve/{secp256k1,curve_types,curve_adds}.rs)
  - in-circuit short-Weierstrass point gadget
                       (src/gadgets/curve.rs: curve_assert_valid / add /
                        double / conditional negate)
  - windowed scalar multiplication with 4-bit RandomAccess window lookups
                       (src/gadgets/curve_windowed_mul.rs:43-110 shape)
  - GLV decomposition k = k1 + k2*lambda with hinted half-width scalars
                       (src/curve/glv.rs:38,82, src/gadgets/glv.rs)
  - multi-scalar Straus interleaving for the 4 GLV half-products
                       (src/gadgets/curve_msm.rs:21 equivalent)

Design notes (TPU framework, not a port): points live in AFFINE coordinates
with hint-based field inversion (one inversion per group op is one
ForeignFieldMul row + a hint in this framework's lookup mode, so the
reference's reason to avoid it — witness cost — does not apply), and
incompleteness of the affine formulas is handled the same way the reference
handles it: every window table is offset by a fixed nothing-up-my-sleeve
point so the accumulator never passes through the identity; the accumulated
offset (a compile-time constant) is subtracted once at the end.  A
degenerate same-x addition makes the inverse hint unsatisfiable, which is a
completeness (not soundness) event.

CAVEAT (ADVICE r2): the window offsets C_i = h(tag)*G are deterministic
public points whose discrete logs w.r.t. G are derivable from the tag, so
an adversarial *input* (a public key constructed as pk = (1-j)^-1 * C_i)
can force a same-x collision and make witness generation unsatisfiable —
a prover-side DoS for that input, never a soundness break.  The reference
avoids this with build-time random offsets (curve_windowed_mul.rs:56);
deployments exposed to attacker-chosen keys should seed `_offset_point`
per-build (pass a random tag) or route collision-prone adds through the
complete-addition fallback.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from .biguint import BigUintTarget
from .nonnative import NonNativeOps, NonNativeTarget

# --- curve constants (SEC2) -------------------------------------------------
P = 2**256 - 2**32 - 977
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
G_X = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
G_Y = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8

# GLV endomorphism: phi(x, y) = (BETA*x, y) acts as multiplication by LAMBDA.
LAMBDA = 0x5363AD4CC05C30E0A5261C028812645A122E22EA20816678DF02967C1B23BD72
BETA = 0x7AE96A2B657C07106E64479EAC3434E99CF0497512F58995C1396C28719501EE
# Lattice basis for the decomposition (curve/glv.rs constants).
_A1 = 0x3086D221A7D46BCDE86C90E49284EB15
_B1 = -0xE4437ED6010E88286F547FA90ABFE4C3
_A2 = 0x114CA50F7A8E2F3F657C1108D9D44CFD8
_B2 = _A1


# ---------------------------------------------------------------------------
# Native (witness-side) curve arithmetic on Python ints.  Identity = None.
# ---------------------------------------------------------------------------

def k1_add_native(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = 3 * x1 * x1 * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def k1_neg_native(pt):
    return None if pt is None else (pt[0], (P - pt[1]) % P)


def k1_mul_native(pt, k: int):
    acc, add = None, pt
    k %= N
    while k:
        if k & 1:
            acc = k1_add_native(acc, add)
        add = k1_add_native(add, add)
        k >>= 1
    return acc


def k1_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - 7) % P == 0


def glv_decompose(k: int):
    """k -> (k1, k2) signed, |ki| < 2^129, k === k1 + k2*LAMBDA (mod N).

    Babai rounding against the lattice basis (curve/glv.rs:38)."""
    k %= N
    c1 = (_B2 * k + N // 2) // N
    c2 = (-_B1 * k + N // 2) // N
    k1 = k - c1 * _A1 - c2 * _A2
    k2 = -c1 * _B1 - c2 * _B2
    assert (k1 + k2 * LAMBDA - k) % N == 0
    assert abs(k1) < 1 << 129 and abs(k2) < 1 << 129
    return k1, k2


def _offset_point(tag: bytes):
    """Deterministic nothing-up-my-sleeve offset point: h(tag)*G."""
    return k1_mul_native((G_X, G_Y),
                         int.from_bytes(hashlib.sha256(tag).digest(), "big"))


# ---------------------------------------------------------------------------
# Circuit gadget
# ---------------------------------------------------------------------------

@dataclass
class K1PointTarget:
    x: NonNativeTarget   # over base field P
    y: NonNativeTarget


_GLV_BITS = 160          # hinted |k_i| carried in 5 u32 limbs
_WINDOW = 4


class Secp256k1Ops:
    """Short-Weierstrass point gadget over NonNativeOps(P) limbs."""

    def __init__(self, b: CircuitBuilder, nn_base: NonNativeOps | None = None,
                 nn_scalar: NonNativeOps | None = None):
        self.b = b
        self.nn = nn_base or NonNativeOps(b, P)
        self.nns = nn_scalar or NonNativeOps(b, N, self.nn.big)

    # -- construction ------------------------------------------------------
    def constant_point(self, pt) -> K1PointTarget:
        x, y = pt
        return K1PointTarget(self.nn.constant_nonnative(x),
                             self.nn.constant_nonnative(y))

    def add_virtual_point(self) -> K1PointTarget:
        return K1PointTarget(self.nn.add_virtual_nonnative(),
                             self.nn.add_virtual_nonnative())

    def curve_assert_valid(self, p: K1PointTarget):
        """y^2 == x^3 + 7 (gadgets/curve.rs curve_assert_valid)."""
        nn = self.nn
        y2 = nn.mul_nonnative(p.y, p.y)
        x3 = nn.mul_nonnative(nn.mul_nonnative(p.x, p.x), p.x)
        nn.connect_nonnative(y2, nn.add_nonnative(x3, nn.constant_nonnative(7)))

    # -- group law (incomplete affine; see module docstring) ----------------
    def curve_add(self, p: K1PointTarget, q: K1PointTarget) -> K1PointTarget:
        nn = self.nn
        lam = nn.div_nonnative(nn.sub_nonnative(q.y, p.y),
                               nn.sub_nonnative(q.x, p.x))
        x3 = nn.sub_nonnative(nn.sub_nonnative(nn.mul_nonnative(lam, lam),
                                               p.x), q.x)
        y3 = nn.sub_nonnative(nn.mul_nonnative(lam, nn.sub_nonnative(p.x, x3)),
                              p.y)
        return K1PointTarget(x3, y3)

    def curve_double(self, p: K1PointTarget) -> K1PointTarget:
        nn = self.nn
        x2 = nn.mul_nonnative(p.x, p.x)
        three_x2 = nn.add_nonnative(nn.add_nonnative(x2, x2), x2)
        lam = nn.div_nonnative(three_x2, nn.add_nonnative(p.y, p.y))
        x3 = nn.sub_nonnative(nn.mul_nonnative(lam, lam),
                              nn.add_nonnative(p.x, p.x))
        y3 = nn.sub_nonnative(nn.mul_nonnative(lam, nn.sub_nonnative(p.x, x3)),
                              p.y)
        return K1PointTarget(x3, y3)

    def conditional_negate(self, p: K1PointTarget, sign: int) -> K1PointTarget:
        """sign ? -P : P (limb-wise select on y)."""
        nn, b = self.nn, self.b
        ny = nn.sub_nonnative(nn.zero(), p.y)
        limbs = [b.select(sign, a, c)
                 for a, c in zip(ny.value.limbs, p.y.value.limbs)]
        return K1PointTarget(p.x, NonNativeTarget(BigUintTarget(limbs), P))

    def endo(self, p: K1PointTarget) -> K1PointTarget:
        """phi(x, y) = (BETA*x, y) = LAMBDA * (x, y)."""
        return K1PointTarget(
            self.nn.mul_nonnative(self.nn.constant_nonnative(BETA), p.x), p.y)

    # -- window machinery ----------------------------------------------------
    def _select_point(self, digit: int, table: list[K1PointTarget]):
        b = self.b
        coords = []
        for attr in ("x", "y"):
            limbs = [b.random_access(digit,
                                     [getattr(pt, attr).value.limbs[li]
                                      for pt in table])
                     for li in range(getattr(table[0], attr).value.num_limbs)]
            coords.append(NonNativeTarget(BigUintTarget(limbs), P))
        return K1PointTarget(*coords)

    def _window_table(self, p: K1PointTarget, offset) -> list[K1PointTarget]:
        """[C, P+C, 2P+C, ..., 15P+C] built with 15 in-circuit adds
        (curve_windowed_mul.rs:43 precompute_window, offset variant)."""
        table = [self.constant_point(offset)]
        for _ in range(15):
            table.append(self.curve_add(table[-1], p))
        return table

    def msm_windowed(self, points: list[K1PointTarget],
                     bits_le: list[list[int]]) -> K1PointTarget:
        """sum_i k_i * P_i, all scalars the same bit width, Straus
        interleaving with per-point offset tables (curve_msm.rs:21 shape).

        Returns the exact affine sum; UNSATISFIABLE (not unsound) if the
        honest value of the sum is the identity."""
        b = self.b
        nbits = len(bits_le[0])
        assert all(len(bt) == nbits for bt in bits_le)
        assert nbits % _WINDOW == 0
        nwin = nbits // _WINDOW
        offsets = [_offset_point(b"zklc-msm-offset-%d" % i)
                   for i in range(len(points))]
        tables = [self._window_table(p, c) for p, c in zip(points, offsets)]
        digits = [[b.le_sum(bt[_WINDOW * w: _WINDOW * (w + 1)])
                   for w in range(nwin)] for bt in bits_le]
        # accumulated offset after the loop: sum_i (16^nwin - 1)/15 * C_i
        m = ((1 << (_WINDOW * nwin)) - 1) // 15
        total_off = None
        for c in offsets:
            total_off = k1_add_native(total_off, k1_mul_native(c, m))
        acc = None
        for w in reversed(range(nwin)):
            if acc is not None:
                for _ in range(_WINDOW):
                    acc = self.curve_double(acc)
            for i in range(len(points)):
                sel = self._select_point(digits[i][w], tables[i])
                acc = sel if acc is None else self.curve_add(acc, sel)
        return self.curve_add(acc, self.constant_point(k1_neg_native(total_off)))

    # -- GLV ------------------------------------------------------------------
    def glv_split(self, k: NonNativeTarget):
        """Hint (|k1|, s1, |k2|, s2) with k === (-1)^s1 |k1| +
        (-1)^s2 |k2| * LAMBDA (mod N), constrained in the scalar field
        (gadgets/glv.rs decomposition check)."""
        nns, b = self.nns, self.b
        deps = list(k.value.limbs)

        def halves(vals):
            kv = 0
            for i, v in enumerate(vals):
                kv |= int(v) << (32 * i)
            return glv_decompose(kv)

        halves_t, signs_t = [], []
        for idx in (0, 1):
            abs_t = nns._hint_biguint(
                _GLV_BITS // 32, deps,
                lambda vals, i=idx: abs(halves(vals)[i]))
            sign = b.add_virtual_target()
            b.add_generator(deps, [sign],
                            lambda vals, i=idx:
                            [np.uint64(halves(vals)[i] < 0)])
            b.assert_bool(sign)
            halves_t.append(abs_t)
            signs_t.append(sign)

        def signed(abs_big, sign):
            limbs = list(abs_big.limbs)
            while len(limbs) < nns.num_limbs:
                limbs.append(nns.u32.zero_u32())
            t = NonNativeTarget(BigUintTarget(limbs), N)
            neg = nns.sub_nonnative(nns.zero(), t)
            sel = [b.select(sign, a, c)
                   for a, c in zip(neg.value.limbs, t.value.limbs)]
            return NonNativeTarget(BigUintTarget(sel), N)

        k1s = signed(halves_t[0], signs_t[0])
        k2s = signed(halves_t[1], signs_t[1])
        lam = nns.constant_nonnative(LAMBDA)
        lhs = nns.add_nonnative(k1s, nns.mul_nonnative(lam, k2s))
        nns.connect_nonnative(lhs, k)
        bits = [sum([b.split_le(l, 32) for l in h.limbs], [])
                for h in halves_t]
        return bits[0], signs_t[0], bits[1], signs_t[1]

    def glv_terms(self, p: K1PointTarget, k: NonNativeTarget):
        """(points, bits) pair lists for k*P via the endomorphism:
        k*P = |k1| * (+-P) + |k2| * (+-phi(P))."""
        b1, s1, b2, s2 = self.glv_split(k)
        p1 = self.conditional_negate(p, s1)
        p2 = self.conditional_negate(self.endo(p), s2)
        return [p1, p2], [b1, b2]

    def glv_mul(self, p: K1PointTarget, k: NonNativeTarget) -> K1PointTarget:
        pts, bits = self.glv_terms(p, k)
        return self.msm_windowed(pts, bits)

    # -- witness ----------------------------------------------------------------
    def set_point_inputs(self, t: K1PointTarget, pt, inputs: dict):
        self.nn.set_nonnative_inputs(t.x, pt[0], inputs)
        self.nn.set_nonnative_inputs(t.y, pt[1], inputs)
