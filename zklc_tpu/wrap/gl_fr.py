"""Goldilocks arithmetic emulated inside BN254-Fr R1CS constraints.

The gl.Chip of the gnark wrapper re-derived for this framework's R1CS
builder (gnark-plonky2-verifier/goldilocks/base.go:112-284 semantics):
values are Fr residues congruent to the Goldilocks value, each carrying a
static BOUND (exclusive max of the integer value); linear ops grow bounds
for free, multiplication emits one R1CS constraint, and `reduce` collapses
a bounded value back under 2^64 with the quotient/remainder hint pattern
(base.go:246 Reduce / :284 ReduceHint) + bit-decomposition range checks
(:362, the USE_BIT_DECOMPOSITION_RANGE_CHECK mode).

Deferred reduction is the whole game: a dot product of k reduced values
has bound k*2^128 — still 120+ bits below Fr — so entire MDS rows and
alpha-Horner steps run reduction-free; only one reduce lands per chain.

The quadratic extension (D=2, X^2 - 7) mirrors goldilocks/
quadratic_extension.go, with `ExtAlg` exposing the same algebra interface
as plonk.algebra.HostExt so the repo's gate evaluators compile to R1CS
unchanged (the equivalent of gnark's plonk/gates/*.go evaluator set).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl64
from .bn254 import R
from .r1cs_builder import R1CSBuilder, LC, lc_add, lc_sub, lc_scale, \
    lc_const, lc_var

P = gl64.P                       # 2^64 - 2^32 + 1
EXT_W = gl64.EXT_W               # 7
# Reduce when a pending bound would exceed this (leave ~4 bits of headroom
# below the ~254-bit modulus for sums of a few such values).
MAX_BOUND = 1 << 250


@dataclass(frozen=True)
class GLVar:
    """A Goldilocks value as (Fr linear combination, exclusive bound)."""
    lc: LC
    bound: int


class GLChip:
    """Goldilocks ops over an R1CSBuilder (base field)."""

    def __init__(self, b: R1CSBuilder):
        self.b = b

    # -- construction --------------------------------------------------------
    def const(self, v: int) -> GLVar:
        v = int(v) % P
        return GLVar(lc_const(v), v + 1)

    def from_var(self, var: int, bound: int = 1 << 64) -> GLVar:
        return GLVar(lc_var(var), bound)

    def wire(self, value_hint=None) -> GLVar:
        """Fresh 64-bit witness input (range-checked)."""
        raise NotImplementedError("allocate via hints in the verifier")

    # -- linear ops (free) ---------------------------------------------------
    def add(self, a: GLVar, b: GLVar) -> GLVar:
        a, b = self._fit(a, b)
        return GLVar(lc_add(a.lc, b.lc), a.bound + b.bound)

    def sub(self, a: GLVar, b: GLVar) -> GLVar:
        """a - b via adding a multiple of p to keep the integer value
        non-negative (base.go SubNoReduce: a + (p * k - b))."""
        a, b = self._fit(a, b)
        k = (b.bound + P - 1) // P
        shift = k * P
        return GLVar(lc_add(a.lc, lc_sub(lc_const(shift % R), b.lc)),
                     a.bound + shift)

    def scale(self, a: GLVar, k: int) -> GLVar:
        k = int(k) % P
        if k == 0:
            return self.const(0)
        a = self._maybe_reduce(a, k)
        return GLVar(lc_scale(a.lc, k), a.bound * k)

    # -- multiplicative ops --------------------------------------------------
    def mul(self, a: GLVar, b: GLVar) -> GLVar:
        a, b = self._fit_mul(a, b)
        return GLVar(self.b.mul(a.lc, b.lc), a.bound * b.bound)

    def mul_add(self, a: GLVar, b: GLVar, c: GLVar) -> GLVar:
        return self.add(self.mul(a, b), c)

    # -- reduction -----------------------------------------------------------
    def reduce(self, x: GLVar) -> GLVar:
        """x mod p as a value < 2^64 (maybe non-canonical: in [0, 2^64))."""
        if x.bound <= (1 << 64):
            return x
        q_bits = max((x.bound // P).bit_length(), 1)
        q, r = self.b.add_hint(
            lambda v: [self._int_of(v[0], x.bound) // P,
                       self._int_of(v[0], x.bound) % P],
            [x.lc], 2)
        # x == q*p + r over Fr; bounds make it exact over the integers
        self.b.assert_eq(x.lc, lc_add(lc_var(q, P), lc_var(r)))
        self.b.to_bits(lc_var(q), q_bits)
        self.b.to_bits(lc_var(r), 64)
        return GLVar(lc_var(r), 1 << 64)

    def reduce_canonical(self, x: GLVar) -> GLVar:
        """x mod p in [0, p): the 64-bit residue plus the r < p check
        (hi != 2^32-1 OR lo == 0, since p - 1 = 0xFFFFFFFF_00000000)."""
        r = self.reduce(x)
        if self._const_value(r) is not None:
            return r
        bits = self.b.to_bits(r.lc, 64)
        lo = self.b.from_bits(bits[:32])
        hi = self.b.from_bits(bits[32:])
        hi_is_max = self.b.is_zero(lc_sub(hi, lc_const((1 << 32) - 1)))
        self.b.constrain(hi_is_max, lo, lc_const(0))
        return GLVar(r.lc, P)

    def assert_eq(self, a: GLVar, b: GLVar) -> None:
        """a == b (mod p): reduce both canonically, then Fr equality."""
        ra = self.reduce_canonical(a) if a.bound > P else a
        rb = self.reduce_canonical(b) if b.bound > P else b
        # both < p after canonical reduce EXCEPT 64-bit residues from
        # reduce(); canonicalize those too
        if ra.bound > P:
            ra = self.reduce_canonical(GLVar(ra.lc, ra.bound + P))
        if rb.bound > P:
            rb = self.reduce_canonical(GLVar(rb.lc, rb.bound + P))
        self.b.assert_eq(ra.lc, rb.lc)

    def inverse(self, x: GLVar) -> GLVar:
        """x^-1 mod p (x != 0): hint + in-field product check."""
        xr = self.reduce(x)
        (inv,) = self.b.add_hint(
            lambda v: [pow(self._int_of(v[0], 1 << 64) % P, P - 2, P)],
            [xr.lc], 1)
        self.b.to_bits(lc_var(inv), 64)
        iv = GLVar(lc_var(inv), 1 << 64)
        self.assert_eq(self.mul(xr, iv), self.const(1))
        return iv

    # -- helpers -------------------------------------------------------------
    def _maybe_reduce(self, a: GLVar, k: int) -> GLVar:
        return self.reduce(a) if a.bound * k > MAX_BOUND else a

    def _fit(self, a: GLVar, b: GLVar):
        if a.bound + b.bound > MAX_BOUND:
            if a.bound > (1 << 64):
                a = self.reduce(a)
            if a.bound + b.bound > MAX_BOUND:
                b = self.reduce(b)
        return a, b

    def _fit_mul(self, a: GLVar, b: GLVar):
        if a.bound * b.bound > MAX_BOUND:
            if a.bound > b.bound:
                a = self.reduce(a)
            if a.bound * b.bound > MAX_BOUND:
                b = self.reduce(b)
            if a.bound * b.bound > MAX_BOUND:
                a = self.reduce(a)
        return a, b

    @staticmethod
    def _int_of(fr_value: int, bound: int) -> int:
        """Recover the INTEGER a bounded Fr residue represents.  All chip
        values are built from non-negative integer combinations < bound <=
        MAX_BOUND < R, so the residue IS the integer."""
        assert fr_value < bound, "bound tracking violated in hint"
        return fr_value

    @staticmethod
    def _const_value(x: GLVar):
        lc = x.lc
        if not lc:
            return 0
        if len(lc) == 1 and 0 in lc:
            return lc[0]
        return None


# ---------------------------------------------------------------------------
# Quadratic extension + the HostExt-compatible algebra facade
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GLExt:
    """Extension element (a0 + a1*X, X^2 = 7)."""
    c0: GLVar
    c1: GLVar


class ExtAlg:
    """plonk.algebra-compatible algebra over R1CS extension elements, so the
    repo's gate evaluators (plonk/gates*.py eval_unfiltered) emit R1CS
    constraints directly — the equivalent of the 16 hand-written gnark
    evaluators under gnark-plonky2-verifier/plonk/gates/."""

    def __init__(self, chip: GLChip):
        self.chip = chip

    def zero(self):
        return GLExt(self.chip.const(0), self.chip.const(0))

    def one(self):
        return GLExt(self.chip.const(1), self.chip.const(0))

    def const(self, v):
        return GLExt(self.chip.const(int(v)), self.chip.const(0))

    def from_base(self, v):
        if isinstance(v, GLVar):
            return GLExt(v, self.chip.const(0))
        return self.const(int(v))

    def add(self, a, b):
        return GLExt(self.chip.add(a.c0, b.c0), self.chip.add(a.c1, b.c1))

    def sub(self, a, b):
        return GLExt(self.chip.sub(a.c0, b.c0), self.chip.sub(a.c1, b.c1))

    def mul(self, a, b):
        ch = self.chip
        t00 = ch.mul(a.c0, b.c0)
        t11 = ch.mul(a.c1, b.c1)
        t01 = ch.mul(a.c0, b.c1)
        t10 = ch.mul(a.c1, b.c0)
        return GLExt(ch.add(t00, ch.scale(t11, EXT_W)), ch.add(t01, t10))

    def scalar_mul(self, k, a):
        return GLExt(self.chip.scale(a.c0, int(k)),
                     self.chip.scale(a.c1, int(k)))

    def neg(self, a):
        z = self.zero()
        return self.sub(z, a)

    def square(self, a):
        return self.mul(a, a)

    def reduce(self, a):
        return GLExt(self.chip.reduce(a.c0), self.chip.reduce(a.c1))

    def inverse(self, a):
        """(a0 + a1 X)^-1 via the norm: (a0 - a1 X) / (a0^2 - 7 a1^2)."""
        ch = self.chip
        norm = ch.sub(ch.mul(a.c0, a.c0), ch.scale(ch.mul(a.c1, a.c1),
                                                   EXT_W))
        ninv = ch.inverse(norm)
        return GLExt(ch.mul(a.c0, ninv),
                     ch.sub(ch.const(0), ch.mul(a.c1, ninv)))
