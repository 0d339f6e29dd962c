"""R1CS chips for the fr-wrap verifier: Poseidon permutations + challenger.

The constraint-side counterparts of:
  - hash/poseidon_bn128.permute_bn128 (native Fr, ~264 constraints/perm —
    the sbox muls; ark/mix are linear and fold into LCs), mirroring
    gnark-plonky2-verifier/poseidon/bn254.go;
  - hash/poseidon.permute over the GL chip (emulated Goldilocks, the
    plonky2 width-12 permutation — gnark poseidon/goldilocks.go), needed
    once for the public-input digest binding;
  - hash/poseidon_bn128.FrChallenger (the fr-flavor duplex sponge) with
    CANONICAL Fr bit-decomposition at every squeeze — the decomposition of
    a field element into 254 bits is ambiguous for x < 2^254 - R, so each
    squeeze enforces bits < R lexicographically (soundness of Fiat-Shamir
    replay; gnark's ToBinary applies the same strictness).
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from ..hash.poseidon_bn128 import (C_CONSTANTS, S_CONSTANTS, M_MATRIX,
                                   P_MATRIX, FR, RATE, WIDTH, FULL_ROUNDS,
                                   PARTIAL_ROUNDS, GOLDILOCKS_ELEMENTS)
from .bn254 import R
from .r1cs_builder import (R1CSBuilder, LC, lc_add, lc_sub, lc_scale,
                           lc_const, lc_var)
from .gl_fr import GLChip, GLVar

assert FR == R, "poseidon_bn128 FR and bn254 R must agree"


# ---------------------------------------------------------------------------
# BN254 Poseidon (native field): 3 constraints per sbox
# ---------------------------------------------------------------------------

def _exp5_lc(b: R1CSBuilder, x: LC) -> LC:
    x2 = b.mul(x, x)
    x4 = b.mul(x2, x2)
    return b.mul(x4, x)


def _ark_lc(state, it):
    return [lc_add(state[i], lc_const(C_CONSTANTS[it + i]))
            for i in range(WIDTH)]


def _mix_lc(state, matrix):
    out = []
    for i in range(WIDTH):
        acc = LC()
        for j in range(WIDTH):
            acc = lc_add(acc, lc_scale(state[j], matrix[j][i]))
        out.append(acc)
    return out


def permute_bn254_lc(b: R1CSBuilder, state: list[LC]) -> list[LC]:
    """In-circuit permute_bn128 (identical round structure/constants)."""
    st = list(state)
    st = _ark_lc(st, 0)
    for i in range(FULL_ROUNDS // 2 - 1):
        st = [_exp5_lc(b, x) for x in st]
        st = _ark_lc(st, (i + 1) * WIDTH)
        st = _mix_lc(st, M_MATRIX)
    st = [_exp5_lc(b, x) for x in st]
    st = _ark_lc(st, (FULL_ROUNDS // 2) * WIDTH)
    st = _mix_lc(st, P_MATRIX)
    for i in range(PARTIAL_ROUNDS):
        s0 = _exp5_lc(b, st[0])
        s0 = lc_add(s0, lc_const(
            C_CONSTANTS[(FULL_ROUNDS // 2 + 1) * WIDTH + i]))
        st = [s0] + st[1:]
        base = (WIDTH * 2 - 1) * i
        new0 = LC()
        for j in range(WIDTH):
            new0 = lc_add(new0, lc_scale(st[j], S_CONSTANTS[base + j]))
        rest = [lc_add(st[k], lc_scale(st[0],
                                       S_CONSTANTS[base + WIDTH + k - 1]))
                for k in range(1, WIDTH)]
        st = [new0] + rest
    for i in range(FULL_ROUNDS // 2 - 1):
        st = [_exp5_lc(b, x) for x in st]
        st = _ark_lc(st, (FULL_ROUNDS // 2 + 1) * WIDTH + PARTIAL_ROUNDS
                     + i * WIDTH)
        st = _mix_lc(st, M_MATRIX)
    st = [_exp5_lc(b, x) for x in st]
    st = _mix_lc(st, M_MATRIX)
    return st


def hash_or_noop_lc(b: R1CSBuilder, gl_values: list[GLVar]) -> LC:
    """bn254.go:79 HashOrNoop over reduced (<2^64) GL chip values."""
    if len(gl_values) <= GOLDILOCKS_ELEMENTS:
        acc = LC()
        for k, v in enumerate(gl_values):
            assert v.bound <= 1 << 64
            acc = lc_add(acc, lc_scale(v.lc, 1 << (64 * k)))
        return acc
    return hash_no_pad_lc(b, gl_values)


def hash_no_pad_lc(b: R1CSBuilder, gl_values: list[GLVar]) -> LC:
    state: list[LC] = [LC() for _ in range(WIDTH)]
    vals = list(gl_values)
    for start in range(0, len(vals), RATE * GOLDILOCKS_ELEMENTS):
        chunk = vals[start: start + RATE * GOLDILOCKS_ELEMENTS]
        for r in range(RATE):
            gl = chunk[r * GOLDILOCKS_ELEMENTS:(r + 1) * GOLDILOCKS_ELEMENTS]
            if not gl:
                break
            acc = LC()
            for k, v in enumerate(gl):
                assert v.bound <= 1 << 64
                acc = lc_add(acc, lc_scale(v.lc, 1 << (64 * k)))
            state[1 + r] = acc
        state = permute_bn254_lc(b, state)
    return state[0]


def two_to_one_lc(b: R1CSBuilder, left: LC, right: LC) -> LC:
    return permute_bn254_lc(b, [LC(), LC(), left, right])[0]


# ---------------------------------------------------------------------------
# Canonical Fr bit decomposition (for squeezes)
# ---------------------------------------------------------------------------

_R_BITS = [(R >> i) & 1 for i in range(254)]


def to_bits_canonical(b: R1CSBuilder, x: LC) -> list[LC]:
    """254 little-endian bits of x with bits-value < R enforced.

    lt = OR over i of (bit_i < R_i AND all higher bits equal) — computed
    MSB-down with a running 'all equal so far' indicator.  ~380 constraints
    (the R_i=1 positions each cost two muls)."""
    bits = b.to_bits(x, 254)
    eq_so_far = lc_const(1)
    lt = LC()
    for i in reversed(range(254)):
        if _R_BITS[i] == 1:
            # x_i = 0 here makes x < R if still equal above
            contrib = b.mul(eq_so_far, lc_sub(lc_const(1), bits[i]))
            lt = lc_add(lt, contrib)
            eq_so_far = b.mul(eq_so_far, bits[i])
        else:
            # x_i = 1 here would make x > R on this prefix
            eq_so_far = b.mul(eq_so_far, lc_sub(lc_const(1), bits[i]))
    b.assert_eq(lt, lc_const(1))
    return bits


# ---------------------------------------------------------------------------
# GL Poseidon (width 12) over the GL chip — plonky2 permutation
# ---------------------------------------------------------------------------

def permute_gl_chip(chip: GLChip, state: list[GLVar]) -> list[GLVar]:
    """hash/poseidon.permute (simple full/partial round form; identical
    output to the fast form the gates use)."""
    W = pos.WIDTH
    assert len(state) == W
    rc = pos.ALL_ROUND_CONSTANTS.reshape(-1, W)
    mds_circ = [int(x) for x in pos.MDS_CIRC]
    mds_diag = [int(x) for x in pos.MDS_DIAG]

    def const_layer(st, r):
        return [chip.add(st[i], chip.const(int(rc[r][i]))) for i in range(W)]

    def sbox(x):
        x2 = chip.mul(x, x)
        x3 = chip.mul(x2, x)
        x4 = chip.mul(x2, x2)
        return chip.mul(x3, x4)

    def mds(st):
        out = []
        for r in range(W):
            acc = chip.scale(st[r], mds_diag[r])
            for i in range(W):
                acc = chip.add(acc, chip.scale(st[(i + r) % W], mds_circ[i]))
            out.append(acc)
        return out

    st = list(state)
    r = 0
    for _ in range(pos.HALF_N_FULL_ROUNDS):
        st = const_layer(st, r)
        st = [sbox(x) for x in st]
        st = mds(st)
        r += 1
    for _ in range(pos.N_PARTIAL_ROUNDS):
        st = const_layer(st, r)
        st = [sbox(st[0])] + st[1:]
        st = mds(st)
        r += 1
    for _ in range(pos.HALF_N_FULL_ROUNDS):
        st = const_layer(st, r)
        st = [sbox(x) for x in st]
        st = mds(st)
        r += 1
    return st


def hash_no_pad_gl_chip(chip: GLChip, inputs: list[GLVar]) -> list[GLVar]:
    """pos.hash_no_pad over the chip (rate 8, squeeze 4)."""
    state = [chip.const(0)] * pos.WIDTH
    for start in range(0, len(inputs), 8):
        chunk = inputs[start: start + 8]
        state = list(state)
        for j, x in enumerate(chunk):
            state[j] = x
        state = permute_gl_chip(chip, state)
    return [chip.reduce(x) for x in state[:4]]


# ---------------------------------------------------------------------------
# In-circuit FrChallenger replay
# ---------------------------------------------------------------------------

class FrChallengerCircuit:
    """Mirror of hash.poseidon_bn128.FrChallenger over R1CS LCs.

    Absorbed GL values must be reduced (< 2^64) GLVars; Fr slots are LCs.
    Squeezes return 56-bit GLVars (canonical by construction)."""

    def __init__(self, b: R1CSBuilder):
        self.b = b
        self.state: list[LC] = [LC() for _ in range(WIDTH)]
        self._gl_buf: list[GLVar] = []
        self._fr_buf: list[LC] = []
        self._out: list[LC] = []

    def _flush_gl(self):
        if self._gl_buf:
            acc = LC()
            for k, v in enumerate(self._gl_buf):
                assert v.bound <= 1 << 64, "absorb requires reduced GL"
                acc = lc_add(acc, lc_scale(v.lc, 1 << (64 * k)))
            self._gl_buf.clear()
            self._push_fr(acc)

    def _push_fr(self, v: LC):
        self._fr_buf.append(v)
        if len(self._fr_buf) == RATE:
            self._duplex()

    def observe_gl(self, x: GLVar):
        self._out.clear()
        self._gl_buf.append(x)
        if len(self._gl_buf) == GOLDILOCKS_ELEMENTS:
            self._flush_gl()

    def observe_gls(self, xs):
        for x in xs:
            self.observe_gl(x)

    def observe_fr(self, v: LC):
        self._out.clear()
        self._flush_gl()
        self._push_fr(v)

    def observe_ext(self, e):
        self.observe_gls(e)

    def _duplex(self):
        st = list(self.state)
        for i, v in enumerate(self._fr_buf):
            st[1 + i] = v
        self._fr_buf.clear()
        self.state = permute_bn254_lc(self.b, st)
        bits = to_bits_canonical(self.b, self.state[0])
        self._out = [self.b.from_bits(bits[56 * i: 56 * (i + 1)])
                     for i in range(4)]

    def get_challenge(self) -> GLVar:
        self._flush_gl()
        if self._fr_buf or not self._out:
            self._duplex()
        return GLVar(self._out.pop(0), 1 << 56)

    def get_n_challenges(self, n: int) -> list[GLVar]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self):
        c = self.get_n_challenges(2)
        return (c[0], c[1])
