"""Host-side Poseidon permutation over Goldilocks (width 12, x^7 S-box).

Round structure: 4 full rounds, 22 partial, 4 full (30 total, 360 round
constants).  Constants are the canonical plonky2 tables, loaded from
`poseidon_goldilocks_constants.json` (extracted from the duplicate copy in
/root/reference/gnark-plonky2-verifier/poseidon/goldilocks_constants.go).

This is the *naive* (unoptimized) formulation; plonky2's fast-partial-round
variant is algebraically identical on outputs, and the device kernel in
ops/poseidon_tpu.py is cross-tested against this implementation.

Sponge construction (rate 8, capacity 4) mirrors plonky2's
`hash_n_to_m_no_pad` / `two_to_one` / `hash_or_noop`, which the recursive
verifier and the Fiat-Shamir challenger both depend on (see
/root/reference/gnark-plonky2-verifier/poseidon/goldilocks.go:44-66 and
challenger/challenger.go:42-117 for the mirrored semantics).
"""
from __future__ import annotations

import json
import os

import numpy as np

from ..field import gl64

WIDTH = 12
RATE = 8
HALF_N_FULL_ROUNDS = 4
N_PARTIAL_ROUNDS = 22
HASH_OUT_SIZE = 4

_HERE = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_HERE, "poseidon_goldilocks_constants.json")) as _f:
    _C = json.load(_f)

ALL_ROUND_CONSTANTS = np.array(_C["ALL_ROUND_CONSTANTS"], dtype=np.uint64)
MDS_CIRC = np.array(_C["MDS_MATRIX_CIRC"], dtype=np.uint64)
MDS_DIAG = np.array(_C["MDS_MATRIX_DIAG"], dtype=np.uint64)
assert ALL_ROUND_CONSTANTS.shape == (360,)

# Fast-partial-round reformulation tables (algebraically equivalent to the
# naive partial rounds; used by the in-circuit PoseidonGate wire layout).
FAST_PARTIAL_FIRST_ROUND_CONSTANT = np.array(
    _C["FAST_PARTIAL_FIRST_ROUND_CONSTANT"], dtype=np.uint64)
FAST_PARTIAL_ROUND_CONSTANTS = np.array(
    _C["FAST_PARTIAL_ROUND_CONSTANTS"], dtype=np.uint64)
FAST_PARTIAL_ROUND_VS = np.array(
    _C["FAST_PARTIAL_ROUND_VS"], dtype=np.uint64).reshape(22, 11)
FAST_PARTIAL_ROUND_W_HATS = np.array(
    _C["FAST_PARTIAL_ROUND_W_HATS"], dtype=np.uint64).reshape(22, 11)
FAST_PARTIAL_ROUND_INITIAL_MATRIX = np.array(
    _C["FAST_PARTIAL_ROUND_INITIAL_MATRIX"], dtype=np.uint64).reshape(11, 11)
MDS0TO0 = np.uint64(25)  # MDS_CIRC[0] + MDS_DIAG[0]

# Dense 12x12 MDS matrix: M[r][i] = CIRC[(i - r) % 12] + (DIAG[r] if i == r).
MDS_MATRIX = np.zeros((WIDTH, WIDTH), dtype=np.uint64)
for _r in range(WIDTH):
    for _i in range(WIDTH):
        MDS_MATRIX[_r, _i] = MDS_CIRC[(_i - _r) % WIDTH]
    MDS_MATRIX[_r, _r] += MDS_DIAG[_r]


def _constant_layer(state: np.ndarray, round_ctr: int) -> np.ndarray:
    rc = ALL_ROUND_CONSTANTS[WIDTH * round_ctr: WIDTH * (round_ctr + 1)]
    return gl64.add(state, rc)


def _sbox(x: np.ndarray) -> np.ndarray:
    x2 = gl64.square(x)
    x3 = gl64.mul(x2, x)
    x6 = gl64.square(x3)
    return gl64.mul(x6, x)


def _mds_layer(state: np.ndarray) -> np.ndarray:
    # state: (..., 12). out[r] = sum_i M[r][i] * state[i].
    out = np.zeros_like(state)
    for r in range(WIDTH):
        acc_hi = np.zeros(state.shape[:-1], dtype=np.uint64)
        acc_lo = np.zeros(state.shape[:-1], dtype=np.uint64)
        for i in range(WIDTH):
            c = int(MDS_MATRIX[r, i])
            if c == 0:
                continue
            # state < 2^64, c < 64: product < 2^70 -> accumulate in 128-bit
            # (hi, lo) pair; totals stay < 2^74.
            h, l = gl64._mul_wide(state[..., i], np.uint64(c))
            new_lo = acc_lo + l
            acc_hi = acc_hi + h + (new_lo < l)
            acc_lo = new_lo
        out[..., r] = gl64.reduce128(acc_hi, acc_lo)
    return out


_MDS_INT = [[int(MDS_MATRIX[r, i]) for i in range(WIDTH)] for r in range(WIDTH)]
_RC_INT = [int(x) for x in ALL_ROUND_CONSTANTS]


def _permute_scalar(state_ints: list) -> list:
    """Pure-Python big-int permutation for single states (transcript path):
    ~50x faster than numpy scalar ops at batch size 1."""
    P_ = gl64.P
    st = [x % P_ for x in state_ints]

    def full_round(st, rc):
        st = [(st[i] + _RC_INT[12 * rc + i]) % P_ for i in range(12)]
        st = [pow(x, 7, P_) for x in st]
        return [sum(_MDS_INT[r][i] * st[i] for i in range(12)) % P_
                for r in range(12)]

    rc = 0
    for _ in range(HALF_N_FULL_ROUNDS):
        st = full_round(st, rc)
        rc += 1
    for _ in range(N_PARTIAL_ROUNDS):
        st = [(st[i] + _RC_INT[12 * rc + i]) % P_ for i in range(12)]
        st[0] = pow(st[0], 7, P_)
        st = [sum(_MDS_INT[r][i] * st[i] for i in range(12)) % P_
              for r in range(12)]
        rc += 1
    for _ in range(HALF_N_FULL_ROUNDS):
        st = full_round(st, rc)
        rc += 1
    return st


try:
    from .. import native as _native
    _NATIVE = _native if _native.available else None
except Exception:  # pragma: no cover
    _NATIVE = None


def permute(state: np.ndarray) -> np.ndarray:
    """Poseidon permutation; state shape (..., 12), canonical uint64."""
    assert state.shape[-1] == WIDTH
    if _NATIVE is not None:
        return _NATIVE.poseidon_permute(state)
    if state.ndim == 1:
        return np.array(_permute_scalar([int(x) for x in state]),
                        dtype=np.uint64)
    with np.errstate(over="ignore"):
        round_ctr = 0
        for _ in range(HALF_N_FULL_ROUNDS):
            state = _constant_layer(state, round_ctr)
            state = _sbox(state)
            state = _mds_layer(state)
            round_ctr += 1
        for _ in range(N_PARTIAL_ROUNDS):
            state = _constant_layer(state, round_ctr)
            state = state.copy()
            state[..., 0] = _sbox(state[..., 0])
            state = _mds_layer(state)
            round_ctr += 1
        for _ in range(HALF_N_FULL_ROUNDS):
            state = _constant_layer(state, round_ctr)
            state = _sbox(state)
            state = _mds_layer(state)
            round_ctr += 1
    return state


# ---------------------------------------------------------------------------
# Fast partial-round formulation (plonky2's optimization; identical output).
# Round structure: 4 full | partial_first_constant_layer -> mds_partial_init
# -> 22x (sbox(state0) -> +FAST_RC -> mds_partial_fast) | 4 full.
# The PoseidonGate's wire layout follows THIS formulation, so the witness
# generator must produce these exact intermediates.
# ---------------------------------------------------------------------------


def partial_first_constant_layer(state: np.ndarray) -> np.ndarray:
    return gl64.add(state, FAST_PARTIAL_FIRST_ROUND_CONSTANT)


def mds_partial_layer_init(state: np.ndarray) -> np.ndarray:
    out = np.zeros_like(state)
    out[..., 0] = state[..., 0]
    for r in range(1, WIDTH):
        for d in range(1, WIDTH):
            t = FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1, d - 1]
            out[..., d] = gl64.add(out[..., d], gl64.mul(state[..., r], t))
    return out


def mds_partial_layer_fast(state: np.ndarray, r: int) -> np.ndarray:
    d_sum = gl64.mul(state[..., 0], MDS0TO0)
    for i in range(1, WIDTH):
        t = FAST_PARTIAL_ROUND_W_HATS[r, i - 1]
        d_sum = gl64.add(d_sum, gl64.mul(state[..., i], t))
    out = np.zeros_like(state)
    out[..., 0] = d_sum
    for i in range(1, WIDTH):
        t = FAST_PARTIAL_ROUND_VS[r, i - 1]
        out[..., i] = gl64.add(state[..., i], gl64.mul(state[..., 0], t))
    return out


def permute_fast(state: np.ndarray) -> np.ndarray:
    """Fast-partial-round permutation; must equal `permute` bit-exactly."""
    with np.errstate(over="ignore"):
        rc = 0
        for _ in range(HALF_N_FULL_ROUNDS):
            state = _constant_layer(state, rc)
            state = _sbox(state)
            state = _mds_layer(state)
            rc += 1
        state = partial_first_constant_layer(state)
        state = mds_partial_layer_init(state)
        for i in range(N_PARTIAL_ROUNDS):
            state = state.copy()
            state[..., 0] = _sbox(state[..., 0])
            state[..., 0] = gl64.add(state[..., 0], FAST_PARTIAL_ROUND_CONSTANTS[i])
            state = mds_partial_layer_fast(state, i)
        rc += N_PARTIAL_ROUNDS
        for _ in range(HALF_N_FULL_ROUNDS):
            state = _constant_layer(state, rc)
            state = _sbox(state)
            state = _mds_layer(state)
            rc += 1
    return state


def hash_n_to_m_no_pad(inputs: np.ndarray, num_outputs: int = HASH_OUT_SIZE) -> np.ndarray:
    """plonky2 `hash_n_to_m_no_pad`: absorb in rate-8 chunks, squeeze."""
    inputs = np.asarray(inputs, dtype=np.uint64)
    if _NATIVE is not None and num_outputs == HASH_OUT_SIZE:
        return _NATIVE.poseidon_hash_no_pad(inputs)
    state = np.zeros(WIDTH, dtype=np.uint64)
    for start in range(0, len(inputs), RATE):
        chunk = inputs[start: start + RATE]
        state = state.copy()
        state[: len(chunk)] = chunk
        state = permute(state)
    outputs = []
    while True:
        for s in state[:RATE]:
            outputs.append(s)
            if len(outputs) == num_outputs:
                return np.array(outputs, dtype=np.uint64)
        state = permute(state)


def hash_no_pad(inputs: np.ndarray) -> np.ndarray:
    return hash_n_to_m_no_pad(inputs, HASH_OUT_SIZE)


def hash_or_noop(inputs: np.ndarray) -> np.ndarray:
    inputs = np.asarray(inputs, dtype=np.uint64)
    if len(inputs) <= HASH_OUT_SIZE:
        out = np.zeros(HASH_OUT_SIZE, dtype=np.uint64)
        out[: len(inputs)] = inputs
        return out
    return hash_no_pad(inputs)


def two_to_one(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    state = np.zeros(WIDTH, dtype=np.uint64)
    state[0:4] = left
    state[4:8] = right
    return permute(state)[:HASH_OUT_SIZE]


class Challenger:
    """Fiat-Shamir duplex sponge over Goldilocks Poseidon.

    Exact transcript discipline of plonky2's `Challenger`, as replayed by the
    reference verifier (gnark-plonky2-verifier/challenger/challenger.go:42-117):
    observe buffers up to 8 elements then duplexes; challenges pop from the
    END of the output buffer (state[7] first); any observe clears pending
    outputs.
    """

    def __init__(self):
        self.sponge_state = np.zeros(WIDTH, dtype=np.uint64)
        self.input_buffer: list[int] = []
        self.output_buffer: list[int] = []

    def observe_element(self, x: int):
        self.output_buffer.clear()
        self.input_buffer.append(int(x) % gl64.P)
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_elements(self, xs):
        for x in xs:
            self.observe_element(int(x))

    def observe_hash(self, h):
        self.observe_elements(h)

    def observe_cap(self, cap):
        for h in cap:
            self.observe_hash(h)

    def observe_extension(self, e):
        self.observe_elements(e)

    def observe_extensions(self, es):
        for e in es:
            self.observe_extension(e)

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> list[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self) -> tuple[int, int]:
        c = self.get_n_challenges(2)
        return (c[0], c[1])

    def get_hash(self):
        return np.array(self.get_n_challenges(4), dtype=np.uint64)

    def _duplex(self):
        st = self.sponge_state.copy()
        for i, x in enumerate(self.input_buffer):
            st[i] = x
        self.input_buffer.clear()
        st = permute(st)
        self.sponge_state = st
        self.output_buffer = [int(x) for x in st[:RATE]]
