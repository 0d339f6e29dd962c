"""Device evaluation of the PoseidonGate's constraints with rolled loops.

The PoseidonGate's algebra-generic `eval_unfiltered` unrolls ~123
constraints whose formulas chain thousands of field ops — XLA cannot
compile that graph fused over a whole LDE coset.  This module evaluates the
SAME constraints (identical order and values) with `lax.fori_loop` bodies:
one full-round body and one partial-round body, constants indexed from
stacked device tables, constraint rows written via dynamic_update_slice.

Used by the prover's device quotient path for every circuit that contains
Poseidon rows (recursion circuits above all).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gl2x32 as gl
from ..hash import poseidon as pos

W = 12
HALF_FULL = pos.HALF_N_FULL_ROUNDS
N_PARTIAL = pos.N_PARTIAL_ROUNDS


def _tbl(x):
    """Constant tables stay NUMPY at module level: this module is first
    imported lazily from inside a jit trace (prover_tpu._quotient_split),
    and a jnp.asarray created there would be a tracer bound to that trace —
    cached in a global, it poisons every later trace (UnexpectedTracerError,
    seen on the real chip by scripts/tpu_smoke.py).  numpy constants are
    embedded per-trace by XLA for free."""
    a = np.asarray(x, dtype=np.uint64)
    return ((a >> np.uint64(32)).astype(np.uint32),
            (a & np.uint64(0xFFFFFFFF)).astype(np.uint32))


_RC = _tbl(pos.ALL_ROUND_CONSTANTS.reshape(30, W))          # (30, 12)
_MDS_CIRC = _tbl(pos.MDS_CIRC)                              # (12,)
_MDS_DIAG = _tbl(pos.MDS_DIAG)
_FAST_FIRST = _tbl(pos.FAST_PARTIAL_FIRST_ROUND_CONSTANT)   # (12,)
_FAST_INIT = _tbl(pos.FAST_PARTIAL_ROUND_INITIAL_MATRIX)    # (11, 11)
_FAST_W_HATS = _tbl(pos.FAST_PARTIAL_ROUND_W_HATS)          # (22, 11)
_FAST_VS = _tbl(pos.FAST_PARTIAL_ROUND_VS)                  # (22, 11)
_FAST_CONST = _tbl(pos.FAST_PARTIAL_ROUND_CONSTANTS)        # (22,)
_MDS00 = _tbl(np.uint64(pos.MDS0TO0))


def _row(tbl, i):
    return (tbl[0][i], tbl[1][i])


def _dyn(tbl, r):
    """Dynamic row of a (R, ...) constant table -> (hi, lo) of row shape."""
    return (jax.lax.dynamic_index_in_dim(tbl[0], r, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(tbl[1], r, 0, keepdims=False))


def _sbox(x):
    x2 = gl.square(x)
    x3 = gl.mul(x2, x)
    return gl.mul(gl.square(x3), x)


def _bcast(c, like):
    return (jnp.broadcast_to(c[0], like[0].shape),
            jnp.broadcast_to(c[1], like[1].shape))


def _mds_layer(state):
    """state: (hi, lo) of shape (12, ...) -> same; circulant + diagonal."""
    outs_hi, outs_lo = [], []
    for r in range(W):
        acc = gl.zeros(state[0].shape[1:])
        for i in range(W):
            c = int(pos.MDS_CIRC[i])
            row = (state[0][(i + r) % W], state[1][(i + r) % W])
            w2, w1, w0 = gl.mul_small(row, c)
            acc = gl.add(acc, gl.reduce128(jnp.zeros_like(w2), w2, w1, w0))
        d = int(pos.MDS_DIAG[r])
        w2, w1, w0 = gl.mul_small((state[0][r], state[1][r]), d)
        acc = gl.add(acc, gl.reduce128(jnp.zeros_like(w2), w2, w1, w0))
        outs_hi.append(acc[0])
        outs_lo.append(acc[1])
    return (jnp.stack(outs_hi), jnp.stack(outs_lo))


def eval_poseidon_gate_device(gate, wires):
    """wires: (hi, lo) pair of (num_wires, lde).  Returns (hi, lo) pair of
    (123, lde) constraint values, order identical to
    PoseidonGate.eval_unfiltered."""
    shape = wires[0].shape[1:]

    def wire(i):
        return (wires[0][i], wires[1][i])

    def stack(rows):
        return (jnp.stack([r[0] for r in rows]),
                jnp.stack([r[1] for r in rows]))

    constraints = []
    swap = wire(gate.wire_swap())
    one = gl.ones(shape)
    constraints.append(gl.mul(swap, gl.sub(swap, one)))
    for i in range(4):
        delta = wire(gate.wire_delta(i))
        diff = gl.sub(wire(gate.wire_input(i + 4)), wire(gate.wire_input(i)))
        constraints.append(gl.sub(gl.mul(swap, diff), delta))

    state_rows = []
    for i in range(4):
        state_rows.append(gl.add(wire(gate.wire_input(i)),
                                 wire(gate.wire_delta(i))))
    for i in range(4):
        state_rows.append(gl.sub(wire(gate.wire_input(i + 4)),
                                 wire(gate.wire_delta(i))))
    for i in range(8, W):
        state_rows.append(wire(gate.wire_input(i)))
    state = stack(state_rows)

    # sbox-in wires stacked per phase for dynamic indexing inside loops
    full0_wires = stack([wire(gate.wire_full_sbox_0(r, i))
                         for r in range(1, HALF_FULL) for i in range(W)])
    full0_wires = (full0_wires[0].reshape((HALF_FULL - 1, W) + shape),
                   full0_wires[1].reshape((HALF_FULL - 1, W) + shape))
    partial_wires = stack([wire(gate.wire_partial_sbox(r))
                           for r in range(N_PARTIAL)])
    full1_wires = stack([wire(gate.wire_full_sbox_1(r, i))
                         for r in range(HALF_FULL) for i in range(W)])
    full1_wires = (full1_wires[0].reshape((HALF_FULL, W) + shape),
                   full1_wires[1].reshape((HALF_FULL, W) + shape))

    def const_layer(st, rc_pair):
        return (gl.add((st[0], st[1]),
                       (rc_pair[0].reshape((W,) + (1,) * len(shape)),
                        rc_pair[1].reshape((W,) + (1,) * len(shape)))))

    # ---- first full rounds: round 0 unrolled (no constraints), rounds
    # 1..3 in a fori_loop emitting 12 constraints each ----
    state = const_layer(state, _row(_RC, 0))
    state = _sbox(state)
    state = _mds_layer(state)

    c_full0 = (jnp.zeros((HALF_FULL - 1, W) + shape, jnp.uint32),
               jnp.zeros((HALF_FULL - 1, W) + shape, jnp.uint32))

    def full0_body(r, carry):
        st, (ch, cl) = carry
        st = const_layer(st, _dyn(_RC, r + 1))
        win = (jax.lax.dynamic_index_in_dim(full0_wires[0], r, 0, False),
               jax.lax.dynamic_index_in_dim(full0_wires[1], r, 0, False))
        diff = gl.canonicalize(gl.sub(st, win))
        ch = jax.lax.dynamic_update_index_in_dim(ch, diff[0], r, 0)
        cl = jax.lax.dynamic_update_index_in_dim(cl, diff[1], r, 0)
        st = _sbox(win)
        st = _mds_layer(st)
        return st, (ch, cl)

    state, c_full0 = jax.lax.fori_loop(0, HALF_FULL - 1, full0_body,
                                       (state, c_full0))

    # ---- partial rounds ----
    state = const_layer(state, _row(_FAST_FIRST, slice(None)))
    # mds_partial_layer_init
    init_rows = [(state[0][0], state[1][0])]
    for d in range(1, W):
        acc = gl.zeros(shape)
        for r in range(1, W):
            t = int(pos.FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1, d - 1])
            c = (jnp.uint32(t >> 32), jnp.uint32(t & 0xFFFFFFFF))
            acc = gl.add(acc, gl.mul((state[0][r], state[1][r]), c))
        init_rows.append(acc)
    state = stack(init_rows)

    c_partial = (jnp.zeros((N_PARTIAL,) + shape, jnp.uint32),
                 jnp.zeros((N_PARTIAL,) + shape, jnp.uint32))

    def partial_body(r, carry):
        st, (ch, cl) = carry
        sin = (jax.lax.dynamic_index_in_dim(partial_wires[0], r, 0, False),
               jax.lax.dynamic_index_in_dim(partial_wires[1], r, 0, False))
        diff = gl.canonicalize(gl.sub((st[0][0], st[1][0]), sin))
        ch = jax.lax.dynamic_update_index_in_dim(ch, diff[0], r, 0)
        cl = jax.lax.dynamic_update_index_in_dim(cl, diff[1], r, 0)
        s0 = _sbox(sin)
        rc = _dyn(_FAST_CONST, jnp.minimum(r, N_PARTIAL - 2))
        s0c = gl.add(s0, _bcast(rc, s0))
        s0 = gl.select(r < N_PARTIAL - 1, s0c, s0)
        # mds_partial_layer_fast with row-r tables
        whats = _dyn(_FAST_W_HATS, r)   # (11,)
        vs = _dyn(_FAST_VS, r)          # (11,)
        d = gl.mul(s0, _bcast(_MDS00, s0))
        # d += sum_i w_hats[i] * state[i+1]
        prods = gl.mul((whats[0].reshape((W - 1,) + (1,) * len(shape)),
                        whats[1].reshape((W - 1,) + (1,) * len(shape))),
                       (st[0][1:], st[1][1:]))
        d = gl.add(d, (_sum_rows(prods)))
        # state[i+1] += vs[i] * s0
        adds = gl.mul((vs[0].reshape((W - 1,) + (1,) * len(shape)),
                       vs[1].reshape((W - 1,) + (1,) * len(shape))),
                      (jnp.broadcast_to(s0[0], (W - 1,) + shape),
                       jnp.broadcast_to(s0[1], (W - 1,) + shape)))
        rest = gl.add((st[0][1:], st[1][1:]), adds)
        st = (jnp.concatenate([d[0][None], rest[0]]),
              jnp.concatenate([d[1][None], rest[1]]))
        return st, (ch, cl)

    state, c_partial = jax.lax.fori_loop(0, N_PARTIAL, partial_body,
                                         (state, c_partial))

    # ---- second full rounds ----
    c_full1 = (jnp.zeros((HALF_FULL, W) + shape, jnp.uint32),
               jnp.zeros((HALF_FULL, W) + shape, jnp.uint32))

    def full1_body(r, carry):
        st, (ch, cl) = carry
        st = const_layer(st, _dyn(_RC, HALF_FULL + N_PARTIAL + r))
        win = (jax.lax.dynamic_index_in_dim(full1_wires[0], r, 0, False),
               jax.lax.dynamic_index_in_dim(full1_wires[1], r, 0, False))
        diff = gl.canonicalize(gl.sub(st, win))
        ch = jax.lax.dynamic_update_index_in_dim(ch, diff[0], r, 0)
        cl = jax.lax.dynamic_update_index_in_dim(cl, diff[1], r, 0)
        st = _sbox(win)
        st = _mds_layer(st)
        return st, (ch, cl)

    state, c_full1 = jax.lax.fori_loop(0, HALF_FULL, full1_body,
                                       (state, c_full1))

    out_rows = []
    for i in range(W):
        out_rows.append(gl.canonicalize(
            gl.sub((state[0][i], state[1][i]), wire(gate.wire_output(i)))))

    first = stack(constraints)
    all_hi = jnp.concatenate([
        first[0], c_full0[0].reshape((-1,) + shape), c_partial[0],
        c_full1[0].reshape((-1,) + shape),
        jnp.stack([r[0] for r in out_rows])])
    all_lo = jnp.concatenate([
        first[1], c_full0[1].reshape((-1,) + shape), c_partial[1],
        c_full1[1].reshape((-1,) + shape),
        jnp.stack([r[1] for r in out_rows])])
    return (all_hi, all_lo)


def _sum_rows(pairs):
    """Field-sum a (k, ...) pair over axis 0 (pairwise tree)."""
    hi, lo = pairs
    n = hi.shape[0]
    while n > 1:
        half = n // 2
        s = gl.add((hi[:half], lo[:half]), (hi[half:2 * half],
                                            lo[half:2 * half]))
        if n % 2:
            hi = jnp.concatenate([s[0], hi[2 * half:]])
            lo = jnp.concatenate([s[1], lo[2 * half:]])
        else:
            hi, lo = s
        n = hi.shape[0]
    return (hi[0], lo[0])
