"""Device-side Poseidon permutation + sponge, batched over TPU lanes.

The permutation state is a Goldilocks (hi, lo) uint32 pair of shape
``(..., 12)`` — a full Merkle level or a whole batch of sponge absorptions
runs as one vectorized permutation.  Rounds run under ``lax.fori_loop`` with
round constants held as device tables (keeps the traced graph tiny so XLA
compiles fast); the MDS layer is one broadcast field multiply against the
dense 12x12 matrix followed by a log-depth carry-safe tree sum.

Cross-tested bit-exactly against the host implementation, which itself
matches the reference verifier's known-answer vector
(gnark-plonky2-verifier/tests/goldilocks_test.go:47-57).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import gl2x32 as gl
from ..hash.poseidon import (
    ALL_ROUND_CONSTANTS,
    MDS_MATRIX,
    WIDTH,
    RATE,
    HALF_N_FULL_ROUNDS,
    N_PARTIAL_ROUNDS,
    HASH_OUT_SIZE,
)

N_ROUNDS = 2 * HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS

# Constant tables as uint32 planes.  They stay NUMPY: a module-level
# jnp.asarray would be a committed device array, and every jit lowering
# that closes over it must pull its value BACK from the device to embed it
# as an MLIR constant — the slow/fragile direction of the tunneled link.
_RC = ALL_ROUND_CONSTANTS.reshape(N_ROUNDS, WIDTH)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_MDS_HI = (MDS_MATRIX >> np.uint64(32)).astype(np.uint32)
_MDS_LO = (MDS_MATRIX & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def _sbox(x):
    x2 = gl.square(x)
    x3 = gl.mul(x2, x)
    x6 = gl.square(x3)
    return gl.mul(x6, x)


def _tree_sum(x, axis=-1):
    """Field-sum over an axis of length 12 via pairwise adds (log depth)."""
    hi, lo = x
    n = hi.shape[axis]
    while n > 1:
        half = n // 2
        a = (jax.lax.slice_in_dim(hi, 0, half, axis=axis),
             jax.lax.slice_in_dim(lo, 0, half, axis=axis))
        b = (jax.lax.slice_in_dim(hi, half, 2 * half, axis=axis),
             jax.lax.slice_in_dim(lo, half, 2 * half, axis=axis))
        s = gl.add(a, b)
        if n % 2:
            rem = (jax.lax.slice_in_dim(hi, 2 * half, n, axis=axis),
                   jax.lax.slice_in_dim(lo, 2 * half, n, axis=axis))
            hi = jnp.concatenate([s[0], rem[0]], axis=axis)
            lo = jnp.concatenate([s[1], rem[1]], axis=axis)
            n = half + 1
        else:
            hi, lo = s
            n = half
    return (jnp.squeeze(hi, axis=axis), jnp.squeeze(lo, axis=axis))


_MDS_T_I32 = MDS_MATRIX.astype(np.int64).T.astype(np.int32)


def _mds_layer_planes(state):
    """MDS on 16-bit digit planes: entries are tiny (<= 41), so the dot is
    exact on int32 (max column sum 12*41*65535 < 2^25) and the four plane
    results recombine into a (hi, lo) pair with shifts only:
        v = out0 + 2^16 out1 + 2^32 out2 + 2^48 out3
    where the 2^48 plane splits as (low16 << 48) + (high << 64) and
    2^64 = 2^32 - 1 mod p.  ~7x fewer VPU ops than the generic-gl.mul
    form; the TPU prover's Merkle leaf hashing is MDS-bound."""
    hi, lo = state
    planes = jnp.stack([lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16],
                       axis=-2).astype(jnp.int32)          # (..., 4, 12)
    # out[..., k, r] = sum_i planes[..., k, i] * MDS[r, i]
    out = (planes @ _MDS_T_I32).astype(jnp.uint32)
    o0 = out[..., 0, :]
    o1 = out[..., 1, :]
    o2 = out[..., 2, :]
    o3 = out[..., 3, :]
    z = jnp.zeros_like(o0)
    acc = gl.add((z, o0), (o1 >> 16, o1 << 16))        # o0 + 2^16 o1
    acc = gl.add(acc, (o2, z))                          # + 2^32 o2
    acc = gl.add(acc, ((o3 & 0xFFFF) << 16, z))         # + 2^48 (o3 & 0xffff)
    hi3 = o3 >> 16
    acc = gl.add(acc, (hi3, z))                         # + 2^64 hi3
    acc = gl.sub(acc, (z, hi3))                         #   (2^64 = 2^32 - 1)
    return acc


def _mds_layer_dense(state):
    """Generic form: full gl.mul against the dense matrix + tree sum.
    XLA:CPU compiles the plane/matmul form pathologically slowly when the
    permutation is inlined many times (hash chains), so the CPU backend
    keeps this one; both are bit-exact."""
    hi, lo = state
    xb = (hi[..., None, :], lo[..., None, :])          # (..., 1, 12)
    prod = gl.mul(xb, (_MDS_HI, _MDS_LO))              # (..., 12, 12)
    return _tree_sum(prod, axis=-1)                     # (..., 12)


def _mds_layer(state):
    import jax as _jax
    if _jax.default_backend() == "tpu":
        return _mds_layer_planes(state)
    return _mds_layer_dense(state)


def _const_layer(state, r):
    rc_hi = jax.lax.dynamic_slice_in_dim(_RC_HI, r, 1, 0)[0]
    rc_lo = jax.lax.dynamic_slice_in_dim(_RC_LO, r, 1, 0)[0]
    return gl.add(state, (rc_hi, rc_lo))


def _full_round(r, state):
    state = _const_layer(state, r)
    state = _sbox(state)
    return _mds_layer(state)


def _partial_round(r, state):
    state = _const_layer(state, r)
    hi, lo = state
    s0 = _sbox((hi[..., :1], lo[..., :1]))
    state = (jnp.concatenate([s0[0], hi[..., 1:]], axis=-1),
             jnp.concatenate([s0[1], lo[..., 1:]], axis=-1))
    return _mds_layer(state)


@jax.jit
def permute(state):
    """Poseidon permutation on (hi, lo) uint32 arrays of shape (..., 12)."""
    state = jax.lax.fori_loop(0, HALF_N_FULL_ROUNDS, _full_round, state)
    state = jax.lax.fori_loop(HALF_N_FULL_ROUNDS,
                              HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS,
                              _partial_round, state)
    state = jax.lax.fori_loop(HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS, N_ROUNDS,
                              _full_round, state)
    return state


@jax.jit
def hash_no_pad_batch(inputs):
    """Batched `hash_n_to_m_no_pad`: (hi, lo) of shape (..., L) -> (..., 4)."""
    hi, lo = inputs
    L = hi.shape[-1]
    shape = hi.shape[:-1]
    st = (jnp.zeros(shape + (WIDTH,), jnp.uint32),
          jnp.zeros(shape + (WIDTH,), jnp.uint32))
    for start in range(0, L, RATE):
        chunk = min(RATE, L - start)
        st = (jnp.concatenate([hi[..., start:start + chunk], st[0][..., chunk:]], axis=-1),
              jnp.concatenate([lo[..., start:start + chunk], st[1][..., chunk:]], axis=-1))
        st = permute(st)
    return (st[0][..., :HASH_OUT_SIZE], st[1][..., :HASH_OUT_SIZE])


@jax.jit
def hash_or_noop_batch(inputs):
    hi, lo = inputs
    L = hi.shape[-1]
    if L <= HASH_OUT_SIZE:
        pad = HASH_OUT_SIZE - L
        if pad:
            z = jnp.zeros(hi.shape[:-1] + (pad,), jnp.uint32)
            hi = jnp.concatenate([hi, z], axis=-1)
            lo = jnp.concatenate([lo, z], axis=-1)
        return (hi, lo)
    return hash_no_pad_batch((hi, lo))


@jax.jit
def two_to_one_batch(left, right):
    """left, right: (hi, lo) shape (..., 4) -> compressed parent (..., 4)."""
    shape = left[0].shape[:-1]
    z = jnp.zeros(shape + (WIDTH - 8,), jnp.uint32)
    st = (jnp.concatenate([left[0], right[0], z], axis=-1),
          jnp.concatenate([left[1], right[1], z], axis=-1))
    st = permute(st)
    return (st[0][..., :HASH_OUT_SIZE], st[1][..., :HASH_OUT_SIZE])


@functools.partial(jax.jit, static_argnums=1)
def merkle_tree_levels(leaves, cap_height: int):
    """Build a Merkle tree from (hi, lo) leaves of shape (N, L).

    Returns (levels, cap): levels[0] = leaf digests (N, 4) down to
    levels[-1] = cap level (2^cap_height, 4); cap == levels[-1].
    plonky2 semantics: leaf vectors hashed with hash_or_noop, interior nodes
    with two_to_one; the tree stops at 2^cap_height nodes.
    """
    n = leaves[0].shape[0]
    assert n & (n - 1) == 0, "leaf count must be a power of two"
    digests = hash_or_noop_batch(leaves)
    levels = [digests]
    cur = digests
    while cur[0].shape[0] > (1 << cap_height):
        left = (cur[0][0::2], cur[1][0::2])
        right = (cur[0][1::2], cur[1][1::2])
        cur = two_to_one_batch(left, right)
        levels.append(cur)
    return levels, cur


merkle_tree_levels_jit = merkle_tree_levels
