"""Polynomial batch commitments: device LDE + bit-reversed Merkle trees.

Equivalent of plonky2's `PolynomialBatch` (SURVEY.md §2.1): commit to a
batch of polynomials by low-degree-extending each onto the rate-8 coset
(shift 7), storing leaf vectors in bit-reversed domain order, and building a
Poseidon Merkle tree with a 2^cap_height cap.  The NTTs and the tree build
run on device; digests are pulled back to host once for query-phase proof
extraction (tiny compared to the LDE work).
"""
from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..field import gl64
from ..field import gl2x32 as gl
from ..ops import ntt as ntt_ops
from ..ops import poseidon_tpu
from ..hash import poseidon as pos


@functools.lru_cache(maxsize=None)
def bit_rev_perm(log_n: int) -> np.ndarray:
    return ntt_ops._bit_rev_indices(log_n).astype(np.int64)


class PolynomialBatch:
    """Commit to values (num_polys, n) uint64.

    Attributes:
      coeffs       : host (num_polys, n) uint64 (for openings at zeta)
      lde_natural  : device (hi, lo) (num_polys, n*8) natural domain order
      leaves_u64   : host (n*8, num_polys) uint64 in bit-reversed order
      levels_u64   : host list of (m, 4) digest arrays, leaf level first
      cap_u64      : host (2^cap_height, 4) uint64
    """

    def __init__(self, values_u64: np.ndarray, rate_bits: int, cap_height: int,
                 values_are_coeffs: bool = False):
        values_u64 = np.asarray(values_u64, dtype=np.uint64)
        num_polys, n = values_u64.shape
        log_n = (n - 1).bit_length()
        assert n == 1 << log_n
        self.rate_bits = rate_bits
        self.cap_height = cap_height
        self.log_n = log_n

        dev_vals = gl.from_u64_np(values_u64)
        if values_are_coeffs:
            coeffs_dev = dev_vals
        else:
            coeffs_dev = ntt_ops.intt(dev_vals, log_n)
        self.coeffs = gl.to_u64_np(coeffs_dev)

        # zero-pad coeffs and coset-NTT to the LDE domain
        pad = n * ((1 << rate_bits) - 1)
        zhi = jnp.zeros((num_polys, pad), jnp.uint32)
        chi = jnp.concatenate([coeffs_dev[0], zhi], axis=-1)
        clo = jnp.concatenate([coeffs_dev[1], zhi], axis=-1)
        lde = ntt_ops.coset_ntt((chi, clo), log_n + rate_bits)
        self.lde_natural = lde

        # bit-reversed leaves: (lde_size, num_polys)
        rev = jnp.asarray(bit_rev_perm(log_n + rate_bits))
        leaves = (jnp.take(lde[0], rev, axis=-1).T,
                  jnp.take(lde[1], rev, axis=-1).T)
        levels, cap = poseidon_tpu.merkle_tree_levels(leaves, cap_height)
        self.leaves_u64 = gl.to_u64_np(leaves)
        self.levels_u64 = [gl.to_u64_np(lv) for lv in levels]
        self.cap_u64 = self.levels_u64[-1]

    @property
    def lde_values_u64(self) -> np.ndarray:
        """Host copy of natural-order LDE values (num_polys, lde_size)."""
        if not hasattr(self, "_lde_u64"):
            self._lde_u64 = gl.to_u64_np(self.lde_natural)
        return self._lde_u64

    def merkle_proof(self, leaf_index: int):
        """Returns (leaf_values (num_polys,), siblings (depth, 4))."""
        sibs = []
        idx = leaf_index
        for level in self.levels_u64[:-1]:
            sibs.append(level[idx ^ 1])
            idx >>= 1
        return self.leaves_u64[leaf_index], np.array(sibs, dtype=np.uint64)


def verify_merkle_proof(leaf_values: np.ndarray, leaf_index: int,
                        siblings: np.ndarray, cap: np.ndarray) -> bool:
    """Host-side check against a cap (plonky2 semantics: low bits walk the
    path, top cap_height bits of the leaf index select the cap entry)."""
    digest = pos.hash_or_noop(np.asarray(leaf_values, dtype=np.uint64))
    idx = leaf_index
    for sib in siblings:
        if idx & 1:
            digest = pos.two_to_one(sib, digest)
        else:
            digest = pos.two_to_one(digest, sib)
        idx >>= 1
    return bool(np.array_equal(digest, cap[idx]))


class ExtPolynomialBatch:
    """Commitment for extension-field polynomials (FRI commit phase trees).

    values: (m, 2) ext values over a domain of size m (bit-reversed order),
    grouped into arity-sized cosets per leaf, flattened [re, im] pairs.
    """

    def __init__(self, values_bitrev_ext: np.ndarray, arity_bits: int,
                 cap_height: int):
        v = np.asarray(values_bitrev_ext, dtype=np.uint64)
        m = v.shape[0]
        arity = 1 << arity_bits
        num_leaves = m // arity
        # leaf i = [v[i*arity+0].0, v[i*arity+0].1, v[i*arity+1].0, ...]
        leaves = v.reshape(num_leaves, arity * 2)
        dev_leaves = gl.from_u64_np(leaves)
        levels, cap = poseidon_tpu.merkle_tree_levels(dev_leaves, cap_height)
        self.leaves_u64 = leaves
        self.levels_u64 = [gl.to_u64_np(lv) for lv in levels]
        self.cap_u64 = self.levels_u64[-1]

    def merkle_proof(self, leaf_index: int):
        sibs = []
        idx = leaf_index
        for level in self.levels_u64[:-1]:
            sibs.append(level[idx ^ 1])
            idx >>= 1
        return self.leaves_u64[leaf_index], np.array(sibs, dtype=np.uint64)
