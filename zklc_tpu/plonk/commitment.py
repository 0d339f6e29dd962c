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

try:
    from .. import native as _native
    _NATIVE = _native if _native.available else None
except Exception:  # pragma: no cover
    _NATIVE = None


@functools.lru_cache(maxsize=None)
def bit_rev_perm(log_n: int) -> np.ndarray:
    return ntt_ops._bit_rev_indices(log_n).astype(np.int64)


def _use_host_path() -> bool:
    """Native host commitments when the jax backend is CPU: XLA:CPU NTT/
    Merkle graphs are orders of magnitude slower than the C++ kernels; on
    real TPU the device path wins and is used unchanged.

    ZKLC_HOST_COMMIT=1 forces the host path on any backend — verification
    and resume paths use it so that merely CHECKING a proof never
    allocates multi-GB LDEs in HBM next to an in-flight prove."""
    import os
    if os.environ.get("ZKLC_HOST_COMMIT") == "1":
        return True
    if _NATIVE is None:
        return False
    import jax
    return jax.default_backend() == "cpu"


@functools.lru_cache(maxsize=None)
def _root_fwd(log_n: int) -> int:
    return gl64.primitive_root_of_unity(log_n)


@functools.lru_cache(maxsize=None)
def _root_inv(log_n: int) -> int:
    return pow(_root_fwd(log_n), gl64.P - 2, gl64.P)


def host_intt(values_u64: np.ndarray, log_n: int) -> np.ndarray:
    out = _NATIVE.ntt_rows(values_u64.copy(), log_n, _root_inv(log_n))
    n_inv = pow(1 << log_n, gl64.P - 2, gl64.P)
    return gl64.mul(out, np.uint64(n_inv))


def host_coset_ntt(coeffs_u64: np.ndarray, log_n: int,
                   shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR
                   ) -> np.ndarray:
    pw = _NATIVE.powers(shift, 1 << log_n)
    scaled = gl64.mul(coeffs_u64, pw)
    return _NATIVE.ntt_rows(scaled, log_n, _root_fwd(log_n))


def host_merkle_levels(leaves_u64: np.ndarray, cap_height: int) -> list:
    """leaves (N, L) -> [leaf digests (N,4), ..., cap (2^cap_height,4)]."""
    levels = [_NATIVE.poseidon_hash_leaves(leaves_u64)]
    while levels[-1].shape[0] > (1 << cap_height):
        levels.append(_NATIVE.poseidon_merkle_level(levels[-1]))
    return levels


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
                 values_are_coeffs: bool = False, hasher: str = "gl"):
        values_u64 = np.asarray(values_u64, dtype=np.uint64)
        num_polys, n = values_u64.shape
        log_n = (n - 1).bit_length()
        assert n == 1 << log_n
        self.rate_bits = rate_bits
        self.cap_height = cap_height
        self.log_n = log_n
        self.hasher = hasher

        if hasher in ("bn128", "fr"):
            # Wrap-config commitment (PoseidonBN128GoldilocksConfig outer
            # hash, crypto/plonky2_bn128/src/config.rs:21): LDE as usual,
            # Merkle nodes in BN254-Fr via the native C++ kernels.
            from ..hash import poseidon_bn128 as pb
            if _use_host_path():
                coeffs = values_u64 if values_are_coeffs else \
                    host_intt(values_u64, log_n)
                self.coeffs = coeffs
                lde_log = log_n + rate_bits
                padded = np.zeros((num_polys, 1 << lde_log), dtype=np.uint64)
                padded[:, :n] = coeffs
                lde_u64 = host_coset_ntt(padded, lde_log)
            else:
                dev_vals = gl.from_u64_np(values_u64)
                coeffs_dev = dev_vals if values_are_coeffs else \
                    ntt_ops.intt(dev_vals, log_n)
                self.coeffs = gl.to_u64_np(coeffs_dev)
                pad = n * ((1 << rate_bits) - 1)
                zhi = jnp.zeros((num_polys, pad), jnp.uint32)
                chi = jnp.concatenate([coeffs_dev[0], zhi], axis=-1)
                clo = jnp.concatenate([coeffs_dev[1], zhi], axis=-1)
                lde_u64 = gl.to_u64_np(
                    ntt_ops.coset_ntt((chi, clo), log_n + rate_bits))
            self._lde_u64 = lde_u64
            self._lde_natural = None
            rev = bit_rev_perm(log_n + rate_bits)
            leaves = np.ascontiguousarray(lde_u64[:, rev].T)
            self.leaves_u64 = leaves
            self.levels_u64 = pb.merkle_levels_bn128(leaves, cap_height)
            self.cap_u64 = self.levels_u64[-1]
            return

        if _use_host_path():
            if values_are_coeffs:
                coeffs = values_u64
            else:
                coeffs = host_intt(values_u64, log_n)
            self.coeffs = coeffs
            lde_log = log_n + rate_bits
            padded = np.zeros((num_polys, 1 << lde_log), dtype=np.uint64)
            padded[:, :n] = coeffs
            lde_u64 = host_coset_ntt(padded, lde_log)
            self._lde_u64 = lde_u64
            self._lde_natural = None
            rev = bit_rev_perm(lde_log)
            leaves = np.ascontiguousarray(lde_u64[:, rev].T)
            self.leaves_u64 = leaves
            self.levels_u64 = host_merkle_levels(leaves, cap_height)
            self.cap_u64 = self.levels_u64[-1]
            return

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
        self._lde_natural = lde

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
        if getattr(self, "_lde_u64", None) is None:
            self._lde_u64 = gl.to_u64_np(self._lde_natural)
        return self._lde_u64

    @property
    def lde_natural(self):
        """Device (hi, lo) natural-order LDE values (built lazily on the
        host-commit path)."""
        if getattr(self, "_lde_natural", None) is None:
            self._lde_natural = gl.from_u64_np(self._lde_u64)
        return self._lde_natural

    @property
    def cap(self):
        """Cap in transcript form: (m, 4) GL digests, or Fr ints (bn128)."""
        if self.hasher in ("bn128", "fr"):
            from ..hash.poseidon_bn128 import fr_limbs_to_int
            return [fr_limbs_to_int(row) for row in self.cap_u64]
        return self.cap_u64

    def merkle_proof(self, leaf_index: int):
        """Returns (leaf_values (num_polys,), siblings): siblings are a
        (depth, 4) GL digest array, or a list of Fr ints (bn128)."""
        sibs = []
        idx = leaf_index
        for level in self.levels_u64[:-1]:
            sibs.append(level[idx ^ 1])
            idx >>= 1
        if self.hasher in ("bn128", "fr"):
            from ..hash.poseidon_bn128 import fr_limbs_to_int
            return self.leaves_u64[leaf_index], \
                [fr_limbs_to_int(s) for s in sibs]
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
                 cap_height: int, hasher: str = "gl"):
        v = np.asarray(values_bitrev_ext, dtype=np.uint64)
        m = v.shape[0]
        arity = 1 << arity_bits
        num_leaves = m // arity
        # leaf i = [v[i*arity+0].0, v[i*arity+0].1, v[i*arity+1].0, ...]
        leaves = v.reshape(num_leaves, arity * 2)
        self.leaves_u64 = leaves
        self.hasher = hasher
        if hasher in ("bn128", "fr"):
            from ..hash import poseidon_bn128 as pb
            self.levels_u64 = pb.merkle_levels_bn128(
                np.ascontiguousarray(leaves), cap_height)
        elif _use_host_path():
            self.levels_u64 = host_merkle_levels(
                np.ascontiguousarray(leaves), cap_height)
        else:
            dev_leaves = gl.from_u64_np(leaves)
            levels, cap = poseidon_tpu.merkle_tree_levels(dev_leaves, cap_height)
            self.levels_u64 = [gl.to_u64_np(lv) for lv in levels]
        self.cap_u64 = self.levels_u64[-1]

    @property
    def cap(self):
        if self.hasher in ("bn128", "fr"):
            from ..hash.poseidon_bn128 import fr_limbs_to_int
            return [fr_limbs_to_int(row) for row in self.cap_u64]
        return self.cap_u64

    def merkle_proof(self, leaf_index: int):
        sibs = []
        idx = leaf_index
        for level in self.levels_u64[:-1]:
            sibs.append(level[idx ^ 1])
            idx >>= 1
        if self.hasher in ("bn128", "fr"):
            from ..hash.poseidon_bn128 import fr_limbs_to_int
            return self.leaves_u64[leaf_index], \
                [fr_limbs_to_int(s) for s in sibs]
        return self.leaves_u64[leaf_index], np.array(sibs, dtype=np.uint64)
