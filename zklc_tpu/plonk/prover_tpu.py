"""Device-resident TPU prover: the proof's bulk data lives in HBM end-to-end.

Motivation (measured on the tunneled v5e): host->device ~1 GB/s,
device->host ~35 MB/s with multi-hundred-ms dispatch latency.  The
host-orchestrated prover (prover.py) pulls LDE matrices to host —
prohibitive here.  This prover keeps LDEs, Merkle levels and FRI state on
device; only transcript-sized data (caps, openings, query leaves, the
final polynomial) crosses back.

Bit-exact with prover.py — same transcript, same proof — cross-checked by
tests/test_prover_tpu.py.  Value-space reformulations used to avoid
coefficient pulls:

* Openings at z: barycentric from LDE values over the coset
  (x_i = s w^i, x_i^M = s^M):
      f(z) = (z^M - s^M) / (M s^M) * sum_i v_i x_i / (z - x_i).
* FRI reduced polynomial per batch:
      Q(x_i) = (R(x_i) - R(z)) / (x_i - z)
  — identical to coefficient-space synthetic division as polynomials.
* FRI folding in value space: the degree<A interpolant of f on a fiber
  coset {c w^k : k<A} is sum_r g_r(y) X^r (where f(X) = sum_r X^r g_r(X^A),
  y = c^A), so evaluating it at beta equals plonky2's coefficient fold
  a'_q = sum_r beta^r a_{Aq+r}.  Matches the verifier's coset
  interpolation (gnark-plonky2-verifier/fri/fri.go:314).

Conventions: base device arrays are GL = (hi, lo) uint32 pairs; extension
arrays are GL2 = (re: GL, im: GL) — gl2x32's native formats.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gl64
from ..field import gl2x32 as gl
from ..hash import poseidon as pos
from ..ops import ntt as ntt_ops
from ..ops import poseidon_tpu
from . import poly_host as ph
from .builder import ProverData
from .commitment import bit_rev_perm
from .config import FriParams
from .proof import (Proof, OpeningSet, FriProof, FriQueryRound, FriQueryStep,
                    FriInitialTreeProof)
from .witness import generate_witness
from . import prover as host_prover
from . import fri as fri_host

CHUNK_POLYS = 32         # NTT poly-batch chunk (bounds peak HBM)
QUOTIENT_CHUNKS = 8      # coset split for the vanishing evaluation
LOOKUP_READY = True      # this prover handles LogUp blocks end-to-end


# ---------------------------------------------------------------------------
# device building blocks
# ---------------------------------------------------------------------------

def _ntt_chunked(vals, log_n: int, inverse: bool):
    P = vals[0].shape[0]
    if P <= CHUNK_POLYS:
        return ntt_ops._ntt_core(vals, log_n, inverse)
    C = -(-P // CHUNK_POLYS)
    pad = C * CHUNK_POLYS - P
    hi = jnp.pad(vals[0], ((0, pad), (0, 0)))
    lo = jnp.pad(vals[1], ((0, pad), (0, 0)))
    hi = hi.reshape(C, CHUNK_POLYS, hi.shape[-1])
    lo = lo.reshape(C, CHUNK_POLYS, lo.shape[-1])
    out_hi, out_lo = jax.lax.map(
        lambda v: ntt_ops._ntt_core(v, log_n, inverse), (hi, lo))
    n = 1 << log_n
    return (out_hi.reshape(C * CHUNK_POLYS, n)[:P],
            out_lo.reshape(C * CHUNK_POLYS, n)[:P])


def _merkle_from_lde(lde, rev, cap_height: int):
    """Merkle levels from natural-order LDE (P, M), leaves in bit-reversed
    order, without materializing the (M, P) leaf matrix."""
    P, M = lde[0].shape
    if P <= 4:
        padh = jnp.zeros((4 - P, M), jnp.uint32)
        dig = (jnp.concatenate([lde[0], padh], 0).T[rev],
               jnp.concatenate([lde[1], padh], 0).T[rev])
    else:
        st = (jnp.zeros((M, 12), jnp.uint32), jnp.zeros((M, 12), jnp.uint32))
        for start in range(0, P, 8):
            c = min(8, P - start)
            chi = jnp.take(lde[0][start:start + c], rev, axis=-1).T
            clo = jnp.take(lde[1][start:start + c], rev, axis=-1).T
            st = (jnp.concatenate([chi, st[0][:, c:]], axis=-1),
                  jnp.concatenate([clo, st[1][:, c:]], axis=-1))
            st = poseidon_tpu.permute(st)
        dig = (st[0][:, :4], st[1][:, :4])
    levels = [dig]
    cur = dig
    while cur[0].shape[0] > (1 << cap_height):
        left = (cur[0][0::2], cur[1][0::2])
        right = (cur[0][1::2], cur[1][1::2])
        cur = poseidon_tpu.two_to_one_batch(left, right)
        levels.append(cur)
    return levels


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def _commit_kernel(vals, log_n: int, rate_bits: int, cap_height: int,
                   values_are_coeffs: bool):
    P, n = vals[0].shape
    if values_are_coeffs:
        coeffs = vals
    else:
        # _ntt_core(inverse=True) already applies the 1/n scaling
        coeffs = _ntt_chunked(vals, log_n, inverse=True)
    M = n << rate_bits
    chi = jnp.concatenate([coeffs[0], jnp.zeros((P, M - n), jnp.uint32)], -1)
    clo = jnp.concatenate([coeffs[1], jnp.zeros((P, M - n), jnp.uint32)], -1)
    cp = ntt_ops._coset_powers(log_n + rate_bits,
                               gl64.MULTIPLICATIVE_GROUP_GENERATOR)
    scaled = gl.mul((chi, clo), cp)          # numpy constants; see ntt.py NB
    lde = _ntt_chunked(scaled, log_n + rate_bits, inverse=False)
    rev = bit_rev_perm(log_n + rate_bits)
    levels = _merkle_from_lde(lde, rev, cap_height)
    return lde, levels


def put_wires_async(wires_t_u64: np.ndarray):
    """Start the host->device transfer of a (P, n) u64 wire matrix and
    return a thunk producing the device (hi, lo) planes.

    Two tricks for the slow tunnel link: the put is ASYNC (overlaps the
    host-side zs/lookup column computation), and hi-plane columns that are
    entirely zero (most wires hold lane pieces / bits / u32 limbs < 2^32)
    are skipped and re-scattered on device."""
    hl = gl.from_u64_np(wires_t_u64)
    nz = np.flatnonzero(hl[0].any(axis=1))
    P, n = hl[0].shape
    hi_sub = jax.device_put(np.ascontiguousarray(hl[0][nz]))
    lo_dev = jax.device_put(hl[1])
    nz_dev = jnp.asarray(nz)

    def get():
        hi_full = jnp.zeros((P, n), jnp.uint32).at[nz_dev].set(hi_sub)
        return (hi_full, lo_dev)
    return get


class DeviceCommitment:
    """Device-resident PolynomialBatch: lde + Merkle levels stay in HBM.

    With ``mesh`` set, the LDE + Merkle build runs through shard_map over
    the device mesh (parallel/sharded.sharded_commit) — same outputs,
    distributed compute."""

    def __init__(self, values_u64: np.ndarray, rate_bits: int,
                 cap_height: int, values_are_coeffs: bool = False,
                 dev_values=None, mesh=None):
        if dev_values is not None:
            vals = dev_values
        else:
            values_u64 = np.asarray(values_u64, dtype=np.uint64)
            vals = gl.from_u64_np(values_u64)
        self.num_polys, n = vals[0].shape
        self.log_n = (n - 1).bit_length()
        self.rate_bits = rate_bits
        self.cap_height = cap_height
        if mesh is not None:
            from ..parallel import sharded
            n_dev = mesh.shape[mesh.axis_names[0]]
            fn = sharded.sharded_commit(mesh, self.num_polys, self.log_n,
                                        rate_bits, cap_height,
                                        values_are_coeffs)
            self.lde, self.levels = fn(sharded.pad_poly_batch(vals, n_dev))
        else:
            self.lde, self.levels = _commit_kernel(
                vals, self.log_n, rate_bits, cap_height, values_are_coeffs)
        self.cap_u64 = gl.to_u64_np(self.levels[-1])

    @property
    def lde_bits(self):
        return self.log_n + self.rate_bits


# ---------------------------------------------------------------------------
# ext helpers (GL2 convention)
# ---------------------------------------------------------------------------

def _ext_inv_dev(a):
    """(a0 + a1 X)^-1 = (a0 - a1 X) / (a0^2 - 7 a1^2), Fermat base inverse."""
    a0, a1 = a
    w7 = gl.full((), gl64.EXT_W)
    norm = gl.sub(gl.square(a0), gl.mul(w7, gl.square(a1)))
    ninv = gl.inv(norm)
    return (gl.mul(a0, ninv), gl.mul(gl.neg(a1), ninv))


def _bcast_ext(e, shape):
    """Broadcast a GL2 scalar to `shape`."""
    return ((jnp.broadcast_to(e[0][0], shape), jnp.broadcast_to(e[0][1], shape)),
            (jnp.broadcast_to(e[1][0], shape), jnp.broadcast_to(e[1][1], shape)))


def _tree_sum_axis(x, axis):
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
    return (jnp.squeeze(hi, axis), jnp.squeeze(lo, axis))


def _ext_tree_sum(x, axis):
    return (_tree_sum_axis(x[0], axis), _tree_sum_axis(x[1], axis))


# ---------------------------------------------------------------------------
# openings + FRI reduced polynomial (value space)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _domain_host(lde_bits: int, shift: int) -> np.ndarray:
    """Host domain points x_i = shift * w^i, natural order (u64)."""
    w = gl64.primitive_root_of_unity(lde_bits)
    x = ph.base_powers(w, 1 << lde_bits)
    return gl64.mul(x, np.uint64(shift % gl64.P))


def _host_ext_inv(a: np.ndarray) -> np.ndarray:
    """Batch extension inverse on host (native Montgomery batch inversion):
    (a0 + a1 X)^-1 = (a0 - a1 X)/(a0^2 - 7 a1^2).  a: (..., 2) u64."""
    a0, a1 = a[..., 0], a[..., 1]
    norm = gl64.sub(gl64.square(a0), gl64.mul(np.uint64(gl64.EXT_W),
                                              gl64.square(a1)))
    ninv = ph.batch_inverse(norm)
    return np.stack([gl64.mul(a0, ninv), gl64.mul(gl64.neg(a1), ninv)],
                    axis=-1)


def _host_invden(x_np: np.ndarray, z_ext: np.ndarray) -> np.ndarray:
    """1/(z - x_i) ext (M, 2), host."""
    z = np.asarray(z_ext, dtype=np.uint64)
    d = np.stack([gl64.sub(z[0], x_np),
                  np.broadcast_to(z[1], x_np.shape).copy()], axis=-1)
    return _host_ext_inv(d)


def _ext_arr_to_dev(a: np.ndarray):
    """host (..., 2) u64 -> GL2 device arrays."""
    a = np.asarray(a, dtype=np.uint64)
    return (gl.from_u64_np(np.ascontiguousarray(a[..., 0])),
            gl.from_u64_np(np.ascontiguousarray(a[..., 1])))


@jax.jit
def _open_batch_kernel(lde, xinv, scale_dev):
    """Barycentric f(z) for every poly: lde (P, M) base, xinv GL2 (M,),
    scale GL2 scalar.  Returns GL2 (P,)."""
    re = _tree_sum_axis(gl.mul(lde, (xinv[0][0][None, :],
                                     xinv[0][1][None, :])), 1)
    im = _tree_sum_axis(gl.mul(lde, (xinv[1][0][None, :],
                                     xinv[1][1][None, :])), 1)
    P = lde[0].shape[0]
    return gl.ext_mul((re, im), _bcast_ext(scale_dev, (P,)))


@jax.jit
def _alpha_combine_kernel(lde, apows):
    """sum_j alpha^j v_j[i]: lde (P, M) base, apows GL2 (P,) -> GL2 (M,)."""
    re = _tree_sum_axis(gl.mul(lde, (apows[0][0][:, None],
                                     apows[0][1][:, None])), 0)
    im = _tree_sum_axis(gl.mul(lde, (apows[1][0][:, None],
                                     apows[1][1][:, None])), 0)
    return (re, im)


@jax.jit
def _reduced_from_combined(combined, rz_dev, invden):
    """Q[i] = (combined[i] - R(z)) * invden[i]  (GL2 (M,))."""
    M = combined[0][0].shape[0]
    rz = _bcast_ext(rz_dev, (M,))
    diff = (gl.sub(combined[0], rz[0]), gl.sub(combined[1], rz[1]))
    return gl.ext_mul(diff, invden)


@jax.jit
def _accumulate_scaled(acc, q, shift_dev):
    """acc * alpha_shift + q (GL2 (M,))."""
    M = acc[0][0].shape[0]
    prod = gl.ext_mul(acc, _bcast_ext(shift_dev, (M,)))
    return (gl.add(prod[0], q[0]), gl.add(prod[1], q[1]))


# ---------------------------------------------------------------------------
# FRI commit phase (value space)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(1, 2))
def _fri_tree_kernel(cur, arity_bits: int, cap_height: int):
    """Commit tree for current values GL2 (M,): leaves are bit-reversed
    arity-cosets, flattened [re, im] pairs (cf. ExtPolynomialBatch)."""
    M = cur[0][0].shape[0]
    rev = bit_rev_perm((M - 1).bit_length())
    arity = 1 << arity_bits
    m = M // arity

    def plane(p):
        re, im = cur[0][p][rev], cur[1][p][rev]
        return jnp.stack([re, im], -1).reshape(m, arity * 2)

    leaves = (plane(0), plane(1))
    dig = poseidon_tpu.hash_or_noop_batch(leaves)
    levels = [dig]
    cur_l = dig
    while cur_l[0].shape[0] > (1 << cap_height):
        left = (cur_l[0][0::2], cur_l[1][0::2])
        right = (cur_l[0][1::2], cur_l[1][1::2])
        cur_l = poseidon_tpu.two_to_one_batch(left, right)
        levels.append(cur_l)
    return leaves, levels


@functools.partial(jax.jit, static_argnums=(3,))
def _fri_fold_kernel(cur, xinv, scale, arity_bits: int):
    """Fold values by arity A: natural-order fiber j = {j + k*(M/A)}.

    P_j(beta) = scale_j * sum_k v_kj x_kj / (beta - x_kj), where
    scale_j = (beta^A - y_j)/(A y_j), y_j = x_j^A = next domain point.
    xinv (GL2 (M,)) and scale (GL2 (M/A,)) are host-precomputed (they need
    field inversions, which run through the native batch inverter).
    Returns next values GL2 (M/A,)."""
    M = cur[0][0].shape[0]
    A = 1 << arity_bits
    m = M // A
    term = gl.ext_mul(cur, xinv)                   # GL2 (M,)
    tsum = _ext_tree_sum(
        ((term[0][0].reshape(A, m), term[0][1].reshape(A, m)),
         (term[1][0].reshape(A, m), term[1][1].reshape(A, m))), 0)
    return gl.ext_mul(tsum, scale)


# ---------------------------------------------------------------------------
# query extraction
# ---------------------------------------------------------------------------

def _u64(hi, lo):
    return (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | \
        np.asarray(lo).astype(np.uint64)


def _gather_tree_proofs_dev(levels, indices):
    """Sibling paths as ONE device (k, depth, 4) pair (no host pull)."""
    his, los = [], []
    idx = np.asarray(indices, dtype=np.int64)
    for level in levels[:-1]:
        sel = jnp.asarray(idx ^ 1)
        his.append(jnp.take(level[0], sel, axis=0))
        los.append(jnp.take(level[1], sel, axis=0))
        idx >>= 1
    if not his:
        return (jnp.zeros((len(indices), 0, 4), jnp.uint32),
                jnp.zeros((len(indices), 0, 4), jnp.uint32))
    return (jnp.stack(his, axis=1), jnp.stack(los, axis=1))


def _gather_lde_columns_dev(lde, cols):
    """Device (k, P) pair of LDE values at natural positions `cols`."""
    sel = jnp.asarray(np.asarray(cols, dtype=np.int64))
    return (jnp.take(lde[0], sel, axis=-1).T,
            jnp.take(lde[1], sel, axis=-1).T)


def _pull_many(pairs) -> list:
    """Fetch many device (hi, lo) pairs in ONE device->host transfer.

    The tunneled link has multi-hundred-ms per-transfer latency, so ~100
    per-level sibling pulls dominate FRI query extraction; concatenating
    everything into one flat buffer makes it a single round trip."""
    flat_hi = jnp.concatenate([p[0].reshape(-1) for p in pairs])
    flat_lo = jnp.concatenate([p[1].reshape(-1) for p in pairs])
    big = _u64(flat_hi, flat_lo)
    out, off = [], 0
    for p in pairs:
        shape = tuple(p[0].shape)
        sz = int(np.prod(shape)) if shape else 1
        out.append(big[off: off + sz].reshape(shape))
        off += sz
    return out


# ---------------------------------------------------------------------------
# the prover
# ---------------------------------------------------------------------------

# HBM budget for cached constants+sigmas commitments.  Every distinct
# circuit proved in a process used to pin its cs LDE + Merkle levels in HBM
# forever (data._tpu_cs) — the multi-circuit BFT pipeline exhausted device
# memory after a handful of header shapes.  An LRU with a byte budget keeps
# the hot circuit (the reused EdDSA leaf) resident and recomputes evicted
# ones on demand (one commit-kernel run, cheap next to a prove).
_CS_CACHE_BUDGET = int(__import__("os").environ.get(
    "ZKLC_CS_CACHE_BYTES", 6 * 1024**3))
_cs_lru: "dict[int, tuple]" = {}      # id(data) -> (weakref(data), nbytes)


def _cs_nbytes(comm: "DeviceCommitment") -> int:
    n = 2 * comm.lde[0].size * 4
    for lv in comm.levels:
        n += 2 * lv[0].size * 4
    return n


def _cs_lru_touch(data, comm):
    import weakref
    key = id(data)
    _cs_lru.pop(key, None)
    # GC callback drops the entry the moment its ProverData is collected:
    # dead entries neither count toward the byte budget (no premature
    # eviction of live commitments) nor linger for id() reuse to alias a
    # new circuit onto (ADVICE r3).
    _cs_lru[key] = (weakref.ref(data, lambda _r, _k=key:
                                _cs_lru.pop(_k, None)),
                    _cs_nbytes(comm))
    total = sum(nb for _, nb in _cs_lru.values())
    for k in list(_cs_lru):
        if total <= _CS_CACHE_BUDGET or k == key:
            continue
        entry = _cs_lru.pop(k, None)
        if entry is None:
            continue
        ref, nb = entry
        victim = ref()
        if victim is not None:
            victim._tpu_cs = None
        total -= nb


def ensure_cs_device(data: ProverData, mesh=None):
    """Device constants+sigmas commitment (LRU-cached); fills circuit digest
    / verifier data exactly like prover.ensure_constants_sigmas_commitment."""
    if getattr(data, "_tpu_cs", None) is not None:
        _cs_lru_touch(data, data._tpu_cs)
        return data._tpu_cs
    cfg = data.common.config
    mat = np.concatenate([data.constants_rows, data.sigmas_rows], axis=1).T
    comm = DeviceCommitment(np.ascontiguousarray(mat),
                            cfg.fri_config.rate_bits,
                            cfg.fri_config.cap_height, mesh=mesh)
    data._tpu_cs = comm
    _cs_lru_touch(data, comm)
    if data.circuit_digest is None:
        digest_input = np.concatenate(
            [comm.cap_u64.ravel(),
             np.array([data.common.degree_bits], dtype=np.uint64)])
        data.circuit_digest = pos.hash_no_pad(digest_input)
        from .builder import VerifierOnlyData
        data.verifier_only = VerifierOnlyData(
            constants_sigmas_cap=comm.cap_u64,
            circuit_digest=data.circuit_digest)
    return comm


def _ext_to_dev(e):
    """host ext (2,) uint64 -> GL2 scalar."""
    e = np.asarray(e, dtype=np.uint64)
    return (gl.from_u64_np(e[0]), gl.from_u64_np(e[1]))


def _ext_from_dev(a) -> np.ndarray:
    """GL2 (...,) -> host (..., 2) u64."""
    return np.stack([_u64(a[0][0], a[0][1]), _u64(a[1][0], a[1][1])], axis=-1)


def _bary_scale(z_ext: np.ndarray, lde_bits: int) -> np.ndarray:
    """(z^M - s^M) / (M * s^M) over the quadratic extension (host, tiny)."""
    M = 1 << lde_bits
    s = gl64.MULTIPLICATIVE_GROUP_GENERATOR
    sM = pow(s, M, gl64.P)
    zM = gl64.ext_pow_const(np.asarray(z_ext, dtype=np.uint64), M)
    num = gl64.ext_sub(zM, np.array([sM, 0], dtype=np.uint64))
    den_inv = pow((M % gl64.P) * sM % gl64.P, gl64.P - 2, gl64.P)
    return gl64.ext_scalar_mul(np.uint64(den_inv), num)


_quotient_fn_cache: dict = {}



def _structural_key(common):
    """Quotient kernels depend on the circuit's STRUCTURE (shapes, gate
    set, selector layout), not its constant values — key the traced-jit
    cache structurally so same-shape circuits (bucketed headers, per-block
    aggregations) never retrace (VERDICT round-1 weak #7)."""
    cfg = common.config
    lk = common.lookup
    return (common.degree_bits, cfg.num_wires, cfg.num_routed_wires,
            cfg.num_challenges, common.num_constants,
            common.num_partial_products, common.quotient_degree_factor,
            tuple(g.id() for g in common.gate_types),
            tuple(common.selector_indices),
            tuple(common.selector_groups),
            tuple(int(k) for k in common.k_is),
            None if lk is None else (lk.cfg.tables, lk.cfg.lanes,
                                     lk.cfg.max_group, lk.lane_cols,
                                     lk.s_col, lk.table_cols, lk.groups))


_quotient_parts_cache: dict = {}


def _quotient_parts(common):
    """Build (or fetch) the per-gate quotient kernel set for a circuit
    shape: (base_jit, gate_jits, finish_jit).

    ONE SMALL JIT KERNEL PER GATE TYPE plus a base kernel (permutation +
    lookup terms), alpha-weighted partial sums added on device.

    Rationale: the fused single-program evaluator (host_prover.
    make_vanishing_fn) XLA-compiles the constraint polynomials of EVERY
    gate type into one graph; for wide circuits with many gate types the
    TPU compile time explodes (>30 min for the ed25519 circuit).  Since the
    alpha-Horner combination is linear in the terms, each gate type's
    filtered contribution sum_k alpha^(base+k) * filt * c_k can be computed
    in its own (cacheable, fast-compiling) kernel and summed.

    Every kernel is pointwise in the domain except the base kernel's
    next-row access, which takes `next_perm=None` for the natural-order
    roll or a static permutation for the rev-sharded layout
    (parallel/sharded_prove.py) — the same cached kernels serve both
    prover paths."""
    import jax
    import jax.numpy as jnp
    from .algebra import DeviceBase, EvalVars
    from ..field import gl2x32 as gl

    cfg = common.config
    rate_bits = cfg.fri_config.rate_bits
    rate = 1 << rate_bits
    nc = cfg.num_challenges
    npp = common.num_partial_products
    routed = cfg.num_routed_wires
    q = common.quotient_degree_factor
    num_chunks = (routed + q - 1) // q
    num_sel = common.num_selectors
    nconst = common.num_constants
    lk = common.lookup
    n_perm_terms = nc + nc * num_chunks
    n_lookup_terms = lk.num_constraints(nc) if lk is not None else 0
    gate_term_base = n_perm_terms + n_lookup_terms
    n_perm_rows = nc * (1 + npp)

    key = _structural_key(common)
    if key not in _quotient_parts_cache:

        def row(pair, i):
            return (pair[0][i], pair[1][i])

        def alpha_pow(alg, alpha, e):
            acc = alg.one()
            base = alpha
            while e:
                if e & 1:
                    acc = alg.mul(acc, base)
                e >>= 1
                if e:
                    base = alg.mul(base, base)
            return acc

        def filt_of(alg, constants, gi):
            si = common.selector_indices[gi]
            start, end = common.selector_groups[si]
            s = constants[si]
            filt = alg.one()
            for k in range(start, end):
                if k == gi:
                    continue
                filt = alg.mul(filt, alg.sub(alg.const(k), s))
            if num_sel > 1:
                from . import gates as G
                filt = alg.mul(filt, alg.sub(alg.const(G.UNUSED_SELECTOR), s))
            return filt

        def make_gate_fn(gi, gate):
            def fn(wires, cs, pi_hash_d, alphas_d):
                alg = DeviceBase()
                constants = [row(cs, i) for i in range(nconst)]
                wires_rows = [row(wires, i)
                              for i in range(common.num_wire_polys)]
                vars_ = EvalVars(
                    local_constants=constants[num_sel:],
                    local_wires=wires_rows,
                    public_inputs_hash=[row(pi_hash_d, i) for i in range(4)],
                )
                from . import gates as G
                if isinstance(gate, G.PoseidonGate):
                    from ..ops.poseidon_gate_device import \
                        eval_poseidon_gate_device
                    cp = eval_poseidon_gate_device(gate, wires)
                    constraints = [(cp[0][i], cp[1][i])
                                   for i in range(gate.num_constraints())]
                else:
                    constraints = gate.eval_unfiltered(alg, vars_)
                filt = filt_of(alg, constants, gi)
                outs_hi, outs_lo = [], []
                for ci in range(nc):
                    alpha = row(alphas_d, ci)
                    acc = alg.zero()
                    for c in reversed(constraints):
                        acc = alg.add(alg.mul(acc, alpha), c)
                    acc = alg.mul(acc, filt)
                    acc = alg.mul(acc, alpha_pow(alg, alpha, gate_term_base))
                    outs_hi.append(acc[0])
                    outs_lo.append(acc[1])
                return (jnp.stack(outs_hi), jnp.stack(outs_lo))
            return fn

        def base_fn(wires, cs, zspp, betas_d, gammas_d, alphas_d, deltas_d,
                    x, zh_inv, l0, next_perm=None):
            alg = DeviceBase()
            if next_perm is None:
                # natural order: next trace row = roll by the LDE rate
                zspp_next = (jnp.roll(zspp[0], -rate, -1),
                             jnp.roll(zspp[1], -rate, -1))
            else:
                # rev-layout sharded path: next row as a static permutation
                # (chip-local whenever n_dev | rate; see sharded_prove.py)
                zspp_next = (zspp[0][:, next_perm], zspp[1][:, next_perm])
            constants = [row(cs, i) for i in range(nconst)]
            sigmas = [row(cs, nconst + i) for i in range(routed)]
            wires_rows = [row(wires, i) for i in range(common.num_wire_polys)]
            zs = [row(zspp, i) for i in range(nc)]
            pps = [row(zspp, nc + i) for i in range(nc * npp)]
            zs_next = [row(zspp_next, i) for i in range(nc)]
            terms = []
            z1_terms, pp_terms = [], []
            for ci in range(nc):
                beta = row(betas_d, ci)
                gamma = row(gammas_d, ci)
                z1_terms.append(alg.mul(l0, alg.sub(zs[ci], alg.one())))
                accs = [zs[ci]] + [pps[ci * npp + i] for i in range(npp)] \
                    + [zs_next[ci]]
                for m in range(num_chunks):
                    nume = alg.one()
                    deno = alg.one()
                    for j in range(m * q, min((m + 1) * q, routed)):
                        sid = alg.mul(alg.const(int(common.k_is[j])), x)
                        wv_g = alg.add(wires_rows[j], gamma)
                        nume = alg.mul(nume,
                                       alg.add(alg.mul(beta, sid), wv_g))
                        deno = alg.mul(deno, alg.add(
                            alg.mul(beta, sigmas[j]), wv_g))
                    pp_terms.append(alg.sub(alg.mul(accs[m], nume),
                                            alg.mul(accs[m + 1], deno)))
            lookup_terms = []
            if lk is not None:
                from . import lookup as lk_mod
                block = lk.block_len
                s_val = constants[lk.s_col]
                table_vals = [constants[c] for c in lk.table_cols]
                m_vals = [wires_rows[cfg.num_wires + ti]
                          for ti in range(lk.num_tables)]
                for ci in range(nc):
                    blk = [row(zspp, n_perm_rows + ci * block + j)
                           for j in range(block)]
                    z_next = row(zspp_next, n_perm_rows + ci * block)
                    lookup_terms.extend(lk_mod.lookup_terms_one_round(
                        alg, lk, wires_rows, s_val, table_vals, m_vals,
                        blk, z_next, row(deltas_d, ci), l0))
            all_terms = z1_terms + pp_terms + lookup_terms
            outs_hi, outs_lo = [], []
            for ci in range(nc):
                alpha = row(alphas_d, ci)
                acc = alg.zero()
                for t in reversed(all_terms):
                    acc = alg.add(alg.mul(acc, alpha), t)
                outs_hi.append(acc[0])
                outs_lo.append(acc[1])
            return (jnp.stack(outs_hi), jnp.stack(outs_lo))

        def finish_fn(parts_hi, parts_lo, zh_inv):
            alg = DeviceBase()
            acc = (parts_hi[0], parts_lo[0])
            for i in range(1, parts_hi.shape[0]):
                acc = alg.add(acc, (parts_hi[i], parts_lo[i]))
            acc = alg.mul(acc, zh_inv)
            acc = gl.canonicalize(acc)
            return acc

        # disk-backed AOT trace cache (utils/aot.py): a cold process
        # deserializes these kernels instead of re-tracing the per-gate
        # evaluators (minutes of pure Python for the EdDSA leaf shape)
        import hashlib
        from ..utils.aot import aot_jit
        from . import gates as G

        def wrap_gate(gi, g):
            fn = make_gate_fn(gi, g)
            if isinstance(g, G.PoseidonGate):
                # the rolled fori_loop/dynamic_update_slice kernel does
                # NOT survive jax.export faithfully — ex.call computes
                # wrong values even in-process (isolated by the r5
                # per-kernel equivalence hunt); always trace it live
                return jax.jit(fn)
            return aot_jit(fn, f"qgate|{skey}|{gi}|{g.id()}")

        skey = hashlib.sha256(repr(key).encode()).hexdigest()[:16]
        _quotient_parts_cache[key] = (
            aot_jit(base_fn, f"qbase|{skey}"),
            [wrap_gate(gi, g) for gi, g in enumerate(common.gate_types)],
            aot_jit(finish_fn, f"qfinish|{skey}"),
        )
    return _quotient_parts_cache[key]


def _quotient_split(data, wires_comm, cs_comm, zs_pp_comm, pi_hash,
                    betas, gammas, alphas, deltas=()):
    """Natural-order quotient evaluation via the split kernel set."""
    common = data.common
    rate_bits = common.config.fri_config.rate_bits
    base_jit, gate_jits, finish_jit = _quotient_parts(common)
    x_np, zh_inv_np, l0_np = host_prover._coset_domain(
        common.degree_bits, rate_bits)
    to_dev = gl.from_u64_np
    pi_hash_d = to_dev(np.asarray(pi_hash, dtype=np.uint64))
    betas_d = to_dev(np.asarray(betas, dtype=np.uint64))
    gammas_d = to_dev(np.asarray(gammas, dtype=np.uint64))
    alphas_d = to_dev(np.asarray(alphas, dtype=np.uint64))
    deltas_d = to_dev(np.asarray(list(deltas) or [0], dtype=np.uint64))
    x_d, zh_d, l0_d = to_dev(x_np), to_dev(zh_inv_np), to_dev(l0_np)
    parts = [base_jit(wires_comm.lde, cs_comm.lde, zs_pp_comm.lde,
                      betas_d, gammas_d, alphas_d, deltas_d,
                      x_d, zh_d, l0_d)]
    for gfn in gate_jits:
        parts.append(gfn(wires_comm.lde, cs_comm.lde, pi_hash_d, alphas_d))
    parts_hi = jnp.stack([p[0] for p in parts])
    parts_lo = jnp.stack([p[1] for p in parts])
    return finish_jit(parts_hi, parts_lo, zh_d)


def _quotient_chunked(data, wires_comm, cs_comm, zs_pp_comm, pi_hash,
                      betas, gammas, alphas, deltas=()):
    """Vanishing evaluation over the coset in QUOTIENT_CHUNKS slices via
    lax.map — one dispatch, bounded temporaries."""
    common = data.common
    rate_bits = common.config.fri_config.rate_bits
    rate = 1 << rate_bits
    M = common.degree << rate_bits
    key = _structural_key(common)
    if key not in _quotient_fn_cache:
        base_fn = host_prover.make_vanishing_fn(common)
        csz = M // QUOTIENT_CHUNKS
        nc = common.config.num_challenges

        def full(wires, cs, zspp, pihash, betas_d, gammas_d, alphas_d,
                 deltas_d, x, zh_inv, l0):
            zspp_next = (jnp.roll(zspp[0], -rate, -1),
                         jnp.roll(zspp[1], -rate, -1))

            def body(ci):
                def sl(pair):
                    return (jax.lax.dynamic_slice_in_dim(
                                pair[0], ci * csz, csz, axis=-1),
                            jax.lax.dynamic_slice_in_dim(
                                pair[1], ci * csz, csz, axis=-1))
                return base_fn(sl(wires), sl(cs), sl(zspp), sl(zspp_next),
                               pihash, betas_d, gammas_d, alphas_d, deltas_d,
                               sl(x), sl(zh_inv), sl(l0))

            hi, lo = jax.lax.map(body, jnp.arange(QUOTIENT_CHUNKS))
            hi = jnp.transpose(hi, (1, 0, 2)).reshape(nc, M)
            lo = jnp.transpose(lo, (1, 0, 2)).reshape(nc, M)
            return hi, lo

        _quotient_fn_cache[key] = jax.jit(full)
    fn = _quotient_fn_cache[key]

    x_np, zh_inv_np, l0_np = host_prover._coset_domain(
        common.degree_bits, rate_bits)
    to_dev = gl.from_u64_np
    return fn(wires_comm.lde, cs_comm.lde, zs_pp_comm.lde,
              to_dev(np.asarray(pi_hash, dtype=np.uint64)),
              to_dev(np.asarray(betas, dtype=np.uint64)),
              to_dev(np.asarray(gammas, dtype=np.uint64)),
              to_dev(np.asarray(alphas, dtype=np.uint64)),
              to_dev(np.asarray(list(deltas) or [0], dtype=np.uint64)),
              to_dev(x_np), to_dev(zh_inv_np), to_dev(l0_np))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _quotient_coeff_kernel(qvals, lde_bits: int, rate_bits: int, n: int):
    """Q values (nc, M) -> chunked coeff rows (nc * 2^rate, n)."""
    coeffs = _ntt_chunked(qvals, lde_bits, inverse=True)
    inv_shift = pow(gl64.MULTIPLICATIVE_GROUP_GENERATOR, gl64.P - 2, gl64.P)
    cp = ntt_ops._coset_powers(lde_bits, inv_shift)
    coeffs = gl.mul(coeffs, cp)
    nc = coeffs[0].shape[0]
    rate = 1 << rate_bits
    return (coeffs[0].reshape(nc * rate, n), coeffs[1].reshape(nc * rate, n))


def _phase_timer():
    """ZKLC_TIMING=1 prints device-synchronized phase durations."""
    import os as _os
    import time as _time
    if _os.environ.get("ZKLC_TIMING", "0") != "1":
        return lambda *_a: None
    state = {"t": _time.perf_counter()}

    def mark(name, *pending):
        for x in pending:
            jax.block_until_ready(x)
        now = _time.perf_counter()
        print("  [prove] %-18s %6.2fs" % (name, now - state["t"]),
              flush=True)
        state["t"] = now
    return mark


def prove(data: ProverData, inputs: dict, mesh=None) -> Proof:
    common = data.common
    cfg = common.config
    fp: FriParams = common.fri_params
    fc = cfg.fri_config
    n = common.degree
    lde_bits = fp.lde_bits
    mark = _phase_timer()

    cs_comm = ensure_cs_device(data, mesh=mesh)

    # 1. witness + wires commitment
    wr = generate_witness(data, inputs)
    mark("witness")
    wires = wr.wires
    public_inputs = np.array([wr.get(t) for t in data.public_input_targets],
                             dtype=np.uint64)
    pi_hash = pos.hash_no_pad(public_inputs) if len(public_inputs) else \
        np.zeros(4, dtype=np.uint64)
    if common.lookup is not None:
        from . import lookup as lk_mod
        m_cols = lk_mod.compute_multiplicities(common.lookup, wires,
                                               data.constants_rows)
        wires = np.concatenate([wires, m_cols], axis=1)
    if mesh is not None:
        wires_comm = DeviceCommitment(np.ascontiguousarray(wires.T),
                                      fc.rate_bits, fc.cap_height, mesh=mesh)
    else:
        wires_dev = put_wires_async(np.ascontiguousarray(wires.T))
        wires_comm = DeviceCommitment(None, fc.rate_bits, fc.cap_height,
                                      dev_values=wires_dev())
    mark("wires_comm", wires_comm.lde)

    # 2. transcript
    ch = pos.Challenger()
    ch.observe_hash(data.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(wires_comm.cap_u64)
    betas = ch.get_n_challenges(cfg.num_challenges)
    gammas = ch.get_n_challenges(cfg.num_challenges)
    deltas = ch.get_n_challenges(cfg.num_challenges) \
        if common.lookup is not None else []

    # 3. Z + partial products (+ lookup columns) (host on the witness matrix)
    zs_pp = host_prover.compute_zs_partial_products(
        common, wires, data.sigmas_rows, betas, gammas)
    if common.lookup is not None:
        lk_cols = lk_mod.compute_lookup_columns(
            common.lookup, wires, data.constants_rows, deltas,
            cfg.num_wires)
        zs_pp = np.concatenate([zs_pp, lk_cols], axis=0)
    mark("zs_pp host")
    zs_pp_comm = DeviceCommitment(zs_pp, fc.rate_bits, fc.cap_height,
                                  mesh=mesh)
    ch.observe_cap(zs_pp_comm.cap_u64)
    alphas = ch.get_n_challenges(cfg.num_challenges)
    mark("zs_pp_comm", zs_pp_comm.lde)

    # 4. quotient — device-chunked on TPU; on the CPU backend XLA cannot
    # compile the fused gate-evaluation graph (known XLA:CPU limitation), so
    # the identical values come from the host evaluator instead.
    import os as _os
    if jax.default_backend() == "tpu":
        qfn = _quotient_chunked \
            if _os.environ.get("ZKLC_QUOTIENT_SPLIT", "1") == "0" \
            else _quotient_split
        qvals = qfn(data, wires_comm, cs_comm, zs_pp_comm,
                    pi_hash, betas, gammas, alphas, deltas)
    else:
        qhost = host_prover.eval_vanishing_on_coset(
            data, gl.to_u64_np(wires_comm.lde), gl.to_u64_np(cs_comm.lde),
            gl.to_u64_np(zs_pp_comm.lde), pi_hash, betas, gammas, alphas,
            deltas)
        qvals = gl.from_u64_np(qhost)
    chunks = _quotient_coeff_kernel(qvals, lde_bits, fc.rate_bits, n)
    quotient_comm = DeviceCommitment(None, fc.rate_bits, fc.cap_height,
                                     values_are_coeffs=True,
                                     dev_values=chunks, mesh=mesh)
    ch.observe_cap(quotient_comm.cap_u64)
    mark("quotient+commit", quotient_comm.lde)
    zeta = np.array(ch.get_extension_challenge(), dtype=np.uint64)

    # 5. openings (device barycentric; inversion-bearing vectors from host)
    g = gl64.primitive_root_of_unity(common.degree_bits)
    zeta_next = gl64.ext_mul(np.array([g, 0], dtype=np.uint64), zeta)
    x_np = _domain_host(lde_bits, gl64.MULTIPLICATIVE_GROUP_GENERATOR)
    invden0_np = _host_invden(x_np, zeta)
    invden1_np = _host_invden(x_np, zeta_next)

    def xinv(inv_np):
        return np.stack([gl64.mul(x_np, inv_np[..., 0]),
                         gl64.mul(x_np, inv_np[..., 1])], axis=-1)

    # 1/(zeta - x) for barycentric openings; its negation 1/(x - zeta) for
    # the FRI reduced polynomial Q(x) = (R(x) - R(z))/(x - z).
    invden0_neg = _ext_arr_to_dev(gl64.neg(invden0_np))
    invden1_neg = _ext_arr_to_dev(gl64.neg(invden1_np))
    xinv0 = _ext_arr_to_dev(xinv(invden0_np))
    xinv1 = _ext_arr_to_dev(xinv(invden1_np))
    scale0 = _ext_to_dev(_bary_scale(zeta, lde_bits))
    scale1 = _ext_to_dev(_bary_scale(zeta_next, lde_bits))

    cs_at = _ext_from_dev(_open_batch_kernel(cs_comm.lde, xinv0, scale0))
    wires_at = _ext_from_dev(_open_batch_kernel(wires_comm.lde, xinv0, scale0))
    zspp_at = _ext_from_dev(_open_batch_kernel(zs_pp_comm.lde, xinv0, scale0))
    quot_at = _ext_from_dev(
        _open_batch_kernel(quotient_comm.lde, xinv0, scale0))
    nc = cfg.num_challenges
    n_perm = nc * (1 + common.num_partial_products)
    block = common.lookup_block
    next_rows = list(range(nc))
    if block:
        next_rows += [n_perm + ci * block for ci in range(nc)]
    sel = np.asarray(next_rows)
    zs_lde = (zs_pp_comm.lde[0][sel], zs_pp_comm.lde[1][sel])
    at_next = _ext_from_dev(_open_batch_kernel(zs_lde, xinv1, scale1))

    openings = OpeningSet(
        constants=cs_at[:common.num_constants],
        plonk_sigmas=cs_at[common.num_constants:],
        wires=wires_at,
        plonk_zs=zspp_at[:nc],
        plonk_zs_next=at_next[:nc],
        partial_products=zspp_at[nc:n_perm],
        quotient_polys=quot_at,
        lookups=zspp_at[n_perm:] if block else None,
        lookup_zs_next=at_next[nc:] if block else None,
    )
    mark("openings")
    for v in openings.fri_batch_zeta():
        ch.observe_extension(v)
    for v in openings.fri_batch_zeta_next():
        ch.observe_extension(v)

    # 6. FRI
    fri_proof = _prove_fri_device(
        common, fp, ch,
        oracles=[cs_comm, wires_comm, zs_pp_comm, quotient_comm],
        openings=openings, invden0=invden0_neg, invden1=invden1_neg,
        x_np=x_np)
    mark("fri")

    return Proof(
        wires_cap=wires_comm.cap_u64,
        plonk_zs_partial_products_cap=zs_pp_comm.cap_u64,
        quotient_polys_cap=quotient_comm.cap_u64,
        openings=openings,
        opening_proof=fri_proof,
        public_inputs=public_inputs,
    )


def _reduce_ext(vals_ext: np.ndarray, apows: np.ndarray) -> np.ndarray:
    """sum_j alpha^j v_j over host ext arrays (P, 2) -> (2,)."""
    prods = gl64.ext_mul(vals_ext, apows)
    return np.array([ph.field_sum(prods[:, 0], 0),
                     ph.field_sum(prods[:, 1], 0)], dtype=np.uint64)


def _prove_fri_device(common, fp, ch, oracles, openings, invden0, invden1,
                      x_np):
    cfg = fp.config
    nc = common.config.num_challenges
    mark = _phase_timer()
    alpha = np.array(ch.get_extension_challenge(), dtype=np.uint64)

    # reduced polynomial (value space) — batch order matches the oracle
    # concat order (incl. the LogUp block inside zs_pp)
    f0 = np.asarray(openings.fri_batch_zeta(), dtype=np.uint64).reshape(-1, 2)
    apows0 = ph.ext_powers(alpha, f0.shape[0])
    r0z = _reduce_ext(f0, apows0)
    f1 = np.asarray(openings.fri_batch_zeta_next(),
                    dtype=np.uint64).reshape(-1, 2)
    apows1 = ph.ext_powers(alpha, f1.shape[0])
    r1z = _reduce_ext(f1, apows1)

    def apows_dev(a):
        a = np.ascontiguousarray(a)
        return (gl.from_u64_np(a[:, 0]), gl.from_u64_np(a[:, 1]))

    offset = 0
    combined0 = None
    for oracle in oracles:
        P = oracle.num_polys
        part = _alpha_combine_kernel(
            oracle.lde, apows_dev(apows0[offset:offset + P]))
        combined0 = part if combined0 is None else \
            (gl.add(combined0[0], part[0]), gl.add(combined0[1], part[1]))
        offset += P
    assert offset == f0.shape[0]
    n_perm = nc * (1 + common.num_partial_products)
    block = common.lookup_block
    next_rows = list(range(nc))
    if block:
        next_rows += [n_perm + ci * block for ci in range(nc)]
    sel = np.asarray(next_rows)
    zs_lde = (oracles[2].lde[0][sel], oracles[2].lde[1][sel])
    combined1 = _alpha_combine_kernel(zs_lde, apows_dev(apows1))

    q0 = _reduced_from_combined(combined0, _ext_to_dev(r0z), invden0)
    q1 = _reduced_from_combined(combined1, _ext_to_dev(r1z), invden1)
    alpha_shift = ph.ext_powers(alpha, f1.shape[0] + 1)[-1]
    cur = _accumulate_scaled(q0, q1, _ext_to_dev(alpha_shift))
    mark("fri.combine", cur)

    # commit phase
    commit_leaves, commit_levels, caps = [], [], []
    cur_x = x_np
    for arity_bits in fp.reduction_arity_bits:
        A = 1 << arity_bits
        leaves, levels = _fri_tree_kernel(cur, arity_bits, cfg.cap_height)
        commit_leaves.append(leaves)
        commit_levels.append(levels)
        cap = gl.to_u64_np(levels[-1])
        caps.append(cap)
        ch.observe_cap(cap)
        beta = np.array(ch.get_extension_challenge(), dtype=np.uint64)
        # host precompute: x/(beta - x) over the current domain, and
        # (beta^A - y)/(A y) over the next one (native batch inversions)
        xinv_np = _host_invden(cur_x, beta)
        xinv_np = np.stack([gl64.mul(cur_x, xinv_np[..., 0]),
                            gl64.mul(cur_x, xinv_np[..., 1])], axis=-1)
        m = cur_x.shape[0] // A
        y = cur_x[:m]
        for _ in range(arity_bits):
            y = gl64.square(y)
        betaA = gl64.ext_pow_const(beta, A)
        ay_inv = ph.batch_inverse(gl64.mul(y, np.uint64(A % gl64.P)))
        fold_scale = np.stack(
            [gl64.mul(ay_inv, gl64.sub(np.uint64(betaA[0]), y)),
             gl64.mul(ay_inv, np.broadcast_to(betaA[1], y.shape))], axis=-1)
        cur = _fri_fold_kernel(cur, _ext_arr_to_dev(xinv_np),
                               _ext_arr_to_dev(fold_scale), arity_bits)
        cur_x = y
        mark("fri.step", cur)

    # final polynomial
    final_vals = _ext_from_dev(cur)                # (M_f, 2)
    M_f = final_vals.shape[0]
    lf = (M_f - 1).bit_length()
    shift_f = pow(gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                  (1 << fp.lde_bits) // M_f, gl64.P)
    final_poly = _final_coeffs(final_vals, lf, shift_f, fp.final_poly_len)
    for c in final_poly:
        ch.observe_extension(c)

    mark("fri.final_poly")
    pow_witness = fri_host.grind_pow(ch, cfg.proof_of_work_bits)
    ch.observe_element(pow_witness)
    mark("fri.grind")
    _ = ch.get_challenge()

    lde_bits = fp.lde_bits
    query_indices = [
        int(ch.get_challenge()) & ((1 << lde_bits) - 1)
        for _ in range(cfg.num_query_rounds)
    ]

    rev = bit_rev_perm(lde_bits)
    nat_cols = [int(rev[i]) for i in query_indices]
    n_or = len(oracles)
    n_steps = len(fp.reduction_arity_bits)
    dev_parts = [_gather_lde_columns_dev(o.lde, nat_cols) for o in oracles]
    dev_parts += [_gather_tree_proofs_dev(o.levels, query_indices)
                  for o in oracles]
    step_idx = []
    cur_idx = np.array(query_indices, dtype=np.int64)
    for arity_bits in fp.reduction_arity_bits:
        cur_idx = cur_idx >> arity_bits
        step_idx.append(cur_idx.copy())
    for r in range(n_steps):
        sel = jnp.asarray(step_idx[r])
        lv = commit_leaves[r]
        dev_parts.append((jnp.take(lv[0], sel, axis=0),
                          jnp.take(lv[1], sel, axis=0)))
    for r in range(n_steps):
        dev_parts.append(_gather_tree_proofs_dev(commit_levels[r],
                                                 step_idx[r]))
    pulled = _pull_many(dev_parts)
    oracle_leaves = pulled[:n_or]
    oracle_sibs = pulled[n_or: 2 * n_or]
    step_leaves = pulled[2 * n_or: 2 * n_or + n_steps]
    step_sibs = pulled[2 * n_or + n_steps:]

    mark("fri.gathers")
    rounds = []
    for qi in range(cfg.num_query_rounds):
        evals_proofs = [(oracle_leaves[oi][qi], oracle_sibs[oi][qi])
                        for oi in range(len(oracles))]
        steps = [FriQueryStep(evals=step_leaves[r][qi].reshape(-1, 2).copy(),
                              siblings=step_sibs[r][qi])
                 for r in range(len(fp.reduction_arity_bits))]
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
            steps=steps))

    return FriProof(
        commit_phase_merkle_caps=caps,
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def _final_coeff_kernel(vals, lf: int, shift: int):
    """GL2 values (M_f,) on coset shift*<w> -> coeff planes (2, M_f)."""
    comp = (jnp.stack([vals[0][0], vals[1][0]]),
            jnp.stack([vals[0][1], vals[1][1]]))      # (2, M_f) hi/lo
    coeffs = ntt_ops._ntt_core(comp, lf, inverse=True)
    inv_shift = pow(shift, gl64.P - 2, gl64.P)
    cp = ntt_ops._coset_powers(lf, inv_shift)
    return gl.mul(coeffs, cp)


def _final_coeffs(final_vals: np.ndarray, lf: int, shift: int,
                  final_len: int) -> np.ndarray:
    dev = ((gl.from_u64_np(np.ascontiguousarray(final_vals[:, 0]))),
           (gl.from_u64_np(np.ascontiguousarray(final_vals[:, 1]))))
    coeffs = _final_coeff_kernel(dev, lf, shift)
    out = _u64(coeffs[0], coeffs[1])                  # (2, M_f)
    return np.ascontiguousarray(out.T[:final_len])
