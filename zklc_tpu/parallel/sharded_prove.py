"""Domain-sharded device prover: the LDE never replicates.

VERDICT r3 weak #4 / next #6: `parallel/sharded.sharded_commit` all_gathers
the full LDE onto every chip, bounding the mesh path to single-host HBM,
and leaves openings/FRI unsharded.  This module is the pod-scale redesign:

**Layout.**  Every committed LDE is stored BIT-REVERSED over `lde_bits`
and sharded in contiguous blocks across the mesh axis.  Writing a global
position p = d*b + lt (chip d, local offset lt, b = M/n_dev), the natural
index is rev(p) = rev_{L-k}(lt)*n_dev + rev_k(d) — i.e. chip d owns the
natural-domain residue class  j ≡ rev_k(d)  (mod n_dev).  This single
choice makes every phase chip-local:

  * **Merkle** — bit-reversed leaves are the storage order, so each chip
    hashes a contiguous complete subtree; only the top max(1, 2^cap/n_dev)
    nodes cross ICI (an all_gather of a few digests).
  * **FRI fold** — an arity-A fiber {j + k*(m)} (m = M/A) shares
    j mod n_dev, and within the rev layout its members are A CONSECUTIVE
    positions; folding is reshape(M/A, A) + weighted sum, local at every
    level, and the folded output lands exactly in the next level's rev
    layout (the layout is self-similar under folding).
  * **openings / alpha-combine** — weighted sums over the domain; order-
    insensitive, so the existing kernels run unchanged on the sharded
    arrays with host weight vectors rev-permuted before upload; XLA
    partial-sums locally and all-reduces the (tiny) results.
  * **quotient** — gate-constraint evaluation is pointwise in the domain;
    the single order-dependent input (Z at the next trace row, natural
    j+2^rate_bits) becomes a static permutation gather, which is chip-local
    whenever n_dev divides 2^rate_bits (n_dev=8, rate 3: free).

Cross-chip traffic per prove: one all_to_all transpose per commitment
(poly-sharded NTT output -> domain shards), cap/tree-top all_gathers,
opening psums, and ~num_query_rounds row gathers.  Everything O(M)-sized
stays distributed.

Transcript/output equality: the proof bytes are IDENTICAL to the
single-device prover's (tests/test_sharded_prove.py asserts JSON
equality), so the verifier, recursion and wrap layers are untouched.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..field import gl64
from ..field import gl2x32 as gl
from ..hash import poseidon as pos
from ..ops import ntt as ntt_ops
from ..ops import poseidon_tpu
from ..plonk import poly_host as ph
from ..plonk.commitment import bit_rev_perm
from ..plonk.proof import (Proof, OpeningSet, FriProof, FriQueryRound,
                           FriQueryStep, FriInitialTreeProof)
from ..plonk.witness import generate_witness
from ..plonk import prover as host_prover
from ..plonk import fri as fri_host
from ..plonk import prover_tpu as PT

AXIS = "d"


def _rev_np(bits: int) -> np.ndarray:
    return np.asarray(bit_rev_perm(bits))


@functools.lru_cache(maxsize=None)
def _send_index(lde_bits: int, k: int) -> np.ndarray:
    """SEND_IDX[e, lt] = natural column chip e stores at local offset lt:
    rev_{L-k}(lt) * n_dev + rev_k(e)."""
    n_dev = 1 << k
    b = 1 << (lde_bits - k)
    rev_loc = _rev_np(lde_bits - k)
    rev_dev = _rev_np(k)
    return (rev_loc[None, :] * n_dev + rev_dev[:, None]).astype(np.int32)


def _dom_sharding(mesh, size: int) -> NamedSharding:
    """Domain sharding, falling back to replicated when the (late-FRI,
    tiny) array no longer divides across the mesh."""
    n_dev = mesh.shape[AXIS]
    if size % n_dev:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(AXIS))


def _shard1(mesh, arr_pair):
    """Place a host ext/base pair (hi, lo) with leading domain axis onto the
    mesh, domain-sharded."""
    sh = _dom_sharding(mesh, arr_pair[0].shape[0])
    return (jax.device_put(arr_pair[0], sh), jax.device_put(arr_pair[1], sh))


def _ext_arr_to_dev_sharded(mesh, a: np.ndarray):
    """host (M, 2) u64 -> GL2 device pair, domain-sharded."""
    a = np.asarray(a, dtype=np.uint64)
    sh = _dom_sharding(mesh, a.shape[0])
    re = gl.from_u64_np(np.ascontiguousarray(a[..., 0]))
    im = gl.from_u64_np(np.ascontiguousarray(a[..., 1]))
    return ((jax.device_put(re[0], sh), jax.device_put(re[1], sh)),
            (jax.device_put(im[0], sh), jax.device_put(im[1], sh)))


# ---------------------------------------------------------------------------
# sharded commitment
# ---------------------------------------------------------------------------

_commit_cache: dict = {}


def _rev_commit_fn(mesh, num_polys_padded: int, num_polys: int, log_n: int,
                   rate_bits: int, cap_height: int, values_are_coeffs: bool):
    key = (mesh, num_polys_padded, num_polys, log_n, rate_bits, cap_height,
           values_are_coeffs)
    if key in _commit_cache:
        return _commit_cache[key]

    n_dev = mesh.shape[AXIS]
    k = n_dev.bit_length() - 1
    lde_bits = log_n + rate_bits
    M = 1 << lde_bits
    b = M // n_dev
    n = 1 << log_n
    stop = max(1, (1 << cap_height) // n_dev)
    send_idx = _send_index(lde_bits, k)
    shift = gl64.MULTIPLICATIVE_GROUP_GENERATOR
    P_loc = num_polys_padded // n_dev

    def local(vh, vl):
        vals = (vh, vl)                          # (P_loc, n)
        coeffs = vals if values_are_coeffs else \
            PT._ntt_chunked(vals, log_n, inverse=True)
        z = jnp.zeros((P_loc, M - n), jnp.uint32)
        chi = jnp.concatenate([coeffs[0], z], axis=-1)
        clo = jnp.concatenate([coeffs[1], z], axis=-1)
        cp = ntt_ops._coset_powers(lde_bits, shift)
        scaled = gl.mul((chi, clo), cp)
        lde_nat = PT._ntt_chunked(scaled, lde_bits, inverse=False)
        # transpose poly shards -> domain shards (ICI all_to_all), arriving
        # directly in the rev layout
        yh = jnp.transpose(lde_nat[0][:, send_idx], (1, 0, 2))
        yl = jnp.transpose(lde_nat[1][:, send_idx], (1, 0, 2))
        zh = jax.lax.all_to_all(yh, AXIS, split_axis=0, concat_axis=0)
        zl = jax.lax.all_to_all(yl, AXIS, split_axis=0, concat_axis=0)
        # canonical at the commitment boundary (the host convention,
        # gl64.py docstring): device field ops are lazy in [0, 2^64) and
        # a lazy residue that leaks into a query leaf would serialize
        # differently from the single-device proof bytes
        lde_rev = gl.canonicalize((zh.reshape(num_polys_padded, b),
                                   zl.reshape(num_polys_padded, b)))
        # Merkle: storage order IS leaf order; local complete subtree.
        # Leaves use the REAL poly count — zero-pad rows exist only for the
        # all_to_all and must not enter the hashes.
        leaves = (lde_rev[0][:num_polys].T, lde_rev[1][:num_polys].T)
        cur = poseidon_tpu.hash_or_noop_batch(leaves)
        local_levels = [cur]
        while cur[0].shape[0] > stop:
            cur = poseidon_tpu.two_to_one_batch(
                (cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
            local_levels.append(cur)
        # tree top: all_gather the per-chip roots (tiny), finish replicated
        top = (jax.lax.all_gather(cur[0], AXIS, tiled=True),
               jax.lax.all_gather(cur[1], AXIS, tiled=True))
        top_levels = []
        cur = top
        while cur[0].shape[0] > (1 << cap_height):
            cur = poseidon_tpu.two_to_one_batch(
                (cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
            top_levels.append(cur)
        out = [lde_rev[0], lde_rev[1]]
        for lv in local_levels:
            out.extend(lv)
        for lv in top_levels:
            out.extend(lv)
        return tuple(out)

    n_local = 1 + (b.bit_length() - 1) - (stop.bit_length() - 1)
    n_top = max(0, ((stop * n_dev).bit_length() - 1) - cap_height)
    lde_spec = P(None, AXIS)
    loc_spec = P(AXIS, None)
    rep_spec = P(None, None)
    out_specs = tuple([lde_spec, lde_spec]
                      + [loc_spec] * (2 * n_local)
                      + [rep_spec] * (2 * n_top))
    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=(P(AXIS, None), P(AXIS, None)),
        out_specs=out_specs, check_vma=False))

    def call(vals):
        out = fn(*vals)
        lde = (out[0], out[1])
        levels = [(out[2 + 2 * i], out[3 + 2 * i])
                  for i in range(n_local + n_top)]
        return lde, levels

    _commit_cache[key] = call
    return call


class RevShardedCommitment:
    """Device commitment whose LDE is bit-reversed + domain-sharded.

    Same cap/levels semantics as prover_tpu.DeviceCommitment (levels are
    rev-ordered there too), but `lde` holds REV-ordered columns — query
    extraction indexes it with rev positions directly."""

    def __init__(self, mesh: Mesh, values_u64, rate_bits: int,
                 cap_height: int, values_are_coeffs: bool = False,
                 dev_values=None):
        self.mesh = mesh
        n_dev = mesh.shape[AXIS]
        if dev_values is not None:
            vals = dev_values
        else:
            vals = gl.from_u64_np(np.asarray(values_u64, dtype=np.uint64))
        self.num_polys, n = vals[0].shape
        Ppad = -(-self.num_polys // n_dev) * n_dev
        if Ppad != self.num_polys:
            vals = (jnp.pad(vals[0], ((0, Ppad - self.num_polys), (0, 0))),
                    jnp.pad(vals[1], ((0, Ppad - self.num_polys), (0, 0))))
        sh = NamedSharding(mesh, P(AXIS, None))
        vals = (jax.device_put(vals[0], sh), jax.device_put(vals[1], sh))
        self.log_n = (n - 1).bit_length()
        self.rate_bits = rate_bits
        self.cap_height = cap_height
        fn = _rev_commit_fn(mesh, Ppad, self.num_polys, self.log_n,
                            rate_bits, cap_height, values_are_coeffs)
        lde_pad, self.levels = fn(vals)
        self.lde = (lde_pad[0][:self.num_polys], lde_pad[1][:self.num_polys])
        self.cap_u64 = gl.to_u64_np(self.levels[-1])

    @property
    def lde_bits(self):
        return self.log_n + self.rate_bits


# ---------------------------------------------------------------------------
# FRI kernels, rev layout
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnums=(3,))
def _fri_fold_rev_kernel(cur, xinv, scale, arity_bits: int):
    """Fold rev-ordered values: fiber members are A consecutive positions.
    Output is the next level's rev layout (self-similar)."""
    M = cur[0][0].shape[0]
    A = 1 << arity_bits
    m = M // A
    term = gl.ext_mul(cur, xinv)
    tsum = PT._ext_tree_sum(
        ((term[0][0].reshape(m, A), term[0][1].reshape(m, A)),
         (term[1][0].reshape(m, A), term[1][1].reshape(m, A))), 1)
    out = gl.ext_mul(tsum, scale)
    return (gl.canonicalize(out[0]), gl.canonicalize(out[1]))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _fri_tree_rev_kernel(cur, arity_bits: int, cap_height: int):
    """Commit tree for rev-ordered values: leaves are A consecutive
    positions flattened [re, im] (no permute — storage order is leaf
    order)."""
    M = cur[0][0].shape[0]
    arity = 1 << arity_bits
    m = M // arity

    def plane(p):
        re, im = cur[0][p], cur[1][p]
        return jnp.stack([re, im], -1).reshape(m, arity * 2)

    leaves = (plane(0), plane(1))
    dig = poseidon_tpu.hash_or_noop_batch(leaves)
    levels = [dig]
    cur_l = dig
    while cur_l[0].shape[0] > (1 << cap_height):
        cur_l = poseidon_tpu.two_to_one_batch(
            (cur_l[0][0::2], cur_l[1][0::2]),
            (cur_l[0][1::2], cur_l[1][1::2]))
        levels.append(cur_l)
    return leaves, levels


# ---------------------------------------------------------------------------
# quotient, rev layout (same per-gate split kernels; next-row via static
# permutation instead of roll)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _next_perm_rev(lde_bits: int, rate_bits: int) -> np.ndarray:
    """perm[p] = rev((rev(p) + 2^rate_bits) mod M): position of the next
    trace row's value in the rev layout."""
    M = 1 << lde_bits
    rev = _rev_np(lde_bits)
    return rev[(rev + (1 << rate_bits)) % M].astype(np.int32)


def quotient_rev(data, wires_comm, cs_comm, zs_pp_comm, pi_hash,
                 betas, gammas, alphas, deltas=()):
    """Quotient values over the coset, rev layout, sharded inputs/output.

    Reuses prover_tpu._quotient_parts verbatim: the per-gate kernels are
    pointwise in the domain (layout-agnostic); the base kernel takes the
    rev-layout next-row permutation; per-point constant vectors (x, 1/Z_H,
    L_0) arrive host-permuted and domain-sharded."""
    common = data.common
    rate_bits = common.config.fri_config.rate_bits
    lde_bits = common.degree_bits + rate_bits
    rev = _rev_np(lde_bits)

    base_jit, gate_jits, finish_jit = PT._quotient_parts(common)
    next_perm = jnp.asarray(_next_perm_rev(lde_bits, rate_bits))

    x_np, zh_inv_np, l0_np = host_prover._coset_domain(
        common.degree_bits, rate_bits)
    to_dev = gl.from_u64_np
    pi_hash_d = to_dev(np.asarray(pi_hash, dtype=np.uint64))
    betas_d = to_dev(np.asarray(betas, dtype=np.uint64))
    gammas_d = to_dev(np.asarray(gammas, dtype=np.uint64))
    alphas_d = to_dev(np.asarray(alphas, dtype=np.uint64))
    deltas_d = to_dev(np.asarray(list(deltas) or [0], dtype=np.uint64))
    mesh = wires_comm.mesh
    x_d = _shard1(mesh, to_dev(x_np[rev]))
    zh_d = _shard1(mesh, to_dev(zh_inv_np[rev]))
    l0_d = _shard1(mesh, to_dev(l0_np[rev]))

    parts = [base_jit(wires_comm.lde, cs_comm.lde, zs_pp_comm.lde,
                      betas_d, gammas_d, alphas_d, deltas_d,
                      x_d, zh_d, l0_d, next_perm)]
    for gfn in gate_jits:
        parts.append(gfn(wires_comm.lde, cs_comm.lde, pi_hash_d, alphas_d))
    parts_hi = jnp.stack([p[0] for p in parts])
    parts_lo = jnp.stack([p[1] for p in parts])
    return finish_jit(parts_hi, parts_lo, zh_d)


def _quotient_host_rev(data, wires_comm, cs_comm, zs_pp_comm, pi_hash,
                       betas, gammas, alphas, deltas, mesh, rev):
    """CPU-backend quotient: pull the sharded rev LDEs, evaluate on host
    (identical values), push back rev-sharded."""
    def nat_u64(comm):
        # bit-reversal is an involution: nat[j] = rev_layout[rev[j]]
        return gl.to_u64_np(comm.lde)[:, rev]

    qhost = host_prover.eval_vanishing_on_coset(
        data, nat_u64(wires_comm), nat_u64(cs_comm), nat_u64(zs_pp_comm),
        pi_hash, betas, gammas, alphas, deltas)
    qrev = np.ascontiguousarray(qhost[:, rev])
    sh = NamedSharding(mesh, P(None, AXIS))
    planes = gl.from_u64_np(qrev)
    return (jax.device_put(planes[0], sh), jax.device_put(planes[1], sh))


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _quotient_coeff_rev_kernel(qvals_rev, lde_bits: int, rate_bits: int,
                               n: int):
    """Rev-layout quotient values -> degree-n coefficient chunks (the
    input format of the quotient commitment).

    Un-revs to natural order (one global gather — the only full-width
    resharding in the pipeline besides the commit transposes), then
    mirrors prover_tpu._quotient_coeff_kernel: coset-iNTT and split each
    challenge's degree-M polynomial into 2^rate_bits chunks of degree n."""
    rev = _rev_np(lde_bits)
    qnat = (qvals_rev[0][:, rev], qvals_rev[1][:, rev])
    return PT._quotient_coeff_kernel(qnat, lde_bits, rate_bits, n)


# ---------------------------------------------------------------------------
# the sharded prove flow
# ---------------------------------------------------------------------------

def prove(data, inputs: dict, mesh: Mesh) -> Proof:
    """Domain-sharded device prove; proof bytes identical to
    prover_tpu.prove / prover.prove."""
    common = data.common
    cfg = common.config
    fp = common.fri_params
    fc = cfg.fri_config
    n = common.degree
    lde_bits = fp.lde_bits
    rev = _rev_np(lde_bits)
    mark = PT._phase_timer()

    cs_comm = ensure_cs_device_sharded(data, mesh)

    # 1. witness + wires commitment
    wr = generate_witness(data, inputs)
    mark("witness")
    wires = wr.wires
    public_inputs = np.array([wr.get(t) for t in data.public_input_targets],
                             dtype=np.uint64)
    pi_hash = pos.hash_no_pad(public_inputs) if len(public_inputs) else \
        np.zeros(4, dtype=np.uint64)
    if common.lookup is not None:
        from ..plonk import lookup as lk_mod
        m_cols = lk_mod.compute_multiplicities(common.lookup, wires,
                                               data.constants_rows)
        wires = np.concatenate([wires, m_cols], axis=1)
    wires_comm = RevShardedCommitment(mesh, np.ascontiguousarray(wires.T),
                                      fc.rate_bits, fc.cap_height)
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

    # 3. Z + partial products (+ lookup columns) on host
    zs_pp = host_prover.compute_zs_partial_products(
        common, wires, data.sigmas_rows, betas, gammas)
    if common.lookup is not None:
        lk_cols = lk_mod.compute_lookup_columns(
            common.lookup, wires, data.constants_rows, deltas,
            cfg.num_wires)
        zs_pp = np.concatenate([zs_pp, lk_cols], axis=0)
    mark("zs_pp host")
    zs_pp_comm = RevShardedCommitment(mesh, zs_pp, fc.rate_bits,
                                      fc.cap_height)
    ch.observe_cap(zs_pp_comm.cap_u64)
    alphas = ch.get_n_challenges(cfg.num_challenges)
    mark("zs_pp_comm", zs_pp_comm.lde)

    # 4. quotient — domain-sharded gate evaluation on TPU; the CPU
    # backend cannot compile the gate kernels (the same known XLA:CPU
    # limitation prover_tpu.prove works around), so the virtual-mesh path
    # computes identical values through the host evaluator and re-shards
    if jax.default_backend() == "tpu":
        qvals = quotient_rev(data, wires_comm, cs_comm, zs_pp_comm,
                             pi_hash, betas, gammas, alphas, deltas)
    else:
        qvals = _quotient_host_rev(data, wires_comm, cs_comm, zs_pp_comm,
                                   pi_hash, betas, gammas, alphas, deltas,
                                   mesh, rev)
    chunks = _quotient_coeff_rev_kernel(qvals, lde_bits, fc.rate_bits, n)
    quotient_comm = RevShardedCommitment(mesh, None, fc.rate_bits,
                                         fc.cap_height,
                                         values_are_coeffs=True,
                                         dev_values=chunks)
    ch.observe_cap(quotient_comm.cap_u64)
    mark("quotient+commit", quotient_comm.lde)
    zeta = np.array(ch.get_extension_challenge(), dtype=np.uint64)

    # 5. openings — same barycentric kernels, rev-permuted weight vectors
    g = gl64.primitive_root_of_unity(common.degree_bits)
    zeta_next = gl64.ext_mul(np.array([g, 0], dtype=np.uint64), zeta)
    x_np = PT._domain_host(lde_bits, gl64.MULTIPLICATIVE_GROUP_GENERATOR)
    invden0_np = PT._host_invden(x_np, zeta)
    invden1_np = PT._host_invden(x_np, zeta_next)

    def xinv(inv_np):
        return np.stack([gl64.mul(x_np, inv_np[..., 0]),
                         gl64.mul(x_np, inv_np[..., 1])], axis=-1)

    invden0_neg = _ext_arr_to_dev_sharded(mesh, gl64.neg(invden0_np)[rev])
    invden1_neg = _ext_arr_to_dev_sharded(mesh, gl64.neg(invden1_np)[rev])
    xinv0 = _ext_arr_to_dev_sharded(mesh, xinv(invden0_np)[rev])
    xinv1 = _ext_arr_to_dev_sharded(mesh, xinv(invden1_np)[rev])
    scale0 = PT._ext_to_dev(PT._bary_scale(zeta, lde_bits))
    scale1 = PT._ext_to_dev(PT._bary_scale(zeta_next, lde_bits))

    ext_from = PT._ext_from_dev
    cs_at = ext_from(PT._open_batch_kernel(cs_comm.lde, xinv0, scale0))
    wires_at = ext_from(PT._open_batch_kernel(wires_comm.lde, xinv0, scale0))
    zspp_at = ext_from(PT._open_batch_kernel(zs_pp_comm.lde, xinv0, scale0))
    quot_at = ext_from(PT._open_batch_kernel(quotient_comm.lde, xinv0,
                                             scale0))
    nc = cfg.num_challenges
    n_perm = nc * (1 + common.num_partial_products)
    block = common.lookup_block
    next_rows = list(range(nc))
    if block:
        next_rows += [n_perm + ci * block for ci in range(nc)]
    sel = np.asarray(next_rows)
    zs_lde = (zs_pp_comm.lde[0][sel], zs_pp_comm.lde[1][sel])
    at_next = ext_from(PT._open_batch_kernel(zs_lde, xinv1, scale1))

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
    fri_proof = _prove_fri_sharded(
        common, fp, ch, mesh,
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


def ensure_cs_device_sharded(data, mesh):
    """Sharded constants+sigmas commitment with the same LRU discipline and
    digest bookkeeping as prover_tpu.ensure_cs_device."""
    cached = getattr(data, "_tpu_cs", None)
    if isinstance(cached, RevShardedCommitment) and cached.mesh is mesh:
        PT._cs_lru_touch(data, cached)
        return cached
    cfg = data.common.config
    mat = np.concatenate([data.constants_rows, data.sigmas_rows], axis=1).T
    comm = RevShardedCommitment(mesh, np.ascontiguousarray(mat),
                                cfg.fri_config.rate_bits,
                                cfg.fri_config.cap_height)
    data._tpu_cs = comm
    PT._cs_lru_touch(data, comm)
    if data.circuit_digest is None:
        digest_input = np.concatenate(
            [comm.cap_u64.ravel(),
             np.array([data.common.degree_bits], dtype=np.uint64)])
        data.circuit_digest = pos.hash_no_pad(digest_input)
        from ..plonk.builder import VerifierOnlyData
        data.verifier_only = VerifierOnlyData(
            constants_sigmas_cap=comm.cap_u64,
            circuit_digest=data.circuit_digest)
    return comm


def _prove_fri_sharded(common, fp, ch, mesh, oracles, openings, invden0,
                       invden1, x_np):
    cfg = fp.config
    nc = common.config.num_challenges
    lde_bits = fp.lde_bits
    mark = PT._phase_timer()
    alpha = np.array(ch.get_extension_challenge(), dtype=np.uint64)

    f0 = np.asarray(openings.fri_batch_zeta(), dtype=np.uint64).reshape(-1, 2)
    apows0 = ph.ext_powers(alpha, f0.shape[0])
    r0z = PT._reduce_ext(f0, apows0)
    f1 = np.asarray(openings.fri_batch_zeta_next(),
                    dtype=np.uint64).reshape(-1, 2)
    apows1 = ph.ext_powers(alpha, f1.shape[0])
    r1z = PT._reduce_ext(f1, apows1)

    def apows_dev(a):
        a = np.ascontiguousarray(a)
        return (gl.from_u64_np(a[:, 0]), gl.from_u64_np(a[:, 1]))

    offset = 0
    combined0 = None
    for oracle in oracles:
        Pn = oracle.num_polys
        part = PT._alpha_combine_kernel(
            oracle.lde, apows_dev(apows0[offset:offset + Pn]))
        combined0 = part if combined0 is None else \
            (gl.add(combined0[0], part[0]), gl.add(combined0[1], part[1]))
        offset += Pn
    assert offset == f0.shape[0]
    n_perm = nc * (1 + common.num_partial_products)
    block = common.lookup_block
    next_rows = list(range(nc))
    if block:
        next_rows += [n_perm + ci * block for ci in range(nc)]
    sel = np.asarray(next_rows)
    zs_lde = (oracles[2].lde[0][sel], oracles[2].lde[1][sel])
    combined1 = PT._alpha_combine_kernel(zs_lde, apows_dev(apows1))

    q0 = PT._reduced_from_combined(combined0, PT._ext_to_dev(r0z), invden0)
    q1 = PT._reduced_from_combined(combined1, PT._ext_to_dev(r1z), invden1)
    alpha_shift = ph.ext_powers(alpha, f1.shape[0] + 1)[-1]
    cur = PT._accumulate_scaled(q0, q1, PT._ext_to_dev(alpha_shift))
    mark("fri.combine", cur)

    # commit phase — rev layout throughout; weight vectors rev-permuted per
    # level (cur_x tracks the natural-order domain of each level)
    commit_leaves, commit_levels, caps = [], [], []
    cur_x = x_np
    cur_bits = lde_bits
    for arity_bits in fp.reduction_arity_bits:
        A = 1 << arity_bits
        leaves, levels = _fri_tree_rev_kernel(cur, arity_bits,
                                              cfg.cap_height)
        commit_leaves.append(leaves)
        commit_levels.append(levels)
        cap = gl.to_u64_np(levels[-1])
        caps.append(cap)
        ch.observe_cap(cap)
        beta = np.array(ch.get_extension_challenge(), dtype=np.uint64)
        xinv_np = PT._host_invden(cur_x, beta)
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
        rev_cur = _rev_np(cur_bits)
        rev_next = _rev_np(cur_bits - arity_bits)
        cur = _fri_fold_rev_kernel(
            cur,
            _ext_arr_to_dev_sharded(mesh, xinv_np[rev_cur]),
            _ext_arr_to_dev_sharded(mesh, fold_scale[rev_next]),
            arity_bits)
        cur_x = y
        cur_bits -= arity_bits
        mark("fri.step", cur)

    # final polynomial (tiny — un-rev on host)
    final_rev = PT._ext_from_dev(cur)              # (M_f, 2) rev order
    final_vals = final_rev[_rev_np(cur_bits)]
    M_f = final_vals.shape[0]
    lf = (M_f - 1).bit_length()
    shift_f = pow(gl64.MULTIPLICATIVE_GROUP_GENERATOR,
                  (1 << fp.lde_bits) // M_f, gl64.P)
    final_poly = PT._final_coeffs(final_vals, lf, shift_f,
                                  fp.final_poly_len)
    for c in final_poly:
        ch.observe_extension(c)

    mark("fri.final_poly")
    pow_witness = fri_host.grind_pow(ch, cfg.proof_of_work_bits)
    ch.observe_element(pow_witness)
    mark("fri.grind")
    _ = ch.get_challenge()

    query_indices = [
        int(ch.get_challenge()) & ((1 << lde_bits) - 1)
        for _ in range(cfg.num_query_rounds)
    ]

    # rev layout: query indices ARE storage positions
    n_or = len(oracles)
    n_steps = len(fp.reduction_arity_bits)
    dev_parts = [PT._gather_lde_columns_dev(o.lde, query_indices)
                 for o in oracles]
    dev_parts += [PT._gather_tree_proofs_dev(o.levels, query_indices)
                  for o in oracles]
    step_idx = []
    cur_idx = np.array(query_indices, dtype=np.int64)
    for arity_bits in fp.reduction_arity_bits:
        cur_idx = cur_idx >> arity_bits
        step_idx.append(cur_idx.copy())
    for r in range(n_steps):
        sel_d = jnp.asarray(step_idx[r])
        lv = commit_leaves[r]
        dev_parts.append((jnp.take(lv[0], sel_d, axis=0),
                          jnp.take(lv[1], sel_d, axis=0)))
    for r in range(n_steps):
        dev_parts.append(PT._gather_tree_proofs_dev(commit_levels[r],
                                                    step_idx[r]))
    pulled = PT._pull_many(dev_parts)
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
