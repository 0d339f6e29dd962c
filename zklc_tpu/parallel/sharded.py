"""Multi-chip sharding layer: signature-batch data parallelism + collectives.

TPU-native replacement for the reference's NATS work-queue fan-out
(SURVEY.md §2.7): the per-signature / per-polynomial batch axis becomes a
sharded mesh axis; Merkle caps and stake sums reduce via psum/all_gather
over ICI instead of queue messages.  The same step compiles for 1 chip or a
pod slice — the mesh shape is the only difference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..field import gl64
from ..field import gl2x32 as gl
from ..ops import ntt as ntt_ops
from ..ops import poseidon_tpu


def make_mesh(n_devices: int | None = None, axis: str = "sig") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def batch_commit_step(mesh: Mesh, log_n: int, rate_bits: int = 3,
                      cap_height: int = 1, axis: str = "sig"):
    """Build a jitted sharded step: (B, n) poly values -> per-poly Merkle
    caps + a psum'd checksum.

    The batch axis (validator signatures / trace columns) shards across
    chips; each chip runs LDE + Merkle locally; caps all_gather over ICI and
    a stake-sum-style scalar reduces via psum — the collective skeleton of
    the distributed signature aggregation pipeline.
    """

    def local_step(vals):
        # vals: (hi, lo) with shape (B/n_dev, n)
        lde = ntt_ops.lde(vals, log_n, rate_bits)
        leaves = (lde[0][..., None], lde[1][..., None])  # (b, lde_n, 1)
        digests = poseidon_tpu.hash_or_noop_batch(leaves)
        # fold each poly's lde digests down to a tiny cap via pairwise hashes
        cur = digests
        while cur[0].shape[-2] > (1 << cap_height):
            left = (cur[0][..., 0::2, :], cur[1][..., 0::2, :])
            right = (cur[0][..., 1::2, :], cur[1][..., 1::2, :])
            cur = poseidon_tpu.two_to_one_batch(left, right)
        caps = cur  # (b, 2^cap, 4)
        gathered = (jax.lax.all_gather(caps[0], axis, tiled=True),
                    jax.lax.all_gather(caps[1], axis, tiled=True))
        checksum = jax.lax.psum(
            jnp.sum(caps[1].astype(jnp.uint32), dtype=jnp.uint32), axis)
        return gathered[0], gathered[1], checksum

    spec = P(axis, None)
    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=((spec, spec),),
        out_specs=(P(None, None, None), P(None, None, None), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def ntt_all_to_all(mesh: Mesh, log_n: int, axis: str = "ntt",
                   inverse: bool = False):
    """ONE large NTT sharded ACROSS chips (SURVEY.md §7.2 step 2): the
    four-step factorization n = n1*n2 with the inter-stage transpose as an
    all-to-all over ICI.

    Layout: coefficients x[j1 + n1*j2] viewed as a (n2, n1) matrix; the j1
    (column) axis shards over the mesh.  Each chip:
      1. inner DFT over j2 — a local (n2 x n2) MXU matmul on its column
         slab;
      2. twiddle by w^(j1*k2) using its global column offset;
      3. all-to-all: split the k2 axis, concatenate the j1 axis — after the
         exchange each chip holds full rows (all j1) for its k2 slab;
      4. outer DFT over j1 — local matmul.
    Returns y viewed as an (n1, n2) matrix [k1, k2] with k2 sharded:
    y_flat[k2 + n2*k1] = NTT(x)[k2 + n2*k1] (the natural-order output of
    ops/ntt_mm._ntt_mm_core with the same factorization).
    """
    from ..ops import ntt_mm
    l1 = (log_n + 1) // 2
    l2 = log_n - l1
    n1, n2 = 1 << l1, 1 << l2
    n_dev = mesh.shape[axis]
    assert n1 % n_dev == 0, "n1 must divide across the mesh"
    cols = n1 // n_dev

    def local(xh, xl):
        # shard: (n2, n1/P) — columns j1 of this chip
        x = (xh, xl)
        # inner DFT over j2: transform along the n2 axis
        xt = (jnp.swapaxes(xh, -1, -2), jnp.swapaxes(xl, -1, -2))
        A = ntt_mm._dft_matmul(xt, l2, inverse)          # (n1/P, n2) over k2
        # twiddle A[j1, k2] *= w^(j1_global * k2)
        j1_base = jax.lax.axis_index(axis) * cols
        root = gl64.primitive_root_of_unity(log_n)
        if inverse:
            root = pow(root, gl64.P - 2, gl64.P)
        j1 = j1_base + jnp.arange(cols, dtype=jnp.uint32)
        k2 = jnp.arange(n2, dtype=jnp.uint32)
        # w^(j1*k2) via square-and-multiply on exponent bits; the exponent
        # j1*k2 < n1*n2 = 2^log_n <= 2^22 fits u32
        expo = j1[:, None] * k2[None, :]
        tw = _pow_table(root, expo, log_n)
        A = gl.mul(A, tw)
        # all-to-all: split k2, concat j1 -> (n1, n2/P)
        B0 = jax.lax.all_to_all(A[0], axis, split_axis=1, concat_axis=0,
                                tiled=True)
        B1 = jax.lax.all_to_all(A[1], axis, split_axis=1, concat_axis=0,
                                tiled=True)
        # outer DFT over j1: transform along the n1 axis
        Bt = (jnp.swapaxes(B0, -1, -2), jnp.swapaxes(B1, -1, -2))
        Y = ntt_mm._dft_matmul(Bt, l1, inverse)          # (n2/P, n1) over k1
        yh, yl = jnp.swapaxes(Y[0], -1, -2), jnp.swapaxes(Y[1], -1, -2)
        if inverse:
            n_inv = pow(1 << log_n, gl64.P - 2, gl64.P)
            yh, yl = gl.mul((yh, yl), (jnp.uint32(n_inv >> 32),
                                       jnp.uint32(n_inv & 0xFFFFFFFF)))
        return yh, yl                                     # (n1, n2/P)

    spec_in = P(None, axis)    # (n2, n1) with n1 sharded
    spec_out = P(None, axis)   # (n1, n2) with n2 sharded
    fn = shard_map(local, mesh=mesh, in_specs=(spec_in, spec_in),
                   out_specs=(spec_out, spec_out), check_vma=False)
    return jax.jit(fn)


def _pow_table(root: int, expo, log_n: int):
    """w^expo for a 2^log_n root via square-and-multiply on the exponent
    bits (device-friendly: log_n constant muls instead of a gather)."""
    rh = jnp.full(expo.shape, 0, jnp.uint32)
    rl = jnp.full(expo.shape, 1, jnp.uint32)
    acc = (rh, rl)
    w = int(root)
    for bit in range(log_n):
        wb = pow(w, 1 << bit, gl64.P)
        mask = ((expo >> bit) & 1).astype(jnp.uint32)
        mul_acc = gl.mul(acc, (jnp.uint32(wb >> 32),
                               jnp.uint32(wb & 0xFFFFFFFF)))
        acc = (jnp.where(mask.astype(bool), mul_acc[0], acc[0]),
               jnp.where(mask.astype(bool), mul_acc[1], acc[1]))
    return acc


def ntt_all_to_all_reference(vals_u64: np.ndarray, log_n: int,
                             inverse: bool = False) -> np.ndarray:
    """Host check: the (n2, n1)->(n1, n2) matrix views of the same flat
    NTT, for validating the sharded kernel."""
    from ..ops import ntt as ntt_ops
    x = gl.from_u64_np(vals_u64.reshape(-1))
    out = ntt_ops.intt(x, log_n) if inverse else ntt_ops.ntt(x, log_n)
    y = gl.to_u64_np(out)
    l1 = (log_n + 1) // 2
    n1, n2 = 1 << l1, 1 << (log_n - l1)
    return y.reshape(n1, n2)


_sharded_commit_cache: dict = {}


def sharded_commit(mesh: Mesh, num_polys: int, log_n: int, rate_bits: int,
                   cap_height: int, values_are_coeffs: bool,
                   axis: str | None = None):
    """Sharded PolynomialBatch commit: the prover's LDE + Merkle phases run
    through shard_map over the mesh (VERDICT r2 next #5 — the mesh wired
    into ACTUAL proving, not standalone kernels).

    Work split (SURVEY.md §2.7 TPU mapping):
      * NTT phase — POLY axis sharded: each chip iNTTs + coset-LDEs its own
        slab of the polynomial batch (data parallelism over trace columns),
        then all_gathers the LDE over ICI.
      * Merkle phase — DOMAIN axis sharded: each chip hashes the leaf rows
        of its contiguous bit-reversed block (a complete subtree), reduces
        it locally, all_gathers the small digest levels, and finishes the
        (tiny) top levels replicated.

    Returns a jitted fn(vals) with vals (hi, lo) of shape (Ppad, n) where
    Ppad = num_polys rounded up to a mesh multiple (zero rows appended);
    output is (lde_hi, lde_lo, levels) replicated, bit-exact with
    prover_tpu._commit_kernel.  Replicating the gathered LDE bounds this
    path to single-host HBM; a pod-scale variant would keep the LDE
    domain-sharded and shard the opening/FRI kernels the same way.
    """
    axis = axis or mesh.axis_names[0]
    key = (mesh, num_polys, log_n, rate_bits, cap_height, values_are_coeffs,
           axis)
    if key in _sharded_commit_cache:
        return _sharded_commit_cache[key]

    n_dev = mesh.shape[axis]
    n = 1 << log_n
    lde_bits = log_n + rate_bits
    M = 1 << lde_bits
    b = M // n_dev                      # local leaf-block size
    assert b >= 1 and M % n_dev == 0
    # local tree reduces to this many nodes; the rest happens replicated
    stop = max(1, (1 << cap_height) // n_dev)
    rev_np = ntt_ops._bit_rev_indices(lde_bits).astype(np.int32)
    shift = gl64.MULTIPLICATIVE_GROUP_GENERATOR

    def local(vh, vl):
        vals = (vh, vl)                 # (Ppad/n_dev, n)
        coeffs = vals if values_are_coeffs else \
            ntt_ops._ntt_core(vals, log_n, inverse=True)
        pad = n * ((1 << rate_bits) - 1)
        lead = coeffs[0].shape[:-1]
        z = jnp.zeros(lead + (pad,), jnp.uint32)
        chi = jnp.concatenate([coeffs[0], z], axis=-1)
        clo = jnp.concatenate([coeffs[1], z], axis=-1)
        cp = ntt_ops._coset_powers(lde_bits, shift)
        scaled = gl.mul((chi, clo), cp)      # numpy constants; see ntt.py NB
        lde_loc = ntt_ops._ntt_core(scaled, lde_bits, inverse=False)
        # replicate the poly axis (ICI all_gather), drop padding rows
        lh = jax.lax.all_gather(lde_loc[0], axis, tiled=True)[:num_polys]
        ll = jax.lax.all_gather(lde_loc[1], axis, tiled=True)[:num_polys]
        # domain-sharded Merkle: this chip's bit-reversed leaf block
        d = jax.lax.axis_index(axis)
        sel = jax.lax.dynamic_slice_in_dim(rev_np, d * b, b)
        leaves = (jnp.take(lh, sel, axis=-1).T,
                  jnp.take(ll, sel, axis=-1).T)          # (b, P)
        cur = poseidon_tpu.hash_or_noop_batch(leaves)
        local_levels = [cur]
        while cur[0].shape[0] > stop:
            cur = poseidon_tpu.two_to_one_batch(
                (cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
            local_levels.append(cur)
        levels = [(jax.lax.all_gather(lv[0], axis, tiled=True),
                   jax.lax.all_gather(lv[1], axis, tiled=True))
                  for lv in local_levels]
        # finish top levels replicated (when the cap is below n_dev nodes)
        cur = levels[-1]
        while cur[0].shape[0] > (1 << cap_height):
            cur = poseidon_tpu.two_to_one_batch(
                (cur[0][0::2], cur[1][0::2]), (cur[0][1::2], cur[1][1::2]))
            levels.append(cur)
        flat = [lh, ll]
        for lv in levels:
            flat.extend(lv)
        return tuple(flat)

    # number of levels is static: local ones + replicated top-off
    n_local = 1 + max(0, (b.bit_length() - 1) - (stop.bit_length() - 1))
    n_total = n_local + max(0, ((stop * n_dev).bit_length() - 1) - cap_height)
    spec = P(axis, None)
    rep = P(None, None)
    fn = shard_map(local, mesh=mesh, in_specs=(spec, spec),
                   out_specs=tuple([rep] * (2 + 2 * n_total)),
                   check_vma=False)
    jfn = jax.jit(fn)

    def call(vals):
        out = jfn(*vals)
        lde = (out[0], out[1])
        levels = [(out[2 + 2 * i], out[3 + 2 * i]) for i in range(n_total)]
        return lde, levels

    _sharded_commit_cache[key] = call
    return call


def pad_poly_batch(vals, n_dev: int):
    """Pad the poly axis of a host (P, n) u64 matrix (or device (hi, lo)
    pair) to a multiple of n_dev with zero rows."""
    if isinstance(vals, tuple):
        Ppad = -(-vals[0].shape[0] // n_dev) * n_dev
        padr = Ppad - vals[0].shape[0]
        if padr == 0:
            return vals
        return (jnp.pad(vals[0], ((0, padr), (0, 0))),
                jnp.pad(vals[1], ((0, padr), (0, 0))))
    Ppad = -(-vals.shape[0] // n_dev) * n_dev
    if Ppad == vals.shape[0]:
        return vals
    return np.pad(vals, ((0, Ppad - vals.shape[0]), (0, 0)))


def prove_level_parallel(jobs, devices=None, max_workers=None):
    """Run independent prover jobs across the chips of this host.

    The fold-tree LEVEL of the signature aggregation (signatures.py
    fold_proof_tree) is embarrassingly parallel — the reference ships each
    fold to a NATS worker (signatures.rs:144-274); here each (callable)
    job's device work is pinned to a chip via jax.default_device and the
    host-side transcript work overlaps through a thread pool.

    jobs: list of zero-arg callables returning (data, proof).
    """
    import concurrent.futures as cf
    devices = devices or jax.devices()
    n_dev = len(devices)
    if n_dev == 1 or len(jobs) == 1:
        return [j() for j in jobs]

    def run(i_job):
        i, job = i_job
        with jax.default_device(devices[i % n_dev]):
            return job()

    with cf.ThreadPoolExecutor(max_workers or min(len(jobs), n_dev)) as ex:
        return list(ex.map(run, enumerate(jobs)))


def sharded_ntt(mesh: Mesh, log_n: int, axis: str = "sig"):
    """Batch NTT with the batch axis sharded across chips (each chip
    transforms its own polynomials; no cross-chip exchange needed for the
    batch axis — ntt_all_to_all above shards a single large transform)."""
    spec = P(axis, None)

    def local(vals):
        return ntt_ops.ntt(vals, log_n)

    fn = shard_map(local, mesh=mesh, in_specs=((spec, spec),),
                   out_specs=(spec, spec))
    return jax.jit(fn)
