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
