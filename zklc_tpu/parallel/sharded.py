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


def sharded_ntt(mesh: Mesh, log_n: int, axis: str = "sig"):
    """Batch NTT with the batch axis sharded across chips (each chip
    transforms its own polynomials; no cross-chip exchange needed for the
    batch axis — the intra-NTT all-to-all sharding is a later milestone)."""
    spec = P(axis, None)

    def local(vals):
        return ntt_ops.ntt(vals, log_n)

    fn = shard_map(local, mesh=mesh, in_specs=((spec, spec),),
                   out_specs=(spec, spec))
    return jax.jit(fn)
