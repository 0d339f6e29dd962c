"""Multi-chip scaling efficiency on the virtual CPU mesh.

Measures the two sharded paths (parallel/sharded.py) at 1 vs N virtual
devices and prints JSON with weak-scaling efficiency:

  * batch-commit step (signature-axis data parallelism: LDE + Merkle caps
    + all_gather/psum) — weak scaling: per-device batch is constant, so
    ideal efficiency keeps wall-clock flat while total work scales by N;
  * cross-chip NTT (ntt_all_to_all): one transform of fixed size, strong
    scaling across N devices.

NOTE: virtual CPU devices SHARE the host's cores, so these numbers
validate the mechanism (collectives compile + run + scale sanely), not ICI
bandwidth — real pod-slice numbers require hardware this environment does
not expose (one tunneled chip).  Run: python scripts/scaling_bench.py
"""
import json
import os
import sys
import time

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np                                           # noqa: E402

from zklc_tpu.parallel import sharded                        # noqa: E402
from zklc_tpu.field import gl2x32 as gl                      # noqa: E402


def time_fn(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_commit(n_dev: int, log_n: int = None, per_dev_batch: int = 4):
    log_n = log_n or int(os.environ.get('ZKLC_SCALING_LOGN', '10'))
    mesh = sharded.make_mesh(n_dev)
    step = sharded.batch_commit_step(mesh, log_n)
    rng = np.random.default_rng(0)
    vals = rng.integers(0, (1 << 64) - 2**32,
                        size=(per_dev_batch * n_dev, 1 << log_n),
                        dtype=np.uint64)
    return time_fn(step, gl.from_u64_np(vals))


def bench_a2a(n_dev: int, log_n: int = None):
    log_n = log_n or int(os.environ.get('ZKLC_SCALING_A2A_LOGN', '14'))
    mesh = sharded.make_mesh(n_dev, axis="ntt")
    fn = sharded.ntt_all_to_all(mesh, log_n)
    l1 = (log_n + 1) // 2
    n1, n2 = 1 << l1, 1 << (log_n - l1)
    rng = np.random.default_rng(1)
    vals = rng.integers(0, (1 << 64) - 2**32, size=(n2, n1), dtype=np.uint64)
    x = gl.from_u64_np(vals)
    return time_fn(fn, x[0], x[1])


def bench_prover_commit(n_dev: int, num_polys: int = 16,
                        log_n: int = None,
                        rate: int = 3, cap: int = 4):
    log_n = log_n or int(os.environ.get('ZKLC_SCALING_LOGN', '10'))
    """The PROVER's own commitment (sharded_commit — the path
    prover_tpu.prove(mesh=...) runs for wires/zs/quotient) at mesh size
    n_dev; strong scaling over a fixed poly batch."""
    mesh = sharded.make_mesh(n_dev)
    fn = sharded.sharded_commit(mesh, num_polys, log_n, rate, cap, False)
    rng = np.random.default_rng(2)
    vals = rng.integers(0, (1 << 64) - 2**32, size=(num_polys, 1 << log_n),
                        dtype=np.uint64)
    padded = sharded.pad_poly_batch(gl.from_u64_np(vals), n_dev)
    return time_fn(fn, padded)


def bench_rev_commit(n_dev: int, num_polys: int = 16, log_n: int = None,
                     rate: int = 3, cap: int = 4):
    log_n = log_n or int(os.environ.get('ZKLC_SCALING_LOGN', '10'))
    """The ROUND-4 no-replication commitment (sharded_prove.
    RevShardedCommitment: poly-sharded NTT -> all_to_all transpose ->
    domain-sharded bit-reversed LDE + local Merkle subtrees); strong
    scaling over a fixed poly batch, and the LDE never replicates."""
    from zklc_tpu.parallel import sharded_prove as SP
    mesh = sharded.make_mesh(n_dev, axis=SP.AXIS)
    rng = np.random.default_rng(3)
    vals = rng.integers(0, (1 << 64) - 2**32, size=(num_polys, 1 << log_n),
                        dtype=np.uint64)

    def run():
        return SP.RevShardedCommitment(mesh, vals, rate, cap).lde

    out = run()
    jax.block_until_ready(out)
    import time as _t
    t0 = _t.perf_counter()
    iters = 5
    for _ in range(iters):
        out = run()
    jax.block_until_ready(out)
    return (_t.perf_counter() - t0) / iters


def main():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = os.path.join(root, "proofs",
                       os.environ.get("ZKLC_SCALING_OUT",
                                      "scaling_efficiency.json"))
    n = len(jax.devices())
    t_c1 = bench_commit(1)
    t_cn = bench_commit(n)
    # weak scaling: ideal keeps time flat as work grows N-fold
    commit_eff = t_c1 / t_cn
    t_a1 = bench_a2a(1)
    t_an = bench_a2a(n)
    # strong scaling: ideal divides time by N
    a2a_eff = t_a1 / (t_an * n)
    t_p1 = bench_prover_commit(1)
    t_pn = bench_prover_commit(n)
    t_r1 = bench_rev_commit(1)
    t_rn = bench_rev_commit(n)
    result = {
        "devices": n,
        "host_cpus": os.cpu_count(),
        "commit_weak_scaling_efficiency": round(commit_eff, 3),
        "commit_ms_1dev": round(t_c1 * 1e3, 2),
        "commit_ms_ndev_nxwork": round(t_cn * 1e3, 2),
        "ntt_a2a_strong_scaling_efficiency": round(a2a_eff, 3),
        "ntt_a2a_ms_1dev": round(t_a1 * 1e3, 2),
        "ntt_a2a_ms_ndev": round(t_an * 1e3, 2),
        "prover_sharded_commit_strong_scaling_efficiency":
            round(t_p1 / (t_pn * n), 3),
        "prover_sharded_commit_ms_1dev": round(t_p1 * 1e3, 2),
        "prover_sharded_commit_ms_ndev": round(t_pn * 1e3, 2),
        "rev_sharded_commit_strong_scaling_efficiency":
            round(t_r1 / (t_rn * n), 3),
        "rev_sharded_commit_ms_1dev": round(t_r1 * 1e3, 2),
        "rev_sharded_commit_ms_ndev": round(t_rn * 1e3, 2),
        "log_n": int(os.environ.get('ZKLC_SCALING_LOGN', '10')),
        "note": "virtual CPU mesh shares host cores; mechanism check, "
                "not ICI bandwidth",
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
