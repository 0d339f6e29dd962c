"""Benchmark: Goldilocks 2^22 NTT on the real TPU chip (BASELINE.json
north-star kernel).  Prints ONE JSON line.

The reference has no published NTT number (SURVEY.md §6 — its plonky2 fork
times NTTs inside TimingTree but publishes nothing), so vs_baseline is
reported against a fixed reference point: 100 ms for a 2^22 NTT, a
representative single-socket CPU (rayon, 16-core) figure for Goldilocks
radix-2 NTT at this size.  vs_baseline > 1 means faster than that CPU
reference.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CPU_REFERENCE_MS = 100.0
LOG_N = 22


def main():
    import jax
    from zklc_tpu.field import gl2x32 as gl
    from zklc_tpu.ops import ntt as ntt_ops

    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
    lo = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
    import jax.numpy as jnp
    x = (jnp.asarray(hi), jnp.asarray(lo))

    # warm-up / compile
    out = ntt_ops.ntt(x, LOG_N)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt_ops.ntt(out, LOG_N)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1000.0

    print(json.dumps({
        "metric": "goldilocks_ntt_2^22",
        "value": round(ms, 3),
        "unit": "ms",
        "vs_baseline": round(CPU_REFERENCE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
