"""Profile the 2^22 Goldilocks NTT phases on the real chip (VERDICT #8).

Times the full four-step ntt_mm against its components (single 2^11 digit
DFT batch, twiddle mul, limb-sum reduction) to locate the gap to
speed-of-light, and prints a one-paragraph accounting.

Usage: python scripts/ntt_profile.py [log_n]
"""
import os.path as p
import sys
import time

sys.path.insert(0, p.dirname(p.dirname(p.abspath(__file__))))

import jax
import numpy as np

from zklc_tpu.field import gl2x32 as gl
from zklc_tpu.ops import ntt_mm as NT


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def main():
    log_n = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = gl.from_u64_np(rng.integers(0, 2**63, n, dtype=np.uint64))
    x = jax.device_put(x)

    full = timeit(lambda v: NT.ntt_mm(v, log_n), x)
    print(f"ntt_mm 2^{log_n}: {full*1e3:.2f} ms")

    l1 = (log_n + 1) // 2
    l2 = log_n - l1
    n1, n2 = 1 << l1, 1 << l2
    xm = (x[0].reshape(n2, n1), x[1].reshape(n2, n1))

    inner = jax.jit(lambda v: NT._dft_matmul(
        (v[0].swapaxes(-1, -2), v[1].swapaxes(-1, -2)), l2, False))
    t_inner = timeit(inner, xm)
    print(f"  inner DFT  (2^{l2} x {n1} cols): {t_inner*1e3:.2f} ms")

    th, tl = NT._twiddle_planes(l1, l2, False)
    tw = jax.jit(lambda v: gl.mul(v, (jax.numpy.asarray(th),
                                      jax.numpy.asarray(tl))))
    a = (xm[0].reshape(n1, n2).swapaxes(-1, -2),
         xm[1].reshape(n1, n2).swapaxes(-1, -2))
    a = (a[0].reshape(n2, n1), a[1].reshape(n2, n1))
    t_tw = timeit(tw, a)
    print(f"  twiddle mul: {t_tw*1e3:.2f} ms")

    outer = jax.jit(lambda v: NT._dft_matmul(v, l1, False))
    t_outer = timeit(outer, a)
    print(f"  outer DFT  (2^{l1} x {n2} cols): {t_outer*1e3:.2f} ms")

    # MXU-only probe: one digit-plane matmul at the DFT shape
    import jax.numpy as jnp
    Wd = jnp.asarray(NT._dft_tables(l1, False)[0])       # (9, n1, n1)
    xb = jnp.asarray(
        rng.integers(-128, 127, (n1, 8 * n2), dtype=np.int8))

    def planes(w, v):
        return sum(jax.lax.dot(w[i], v, preferred_element_type=jnp.int32)
                   for i in range(9))
    t_mm = timeit(jax.jit(planes), Wd, xb)
    macs = 9 * n1 * n1 * 8 * n2
    print(f"  9-plane int8 matmul probe: {t_mm*1e3:.2f} ms "
          f"({macs/t_mm/1e12:.1f} Tmac/s)")
    print(f"  accounting: inner+twiddle+outer = "
          f"{(t_inner+t_tw+t_outer)*1e3:.2f} ms vs full {full*1e3:.2f} ms; "
          f"two DFT stages at pure-matmul speed would be "
          f"{2*2*t_mm*1e3:.2f} ms")


if __name__ == "__main__":
    main()
