"""Benchmark on the real TPU chip — prints ONE JSON line.

Primary metric (BASELINE.json north star #1): ed25519 signature proofs per
second per chip, measured on the real batch-K EdDSA leaf circuit
(gadgets/eddsa.py, 2^16 rows x 234 wires with LogUp range lanes) proving
real validator signatures from the mainnet fixtures with the HBM-resident
TPU prover — the workload the NEAR pipeline spends its time in
(~100 signatures per block, SURVEY.md §3.1 hot loop #1).

Extra fields carry north star #2 (Goldilocks 2^22 NTT latency).

vs_baseline: the reference publishes no per-signature number (SURVEY.md §6)
and the image has no Rust toolchain to measure it, so the baseline is the
documented plonky2 wide_ecc ballpark of ~10 s/signature on a 16-core rayon
CPU (crypto/plonky2_ed25519/src/main.rs:25 harness) => 0.1 sig/s.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CPU_REFERENCE_SIG_PER_S = 0.1     # plonky2 wide_ecc ed25519, 16-core rayon
CPU_REFERENCE_NTT_MS = 100.0      # 2^22 radix-2 Goldilocks, 16-core rayon
LOG_N = 22


def bench_ntt():
    import jax
    import jax.numpy as jnp
    from zklc_tpu.ops import ntt as ntt_ops

    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
    lo = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
    x = (jnp.asarray(hi), jnp.asarray(lo))
    out = ntt_ops.ntt(x, LOG_N)          # warm-up / compile
    jax.block_until_ready(out)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt_ops.ntt(out, LOG_N)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def bench_ntt_subprocess(timeout_s: float = 900.0):
    """Run the 2^22 NTT bench in its own process, bounded by a timeout.

    The TPU tunnel occasionally wedges on a single oversized transfer; the
    flagship sig/s metric must not be hostage to it.  The child holds the
    device exclusively while it runs (single-client tunnel discipline), so
    the parent only initializes the TPU afterwards — killing a wedged child
    frees the tunnel (observed behavior)."""
    import subprocess
    import sys as _sys
    code = ("import sys, json; sys.path.insert(0, '.');"
            "import bench; print(json.dumps(bench.bench_ntt()))")
    try:
        res = subprocess.run([_sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s, cwd=".")
        return float(res.stdout.strip().splitlines()[-1])
    except Exception:
        return None


def bench_ed25519():
    import os.path as p
    from zklc_tpu.near import utils as U, signatures as S

    eps = U.ordered_epochs()
    _, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3])
    validators = U.load_validators(
        p.join(U.epoch_dir(eps[-1]), "validators.json"))
    b_i, b_next = blocks[4], blocks[3]
    msg = S.generate_signed_message(b_i.height, b_next.height, b_i.hash)
    chk = S.check_approvals(msg, b_next.approvals, validators)
    k = S.BATCH_K
    sig_pks = []
    for idx in chk.valid_indices[:k]:
        sig = b_next.approvals[idx]
        sig_pks.append((sig[1:] if len(sig) == 65 else sig,
                        validators[idx].public_key[1:]))

    # warm-up: circuit build + witness tape + kernel cache
    S.prove_signature_batch(msg, sig_pks)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        S.prove_signature_batch(msg, sig_pks)
    dt = (time.perf_counter() - t0) / iters
    return len(sig_pks) / dt, dt


def bench_ed25519_subprocess(timeout_s: float = 2100.0, attempts: int = 2):
    """Primary metric in a bounded, RETRIED subprocess.

    Observed tunnel failure mode: a single transfer wedges the client
    forever, but killing the client frees the tunnel — so a timeout + kill
    + retry harness self-heals where an in-process run would hang to the
    driver's deadline.  State that matters (XLA compile cache, witness
    tapes) is on disk, so a retry resumes warm."""
    import subprocess
    import sys as _sys
    code = ("import sys, json; sys.path.insert(0, '.'); import bench; "
            "s, l = bench.bench_ed25519(); print('RES'+json.dumps([s, l]))")
    for _ in range(attempts):
        try:
            res = subprocess.run([_sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=timeout_s, cwd=".")
            for line in reversed(res.stdout.strip().splitlines()):
                if line.startswith("RES"):
                    s, l = json.loads(line[3:])
                    return float(s), float(l)
        except subprocess.TimeoutExpired:
            continue
    return None, None


def main():
    # Every measurement runs in a bounded subprocess (single-client tunnel
    # discipline: each child holds the device alone; the parent never
    # initializes the TPU).  A wedged child is killed and retried.
    ntt_ms = bench_ntt_subprocess()
    sig_per_s, leaf_s = bench_ed25519_subprocess()
    if sig_per_s is None:
        # last resort: in-process (previous behavior)
        sig_per_s, leaf_s = bench_ed25519()
    extra = {"eddsa_batch4_leaf_s": round(leaf_s, 3)}
    if ntt_ms is not None:
        extra["goldilocks_ntt_2^22_ms"] = round(ntt_ms, 3)
        extra["ntt_vs_cpu_reference"] = round(CPU_REFERENCE_NTT_MS / ntt_ms,
                                              3)
    print(json.dumps({
        "metric": "ed25519_sig_proofs_per_sec_per_chip",
        "value": round(sig_per_s, 4),
        "unit": "sig/s",
        "vs_baseline": round(sig_per_s / CPU_REFERENCE_SIG_PER_S, 3),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
