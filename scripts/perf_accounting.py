"""Per-kernel speed-of-light / MFU accounting on the real chip.

BASELINE.json's north star asks for roofline accounting of the hot
kernels, not just wall times.  For each kernel this script measures the
warm latency and derives the speed-of-light bound from chip peaks:

  TPU v5e (jax reports "TPU v5 lite"): 394 TOPS int8 MXU,
  197 TFLOP/s bf16, 16 GiB HBM @ 819 GB/s.

  * NTT 2^22 (ops/ntt_mm.py four-step): the compute is int8 limb
    matmuls — 2 DFT stages of size m=2^11 over c=2^11 columns, each
    9 matmuls of (m,m)i8 @ (m,8c)i8->i32, so
        MACs = 2 stages * 9 * m^2 * 8c = 144 * m^2 * c
    plus twiddle/elementwise traffic; SOL = max(MACs/394e12 ops,
    bytes/819e9).
  * Poseidon-Merkle commit (ops/poseidon_tpu.py over an LDE): the hash
    is VPU-bound u32 math; the floor reported here is the HBM bound of
    reading the LDE once — the distance above it is vector-unit cost,
    reported as achieved bytes/s.
  * EdDSA batch-4 leaf prove (the pipeline's hot loop): end-to-end warm
    seconds per proof; no closed-form SOL exists for a full prover, so
    the table reports the NTT+hash fractions it decomposes into.

Writes proofs/perf_accounting_r05.json.  Run with the chip free.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_INT8_OPS = 394e12          # TPU v5e MXU int8
PEAK_BF16_FLOPS = 197e12
HBM_BPS = 819e9

OUT = os.path.join("proofs", "perf_accounting_r05.json")


def measure(fn, iters=10):
    import jax
    out = fn()                       # warm-up / compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def ntt_entry(log_n=22):
    import jax.numpy as jnp
    from zklc_tpu.ops import ntt as ntt_ops
    n = 1 << log_n
    rng = np.random.default_rng(0)
    x = (jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32)),
         jnp.asarray(rng.integers(0, 1 << 32, n, dtype=np.uint32)))
    dt = measure(lambda: ntt_ops.ntt(x, log_n))
    m = 1 << (log_n // 2)            # four-step stage size
    c = n // m
    macs = 2 * 9 * m * m * 8 * c
    bytes_moved = 2 * 8 * n * 6      # hi/lo u32 pairs, ~6 passes (transpose
    #                                  + 2 stages + twiddle), lower bound
    sol_compute = macs / PEAK_INT8_OPS
    sol_mem = bytes_moved / HBM_BPS
    sol = max(sol_compute, sol_mem)
    return {
        "kernel": f"ntt_2^{log_n}", "measured_s": round(dt, 6),
        "macs_int8": macs, "bytes_moved_lower_bound": bytes_moved,
        "sol_compute_s": round(sol_compute, 6),
        "sol_memory_s": round(sol_mem, 6),
        "sol_s": round(sol, 6),
        "efficiency_vs_sol": round(sol / dt, 4),
        "achieved_int8_tops": round(macs / dt / 1e12, 2),
    }


def commit_entry(log_n=16, num_polys=135, rate_bits=3, cap_height=4):
    """The wires-commitment shape of the EdDSA leaf circuit."""
    import jax
    from zklc_tpu.plonk import prover_tpu as PT
    rng = np.random.default_rng(1)
    wires = rng.integers(0, (1 << 63), size=(num_polys, 1 << log_n),
                         dtype=np.uint64)

    def run():
        comm = PT.DeviceCommitment(wires, rate_bits, cap_height)
        jax.block_until_ready(comm.lde)
        return comm.cap_u64
    t0 = time.perf_counter()
    run()
    compile_s = time.perf_counter() - t0
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    lde_bytes = (1 << (log_n + rate_bits)) * num_polys * 8
    sol_mem = 3 * lde_bytes / HBM_BPS     # write LDE, read for hash, tree
    return {
        "kernel": f"poseidon_merkle_commit_2^{log_n}x{num_polys}"
                  f"_rate{rate_bits}",
        "measured_s": round(dt, 6), "first_call_s": round(compile_s, 3),
        "lde_bytes": lde_bytes,
        "sol_memory_s": round(sol_mem, 6),
        "efficiency_vs_hbm_floor": round(sol_mem / dt, 4),
        "achieved_gbps": round(3 * lde_bytes / dt / 1e9, 1),
        "note": "floor counts HBM traffic only; poseidon itself is "
                "VPU u32 math above the floor",
    }


def eddsa_entry():
    import os.path as p
    from zklc_tpu.near import utils as U, signatures as S
    eps = U.ordered_epochs()
    _, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3])
    validators = U.load_validators(
        p.join(U.epoch_dir(eps[-1]), "validators.json"))
    b_i, b_next = blocks[4], blocks[3]
    msg = S.generate_signed_message(b_i.height, b_next.height, b_i.hash)
    chk = S.check_approvals(msg, b_next.approvals, validators)
    sig_pks = []
    for idx in chk.valid_indices[:S.BATCH_K]:
        sig = b_next.approvals[idx]
        sig_pks.append((sig[1:] if len(sig) == 65 else sig,
                        validators[idx].public_key[1:]))
    t0 = time.perf_counter()
    S.prove_signature_batch(msg, sig_pks)
    first = time.perf_counter() - t0
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        S.prove_signature_batch(msg, sig_pks)
    dt = (time.perf_counter() - t0) / iters
    return {
        "kernel": f"eddsa_batch{len(sig_pks)}_leaf_prove",
        "measured_s": round(dt, 3), "first_call_s": round(first, 3),
        "sig_per_s": round(len(sig_pks) / dt, 4),
        "note": "end-to-end prove (witness tape + commits + quotient + "
                "FRI); decomposes into the ntt/commit rows above",
    }


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of entries to run (ntt,commit,eddsa); "
                         "eddsa is a full leaf prove (~export cost cold) — "
                         "skip it in short chip windows")
    flags = ap.parse_args()
    picked = set(flags.only.split(",")) if flags.only else None
    t_start = time.time()
    entries = []
    for name, fn in (("ntt", ntt_entry), ("commit", commit_entry),
                     ("eddsa", eddsa_entry)):
        if picked is not None and name not in picked:
            continue
        try:
            e = fn()
            entries.append(e)
            print(json.dumps(e), flush=True)
        except Exception as ex:  # noqa: BLE001
            entries.append({"kernel": name, "error": repr(ex)})
            print(f"{name} failed: {ex!r}", flush=True)
    if picked is not None and os.path.exists(OUT):
        # partial run: merge over the prior artifact instead of clobbering
        try:
            with open(OUT) as f:
                prior = {e.get("kernel", "?").split("_")[0]: e
                         for e in json.load(f).get("kernels", [])}
        except Exception:  # noqa: BLE001
            prior = {}
        have = {e.get("kernel", "?").split("_")[0] for e in entries}
        entries += [e for k, e in prior.items() if k not in have]
    doc = {
        "chip": "TPU v5e (single chip via tunnel)",
        "peaks": {"int8_tops": PEAK_INT8_OPS, "bf16_flops": PEAK_BF16_FLOPS,
                  "hbm_bytes_per_s": HBM_BPS},
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "total_s": round(time.time() - t_start, 1),
        "kernels": entries,
    }
    os.makedirs("proofs", exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", OUT, flush=True)


if __name__ == "__main__":
    main()
