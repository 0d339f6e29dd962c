"""Benchmark on the real TPU chip — streams one JSON line per metric,
final combined line LAST.

Primary metric (BASELINE.json north star #1): ed25519 signature proofs per
second per chip, measured on the real batch-K EdDSA leaf circuit
(gadgets/eddsa.py, 2^16 rows x 234 wires with LogUp range lanes) proving
real validator signatures from the mainnet fixtures with the HBM-resident
TPU prover — the workload the NEAR pipeline spends its time in
(~100 signatures per block, SURVEY.md §3.1 hot loop #1).

Driver-window-proofing (VERDICT r3 weak #1 / next #1):
  * a TOTAL budget is read from ZKLC_BENCH_BUDGET_S (default 2400 s) and
    every child subprocess timeout is derived from the remaining budget —
    the harness finishes before any sane driver deadline;
  * the signature metric runs FIRST;
  * every metric prints as its own flushed JSON line the moment it lands
    (a driver kill can no longer erase finished measurements), and the
    combined line is printed last;
  * children stream provisional RES lines after the warm-up prove, so even
    a timed-out child yields a number (TimeoutExpired.stdout is parsed);
  * there is NO unbounded in-process fallback, and any child failure
    (crash or timeout) retries uniformly with stderr logged (ADVICE r3).

vs_baseline: the reference publishes no per-signature number (SURVEY.md §6)
and the image has no Rust toolchain to measure it, so the baseline is the
documented plonky2 wide_ecc ballpark of ~10 s/signature on a 16-core rayon
CPU (crypto/plonky2_ed25519/src/main.rs:25 harness) => 0.1 sig/s.
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

CPU_REFERENCE_SIG_PER_S = 0.1     # plonky2 wide_ecc ed25519, 16-core rayon
CPU_REFERENCE_NTT_MS = 100.0      # 2^22 radix-2 Goldilocks, 16-core rayon
LOG_N = 22
TOTAL_BUDGET_S = float(os.environ.get("ZKLC_BENCH_BUDGET_S", "2400"))
_DEADLINE = time.time() + TOTAL_BUDGET_S


def _remaining() -> float:
    return _DEADLINE - time.time()


def emit(obj) -> None:
    print(json.dumps(obj), flush=True)


# ---------------------------------------------------------------------------
# child bodies (run via `python -c` in their own process: the child holds
# the TPU tunnel alone — single-client discipline — and a wedged child is
# killed without poisoning the parent)
# ---------------------------------------------------------------------------

def child_sig(budget_s: float) -> None:
    """Prove the real EdDSA leaf; stream RES lines (last one wins)."""
    import os.path as p
    from zklc_tpu.near import utils as U, signatures as S

    t_start = time.perf_counter()
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

    # warm-up: circuit build + witness tape + kernel cache.  Its wall time
    # upper-bounds the warm latency -> provisional number streams out
    # immediately in case the driver kills us mid-refinement.
    t0 = time.perf_counter()
    S.prove_signature_batch(msg, sig_pks)
    warm = time.perf_counter() - t0
    print("RES" + json.dumps([len(sig_pks) / warm, warm, "warmup"]),
          flush=True)

    iters = 0
    t0 = time.perf_counter()
    while iters < 3:
        S.prove_signature_batch(msg, sig_pks)
        iters += 1
        dt = (time.perf_counter() - t0) / iters
        print("RES" + json.dumps([len(sig_pks) / dt, dt, f"iter{iters}"]),
              flush=True)
        if time.perf_counter() - t_start > budget_s * 0.75:
            break


def child_ntt() -> None:
    import jax
    import jax.numpy as jnp
    from zklc_tpu.ops import ntt as ntt_ops

    n = 1 << LOG_N
    rng = np.random.default_rng(0)
    hi = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
    lo = rng.integers(0, 0xFFFFFFFF, size=n, dtype=np.uint32)
    x = (jnp.asarray(hi), jnp.asarray(lo))
    t0 = time.perf_counter()
    out = ntt_ops.ntt(x, LOG_N)          # warm-up / compile
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    print("RES" + json.dumps([compile_s * 1000.0, "warmup"]), flush=True)
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = ntt_ops.ntt(out, LOG_N)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1000.0
    print("RES" + json.dumps([ms, f"avg{iters}"]), flush=True)


# ---------------------------------------------------------------------------
# parent-side harness
# ---------------------------------------------------------------------------

def _parse_res(text: str):
    """Last RES line of a child's stdout, or None."""
    if not text:
        return None
    for line in reversed(text.strip().splitlines()):
        if line.startswith("RES"):
            try:
                return json.loads(line[3:])
            except json.JSONDecodeError:
                continue
    return None


def run_child(call: str, timeout_s: float, attempts: int = 2):
    """Run `bench.<call>` in a subprocess; retry on ANY failure (crash or
    timeout, uniformly — ADVICE r3); salvage the last streamed RES line
    even from a timed-out child."""
    code = ("import sys; sys.path.insert(0, '.'); "
            f"import bench; bench.{call}")
    best = None
    for att in range(attempts):
        if _remaining() < 30:
            break
        tmo = max(30.0, min(timeout_s, _remaining() - 15))
        try:
            res = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True,
                                 timeout=tmo, cwd=".")
            got = _parse_res(res.stdout)
            if got is not None:
                return got
            print(f"bench child {call} attempt {att}: rc={res.returncode} "
                  f"no RES; stderr tail: {res.stderr[-800:]}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired as e:
            out = e.stdout if isinstance(e.stdout, str) else (
                e.stdout.decode(errors="replace") if e.stdout else "")
            got = _parse_res(out)
            if got is not None:
                best = got          # provisional from a killed child
            print(f"bench child {call} attempt {att}: timeout {tmo:.0f}s "
                  f"(salvaged={got is not None})",
                  file=sys.stderr, flush=True)
        except Exception as e:      # noqa: BLE001 — report and retry
            print(f"bench child {call} attempt {att}: {e!r}",
                  file=sys.stderr, flush=True)
    return best


def main():
    extra = {}
    sig_per_s = leaf_s = None
    ntt_ms = None

    # 1. PRIMARY metric first: ed25519 sig proofs/s (never yet captured)
    ntt_reserve = 300.0
    sig_budget = max(60.0, _remaining() - ntt_reserve)
    got = run_child(f"child_sig({sig_budget:.0f})",
                    timeout_s=sig_budget, attempts=2)
    if got is not None:
        sig_per_s, leaf_s = float(got[0]), float(got[1])
        emit({"metric": "ed25519_sig_proofs_per_sec_per_chip",
              "value": round(sig_per_s, 4), "unit": "sig/s",
              "vs_baseline": round(sig_per_s / CPU_REFERENCE_SIG_PER_S, 3),
              "quality": got[2] if len(got) > 2 else None})

    # 2. Goldilocks 2^22 NTT latency (north star #2)
    got = run_child("child_ntt()", timeout_s=min(600.0, _remaining()),
                    attempts=2)
    if got is not None:
        ntt_ms = float(got[0])
        emit({"metric": "goldilocks_ntt_2^22_ms", "value": round(ntt_ms, 3),
              "unit": "ms",
              "vs_baseline": round(CPU_REFERENCE_NTT_MS / ntt_ms, 3),
              "quality": got[1] if len(got) > 1 else None})

    # 3. combined line LAST (the driver records the tail)
    if leaf_s is not None:
        extra["eddsa_batch4_leaf_s"] = round(leaf_s, 3)
    if ntt_ms is not None:
        extra["goldilocks_ntt_2^22_ms"] = round(ntt_ms, 3)
        extra["ntt_vs_cpu_reference"] = round(CPU_REFERENCE_NTT_MS / ntt_ms,
                                              3)
    if sig_per_s is not None:
        emit({"metric": "ed25519_sig_proofs_per_sec_per_chip",
              "value": round(sig_per_s, 4), "unit": "sig/s",
              "vs_baseline": round(sig_per_s / CPU_REFERENCE_SIG_PER_S, 3),
              "extra": extra})
    elif ntt_ms is not None:
        # explicit null for the missing primary, not a silent omission
        extra["ed25519_sig_proofs_per_sec_per_chip"] = None
        emit({"metric": "goldilocks_ntt_2^22_ms", "value": round(ntt_ms, 3),
              "unit": "ms",
              "vs_baseline": round(CPU_REFERENCE_NTT_MS / ntt_ms, 3),
              "extra": extra})
    else:
        emit({"metric": "ed25519_sig_proofs_per_sec_per_chip", "value": None,
              "unit": "sig/s", "vs_baseline": None,
              "error": "all bench children failed within budget "
                       f"{TOTAL_BUDGET_S:.0f}s"})


if __name__ == "__main__":
    main()
