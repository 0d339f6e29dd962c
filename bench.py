"""Benchmark on the real TPU chip — cache-first, then live-streamed.

Primary metric (BASELINE.json north star #1): ed25519 signature proofs per
second per chip, measured on the real batch-K EdDSA leaf circuit
(gadgets/eddsa.py, 2^16 rows x 234 wires with LogUp range lanes) proving
real validator signatures from the mainnet fixtures with the HBM-resident
TPU prover — the workload the NEAR pipeline spends its time in
(~100 signatures per block, SURVEY.md §3.1 hot loop #1).

Driver-window-proofing (VERDICT r4 next #1) — this harness must produce a
parseable tail under ANY driver deadline, and a LIVE sig/s line whenever
the window allows:
  1. CACHE FIRST: every successful live measurement persists to
     proofs/bench_cache.json; on startup the cached lines are emitted
     within the first seconds, marked "quality": "cached" with the
     timestamp they were measured.  A driver kill at t=+10s still yields
     a parsed artifact.
  2. STREAMING PARENT: children are run via Popen and their stdout is
     read line-by-line; each RES line a child streams is re-emitted by
     the parent AS A METRIC LINE the moment it arrives.  In r3/r4 the
     parent only printed after subprocess.run() returned, so a mid-child
     driver kill erased everything — that failure mode is gone.
  3. The signature metric runs FIRST and its child streams a provisional
     number right after the warm-up prove.
  4. Cold-start is cut by the persistent circuit-build cache
     (near/circuit_cache.py) + the persistent XLA compile cache
     (runtime.py): a fresh process skips the Python circuit build.

vs_baseline honesty (VERDICT r4 next #7): the reference publishes NO
per-signature or NTT number (BASELINE.md:25-28 — "must be measured"), and
the image has no Rust toolchain to measure its TimingTree.  The
denominators below are therefore ESTIMATES, marked as such in every
emitted line via "baseline_quality": "estimate" + "baseline_basis".
"""
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")

# ESTIMATED baselines — the reference publishes neither number
# (BASELINE.md:25-28).  Basis strings are embedded in every emitted line.
CPU_REFERENCE_SIG_PER_S = 0.1     # ~10 s/sig: plonky2 wide-ecc ed25519 on a
SIG_BASELINE_BASIS = ("estimate; reference publishes no per-signature time "
                      "(BASELINE.md:25-28); ~10 s/sig ballpark for plonky2 "
                      "ed25519 on a 16-core rayon CPU "
                      "(crypto/plonky2_ed25519 harness class)")
CPU_REFERENCE_NTT_MS = 100.0
NTT_BASELINE_BASIS = ("estimate; reference publishes no NTT time "
                      "(BASELINE.md:25-28); ~100 ms ballpark for a 2^22 "
                      "radix-2 Goldilocks NTT on a 16-core rayon CPU")
LOG_N = 22
TOTAL_BUDGET_S = float(os.environ.get("ZKLC_BENCH_BUDGET_S", "2400"))
_DEADLINE = time.time() + TOTAL_BUDGET_S
CACHE_PATH = os.path.join("proofs", "bench_cache.json")


def _remaining() -> float:
    return _DEADLINE - time.time()


def emit(obj) -> None:
    print(json.dumps(obj), flush=True)


def _load_cache() -> dict:
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_cache(cache: dict) -> None:
    try:
        os.makedirs(os.path.dirname(CACHE_PATH), exist_ok=True)
        tmp = CACHE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, CACHE_PATH)
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        print(f"bench cache save failed: {e!r}", file=sys.stderr, flush=True)


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

    # warm-up: circuit build (disk-cached) + witness tape + kernel cache.
    # Its wall time upper-bounds the warm latency -> provisional number
    # streams out immediately in case the driver kills us mid-refinement.
    t0 = time.perf_counter()
    S.prove_signature_batch(msg, sig_pks)
    warm = time.perf_counter() - t0
    print("RES" + json.dumps([len(sig_pks) / warm, warm,
                              f"warmup-K{len(sig_pks)}"]), flush=True)

    iters = 0
    t0 = time.perf_counter()
    while iters < 3:
        S.prove_signature_batch(msg, sig_pks)
        iters += 1
        dt = (time.perf_counter() - t0) / iters
        print("RES" + json.dumps([len(sig_pks) / dt, dt,
                                  f"iter{iters}-K{len(sig_pks)}"]),
              flush=True)
        if time.perf_counter() - t_start > budget_s * 0.75:
            break


def child_selftest() -> None:
    """Test-only child: two RES lines with a pause between them, so the
    harness test can assert mid-child emission (test_bench_harness.py)."""
    print("RES" + json.dumps([1.0, 2.0, "early"]), flush=True)
    time.sleep(2)
    print("RES" + json.dumps([3.0, 4.0, "late"]), flush=True)


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

def _sig_line(sig_per_s, leaf_s, quality, measured_at=None):
    line = {"metric": "ed25519_sig_proofs_per_sec_per_chip",
            "value": round(sig_per_s, 4), "unit": "sig/s",
            "vs_baseline": round(sig_per_s / CPU_REFERENCE_SIG_PER_S, 3),
            "baseline_quality": "estimate",
            "baseline_basis": SIG_BASELINE_BASIS,
            "quality": quality}
    if leaf_s is not None:
        line["eddsa_leaf_s"] = round(leaf_s, 3)
    if measured_at is not None:
        line["measured_at"] = measured_at
    return line


def _ntt_line(ntt_ms, quality, measured_at=None):
    line = {"metric": "goldilocks_ntt_2^22_ms", "value": round(ntt_ms, 3),
            "unit": "ms",
            "vs_baseline": round(CPU_REFERENCE_NTT_MS / ntt_ms, 3),
            "baseline_quality": "estimate",
            "baseline_basis": NTT_BASELINE_BASIS,
            "quality": quality}
    if measured_at is not None:
        line["measured_at"] = measured_at
    return line


_current_child = None   # live Popen, killed by the SIGTERM finalizer


def stream_child(call: str, timeout_s: float, on_res, attempts: int = 2):
    """Run `bench.<call>` in a subprocess via Popen, parsing RES lines the
    instant they stream out; `on_res(payload)` is invoked per line so the
    parent can emit metric lines mid-child.  Returns the last payload."""
    code = ("import sys; sys.path.insert(0, '.'); "
            f"import bench; bench.{call}")
    best = None
    for att in range(attempts):
        if _remaining() < 30:
            break
        tmo = max(30.0, min(timeout_s, _remaining() - 10))
        t_end = time.time() + tmo
        try:
            # Reload AOT-cached kernel traces if present, but never PAY
            # export on a miss (~3-4x a plain trace): the child is
            # deadline-bound and a plain retrace (~10 min) beats an
            # export run (~55 min) inside any driver window.
            env = dict(os.environ, ZKLC_AOT_EXPORT="0")
            proc = subprocess.Popen([sys.executable, "-c", code],
                                    stdout=subprocess.PIPE,
                                    stderr=subprocess.PIPE,
                                    text=True, cwd=".", env=env)
            global _current_child
            _current_child = proc
        except Exception as e:  # noqa: BLE001
            print(f"bench child {call} attempt {att}: spawn {e!r}",
                  file=sys.stderr, flush=True)
            continue
        import selectors
        sel = selectors.DefaultSelector()
        sel.register(proc.stdout, selectors.EVENT_READ)
        timed_out = False
        try:
            while True:
                if time.time() > t_end:
                    timed_out = True
                    proc.kill()
                    break
                if not sel.select(timeout=1.0):
                    if proc.poll() is not None:
                        break
                    continue
                line = proc.stdout.readline()
                if not line:
                    break
                if line.startswith("RES"):
                    try:
                        payload = json.loads(line[3:])
                    except json.JSONDecodeError:
                        continue
                    best = payload
                    try:
                        on_res(payload)
                    except Exception as e:  # noqa: BLE001
                        print(f"on_res error: {e!r}", file=sys.stderr,
                              flush=True)
        finally:
            sel.close()
            try:
                proc.wait(timeout=10)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
        if best is not None:
            return best
        err = proc.stderr.read() if proc.stderr else ""
        why = f"timeout {tmo:.0f}s" if timed_out else f"rc={proc.returncode}"
        print(f"bench child {call} attempt {att}: {why} no RES; "
              f"stderr tail: {err[-800:]}", file=sys.stderr, flush=True)
    return best


_final_emitted = False


def _emit_final(live, cache, run_ts):
    """Combined line LAST (the driver records the tail).  Idempotent: also
    invoked from the SIGTERM finalizer, so a driver `timeout` kill still
    leaves a complete parseable tail instead of a mid-stream cut."""
    global _final_emitted
    if _final_emitted:
        return
    _final_emitted = True
    extra = {}
    sig = live["sig"] or (cache.get("sig") and
                          (cache["sig"]["sig_per_s"],
                           cache["sig"].get("leaf_s")))
    ntt_ms = live["ntt"] if live["ntt"] is not None else (
        cache.get("ntt", {}).get("ntt_ms"))
    if sig is not None and sig[1] is not None:
        extra["eddsa_leaf_s"] = round(sig[1], 3)
    if ntt_ms is not None:
        extra["goldilocks_ntt_2^22_ms"] = round(ntt_ms, 3)
        extra["ntt_vs_cpu_estimate"] = round(CPU_REFERENCE_NTT_MS / ntt_ms, 3)
    extra["sig_live"] = live["sig"] is not None
    extra["ntt_live"] = live["ntt"] is not None

    if sig is not None:
        sig_is_live = live["sig"] is not None
        line = _sig_line(sig[0], sig[1],
                         "live" if sig_is_live else "cached",
                         measured_at=run_ts if sig_is_live
                         else cache.get("sig", {}).get("measured_at"))
        line["extra"] = extra
        emit(line)
    elif ntt_ms is not None:
        extra["ed25519_sig_proofs_per_sec_per_chip"] = None
        ntt_is_live = live["ntt"] is not None
        line = _ntt_line(ntt_ms,
                         "live" if ntt_is_live else "cached",
                         measured_at=run_ts if ntt_is_live
                         else cache.get("ntt", {}).get("measured_at"))
        line["extra"] = extra
        emit(line)
    else:
        emit({"metric": "ed25519_sig_proofs_per_sec_per_chip", "value": None,
              "unit": "sig/s", "vs_baseline": None,
              "error": "no cached metrics and all bench children failed "
                       f"within budget {TOTAL_BUDGET_S:.0f}s"})


def main():
    run_ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    cache = _load_cache()

    # ---- 0. cached lines FIRST: a parseable tail within seconds --------
    have_cached_sig = have_cached_ntt = False
    c = cache.get("sig")
    if c:
        emit(_sig_line(c["sig_per_s"], c.get("leaf_s"), "cached",
                       measured_at=c.get("measured_at")))
        have_cached_sig = True
    c = cache.get("ntt")
    if c:
        emit(_ntt_line(c["ntt_ms"], "cached",
                       measured_at=c.get("measured_at")))
        have_cached_ntt = True

    live = {"sig": None, "ntt": None}

    # A driver-side `timeout` sends SIGTERM: flush the combined final line
    # (live-so-far falling back to cache) and exit cleanly instead of
    # dying mid-stream — BENCH_r04.json's empty-tail failure mode.
    def _on_term(signum, frame):  # noqa: ARG001
        if _current_child is not None:
            try:
                _current_child.kill()
            except Exception:  # noqa: BLE001
                pass
        _emit_final(live, cache, run_ts)
        sys.stdout.flush()
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # ---- 1. PRIMARY metric: live ed25519 sig proofs/s ------------------
    ntt_reserve = 240.0
    sig_budget = max(60.0, _remaining() - ntt_reserve)

    def on_sig(payload):
        sig_per_s, leaf_s = float(payload[0]), float(payload[1])
        q = payload[2] if len(payload) > 2 else "live"
        live["sig"] = (sig_per_s, leaf_s)
        emit(_sig_line(sig_per_s, leaf_s, f"live-{q}", measured_at=run_ts))
        cache["sig"] = {"sig_per_s": sig_per_s, "leaf_s": leaf_s,
                        "measured_at": run_ts, "quality": q}
        _save_cache(cache)

    stream_child(f"child_sig({sig_budget:.0f})", timeout_s=sig_budget,
                 on_res=on_sig, attempts=2)

    # ---- 2. Goldilocks 2^22 NTT latency (north star #2) ----------------
    def on_ntt(payload):
        ntt_ms = float(payload[0])
        q = payload[1] if len(payload) > 1 else "live"
        if q == "warmup":          # compile time, not steady-state: skip
            return
        live["ntt"] = ntt_ms
        emit(_ntt_line(ntt_ms, f"live-{q}", measured_at=run_ts))
        cache["ntt"] = {"ntt_ms": ntt_ms, "measured_at": run_ts,
                        "quality": q}
        _save_cache(cache)

    stream_child("child_ntt()", timeout_s=min(600.0, _remaining()),
                 on_res=on_ntt, attempts=2)

    _emit_final(live, cache, run_ts)
    _ = have_cached_sig, have_cached_ntt


if __name__ == "__main__":
    main()
