"""bench.py parent-side harness: cache-first emission and the streaming
child protocol (RES lines re-emitted the moment they arrive) — the
driver-window-proofing mechanics of VERDICT r4 next #1."""
import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.smoke
ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_cache_first_lines_emit_within_seconds():
    """With a tiny budget the children never run; the cached metrics must
    still produce a parseable final line."""
    env = dict(os.environ, ZKLC_BENCH_BUDGET_S="3")
    r = subprocess.run([sys.executable, "bench.py"], capture_output=True,
                       text=True, cwd=ROOT, env=env, timeout=120)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert lines, r.stderr[-500:]
    first, last = json.loads(lines[0]), json.loads(lines[-1])
    assert first["quality"] == "cached"
    assert last["metric"] == "ed25519_sig_proofs_per_sec_per_chip"
    assert last["baseline_quality"] == "estimate"
    assert "baseline_basis" in last


def test_stream_child_emits_mid_child(monkeypatch):
    """A RES line must reach on_res BEFORE the child exits."""
    sys.path.insert(0, ROOT)
    import bench
    monkeypatch.setattr(bench, "_DEADLINE", bench.time.time() + 300)
    import time as _t
    got, stamps = [], []

    def on_res(payload):
        got.append(payload)
        stamps.append(_t.time())

    best = bench.stream_child("child_selftest()", timeout_s=30,
                              on_res=on_res, attempts=1)
    assert [p[2] for p in got] == ["early", "late"]
    assert best[2] == "late"
    # the first RES arrived while the child was still sleeping (>=2s
    # before the second) — the r3/r4 harness only surfaced results after
    # the child exited
    assert stamps[1] - stamps[0] >= 1.5
