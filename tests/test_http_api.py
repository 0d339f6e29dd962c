"""HTTP service surface tests (backend/src/server.ts + controllers).

Uses a stub prover so the tests exercise routing, dedupe, the status
machine, async dispatch, and metrics — the reference backend itself has no
tests; this follows its observable behavior (proof.controller.ts:8-80).
"""
import json
import threading
import time
import urllib.request

import pytest

from zklc_tpu.service.http_api import ProofApi, make_server
from zklc_tpu.service.metrics import Metrics
from zklc_tpu.service.orchestrator import Orchestrator, ProofStatus, StatusStore

pytestmark = pytest.mark.smoke



class StubOrchestrator(Orchestrator):
    """Orchestrator with the proving edge replaced (RISC0_DEV_MODE shape)."""
    def __init__(self, tmp, fail=False, delay=0.0):
        super().__init__(proofs_dir=str(tmp))
        self.fail = fail
        self.delay = delay

    def generate_proof(self, epoch_blocks, blocks, validators,
                       mode="random", validators_n_1=None, wrap=None,
                       claimed=False):
        h = blocks[0]
        self.store.set(h, status=ProofStatus.IN_PROCESSING)
        time.sleep(self.delay)
        if self.fail:
            self.store.set(h, status=ProofStatus.ERROR, error="boom")
            raise RuntimeError("boom")
        self.store.set(h, status=ProofStatus.DONE, artifacts=f"{mode}/{h}")
        return self.store.get(h)


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return r.status, json.loads(r.read())


@pytest.fixture()
def server(tmp_path):
    orch = StubOrchestrator(tmp_path)

    def fetch(block_hash):
        if block_hash == "unknown":
            return None
        return ([], [block_hash], [], "random", None)

    api = ProofApi(orch, fetch, metrics=Metrics())
    srv = make_server(api, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    yield base, api
    srv.shutdown()


def test_health_ready_metrics(server):
    base, _ = server
    assert _get(base + "/health") == (200, {"ok": True})
    code, body = _get(base + "/ready")
    assert code == 200 and body["active"] == 0
    with urllib.request.urlopen(base + "/metrics", timeout=5) as r:
        assert r.status == 200
        assert "text/plain" in r.headers["Content-Type"]


def test_generate_proof_lifecycle_and_dedupe(server):
    base, api = server
    code, body = _post(base + "/generate-proof", {"hash": "h1"})
    assert code == 200 and body["status"] == ProofStatus.IN_PROCESSING
    api.join(timeout=10)
    code, body = _get(base + "/proof-status?hash=h1")
    assert code == 200 and body["status"] == ProofStatus.DONE
    assert body["artifacts"] == "random/h1"
    # dedupe: second request returns the DONE row, no new thread
    n = len(api._threads)
    code, body = _post(base + "/generate-proof", {"hash": "h1"})
    assert code == 200 and body["status"] == ProofStatus.DONE
    assert len(api._threads) == n
    snap = api.metrics.snapshot()["counters"]
    assert snap["proof_requests_total"] == 1
    assert snap["proof_requests_deduped_total"] == 1
    assert snap["proofs_done_total"] == 1


def test_unknown_block_and_bad_requests(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/generate-proof", {"hash": "unknown"})
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(base + "/generate-proof", {})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base + "/proof-status")
    assert e.value.code == 400
    code, body = _get(base + "/proof-status?hash=nope")
    assert body["status"] == "NOT-FOUND"


def test_error_path_records_status(tmp_path):
    orch = StubOrchestrator(tmp_path, fail=True)
    api = ProofApi(orch, lambda h: ([], [h], [], "random", None),
                   metrics=Metrics())
    code, _ = api.generate_proof("bad1")
    assert code == 200
    api.join(timeout=10)
    assert orch.get_proof_status("bad1")["status"] == ProofStatus.ERROR
    assert api.metrics.snapshot()["counters"]["proofs_error_total"] == 1
