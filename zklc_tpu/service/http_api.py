"""HTTP surface for the proof pipeline: backend/src/server.ts equivalent.

Routes (mirroring the reference's express server + controllers):
  POST /generate-proof   {"hash": <b58 block hash>}
                         -> 200 {"status": "IN-PROCESSING"|...} (dedupe like
                            controllers/proof.controller.ts:8-48; proving
                            runs on a worker thread, the queue-decoupled
                            shape of sendProvingTaskToQueue)
  GET  /proof-status?hash=<b58>
                         -> proof.controller.ts:50 getProofStatus
  GET  /health           -> {"ok": true}  (server.ts:43, web-api.go:26)
  GET  /ready            -> active-request gauge (risc0 proving_server.rs:33)
  GET  /metrics          -> Prometheus text format (service.metrics)

The NEAR-RPC edge is a pluggable `fetch_task_fn(block_hash) ->
(epoch_blocks, blocks, validators, mode, validators_n_1)` — this
environment has no egress; near/utils.py fixture loaders provide the
offline implementation.
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from .metrics import DEFAULT as METRICS
from .orchestrator import Orchestrator, ProofStatus


class ProofApi:
    def __init__(self, orchestrator: Orchestrator, fetch_task_fn,
                 metrics=METRICS):
        self.orch = orchestrator
        self.fetch_task = fetch_task_fn
        self.metrics = metrics
        # active worker threads keyed by block hash; pruned on completion
        # so a long-running server doesn't leak Thread objects (ADVICE r2)
        self._threads: dict[str, threading.Thread] = {}
        self._threads_lock = threading.Lock()

    # -- handlers ------------------------------------------------------------
    def generate_proof(self, block_hash: str) -> tuple[int, dict]:
        try:
            task = self.fetch_task(block_hash)
        except Exception as e:
            return 404, {"error": f"task fetch failed: {e}"}
        if task is None:
            return 404, {"error": "unknown block"}
        # Atomic claim BEFORE spawning the worker: concurrent duplicate
        # POSTs must not both launch ~10-minute proving runs (ADVICE r2).
        claimed, row = self.orch.store.claim(block_hash)
        if not claimed:
            self.metrics.inc("proof_requests_deduped_total")
            return 200, row
        epoch_blocks, blocks, validators, mode, vn1 = task
        self.metrics.inc("proof_requests_total")

        def run():
            with self.metrics.timer("prove_block"):
                try:
                    self.orch.generate_proof(epoch_blocks, blocks, validators,
                                             mode=mode, validators_n_1=vn1,
                                             claimed=True)
                    self.metrics.inc("proofs_done_total")
                except Exception:
                    self.metrics.inc("proofs_error_total")
                finally:
                    with self._threads_lock:
                        self._threads.pop(block_hash, None)

        t = threading.Thread(target=run, daemon=True)
        with self._threads_lock:
            self._threads[block_hash] = t
        t.start()
        return 200, {"status": ProofStatus.IN_PROCESSING, "hash": block_hash}

    def proof_status(self, block_hash: str) -> tuple[int, dict]:
        return 200, self.orch.get_proof_status(block_hash)

    def join(self, timeout=None):
        with self._threads_lock:
            threads = list(self._threads.values())
        for t in threads:
            t.join(timeout)


def make_server(api: ProofApi, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):      # quiet; metrics carry the signal
            pass

        def _send(self, code: int, body, ctype="application/json"):
            data = (body if isinstance(body, (bytes, str))
                    else json.dumps(body))
            if isinstance(data, str):
                data = data.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            u = urlparse(self.path)
            if u.path == "/health":
                self._send(200, {"ok": True})
            elif u.path == "/ready":
                g = api.metrics.snapshot()["gauges"]
                self._send(200, {"active": g.get("prove_block_active", 0)})
            elif u.path == "/metrics":
                self._send(200, api.metrics.render_prometheus(),
                           ctype="text/plain; version=0.0.4")
            elif u.path == "/proof-status":
                q = parse_qs(u.query)
                h = (q.get("hash") or [""])[0]
                if not h:
                    self._send(400, {"error": "missing hash"})
                else:
                    self._send(*api.proof_status(h))
            else:
                self._send(404, {"error": "not found"})

        def do_POST(self):
            u = urlparse(self.path)
            if u.path != "/generate-proof":
                self._send(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                payload = json.loads(self.rfile.read(n) or b"{}")
                h = payload["hash"]
            except Exception as e:
                self._send(400, {"error": f"bad request: {e}"})
                return
            self._send(*api.generate_proof(h))

    return ThreadingHTTPServer((host, port), Handler)


def serve_forever(api: ProofApi, host="0.0.0.0", port=9024):
    """server.ts:11-30 boot (port 9024 matches the reference)."""
    srv = make_server(api, host, port)
    srv.serve_forever()


def fixture_fetch_task(data_dir: str = "/root/reference/data"):
    """fetch_task_fn resolving block hashes against the epoch fixtures —
    the offline stand-in for the near-helper.ts RPC task builders."""
    from ..near import utils as U
    from ..near.types import b58encode

    def fetch(block_hash: str):
        eps = U.ordered_epochs(data_dir)
        epoch_blocks, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3],
                                            data_dir=data_dir)
        if b58encode(blocks[4].hash) != block_hash:
            return None
        import os.path as p
        validators = U.load_validators(
            p.join(U.epoch_dir(eps[-1], data_dir), "validators.json"))
        return epoch_blocks, blocks[:5], validators, "random", None
    return fetch


def main(argv=None):  # pragma: no cover — CLI for real deployments
    import argparse
    ap = argparse.ArgumentParser(description="zklc proof HTTP service")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=9024)
    ap.add_argument("--proofs-dir", default="proofs")
    ap.add_argument("--data-dir", default="/root/reference/data",
                    help="epoch fixture dir for the offline task fetcher")
    ap.add_argument("--backend", default="plonk",
                    choices=["plonk", "statement"])
    ap.add_argument("--dev", action="store_true")
    args = ap.parse_args(argv)
    orch = Orchestrator(proofs_dir=args.proofs_dir, dev_mode=args.dev,
                        backend=args.backend)
    api = ProofApi(orch, fixture_fetch_task(args.data_dir))
    print(f"proof service on {args.host}:{args.port} "
          f"(backend={args.backend})", flush=True)
    serve_forever(api, args.host, args.port)


if __name__ == "__main__":  # pragma: no cover
    main()
