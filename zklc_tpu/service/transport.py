"""Cross-process work-queue transport: the NATS JetStream equivalent.

The reference's distributed backend is NATS JetStream work-queues crossing
machine boundaries with at-least-once delivery and durable streams
(docker-compose.yml services `nats --jetstream`; SURVEY.md §2.7;
signatures.rs:144-274 publishes `InputTask` / folds `OutputTask`).  The
in-process `service/queue.py` covers single-host fan-out; this module is the
multi-host seam: a small TCP broker speaking line-delimited JSON with

  * subjects (work queues) holding byte payloads,
  * at-least-once delivery: messages must be ACKed; unacked messages
    redeliver after a visibility timeout (worker death != lost task — the
    liveness hole of signatures.rs:218-222 fixed at the transport layer),
  * durability: an append-only journal per broker; a restarted broker
    replays it and unacked messages survive (JetStream file store
    semantics).

Wire protocol (one JSON object per line, UTF-8):
  client->broker: {"op":"pub","subject":s,"data":b64}
                  {"op":"sub","subject":s}           (pull one message)
                  {"op":"ack","id":n}
                  {"op":"ping"}
  broker->client: {"op":"msg","id":n,"subject":s,"data":b64} | {"op":"none"}
                  {"op":"ok"} | {"op":"pong"}

Workers PULL (subscribe returns one message or none) — the consumer-group
semantics of a JetStream work queue, without server-push bookkeeping.
"""
from __future__ import annotations

import base64
import json
import os
import socket
import socketserver
import threading
import time


class Broker:
    """Durable work-queue broker over TCP."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 journal_path: str | None = None,
                 visibility_timeout_s: float = 30.0):
        self._lock = threading.Lock()
        self._queues: dict[str, list[int]] = {}       # subject -> msg ids
        self._msgs: dict[int, tuple[str, bytes]] = {}  # id -> (subject, data)
        self._inflight: dict[int, float] = {}          # id -> deadline
        self._next_id = 1
        self._journal_path = journal_path
        self._journal = None
        self.visibility_timeout_s = visibility_timeout_s
        if journal_path:
            self._replay_journal(journal_path)
            self._compact_journal(journal_path)
            self._journal = open(journal_path, "a", encoding="utf-8")

        broker = self

        class Handler(socketserver.StreamRequestHandler):
            def handle(self):
                for line in self.rfile:
                    try:
                        req = json.loads(line)
                    except ValueError:
                        break
                    resp = broker._handle(req)
                    self.wfile.write(
                        (json.dumps(resp) + "\n").encode())
                    self.wfile.flush()

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.host, self.port = self._server.server_address
        self._thread = threading.Thread(target=self._server.serve_forever,
                                        daemon=True)
        self._thread.start()

    # -- journal ---------------------------------------------------------

    def _replay_journal(self, path: str):
        if not os.path.exists(path):
            return
        acked = set()
        events = []
        with open(path, encoding="utf-8") as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue               # torn tail write
                events.append(ev)
                if ev["t"] == "ack":
                    acked.add(ev["id"])
        for ev in events:
            if ev["t"] == "put" and ev["id"] not in acked:
                mid = ev["id"]
                self._msgs[mid] = (ev["subject"],
                                   base64.b64decode(ev["data"]))
                self._queues.setdefault(ev["subject"], []).append(mid)
                self._next_id = max(self._next_id, mid + 1)
            elif ev["t"] == "put":
                self._next_id = max(self._next_id, ev["id"] + 1)

    def _compact_journal(self, path: str):
        """Rewrite the journal keeping only unacked puts (the state just
        rebuilt by replay).  Without this every restart replays the full
        history of acked messages and the file grows unboundedly
        (ADVICE r3)."""
        tmp = path + ".compact"
        with open(tmp, "w", encoding="utf-8") as f:
            for subject, ids in self._queues.items():
                for mid in ids:
                    f.write(json.dumps({
                        "t": "put", "id": mid, "subject": subject,
                        "data": base64.b64encode(
                            self._msgs[mid][1]).decode()}) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def _log(self, ev: dict):
        if self._journal is not None:
            self._journal.write(json.dumps(ev) + "\n")
            self._journal.flush()
            # acked-to-publisher durability: a host crash after the OK
            # response must not lose the message (JetStream file-store
            # semantics the module docstring promises; ADVICE r3)
            os.fsync(self._journal.fileno())

    # -- operations ------------------------------------------------------

    def _requeue_expired(self, now: float):
        expired = [mid for mid, dl in self._inflight.items() if dl <= now]
        for mid in expired:
            del self._inflight[mid]
            subject = self._msgs[mid][0]
            self._queues.setdefault(subject, []).append(mid)

    def _handle(self, req: dict) -> dict:
        op = req.get("op")
        if op == "ping":
            return {"op": "pong"}
        with self._lock:
            now = time.monotonic()
            self._requeue_expired(now)
            if op == "pub":
                mid = self._next_id
                self._next_id += 1
                data = req["data"]
                self._msgs[mid] = (req["subject"], base64.b64decode(data))
                self._queues.setdefault(req["subject"], []).append(mid)
                self._log({"t": "put", "id": mid, "subject": req["subject"],
                           "data": data})
                return {"op": "ok", "id": mid}
            if op == "sub":
                q = self._queues.get(req["subject"]) or []
                if not q:
                    return {"op": "none"}
                mid = q.pop(0)
                self._inflight[mid] = now + self.visibility_timeout_s
                subject, data = self._msgs[mid]
                return {"op": "msg", "id": mid, "subject": subject,
                        "data": base64.b64encode(data).decode()}
            if op == "ack":
                mid = int(req["id"])
                self._inflight.pop(mid, None)
                if mid in self._msgs:
                    del self._msgs[mid]
                    self._log({"t": "ack", "id": mid})
                return {"op": "ok"}
        return {"op": "error", "reason": f"bad op {op!r}"}

    def close(self):
        self._server.shutdown()
        self._server.server_close()
        if self._journal is not None:
            self._journal.close()


class QueueClient:
    """Blocking client for Broker — usable from any process/machine."""

    def __init__(self, host: str, port: int, timeout_s: float = 30.0):
        self._sock = socket.create_connection((host, port),
                                              timeout=timeout_s)
        self._rd = self._sock.makefile("r", encoding="utf-8")
        self._lock = threading.Lock()

    def _rpc(self, req: dict) -> dict:
        with self._lock:
            self._sock.sendall((json.dumps(req) + "\n").encode())
            line = self._rd.readline()
        if not line:
            raise ConnectionError("broker closed connection")
        return json.loads(line)

    def publish(self, subject: str, data: bytes) -> int:
        resp = self._rpc({"op": "pub", "subject": subject,
                          "data": base64.b64encode(data).decode()})
        return int(resp["id"])

    def pull(self, subject: str):
        """One message as (id, bytes), or None if the queue is empty."""
        resp = self._rpc({"op": "sub", "subject": subject})
        if resp["op"] == "none":
            return None
        return int(resp["id"]), base64.b64decode(resp["data"])

    def ack(self, msg_id: int):
        self._rpc({"op": "ack", "id": msg_id})

    def ping(self) -> bool:
        return self._rpc({"op": "ping"}).get("op") == "pong"

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass


def run_worker(client: QueueClient, in_subject: str, out_subject: str,
               handler, poll_s: float = 0.05, max_messages=None):
    """Worker loop: pull task bytes, run handler, publish result bytes, ack.

    The reference's sign-prover worker consumes `PROVE_SIGNATURE` and
    publishes `PROCESS_SIGNATURE_RESULT` (signatures.rs:164,198); plug
    `near/signatures.py` proving into `handler` for the real thing.
    Acks AFTER publishing the result — a worker dying mid-task leaves the
    task unacked and it redelivers (at-least-once).
    """
    done = 0
    while max_messages is None or done < max_messages:
        msg = client.pull(in_subject)
        if msg is None:
            time.sleep(poll_s)
            continue
        mid, data = msg
        result = handler(data)
        if result is not None:
            client.publish(out_subject, result)
        client.ack(mid)
        done += 1
    return done


def main(argv=None):  # pragma: no cover — CLI for real deployments
    import argparse
    ap = argparse.ArgumentParser(description="zklc queue broker")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=4222)
    ap.add_argument("--journal", default=None)
    ap.add_argument("--visibility-timeout", type=float, default=600.0)
    args = ap.parse_args(argv)
    b = Broker(args.host, args.port, journal_path=args.journal,
               visibility_timeout_s=args.visibility_timeout)
    print(f"broker listening on {b.host}:{b.port}", flush=True)
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        b.close()


if __name__ == "__main__":  # pragma: no cover
    main()
