"""Cross-process transport tests: the NATS-JetStream-equivalent broker.

Covers the reference's distributed contract (SURVEY.md §2.7): work crosses
REAL process boundaries as InputTask/OutputTask bytes, delivery is
at-least-once (worker death redelivers), and the stream survives a broker
restart (JetStream durability).
"""
import json
import os
import subprocess
import sys
import time

import pytest

from zklc_tpu.service.transport import Broker, QueueClient, run_worker
from zklc_tpu.service.tasks import (InputTask, OutputTask, PROVE_SIGNATURE,
                                    PROCESS_SIGNATURE_RESULT)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER_SRC = """
import sys, json
sys.path.insert(0, {repo!r})
from zklc_tpu.service.transport import QueueClient, run_worker
from zklc_tpu.service.tasks import InputTask, OutputTask

def handler(data):
    task = InputTask.from_json(data.decode())
    out = OutputTask(proof=task.message[::-1], verifier_data=task.validator,
                     signature_index=task.signature_index)
    return out.to_json().encode()

c = QueueClient("127.0.0.1", int(sys.argv[1]))
run_worker(c, "PROVE_SIGNATURE", "PROCESS_SIGNATURE_RESULT", handler,
           max_messages=int(sys.argv[2]))
"""


@pytest.mark.smoke
def test_pub_pull_ack_roundtrip(tmp_path):
    b = Broker(journal_path=str(tmp_path / "j.log"))
    try:
        c = QueueClient(b.host, b.port)
        assert c.ping()
        c.publish("s", b"hello")
        mid, data = c.pull("s")
        assert data == b"hello"
        c.ack(mid)
        assert c.pull("s") is None
    finally:
        b.close()


def test_cross_process_workers():
    """Two REAL worker subprocesses drain a task queue; the coordinator
    folds OutputTask results in arrival order (signatures.rs:218-260)."""
    b = Broker()
    try:
        c = QueueClient(b.host, b.port)
        n = 10
        for i in range(n):
            t = InputTask(message=bytes([i]) * 4, approval=b"ap",
                          validator=bytes([i, i]), signature_index=i)
            c.publish(PROVE_SIGNATURE, t.to_json().encode())
        src = WORKER_SRC.format(repo=REPO)
        procs = [subprocess.Popen([sys.executable, "-c", src, str(b.port),
                                   str(n // 2)]) for _ in range(2)]
        got = {}
        deadline = time.time() + 60
        while len(got) < n and time.time() < deadline:
            msg = c.pull(PROCESS_SIGNATURE_RESULT)
            if msg is None:
                time.sleep(0.05)
                continue
            mid, data = msg
            out = OutputTask.from_json(data.decode())
            got[out.signature_index] = out
            c.ack(mid)
        for p in procs:
            p.wait(timeout=30)
        assert len(got) == n
        for i in range(n):
            assert got[i].proof == bytes([i]) * 4  # palindrome reverses to itself
            assert got[i].verifier_data == bytes([i, i])
    finally:
        b.close()


def test_redelivery_after_worker_death():
    """A pulled-but-never-acked message redelivers after the visibility
    timeout — the fold loop can't block forever on a dead worker
    (fixes signatures.rs:218-222 at the transport layer)."""
    b = Broker(visibility_timeout_s=0.2)
    try:
        c = QueueClient(b.host, b.port)
        c.publish("q", b"task")
        mid1, _ = c.pull("q")          # worker takes it... and dies (no ack)
        assert c.pull("q") is None      # in flight: not redelivered yet
        time.sleep(0.3)
        got = c.pull("q")               # visibility expired -> redelivered
        assert got is not None and got[1] == b"task"
        c.ack(got[0])
    finally:
        b.close()


def test_broker_restart_durability(tmp_path):
    """Unacked messages survive a broker restart (JetStream file store)."""
    jp = str(tmp_path / "journal.log")
    b = Broker(journal_path=jp)
    c = QueueClient(b.host, b.port)
    c.publish("sub", b"one")
    c.publish("sub", b"two")
    mid, data = c.pull("sub")
    assert data == b"one"
    c.ack(mid)
    port = b.port
    b.close()

    b2 = Broker(port=port, journal_path=jp)
    try:
        c2 = QueueClient(b2.host, b2.port)
        got = c2.pull("sub")
        assert got is not None and got[1] == b"two"   # acked "one" is gone
        c2.ack(got[0])
        assert c2.pull("sub") is None
    finally:
        b2.close()
