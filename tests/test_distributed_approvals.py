"""Distributed approval proving through the broker with REAL worker
subprocesses (near/distributed.py — the prove_approvals_with_client
equivalent, signatures.rs:144-274).

Leaf tasks cross real process + TCP boundaries: the test parent runs the
durable broker, worker subprocesses pull PROVE_SIGNATURE tasks, prove
dev-mode leaves (real proofs of the small transcript circuit — the
RISC0_DEV_MODE pattern, SURVEY.md §4), publish proof bytes to
PROCESS_SIGNATURE_RESULT, and the parent folds.  Also covers the
at-least-once story: a "dying worker" pulls a task and never acks; the
task redelivers after the visibility timeout and a healthy worker
completes it (the liveness hole of signatures.rs:218-222, fixed here).
"""
import json
import os.path as p
import subprocess
import sys
import time

import pytest

from zklc_tpu.near import utils as U, signatures as S, distributed as D
from zklc_tpu.service.transport import Broker, QueueClient

pytestmark = pytest.mark.heavy

WORKER_CODE = """
import sys
sys.path.insert(0, {root!r})
import jax
jax.config.update("jax_platforms", "cpu")
from zklc_tpu.near.distributed import run_signature_worker
n = run_signature_worker({host!r}, {port}, max_messages={maxmsg})
print("WORKER_DONE", n, flush=True)
"""

ROOT = p.dirname(p.dirname(p.abspath(__file__)))


def _spawn_worker(broker, maxmsg):
    return subprocess.Popen(
        [sys.executable, "-c", WORKER_CODE.format(
            root=ROOT, host=broker.host, port=broker.port, maxmsg=maxmsg)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _fixture_subset():
    eps = U.ordered_epochs()
    _, blocks = U.set_blocks(eps[-1], eps[-2], eps[-3])
    allv = U.load_validators(
        p.join(U.epoch_dir(eps[-1]), "validators.json"))
    b_i, b_next = blocks[4], blocks[3]
    msg = S.generate_signed_message(b_i.height, b_next.height, b_i.hash)
    apr = b_next.approvals
    valid = S.check_approvals(msg, apr, allv).valid_indices
    sel = sorted(valid[:3])
    return msg, [apr[i] for i in sel], [allv[i] for i in sel]


def test_distributed_dev_leaves_two_workers():
    msg, approvals, validators = _fixture_subset()
    broker = Broker(visibility_timeout_s=600.0)
    try:
        workers = [_spawn_worker(broker, maxmsg=None) for _ in range(2)]
        client = QueueClient(broker.host, broker.port)
        try:
            data, proof, check = D.prove_approvals_distributed(
                msg, approvals, validators, client, dev_mode=True,
                timeout_s=600.0)
        finally:
            client.close()
            for w in workers:
                w.kill()
                w.wait()
        # same aggregate as the local path produces
        ldata, lproof, lcheck = S.prove_approvals(
            msg, approvals, validators, dev_mode=True)
        assert check.valid_indices == lcheck.valid_indices
        assert [int(x) for x in proof.public_inputs] == \
            [int(x) for x in lproof.public_inputs]
        from zklc_tpu.plonk import verifier
        verifier.verify(proof, data.verifier_only, data.common)
    finally:
        broker.close()


def test_prove_approvals_routes_through_client(monkeypatch):
    """signatures.prove_approvals(client=...) is the
    prove_approvals_with_client entry (orchestrator ZKLC_SIG_BROKER /
    sig_broker flag path)."""
    sentinel = object()
    captured = {}

    def fake(message, approvals, validators, client, dev_mode=False):
        captured.update(client=client, dev=dev_mode)
        return "d", "p", "c"

    monkeypatch.setattr("zklc_tpu.near.distributed."
                        "prove_approvals_distributed", fake)
    out = S.prove_approvals(b"m", [], [], dev_mode=True, client=sentinel)
    assert out == ("d", "p", "c")
    assert captured["client"] is sentinel and captured["dev"] is True


def test_redelivery_after_worker_death():
    """A worker that pulls a task and dies without acking must not stall
    the fold: the task redelivers and a healthy worker finishes it."""
    msg, approvals, validators = _fixture_subset()
    broker = Broker(visibility_timeout_s=1.0)
    try:
        # "dying worker": consume one task, never ack, never respond
        dead = QueueClient(broker.host, broker.port)
        check = S.check_approvals(msg, approvals, validators)
        assert len(check.valid_indices) >= 2
        # publish tasks first so the dead client can grab one
        client = QueueClient(broker.host, broker.port)
        sig_pks = []
        for idx in check.valid_indices:
            sig = approvals[idx]
            raw = sig[1:] if len(sig) == 65 else sig
            sig_pks.append((raw, validators[idx].public_key[1:]))
        for start in range(len(sig_pks)):
            s_, p_ = sig_pks[start]
            client.publish(D.TASK_SUBJECT, json.dumps({
                "mode": "dev", "message": msg.hex(), "start": start,
                "sig_pks": [[s_.hex(), p_.hex()]],
            }).encode())
        grabbed = dead.pull(D.TASK_SUBJECT)
        assert grabbed is not None
        dead.close()                      # dies holding the task

        time.sleep(1.2)                   # visibility timeout expires
        worker = _spawn_worker(broker, maxmsg=len(sig_pks))
        try:
            results = set()
            deadline = time.monotonic() + 600
            while len(results) < len(sig_pks):
                assert time.monotonic() < deadline, \
                    f"only {sorted(results)} of {len(sig_pks)} arrived"
                got = client.pull(D.RESULT_SUBJECT)
                if got is None:
                    time.sleep(0.05)
                    continue
                mid, payload = got
                results.add(json.loads(payload)["start"])
                client.ack(mid)
        finally:
            worker.kill()
            worker.wait()
            client.close()
        assert results == set(range(len(sig_pks)))
    finally:
        broker.close()
