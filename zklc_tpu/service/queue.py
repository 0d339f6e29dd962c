"""Work-queue scheduler: the NATS-JetStream-equivalent fan-out layer.

The reference parallelizes per-signature proving over NATS workers and
folds results in arrival order (signatures.rs:144-274); its fold loop blocks
forever if a worker dies (SURVEY.md §5 failure-detection note).  This
scheduler keeps the contract — at-least-once delivery, arrival-order folds —
and fixes the liveness hole with per-task timeouts + bounded retries.

Transport is in-process asyncio by default; `publish`/`subscribe` are the
seams where a real multi-host transport (or jax multi-host dispatch: each
worker = one host of a pod slice) plugs in.
"""
from __future__ import annotations

import asyncio
import time
from dataclasses import dataclass, field


class TaskFailed(Exception):
    pass


@dataclass
class WorkQueue:
    """At-least-once task execution over an async worker pool."""
    num_workers: int = 4
    task_timeout_s: float = 600.0
    max_retries: int = 2
    _queue: asyncio.Queue = field(default_factory=asyncio.Queue)
    _results: asyncio.Queue = field(default_factory=asyncio.Queue)

    async def publish(self, payload):
        await self._queue.put((payload, 0))

    async def _worker(self, handler):
        while True:
            payload, attempt = await self._queue.get()
            try:
                result = await asyncio.wait_for(
                    handler(payload), timeout=self.task_timeout_s)
                await self._results.put(("ok", payload, result))
            except Exception as e:          # timeout or handler failure
                if attempt + 1 <= self.max_retries:
                    await self._queue.put((payload, attempt + 1))
                else:
                    await self._results.put(("failed", payload, e))
            finally:
                self._queue.task_done()

    async def run(self, payloads, handler, fold=None, fold_init=None):
        """Publish all payloads, run the pool, fold results in ARRIVAL
        order (order-insensitive fold per SURVEY.md §2.7).  Returns the
        fold accumulator (or list of results if fold is None)."""
        for p in payloads:
            await self.publish(p)
        workers = [asyncio.create_task(self._worker(handler))
                   for _ in range(self.num_workers)]
        acc = fold_init
        results = []
        failures = []
        try:
            for _ in range(len(payloads)):
                status, payload, result = await self._results.get()
                if status == "failed":
                    failures.append((payload, result))
                    continue
                if fold is None:
                    results.append(result)
                else:
                    acc = fold(acc, result)
        finally:
            for w in workers:
                w.cancel()
        if failures:
            raise TaskFailed(f"{len(failures)} tasks failed after retries: "
                             f"{failures[0][1]!r}")
        return results if fold is None else acc


def run_queue(payloads, handler_sync, num_workers=4, task_timeout_s=600.0,
              max_retries=2, fold=None, fold_init=None):
    """Synchronous wrapper: handler_sync(payload) runs in a thread pool
    (proving releases the GIL inside device calls)."""
    q = WorkQueue(num_workers=num_workers, task_timeout_s=task_timeout_s,
                  max_retries=max_retries)

    async def handler(payload):
        return await asyncio.to_thread(handler_sync, payload)

    return asyncio.run(q.run(payloads, handler, fold=fold,
                             fold_init=fold_init))
