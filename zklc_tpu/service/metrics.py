"""Minimal metrics registry (observability gap of SURVEY.md §5).

The reference has no Prometheus/OTel — only log lines and the /health
endpoints (backend proof.controller.ts:72, gnark web-api.go:26-33, risc0
proving_server.rs:33,51 with its active-request gauge).  This registry
provides the same signals queryably: counters, gauges, and wall-clock
timers, rendered in the Prometheus text exposition format by /metrics
(service.http_api).
"""
from __future__ import annotations

import threading
import time
from contextlib import contextmanager


class Metrics:
    def __init__(self):
        self._lock = threading.Lock()
        self._counters: dict[str, float] = {}
        self._gauges: dict[str, float] = {}

    def inc(self, name: str, value: float = 1.0):
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def set_gauge(self, name: str, value: float):
        with self._lock:
            self._gauges[name] = float(value)

    def add_gauge(self, name: str, delta: float):
        """Atomic get+set: concurrent timers must not lose increments
        (the _active gauge feeds /ready; ADVICE r2)."""
        with self._lock:
            self._gauges[name] = self._gauges.get(name, 0.0) + delta

    @contextmanager
    def timer(self, name: str):
        """Accumulates seconds into <name>_seconds_total and counts
        <name>_total (risc0's active-request gauge analogue included)."""
        self.add_gauge(name + "_active", 1)
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.inc(name + "_seconds_total", dt)
            self.inc(name + "_total")
            self.add_gauge(name + "_active", -1)

    def snapshot(self) -> dict:
        with self._lock:
            return {"counters": dict(self._counters),
                    "gauges": dict(self._gauges)}

    def render_prometheus(self) -> str:
        snap = self.snapshot()
        lines = []
        for k, v in sorted(snap["counters"].items()):
            lines.append(f"# TYPE {k} counter")
            lines.append(f"{k} {v}")
        for k, v in sorted(snap["gauges"].items()):
            lines.append(f"# TYPE {k} gauge")
            lines.append(f"{k} {v}")
        return "\n".join(lines) + "\n"


DEFAULT = Metrics()
