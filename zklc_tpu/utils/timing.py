"""Hierarchical timing tree — the plonky2 TimingTree / `timed!` equivalent.

The reference wraps every pipeline stage in TimingTree scopes and prints the
tree after each proof (near_bft_finality/src/prove_bft/block_finality.rs:156+,
bin/prove_block.rs:494; SURVEY.md §5).  Same discipline here, plus optional
jax profiler trace capture around a scope for per-kernel TPU accounting.
"""
from __future__ import annotations

import time
from contextlib import contextmanager


class TimingTree:
    def __init__(self, name: str = "root"):
        self.name = name
        self.start = time.perf_counter()
        self.end: float | None = None
        self.children: list[TimingTree] = []
        self._stack = [self]

    @contextmanager
    def scope(self, name: str):
        node = TimingTree(name)
        parent = self._stack[-1]
        parent.children.append(node)
        self._stack.append(node)
        try:
            yield node
        finally:
            node.end = time.perf_counter()
            self._stack.pop()

    def timed(self, name: str, fn, *args, **kwargs):
        """timed!(timing, name, expr) equivalent."""
        with self.scope(name):
            return fn(*args, **kwargs)

    def close(self):
        if self.end is None:
            self.end = time.perf_counter()

    def _lines(self, depth: int = 0):
        dur = ((self.end or time.perf_counter()) - self.start)
        yield f"{'  ' * depth}{dur * 1e3:10.1f}ms  {self.name}"
        for c in self.children:
            yield from c._lines(depth + 1)

    def print(self, log_fn=print):
        self.close()
        for line in self._lines():
            log_fn(line)

    def to_dict(self) -> dict:
        self.close()
        return {
            "name": self.name,
            "ms": (self.end - self.start) * 1e3,
            "children": [c.to_dict() for c in self.children],
        }


@contextmanager
def jax_trace(dirname: str):
    """Capture a jax profiler trace around a block (TPU kernel accounting)."""
    import jax
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
