"""Persistent AOT kernel cache: skip jit RE-TRACING across processes.

The XLA persistent compile cache (runtime.py) already makes compilation
once-per-machine, but a fresh prover process still pays full Python
tracing + lowering for every kernel — for the EdDSA leaf circuit's
per-gate quotient evaluators that is ~10 minutes of pure tracing before
the first proof (the r4 bench failure mode: BENCH_r04 rc=124 with the
first metric still minutes away).

jax.export gives the missing piece: a traced+lowered kernel serializes
to StableHLO bytes.  This module caches those bytes on disk keyed by
(code version, semantic key, backend, arg treedef + avals); a cold
process deserializes in milliseconds and goes straight to the XLA
compile cache.  Semantics are identical — Exported.call is a regular
traceable JAX callable.

Opt-in per call site via `aot_jit(fn, key)`; enabled when ZKLC_AOT=1
(default on for TPU backends, off for CPU where tracing is cheap and the
test matrix churns shapes).
"""
from __future__ import annotations

import hashlib
import os
import threading

_VERSION = 1
_lock = threading.Lock()


def _cache_dir() -> str:
    d = os.environ.get("ZKLC_AOT_CACHE",
                       os.path.expanduser("~/.cache/zklc_aot"))
    os.makedirs(d, exist_ok=True)
    return d


def enabled() -> bool:
    import jax
    flag = os.environ.get("ZKLC_AOT")
    if flag is not None:
        return flag == "1"
    return jax.default_backend() not in ("cpu",)


def export_enabled() -> bool:
    """Whether a cache MISS may pay the export cost (~3-4x a plain trace,
    measured ~140 s vs ~40 s per leaf-gate quotient kernel on the 2-core
    host).  Long checkpointed runs amortize it; deadline-bound processes
    (bench.py children) set ZKLC_AOT_EXPORT=0 to reload-if-present but
    fall back to plain jit on a miss instead of exporting."""
    return os.environ.get("ZKLC_AOT_EXPORT", "1") == "1"


def aot_jit(fn, key: str):
    """jax.jit(fn) with a disk-backed trace cache.

    `key` must capture everything that determines the traced computation
    besides the runtime args (circuit structural key, gate id, kernel
    parameters).  Falls back to plain jit on any export/deserialize
    failure — the cache can only win time, never correctness."""
    import jax

    if not enabled():
        return jax.jit(fn)

    mem: dict = {}
    jfn = jax.jit(fn)

    def wrapped(*args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        avals = tuple((tuple(x.shape), str(getattr(x, "dtype", type(x))))
                      for x in leaves)
        mk = (str(treedef), avals)
        call = mem.get(mk)
        if call is not None:
            return call(*args)
        # same-machine cache: key on the jax version too, so an upgrade
        # invalidates every entry instead of deserializing stale StableHLO
        digest = hashlib.sha256(
            f"v{_VERSION}|jax{jax.__version__}|{key}|"
            f"{jax.default_backend()}|{mk}".encode()).hexdigest()
        path = os.path.join(_cache_dir(), digest + ".jaxexp")
        call = None
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    blob = bytearray(f.read())
                # pallas kernels (tpu_custom_call) do NOT survive the
                # export round-trip faithfully — reloaded modules run but
                # return wrong values (observed: PoseidonGate quotient
                # kernel, r5).  Refuse to reload any entry containing one.
                if b"tpu_custom_call" in blob:
                    raise ValueError("entry contains tpu_custom_call "
                                     "(pallas); AOT reload unsound")
                ex = jax.export.deserialize(blob)
                call = jax.jit(ex.call)
            except Exception as e:  # noqa: BLE001 — stale/corrupt entry
                print(f"[aot] reload failed for {key}: {e!r}; retracing",
                      flush=True)
                call = None
                try:
                    os.remove(path)
                except OSError:
                    pass
        if call is None and not export_enabled():
            call = jfn            # miss + export disabled: plain trace
        if call is None:
            try:
                sds = jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
                # sharding/placement annotations are safe for a
                # same-machine cache; pallas tpu_custom_call is NOT on the
                # allow-list — kernels containing one raise here and run
                # as plain jit (their reloads return wrong values)
                checks = [jax.export.DisabledSafetyCheck.custom_call(c)
                          for c in ("Sharding",
                                    "annotate_device_placement")]
                ex = jax.export.export(jfn, disabled_checks=checks)(*sds)
                blob = ex.serialize()
                if b"tpu_custom_call" in blob:
                    raise ValueError("kernel contains tpu_custom_call "
                                     "(pallas); AOT caching unsound")
                with _lock:
                    tmp = f"{path}.tmp.{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)
                call = jax.jit(ex.call)
            except Exception as e:  # noqa: BLE001 — unexportable kernel
                print(f"[aot] export failed for {key}: {e!r}; plain jit",
                      flush=True)
                call = jfn
        mem[mk] = call
        return call(*args)

    return wrapped
