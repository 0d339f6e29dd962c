"""Runtime knobs applied on package import.

The heavyweight cost on the tunneled TPU is XLA compilation (20-150 s per
program through the remote compile helper).  Circuits are static per shape,
so the same executables recur across prover processes — enable JAX's
persistent compilation cache so every kernel compiles once per machine, not
once per process.  (The reference's analogue is its per-message-length
circuit-data cache, prove_crypto/ed25519.rs:18.)
"""
from __future__ import annotations

import os


def configure_jax_cache() -> None:
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        return   # CPU AOT cache entries are machine-feature-pinned; skip
    try:
        import jax
        cache_dir = os.environ.get("ZKLC_JAX_CACHE",
                                   os.path.expanduser("~/.cache/zklc_jax"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover — older jax or read-only FS
        pass


configure_jax_cache()
