"""Test harness config: run all tests on CPU with 8 virtual devices.

Real-TPU execution is exercised by bench.py; tests use the CPU backend so the
multi-chip sharding paths (jax.sharding.Mesh over 8 virtual devices) are
testable without hardware, per the driver's dryrun contract.

Note: this environment's sitecustomize force-registers the 'axon' TPU
platform and overrides JAX_PLATFORMS, so we must override back via
jax.config.update BEFORE any backend initialization.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent CPU compile cache in $HOME (survives reboots; /tmp does not —
# a tier whose "warm" budget depends on an evaporating cache overstates
# itself, VERDICT r3 weak #9)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/zklc_jax_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
