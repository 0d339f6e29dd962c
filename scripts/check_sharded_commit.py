"""CPU-mesh check: sharded_commit is bit-exact with the single-device
commit kernel, and the mesh-threaded prover_tpu.prove round-trips.

Forces the CPU backend IN-PROCESS (this image's sitecustomize overrides
JAX_PLATFORMS, so an env var is not enough — cf. tests/conftest.py).
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = \
        (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    from zklc_tpu.parallel import sharded
    from zklc_tpu.field import gl2x32 as gl
    from zklc_tpu.plonk import prover_tpu

    mesh = sharded.make_mesh(8)
    rng = np.random.default_rng(0)
    P, log_n, rate, cap = 5, 6, 3, 4
    vals = rng.integers(0, (1 << 64) - 2**32, size=(P, 1 << log_n),
                        dtype=np.uint64)
    dv = gl.from_u64_np(vals)
    lde_ref, levels_ref = prover_tpu._commit_kernel(dv, log_n, rate, cap,
                                                    False)
    fn = sharded.sharded_commit(mesh, P, log_n, rate, cap, False)
    lde_s, levels_s = fn(sharded.pad_poly_batch(dv, 8))
    assert np.array_equal(np.asarray(lde_ref[0]), np.asarray(lde_s[0]))
    assert np.array_equal(np.asarray(lde_ref[1]), np.asarray(lde_s[1]))
    assert len(levels_ref) == len(levels_s), (len(levels_ref), len(levels_s))
    for lr, ls in zip(levels_ref, levels_s):
        assert np.array_equal(np.asarray(lr[0]), np.asarray(ls[0]))
        assert np.array_equal(np.asarray(lr[1]), np.asarray(ls[1]))
    print("sharded_commit bit-exact OK")

    # full prove with every commitment through the mesh
    from zklc_tpu.plonk.builder import CircuitBuilder
    from zklc_tpu.plonk.config import CircuitConfig
    from zklc_tpu.plonk import verifier
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x_t, y_t = b.add_virtual_target(), b.add_virtual_target()
    z_t = b.arithmetic(1, 1, x_t, y_t, x_t)
    b.register_public_inputs([x_t, y_t, z_t])
    pdata = b.build()
    proof = prover_tpu.prove(pdata, {x_t: np.uint64(5), y_t: np.uint64(7)},
                             mesh=mesh)
    assert verifier.verify(proof, pdata.verifier_only, pdata.common)
    assert int(proof.public_inputs[2]) == 5 * 7 + 5
    print("mesh-sharded prove OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
