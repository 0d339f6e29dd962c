"""Real-TPU smoke gate (VERDICT r2 next #1): prove + verify, ON THE CHIP,

  1. a tiny LogUp lookup circuit  — covers the prover_tpu LOOKUP_READY path
     and the structural quotient-kernel cache key (the r2 bench crash), and
  2. one recursion shape          — covers the widest gate mix the real
     pipeline uses (in-circuit Poseidon/FRI verification gates).

Run BEFORE every snapshot:  python scripts/tpu_smoke.py [--quick]

Exits nonzero on any failure; prints per-stage wall times, flushed as
they land.  MEASURED budgets (r3, real chip through the tunnel): first
run on a fresh machine ~35 min (every quotient gate kernel compiles);
warm persistent-cache reruns are minutes.  `--quick` runs only the
lookup stage (~1/4 the compile surface) — the right gate when the tunnel
window is short; the recursion stage then runs on the next invocation
from a warm cache.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="lookup stage only (short tunnel windows)")
    args = ap.parse_args(argv)
    import jax
    backend = jax.default_backend()
    print(f"backend: {backend} devices: {jax.devices()}", flush=True)

    from zklc_tpu.plonk.builder import CircuitBuilder
    from zklc_tpu.plonk.config import CircuitConfig
    from zklc_tpu.plonk import prover, verifier

    t0 = time.time()

    # --- 1. tiny LogUp circuit: u32 range checks + adds force lookup lanes
    # (the ed25519 leaf's gate family = the r2 crash path) ---
    from zklc_tpu.gadgets.u32 import U32Ops
    cfg = CircuitConfig.standard_lookup_config()
    b = CircuitBuilder(cfg)
    u = U32Ops(b)
    xs = [b.add_virtual_target() for _ in range(4)]
    u.range_check_u32(xs)
    acc, _carry = u.add_many_u32(xs)
    b.register_public_input(acc)
    data = b.build()
    inputs = {t: np.uint64(1000 + 7 * i) for i, t in enumerate(xs)}
    t1 = time.time()
    proof = prover.prove(data, dict(inputs))
    t2 = time.time()
    assert verifier.verify(proof, data.verifier_only, data.common)
    want = sum(1000 + 7 * i for i in range(4)) & 0xFFFFFFFF
    assert int(proof.public_inputs[0]) == want
    print(f"lookup circuit: build {t1 - t0:.1f}s prove {t2 - t1:.1f}s "
          f"verify {time.time() - t2:.1f}s", flush=True)

    if args.quick:
        print(f"TPU SMOKE OK --quick ({backend}) total "
              f"{time.time() - t0:.1f}s", flush=True)
        return 0

    # --- 2. one recursion shape ---
    from zklc_tpu.plonk.recursion import (RecursiveVerifier,
                                          recursive_proof_circuit)
    t3 = time.time()
    ib = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x, y = ib.add_virtual_target(), ib.add_virtual_target()
    z = ib.mul_add(x, y, x)
    ib.register_public_inputs([x, y, z])
    idata = ib.build()
    iproof = prover.prove(idata, {x: 3, y: 4})
    prover.ensure_constants_sigmas_commitment(idata)
    t4 = time.time()
    rb, pt = recursive_proof_circuit(idata.common, idata.verifier_only)
    rdata = rb.build()
    rinputs = {}
    RecursiveVerifier.set_proof_targets(pt, iproof, rinputs)
    t5 = time.time()
    rproof = prover.prove(rdata, rinputs)
    t6 = time.time()
    assert verifier.verify(rproof, rdata.verifier_only, rdata.common)
    assert [int(v) for v in rproof.public_inputs] == [3, 4, 15]
    print(f"recursion: inner {t4 - t3:.1f}s build {t5 - t4:.1f}s "
          f"prove {t6 - t5:.1f}s verify {time.time() - t6:.1f}s", flush=True)

    print(f"TPU SMOKE OK ({backend}) total {time.time() - t0:.1f}s",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
