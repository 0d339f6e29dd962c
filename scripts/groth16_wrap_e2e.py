"""End-to-end L5: fr-wrap a proof, compile the verifier to R1CS, Groth16-
prove it, verify via the pairing AND the contract model, write artifacts.

The in-repo equivalent of the reference's full wrap chain
(bin/prove_block.rs:279 wrap -> gnark compile/prove cmd/compile.go:20,
web-api.go:78 -> Verifier.sol).  Artifacts land under proofs/groth16/:
  vk.json, verifier_constants.sol, proof8.json, timings.json

Usage:
  python scripts/groth16_wrap_e2e.py           # small demo inner proof
  python scripts/groth16_wrap_e2e.py <proof_dir-from-real_bft_prove>
"""
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The whole Groth16 chain is host math (C++ BN254 + numpy); default to the
# CPU backend WITHOUT querying default_backend() first — querying would
# initialize the tunneled axon TPU and contend with a concurrent prover.
# Set ZKLC_GROTH16_TPU=1 to let it ride an already-initialized TPU session.
if os.environ.get("ZKLC_GROTH16_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")


def main():
    t00 = time.time()
    timings = {}

    def mark(stage):
        timings[stage] = round(time.time() - t00, 1)
        print(f"[{timings[stage]:8.1f}s] {stage}", flush=True)

    from zklc_tpu.plonk.builder import CircuitBuilder
    from zklc_tpu.plonk.config import CircuitConfig, FriConfig
    from zklc_tpu.plonk import prover
    from zklc_tpu.wrap import fr_wrap, groth16, groth16_fast
    from zklc_tpu.wrap.verifier_r1cs import WrapVerifierR1CS
    from zklc_tpu.wrap.contracts_model import (Groth16VerifierModel,
                                               NearBlockVerificationModel)
    from zklc_tpu.service.eth_client import EthHelper, ModelTransport
    from zklc_tpu.bins.export_vk import export_vk

    # inner proof: demo circuit (pass artifacts dir for the real pipeline)
    cfg = CircuitConfig(
        hasher="fr",
        fri_config=FriConfig(rate_bits=3, cap_height=2,
                             proof_of_work_bits=4, arity_bits=2,
                             final_poly_bits=3, num_query_rounds=8))
    # Inner demo proof with EXACTLY 16 u32-lane public inputs — the deployed
    # interface shape (16 GL words packed 4-per-BN254-word into the
    # contract's uint256[4], cmd/web-api.go:50-66); the contract model's
    # verifyProof is fixed-arity and must see 4 packed words.
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x, y = b.add_virtual_target(), b.add_virtual_target()
    z_t = b.mul_add(x, y, x)
    extras = [b.add_virtual_target() for _ in range(13)]
    b.register_public_inputs([x, y, z_t] + extras)
    data = b.build()
    inner_inputs = {x: 3, y: 4}
    for j, t in enumerate(extras):
        inner_inputs[t] = 100 + j
    proof = prover.prove(data, inner_inputs)
    mark("inner_proof")

    wdata, wproof = fr_wrap.wrap_proof_fr(data, proof, config=cfg)
    assert fr_wrap.verify_fr(wproof, wdata.verifier_only, wdata.common)
    mark("fr_wrap_proof")

    st = WrapVerifierR1CS(wdata.common, wdata.verifier_only)
    r1cs = st.b.build()
    mark(f"r1cs_compile")
    timings["r1cs_constraints"] = len(r1cs.a)
    packed, z = st.solve(wproof)
    mark("witness_solve")

    rng = random.Random(int.from_bytes(os.urandom(8), "big"))
    pk, vk = groth16_fast.setup(
        r1cs, rng=lambda: rng.randrange(1, groth16.R),
        progress=lambda m: print("   ", m, flush=True))
    mark("groth16_setup")
    proof8, pubs = groth16_fast.prove(
        pk, r1cs, z, rng=lambda: rng.randrange(groth16.R))
    mark("groth16_prove")
    assert groth16.verify(vk, proof8, pubs)
    mark("pairing_verify")

    # on-chain round trip through real calldata + the behavioral twin
    model = NearBlockVerificationModel(Groth16VerifierModel(vk))
    helper = EthHelper(ModelTransport(model, sender="deployer"))
    assert helper.execute_proof_saving(pubs, proof8)["status"] == 1
    mark("contract_submit")

    out = os.path.join("proofs", "groth16")
    os.makedirs(out, exist_ok=True)
    export_vk(vk, out)
    with open(os.path.join(out, "proof8.json"), "w") as f:
        json.dump({"inputs": [str(v) for v in pubs],
                   "proof": [str(v) for v in proof8]}, f, indent=1)
    with open(os.path.join(out, "timings.json"), "w") as f:
        json.dump(timings, f, indent=1)
    print("artifacts:", out, flush=True)
    print("GROTH16 WRAP E2E OK", flush=True)


if __name__ == "__main__":
    main()
