"""PLONK(KZG) wrap of the REAL BFT final proof — checkpointed stages.

The reference offers both Groth16 and PLONK backends for the wrap circuit
(gnark-plonky2-verifier/README.md:37-40: 17 min compile / 2.3 min prove on
16 cores).  scripts/groth16_wrap_e2e.py --real covers the Groth16 row;
this driver covers the PLONK row at the REAL wrap shape (2.45 M R1CS
constraints -> plonkish rows), with every expensive stage persisted under
proofs/plonk_wrap_ckpt/ so a 2-core host crosses it in resumable pieces:

  stage 1  inner+fr_wrap   resume BFT checkpoints, fr-wrap the final proof
  stage 2  r1cs+witness    WrapVerifierR1CS build + solve  (pickled)
  stage 3  plonkish        from_r1cs lowering              (pickled)
  stage 4  srs+setup       dev-mode SRS + proving/verifying keys (pickled)
  stage 5  prove           5-round KZG-PLONK proof
  stage 6  verify          plonk_verify + artifact write -> proofs/plonk/

Each stage logs wall time; rerunning skips completed stages.
"""
import json
import os
import pickle
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("ZKLC_GROTH16_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")

CKPT = os.path.join("proofs", "plonk_wrap_ckpt")
OUT = os.path.join("proofs", "plonk")
t00 = time.time()
timings = {}


def mark(stage):
    timings[stage] = round(time.time() - t00, 1)
    print(f"[{timings[stage]:8.1f}s] {stage}", flush=True)


def staged(name):
    """Pickle-checkpoint a stage under proofs/plonk_wrap_ckpt/<name>.pkl."""
    def deco(fn):
        def run(*a, **kw):
            path = os.path.join(CKPT, name + ".pkl")
            if os.path.exists(path):
                with open(path, "rb") as f:
                    out = pickle.load(f)
                mark(f"{name} (resumed)")
                return out
            out = fn(*a, **kw)
            os.makedirs(CKPT, exist_ok=True)
            tmp = f"{path}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(out, f, protocol=4)
            os.replace(tmp, path)
            mark(name)
            return out
        return run
    return deco


@staged("r1cs_witness")
def stage_r1cs(mode, ckpt_dir):
    """fr-wrap the resumed final proof and compile+solve the wrap R1CS in
    one stage: circuit objects hold lambdas (generators) and cannot
    pickle, so only the plain (r1cs, packed, z, statement) artifact
    checkpoints."""
    sys.path.insert(0, "scripts")
    import groth16_wrap_e2e as GW
    from zklc_tpu.plonk.config import CircuitConfig, FriConfig
    from zklc_tpu.wrap import fr_wrap
    from zklc_tpu.wrap.verifier_r1cs import WrapVerifierR1CS
    cfg = CircuitConfig(
        hasher="fr",
        fri_config=FriConfig(rate_bits=3, cap_height=2,
                             proof_of_work_bits=4, arity_bits=2,
                             final_poly_bits=3, num_query_rounds=8))
    data, proof, statement = GW.real_inner(mode, ckpt_dir,
                                           "/root/reference/data")
    wdata, wproof = fr_wrap.wrap_proof_fr(data, proof, config=cfg)
    assert fr_wrap.verify_fr(wproof, wdata.verifier_only, wdata.common)
    mark("fr_wrap")
    st = WrapVerifierR1CS(wdata.common, wdata.verifier_only)
    r1cs = st.b.build()
    packed, z = st.solve(wproof)
    return r1cs, packed, z, statement


@staged("plonkish")
def stage_plonkish(r1cs):
    from zklc_tpu.wrap import plonk_kzg as PK
    return PK.from_r1cs(r1cs)


@staged("setup")
def stage_setup(cs):
    from zklc_tpu.wrap import plonk_kzg as PK
    rng = random.Random(0xC0FFEE)            # dev-mode tau (NOT a ceremony)
    tau = rng.randrange(2, PK.R - 1)
    pk, vk = PK.plonk_setup(cs, tau=tau)
    return pk, vk


@staged("prove")
def stage_prove(pk, cs, z, packed):
    from zklc_tpu.wrap import plonk_kzg as PK
    wit = PK.plonkish_witness(cs, z)
    rng = random.Random(0xBEEF)
    proof = PK.plonk_prove(pk, wit, packed, rng=lambda: rng.randrange(PK.R))
    return proof


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="random")
    ap.add_argument("--ckpt-dir", default=None)
    args = ap.parse_args()
    ckpt_dir = args.ckpt_dir or os.path.join("proofs", "checkpoints",
                                             args.mode)

    from zklc_tpu.wrap import plonk_kzg as PK

    r1cs, packed, z, statement = stage_r1cs(args.mode, ckpt_dir)
    timings["r1cs_constraints"] = len(r1cs.a)
    cs = stage_plonkish(r1cs)
    timings["plonkish_rows"] = cs.num_rows
    pk, vk = stage_setup(cs)
    proof = stage_prove(pk, cs, z, packed)
    ok = PK.plonk_verify(vk, proof, packed)
    mark("verify")
    if not ok:
        raise SystemExit("PLONK verify FAILED")

    def ser(v):
        if isinstance(v, bool) or v is None:
            return v
        if isinstance(v, int):
            return str(v)
        if isinstance(v, (list, tuple)):
            return [ser(x) for x in v]
        if isinstance(v, dict):
            return {k: ser(x) for k, x in v.items()}
        return repr(v)

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "plonk_proof.json"), "w") as f:
        json.dump({"statement": statement,
                   "inputs": [str(v) for v in packed],
                   "proof": ser(proof)}, f, indent=1)
    with open(os.path.join(OUT, "timings.json"), "w") as f:
        json.dump(timings, f, indent=1)
    print(f"PLONK WRAP REAL OK ({statement})", flush=True)


if __name__ == "__main__":
    main()
