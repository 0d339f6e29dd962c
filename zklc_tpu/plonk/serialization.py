"""Proof / circuit-data JSON serialization in the reference verifier's
schema.

The gnark-plonky2-verifier's parsers (types/common_circuit_data.go:127,
variables/deserialize.go) define the interop format; artifacts written here
follow testdata/test_circuit/*.json exactly so the Go wrapper can consume
our proofs unchanged (SURVEY.md §7.2 step 5 oracle).  Hash digests pack the
4 Goldilocks limbs little-endian into one big integer, matching plonky2's
serde of HashOut.
"""
from __future__ import annotations

import json

import numpy as np


def _digest_int(h) -> int:
    """Hash -> one big integer.  GL-Poseidon hashes (4 u64 limbs) pack
    little-endian, matching plonky2's serde of HashOut; BN128-transcript
    hashes are already a single BN254-Fr integer."""
    if isinstance(h, (int, np.integer)):
        return int(h)
    v = 0
    for i, limb in enumerate(np.asarray(h).ravel()):
        v |= int(limb) << (64 * i)
    return v


def _digest_str(h) -> str:
    """gnark parses caps/siblings/digests as DECIMAL STRINGS
    (types/deserialize.go:11-32 `[]string`, variables/deserialize.go:16
    big.Int.SetString(_, 10))."""
    return str(_digest_int(h))


def _digest_from_int(v: int) -> list[int]:
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def _ext(e) -> list[int]:
    return [int(e[0]), int(e[1])]


def proof_to_json(proof, common) -> dict:
    """ProofWithPublicInputs JSON (proof_with_public_inputs.json schema)."""
    op = proof.opening_proof
    o = proof.openings
    query_rounds = []
    for rp in op.query_round_proofs:
        evals_proofs = []
        for leaf, sibs in rp.initial_trees_proof.evals_proofs:
            evals_proofs.append([
                [int(x) for x in leaf],
                {"siblings": [_digest_str(s) for s in sibs]},
            ])
        steps = []
        for st in rp.steps:
            steps.append({
                "evals": [_ext(e) for e in st.evals],
                "merkle_proof": {
                    "siblings": [_digest_str(s) for s in st.siblings]},
            })
        query_rounds.append({
            "initial_trees_proof": {"evals_proofs": evals_proofs},
            "steps": steps,
        })
    return {
        "proof": {
            "wires_cap": [_digest_str(h) for h in proof.wires_cap],
            "plonk_zs_partial_products_cap": [
                _digest_str(h) for h in proof.plonk_zs_partial_products_cap],
            "quotient_polys_cap": [
                _digest_str(h) for h in proof.quotient_polys_cap],
            "openings": {
                "constants": [_ext(e) for e in o.constants],
                "plonk_sigmas": [_ext(e) for e in o.plonk_sigmas],
                "wires": [_ext(e) for e in o.wires],
                "plonk_zs": [_ext(e) for e in o.plonk_zs],
                "plonk_zs_next": [_ext(e) for e in o.plonk_zs_next],
                "partial_products": [_ext(e) for e in o.partial_products],
                "quotient_polys": [_ext(e) for e in o.quotient_polys],
                "lookup_zs": [_ext(e) for e in o.lookups]
                if o.lookups is not None and len(o.lookups) else [],
                "lookup_zs_next": [_ext(e) for e in o.lookup_zs_next]
                if o.lookup_zs_next is not None and len(o.lookup_zs_next)
                else [],
            },
            "opening_proof": {
                "commit_phase_merkle_caps": [
                    [_digest_str(h) for h in cap]
                    for cap in op.commit_phase_merkle_caps],
                "query_round_proofs": query_rounds,
                "final_poly": {"coeffs": [_ext(c) for c in op.final_poly]},
                "pow_witness": int(op.pow_witness),
            },
        },
        "public_inputs": [int(x) for x in proof.public_inputs],
    }


def verifier_only_to_json(vdata) -> dict:
    return {
        "constants_sigmas_cap": [_digest_str(h)
                                 for h in vdata.constants_sigmas_cap],
        "circuit_digest": _digest_str(vdata.circuit_digest),
    }


def common_data_to_json(common) -> dict:
    cfg = common.config
    fc = cfg.fri_config
    fp = common.fri_params
    fri_config = {
        "rate_bits": fc.rate_bits,
        "cap_height": fc.cap_height,
        "proof_of_work_bits": fc.proof_of_work_bits,
        "reduction_strategy": {
            "ConstantArityBits": [fc.arity_bits, fc.final_poly_bits]},
        "num_query_rounds": fc.num_query_rounds,
    }
    return {
        "config": {
            "num_wires": cfg.num_wires,
            "num_routed_wires": cfg.num_routed_wires,
            "num_constants": cfg.num_constants,
            "use_base_arithmetic_gate": cfg.use_base_arithmetic_gate,
            "security_bits": cfg.security_bits,
            "num_challenges": cfg.num_challenges,
            "zero_knowledge": cfg.zero_knowledge,
            "max_quotient_degree_factor": cfg.max_quotient_degree_factor,
            "fri_config": fri_config,
        },
        "fri_params": {
            "config": fri_config,
            "hiding": False,
            "degree_bits": common.degree_bits,
            "reduction_arity_bits": list(fp.reduction_arity_bits),
        },
        "gates": [g.id() for g in common.gate_types],
        "selectors_info": {
            "selector_indices": list(common.selector_indices),
            "groups": [{"start": s, "end": e}
                       for (s, e) in common.selector_groups],
        },
        "quotient_degree_factor": common.quotient_degree_factor,
        "num_gate_constraints": common.num_gate_constraints,
        "num_constants": common.num_constants,
        "num_public_inputs": common.num_public_inputs,
        "k_is": [int(k) for k in common.k_is],
        "num_partial_products": common.num_partial_products,
        "num_lookup_polys": 0,
        "num_lookup_selectors": 0,
        "luts": [],
    }


# ---------------------------------------------------------------------------
# Parsers (the repo-side mirror of gnark's types/deserialize.go +
# variables/deserialize.go): load reference-format artifacts back into the
# framework's proof model.  Round-tripping the reference's
# testdata/test_circuit/*.json through parse -> serialize must be identity
# (tests/test_serialization.py).
# ---------------------------------------------------------------------------

def _ext_np(pairs) -> np.ndarray:
    a = np.array(pairs, dtype=np.uint64)
    return a.reshape(-1, 2) if a.size else a.reshape(0, 2)


def proof_from_json(d: dict):
    """proof_with_public_inputs.json -> Proof.  Hash values are kept as
    Python ints (decimal-string encoding is transcript-agnostic: a packed
    4-limb GL HashOut or a single BN254-Fr element)."""
    from .proof import (Proof, OpeningSet, FriProof, FriQueryRound,
                        FriQueryStep, FriInitialTreeProof)
    pr = d["proof"]
    o = pr["openings"]
    openings = OpeningSet(
        constants=_ext_np(o["constants"]),
        plonk_sigmas=_ext_np(o["plonk_sigmas"]),
        wires=_ext_np(o["wires"]),
        plonk_zs=_ext_np(o["plonk_zs"]),
        plonk_zs_next=_ext_np(o["plonk_zs_next"]),
        partial_products=_ext_np(o["partial_products"]),
        quotient_polys=_ext_np(o["quotient_polys"]),
        lookups=_ext_np(o.get("lookup_zs", [])),
        lookup_zs_next=_ext_np(o.get("lookup_zs_next", [])),
    )
    op = pr["opening_proof"]
    rounds = []
    for qr in op["query_round_proofs"]:
        evals_proofs = []
        for leaf, mp in qr["initial_trees_proof"]["evals_proofs"]:
            evals_proofs.append((
                np.array(leaf, dtype=np.uint64),
                [int(s) for s in mp["siblings"]],
            ))
        steps = [FriQueryStep(evals=_ext_np(st["evals"]),
                              siblings=[int(s) for s in
                                        st["merkle_proof"]["siblings"]])
                 for st in qr["steps"]]
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs),
            steps=steps))
    fri = FriProof(
        commit_phase_merkle_caps=[[int(h) for h in cap]
                                  for cap in op["commit_phase_merkle_caps"]],
        query_round_proofs=rounds,
        final_poly=_ext_np(op["final_poly"]["coeffs"]),
        pow_witness=int(op["pow_witness"]),
    )
    return Proof(
        wires_cap=[int(h) for h in pr["wires_cap"]],
        plonk_zs_partial_products_cap=[
            int(h) for h in pr["plonk_zs_partial_products_cap"]],
        quotient_polys_cap=[int(h) for h in pr["quotient_polys_cap"]],
        openings=openings,
        opening_proof=fri,
        public_inputs=np.array(d["public_inputs"], dtype=np.uint64),
    )


def unpack_gl_digests(proof):
    """proof_from_json keeps Merkle digests as packed ints (transcript-
    agnostic).  The native GL pipeline (verifier.verify,
    RecursiveVerifier.set_proof_targets) consumes 4-limb u64 arrays —
    unpack in place and return the proof."""
    def limb4(v):
        return np.array([(int(v) >> (64 * i)) & 0xFFFFFFFFFFFFFFFF
                         for i in range(4)], dtype=np.uint64)

    def cap(c):
        return [limb4(h) for h in c]

    proof.wires_cap = cap(proof.wires_cap)
    proof.plonk_zs_partial_products_cap = cap(
        proof.plonk_zs_partial_products_cap)
    proof.quotient_polys_cap = cap(proof.quotient_polys_cap)
    op = proof.opening_proof
    op.commit_phase_merkle_caps = [cap(c)
                                   for c in op.commit_phase_merkle_caps]
    for rp in op.query_round_proofs:
        rp.initial_trees_proof.evals_proofs = [
            (leaf, cap(sibs))
            for leaf, sibs in rp.initial_trees_proof.evals_proofs]
        for st in rp.steps:
            st.siblings = cap(st.siblings)
    return proof


def verifier_only_from_json(d: dict):
    """verifier_only_circuit_data.json -> (constants_sigmas_cap, digest) as
    transcript-agnostic ints."""
    return ([int(h) for h in d["constants_sigmas_cap"]],
            int(d["circuit_digest"]))


def common_data_from_json(d: dict) -> dict:
    """common_circuit_data.json -> a plain parameter dict (the verifier-side
    subset of CommonCircuitData gnark consumes, types/common_circuit_data.go:
    127).  Gate re-instantiation from the id strings is the compatibility
    oracle's job (wrap/gnark_oracle.py)."""
    cfg = d["config"]
    fc = cfg["fri_config"]
    return {
        "num_wires": cfg["num_wires"],
        "num_routed_wires": cfg["num_routed_wires"],
        "num_challenges": cfg["num_challenges"],
        "security_bits": cfg["security_bits"],
        "rate_bits": fc["rate_bits"],
        "cap_height": fc["cap_height"],
        "proof_of_work_bits": fc["proof_of_work_bits"],
        "num_query_rounds": fc["num_query_rounds"],
        "degree_bits": d["fri_params"]["degree_bits"],
        "reduction_arity_bits": list(d["fri_params"]["reduction_arity_bits"]),
        "gates": list(d["gates"]),
        "selector_indices": list(d["selectors_info"]["selector_indices"]),
        "selector_groups": [(g["start"], g["end"])
                            for g in d["selectors_info"]["groups"]],
        "quotient_degree_factor": d["quotient_degree_factor"],
        "num_gate_constraints": d["num_gate_constraints"],
        "num_constants": d["num_constants"],
        "num_public_inputs": d["num_public_inputs"],
        "k_is": [int(k) for k in d["k_is"]],
        "num_partial_products": d["num_partial_products"],
    }


def write_proof_artifacts(dirname: str, proof, data, block_hash: bytes):
    """bin/prove_block.rs:302-458 artifact layout: proof.json,
    verifier_data.json, common_data.json, hash.json under <dir>."""
    import os
    os.makedirs(dirname, exist_ok=True)
    with open(os.path.join(dirname, "proof.json"), "w") as f:
        json.dump(proof_to_json(proof, data.common), f)
    with open(os.path.join(dirname, "verifier_data.json"), "w") as f:
        json.dump(verifier_only_to_json(data.verifier_only), f)
    with open(os.path.join(dirname, "common_data.json"), "w") as f:
        json.dump(common_data_to_json(data.common), f)
    with open(os.path.join(dirname, "hash.json"), "w") as f:
        json.dump(_b58encode(block_hash), f)


def _b58encode(b: bytes) -> str:
    from ..near.types import b58encode
    return b58encode(b)
