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
    v = 0
    for i, limb in enumerate(h):
        v |= int(limb) << (64 * i)
    return v


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
                {"siblings": [_digest_int(s) for s in sibs]},
            ])
        steps = []
        for st in rp.steps:
            steps.append({
                "evals": [_ext(e) for e in st.evals],
                "merkle_proof": {
                    "siblings": [_digest_int(s) for s in st.siblings]},
            })
        query_rounds.append({
            "initial_trees_proof": {"evals_proofs": evals_proofs},
            "steps": steps,
        })
    return {
        "proof": {
            "wires_cap": [_digest_int(h) for h in proof.wires_cap],
            "plonk_zs_partial_products_cap": [
                _digest_int(h) for h in proof.plonk_zs_partial_products_cap],
            "quotient_polys_cap": [
                _digest_int(h) for h in proof.quotient_polys_cap],
            "openings": {
                "constants": [_ext(e) for e in o.constants],
                "plonk_sigmas": [_ext(e) for e in o.plonk_sigmas],
                "wires": [_ext(e) for e in o.wires],
                "plonk_zs": [_ext(e) for e in o.plonk_zs],
                "plonk_zs_next": [_ext(e) for e in o.plonk_zs_next],
                "partial_products": [_ext(e) for e in o.partial_products],
                "quotient_polys": [_ext(e) for e in o.quotient_polys],
                "lookup_zs": [],
                "lookup_zs_next": [],
            },
            "opening_proof": {
                "commit_phase_merkle_caps": [
                    [_digest_int(h) for h in cap]
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
        "constants_sigmas_cap": [_digest_int(h)
                                 for h in vdata.constants_sigmas_cap],
        "circuit_digest": _digest_int(vdata.circuit_digest),
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
