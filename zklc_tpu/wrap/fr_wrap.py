"""The "fr" wrap flavor: produce + host-verify wrap proofs whose transcript
is BN254-native, the statement the in-repo Groth16 pipeline compiles to
R1CS (wrap/verifier_r1cs.py).

Pipeline position (reference: bin/prove_block.rs:279-300 wrap + the gnark
verify of cmd/web-api.go):

    final BFT proof (GL transcript)
      -> wrap_proof_fr: one recursion circuit under fr_wrap_config
         (BN254 Merkle caps + FrChallenger transcript, plonk/config.py)
      -> verify_fr (host oracle, this file)  == the R1CS statement
      -> wrap/verifier_r1cs compile -> groth16.prove -> 256-byte proof.

verify_fr is the executable spec of the R1CS circuit: same challenge
schedule, same vanishing evaluation (shared gate evaluators), same FRI
checks — kept host-side so every circuit stage can be diffed against it.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from ..hash import poseidon_bn128 as pb
from ..plonk import prover
from ..plonk.algebra import HostExt, EvalVars
from ..plonk.config import CircuitConfig
from ..plonk.recursion import RecursiveVerifier, recursive_proof_circuit
from .wrap import assert_gnark_gate_set
from .gnark_oracle import _verify_merkle_fr, _interpolate, OracleError


def _check(cond, msg):
    if not cond:
        raise OracleError(msg)


_fr_wrap_cache: dict = {}


def wrap_proof_fr(inner_data, inner_proof, config: CircuitConfig = None):
    """Re-prove (inner_data, inner_proof) under the fr transcript flavor.

    Returns (wrap_data, wrap_proof); PIs are the inner proof's,
    re-registered (the prove_block.rs:293-299 convention)."""
    prover.ensure_constants_sigmas_commitment(inner_data)
    key = (id(inner_data), id(config))
    if key not in _fr_wrap_cache:
        b, pt = recursive_proof_circuit(
            inner_data.common, inner_data.verifier_only,
            config=config or CircuitConfig.fr_wrap_config())
        data = b.build()
        assert_gnark_gate_set(data.common)
        _fr_wrap_cache[key] = (data, pt)
    data, pt = _fr_wrap_cache[key]
    inputs: dict = {}
    RecursiveVerifier.set_proof_targets(pt, inner_proof, inputs)
    proof = prover.prove(data, inputs)
    return data, proof


# ---------------------------------------------------------------------------
# Host verifier (the R1CS statement's executable spec)
# ---------------------------------------------------------------------------

def get_challenges_fr(common, circuit_digest: int, proof):
    """Challenge schedule of the fr flavor — identical ORDER to the gl/bn128
    verifiers (verifier.py:33 / gnark verifier.go:45), FrChallenger sponge."""
    cfg = common.config
    fc = cfg.fri_config
    nc = cfg.num_challenges
    pi_hash = pos.hash_no_pad(proof.public_inputs) \
        if len(proof.public_inputs) else np.zeros(4, dtype=np.uint64)
    ch = pb.FrChallenger()
    ch.observe_fr(circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    alphas = ch.get_n_challenges(nc)
    ch.observe_cap(proof.quotient_polys_cap)
    zeta = np.array(ch.get_extension_challenge(), dtype=np.uint64)
    for v in proof.openings.fri_batch_zeta():
        ch.observe_extension(v)
    for v in proof.openings.fri_batch_zeta_next():
        ch.observe_extension(v)
    fri_alpha = np.array(ch.get_extension_challenge(), dtype=np.uint64)
    fri_betas = []
    for cap in proof.opening_proof.commit_phase_merkle_caps:
        ch.observe_cap(cap)
        fri_betas.append(np.array(ch.get_extension_challenge(),
                                  dtype=np.uint64))
    for c in proof.opening_proof.final_poly:
        ch.observe_extension(c)
    ch.observe_element(proof.opening_proof.pow_witness)
    pow_response = ch.get_challenge()
    indices = [int(ch.get_challenge()) & ((1 << common.fri_params.lde_bits)
                                          - 1)
               for _ in range(fc.num_query_rounds)]
    return dict(betas=betas, gammas=gammas, alphas=alphas, zeta=zeta,
                fri_alpha=fri_alpha, fri_betas=fri_betas,
                pow_response=pow_response, indices=indices, pi_hash=pi_hash)


def _eval_vanishing(common, ch, o):
    """Shared-evaluator vanishing check at zeta (= gnark_oracle
    eval_vanishing, generic over CommonData objects)."""
    from ..plonk import verifier as V
    from ..plonk.proof import ProofChallenges
    pc = ProofChallenges(
        plonk_betas=ch["betas"], plonk_gammas=ch["gammas"],
        plonk_alphas=ch["alphas"], plonk_zeta=ch["zeta"],
        fri_alpha=ch["fri_alpha"], fri_betas=ch["fri_betas"],
        fri_pow_response=ch["pow_response"],
        fri_query_indices=ch["indices"], plonk_deltas=[])
    return V.eval_vanishing_at_zeta(common, pc, o, ch["pi_hash"])


def verify_fr(proof, verifier_only, common) -> bool:
    """Full fr-flavor verification; raises OracleError on failure."""
    cfg = common.config
    fc = cfg.fri_config
    nc = cfg.num_challenges
    _check(cfg.hasher == "fr", "not an fr-flavor proof")
    ch = get_challenges_fr(common, verifier_only.circuit_digest, proof)
    o = proof.openings

    # vanishing / quotient consistency at zeta
    vanishing, zeta_pow_n, zh_zeta = _eval_vanishing(common, ch, o)
    zeta = ch["zeta"]
    q = common.quotient_degree_factor
    for ci in range(nc):
        chunk = o.quotient_polys[ci * q:(ci + 1) * q]
        acc = np.zeros(2, dtype=np.uint64)
        for v in chunk[::-1]:
            acc = gl64.ext_add(gl64.ext_mul(acc, zeta_pow_n), v)
        rhs = gl64.ext_mul(zh_zeta, acc)
        _check(np.array_equal(vanishing[ci], rhs),
               f"vanishing check failed (challenge {ci})")

    # FRI
    _check(int(ch["pow_response"]) < (1 << (56 - fc.proof_of_work_bits)),
           "proof-of-work check failed")
    op = proof.opening_proof
    _check(len(op.query_round_proofs) == fc.num_query_rounds,
           "bad query round count")
    alpha = ch["fri_alpha"]
    alg = HostExt()
    batch0 = list(o.fri_batch_zeta())
    batch1 = list(o.fri_batch_zeta_next())
    reduced_openings = []
    for batch in (batch0, batch1):
        acc = alg.zero()
        for v in batch[::-1]:
            acc = alg.add(alg.mul(acc, alpha), v)
        reduced_openings.append(acc)

    g = gl64.primitive_root_of_unity(common.degree_bits)
    zeta_next = gl64.ext_mul(np.array([g, 0], dtype=np.uint64), zeta)
    n_cs = common.num_constants + cfg.num_routed_wires
    n_wires = cfg.num_wires
    n_zspp = nc * (1 + common.num_partial_products)
    n_quot = nc * q
    batch0_polys = [(0, i) for i in range(n_cs)] + \
        [(1, i) for i in range(n_wires)] + \
        [(2, i) for i in range(n_zspp)] + \
        [(3, i) for i in range(n_quot)]
    batch1_polys = [(2, i) for i in range(nc)]
    batches = [(batch0_polys, zeta, reduced_openings[0]),
               (batch1_polys, zeta_next, reduced_openings[1])]

    initial_caps = [verifier_only.constants_sigmas_cap, proof.wires_cap,
                    proof.plonk_zs_partial_products_cap,
                    proof.quotient_polys_cap]
    lde_bits = common.fri_params.lde_bits
    for q_idx, x_index in enumerate(ch["indices"]):
        rp = op.query_round_proofs[q_idx]
        for oi, (leaf, sibs) in enumerate(rp.initial_trees_proof.evals_proofs):
            _check(_verify_merkle_fr(leaf, x_index, sibs, initial_caps[oi]),
                   f"initial tree {oi} merkle proof failed @{x_index}")
        rev = int(format(x_index, f"0{lde_bits}b")[::-1], 2)
        subgroup_x = np.uint64(
            (gl64.MULTIPLICATIVE_GROUP_GENERATOR *
             pow(gl64.primitive_root_of_unity(lde_bits), rev, gl64.P))
            % gl64.P)
        sx = alg.from_base(subgroup_x)
        total = alg.zero()
        for polys, point, red_open in batches:
            evals = [alg.from_base(
                rp.initial_trees_proof.evals_proofs[oi][0][pi])
                for (oi, pi) in polys]
            acc = alg.zero()
            for v in evals[::-1]:
                acc = alg.add(alg.mul(acc, alpha), v)
            numerator = alg.sub(acc, red_open)
            denominator = alg.sub(sx, point)
            total = alg.mul(total, gl64.ext_pow_const(alpha, len(evals)))
            total = alg.add(total, alg.mul(numerator,
                                           gl64.ext_inv(denominator)))
        old_eval = total
        cur_index, cur_x = x_index, subgroup_x
        for si, arity_bits in enumerate(common.fri_params.reduction_arity_bits):
            arity = 1 << arity_bits
            step = rp.steps[si]
            within = cur_index & (arity - 1)
            coset_index = cur_index >> arity_bits
            _check(np.array_equal(step.evals[within], old_eval),
                   f"fold consistency failed at step {si}")
            g_arity = gl64.primitive_root_of_unity(arity_bits)
            rev_within = int(format(within, f"0{arity_bits}b")[::-1], 2)
            coset_start = gl64.mul(
                cur_x, np.uint64(pow(g_arity, (arity - rev_within) % arity,
                                     gl64.P)))
            ys = np.zeros_like(step.evals)
            for i in range(arity):
                ri = int(format(i, f"0{arity_bits}b")[::-1], 2)
                ys[ri] = step.evals[i]
            xs = np.zeros((arity, 2), dtype=np.uint64)
            acc_x = coset_start
            for i in range(arity):
                xs[i] = [acc_x, 0]
                acc_x = gl64.mul(acc_x, np.uint64(g_arity))
            old_eval = _interpolate(xs, ys, ch["fri_betas"][si])
            flat = step.evals.reshape(-1)
            _check(_verify_merkle_fr(flat, coset_index, step.siblings,
                                     op.commit_phase_merkle_caps[si]),
                   f"commit-phase tree {si} merkle proof failed")
            cur_index = coset_index
            cur_x = gl64.pow_const(cur_x, arity)
        fx = alg.from_base(cur_x)
        acc = alg.zero()
        for coeff in op.final_poly[::-1]:
            acc = alg.add(alg.mul(acc, fx), coeff)
        _check(np.array_equal(acc, old_eval),
               f"final poly mismatch at query {q_idx}")
    return True
