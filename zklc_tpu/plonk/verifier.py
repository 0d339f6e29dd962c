"""CPU verifier: full plonky2-protocol verification of our proofs.

Independent of the prover's code paths wherever possible (host numpy ext
algebra, recomputed challenges, Merkle checks via hash/poseidon.py).
Logic mirrors the reference verifier chip exactly:
  - challenges: gnark-plonky2-verifier/verifier/verifier.go:45-85
  - vanishing check: plonk/plonk.go:121-250
  - FRI: fri/fri.go:208-548
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from . import poly_host as ph
from .algebra import HostExt, EvalVars
from .builder import CommonData, VerifierOnlyData
from .commitment import verify_merkle_proof
from .proof import Proof, ProofChallenges
from . import gates as G


class VerificationError(Exception):
    pass


def _check(cond, msg):
    if not cond:
        raise VerificationError(msg)


def get_challenges(common: CommonData, verifier_data: VerifierOnlyData,
                   proof: Proof) -> ProofChallenges:
    cfg = common.config
    fc = cfg.fri_config
    pi_hash = pos.hash_no_pad(proof.public_inputs) \
        if len(proof.public_inputs) else np.zeros(4, dtype=np.uint64)
    ch = pos.Challenger()
    ch.observe_hash(verifier_data.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.get_n_challenges(cfg.num_challenges)
    gammas = ch.get_n_challenges(cfg.num_challenges)
    deltas = ch.get_n_challenges(cfg.num_challenges) \
        if common.lookup is not None else []
    ch.observe_cap(proof.plonk_zs_partial_products_cap)
    alphas = ch.get_n_challenges(cfg.num_challenges)
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
        fri_betas.append(np.array(ch.get_extension_challenge(), dtype=np.uint64))
    for c in proof.opening_proof.final_poly:
        ch.observe_extension(c)
    ch.observe_element(proof.opening_proof.pow_witness)
    pow_response = ch.get_challenge()
    indices = [int(ch.get_challenge()) & ((1 << common.fri_params.lde_bits) - 1)
               for _ in range(fc.num_query_rounds)]
    return ProofChallenges(
        plonk_betas=betas, plonk_gammas=gammas, plonk_alphas=alphas,
        plonk_zeta=zeta, fri_alpha=fri_alpha, fri_betas=fri_betas,
        fri_pow_response=pow_response, fri_query_indices=indices,
        plonk_deltas=deltas), pi_hash


def eval_vanishing_at_zeta(common: CommonData, challenges, openings, pi_hash):
    """plonk.go evalVanishingPoly at zeta (HostExt algebra)."""
    alg = HostExt()
    cfg = common.config
    o = openings
    zeta = challenges.plonk_zeta
    n = common.degree
    zeta_pow_n = gl64.ext_pow_const(zeta, n)

    num_selectors = common.num_selectors
    vars_ = EvalVars(
        local_constants=[o.constants[num_selectors + i]
                         for i in range(common.num_constants - num_selectors)],
        local_wires=[o.wires[i] for i in range(cfg.num_wires)],
        public_inputs_hash=[alg.from_base(h) for h in pi_hash],
    )

    # gate constraint terms
    constraint_terms = [alg.zero() for _ in range(common.num_gate_constraints)]
    many = num_selectors > 1
    for gi, gate in enumerate(common.gate_types):
        si = common.selector_indices[gi]
        start, end = common.selector_groups[si]
        s = o.constants[si]
        filt = alg.one()
        for k in range(start, end):
            if k == gi:
                continue
            filt = alg.mul(filt, alg.sub(alg.const(k), s))
        if many:
            filt = alg.mul(filt, alg.sub(alg.const(G.UNUSED_SELECTOR), s))
        for ci, c in enumerate(gate.eval_unfiltered(alg, vars_)):
            constraint_terms[ci] = alg.add(constraint_terms[ci],
                                           alg.mul(c, filt))

    # L_0(zeta) = (zeta^n - 1) / (n * (zeta - 1))
    zh_zeta = gl64.ext_sub(zeta_pow_n, alg.one())
    denom = gl64.ext_sub(gl64.ext_scalar_mul(np.uint64(n), zeta), alg.const(n))
    l0_zeta = gl64.ext_mul(zh_zeta, gl64.ext_inv(denom))

    nc = cfg.num_challenges
    npp = common.num_partial_products
    routed = cfg.num_routed_wires
    q = common.quotient_degree_factor
    num_chunks = (routed + q - 1) // q

    z1_terms = []
    pp_terms = []
    for ci in range(nc):
        beta = alg.from_base(np.uint64(challenges.plonk_betas[ci]))
        gamma = alg.from_base(np.uint64(challenges.plonk_gammas[ci]))
        z1_terms.append(alg.mul(l0_zeta, alg.sub(o.plonk_zs[ci], alg.one())))
        nume_vals, deno_vals = [], []
        for j in range(routed):
            sid = gl64.ext_scalar_mul(common.k_is[j], zeta)
            wv_g = alg.add(o.wires[j], gamma)
            nume_vals.append(alg.add(alg.mul(beta, sid), wv_g))
            deno_vals.append(alg.add(alg.mul(beta, o.plonk_sigmas[j]), wv_g))
        accs = [o.plonk_zs[ci]] + \
            [o.partial_products[ci * npp + i] for i in range(npp)] + \
            [o.plonk_zs_next[ci]]
        for m in range(num_chunks):
            nume = alg.one()
            deno = alg.one()
            for j in range(m * q, min((m + 1) * q, routed)):
                nume = alg.mul(nume, nume_vals[j])
                deno = alg.mul(deno, deno_vals[j])
            pp_terms.append(alg.sub(alg.mul(accs[m], nume),
                                    alg.mul(accs[m + 1], deno)))

    lookup_terms = []
    if common.lookup is not None:
        from . import lookup as lk_mod
        lk = common.lookup
        block = lk.block_len
        s_val = o.constants[lk.s_col]
        table_vals = [o.constants[c] for c in lk.table_cols]
        m_vals = [o.wires[cfg.num_wires + ti] for ti in range(lk.num_tables)]
        for ci in range(nc):
            blk = [o.lookups[ci * block + j] for j in range(block)]
            z_next = o.lookup_zs_next[ci]
            delta = alg.from_base(np.uint64(challenges.plonk_deltas[ci]))
            lookup_terms.extend(lk_mod.lookup_terms_one_round(
                alg, lk, o.wires, s_val, table_vals, m_vals, blk,
                z_next, delta, l0_zeta))

    all_terms = z1_terms + pp_terms + lookup_terms + constraint_terms
    reduced = []
    for ci in range(nc):
        alpha = alg.from_base(np.uint64(challenges.plonk_alphas[ci]))
        acc = alg.zero()
        for t in reversed(all_terms):
            acc = alg.add(alg.mul(acc, alpha), t)
        reduced.append(acc)
    return reduced, zeta_pow_n, zh_zeta


def verify_fri(common: CommonData, proof: Proof, challenges: ProofChallenges,
               initial_caps):
    """fri.go VerifyFriProof."""
    fp = common.fri_params
    fc = fp.config
    op = proof.opening_proof
    alg = HostExt()

    _check(int(challenges.fri_pow_response) < (1 << (64 - fc.proof_of_work_bits)),
           "proof-of-work check failed")
    _check(len(op.query_round_proofs) == fc.num_query_rounds, "bad query count")

    alpha = challenges.fri_alpha
    batch0 = proof.openings.fri_batch_zeta()
    batch1 = proof.openings.fri_batch_zeta_next()
    reduced_openings = []
    for batch in (batch0, batch1):
        acc = alg.zero()
        for v in batch[::-1]:
            acc = alg.add(alg.mul(acc, alpha), v)
        reduced_openings.append(acc)

    g = gl64.primitive_root_of_unity(common.degree_bits)
    zeta = challenges.plonk_zeta
    zeta_next = gl64.ext_mul(np.array([g, 0], dtype=np.uint64), zeta)
    batch_points = [zeta, zeta_next]
    # per-batch polynomial lists: (oracle_index, poly_index)
    nc = common.config.num_challenges
    n_cs = common.num_constants + common.config.num_routed_wires
    n_wires = common.num_wire_polys
    n_zspp = common.num_zspp_polys
    n_perm = nc * (1 + common.num_partial_products)
    n_quot = nc * common.quotient_degree_factor
    batch0_polys = [(0, i) for i in range(n_cs)] + \
        [(1, i) for i in range(n_wires)] + \
        [(2, i) for i in range(n_zspp)] + \
        [(3, i) for i in range(n_quot)]
    batch1_polys = [(2, i) for i in range(nc)]
    if common.lookup_block:
        batch1_polys += [(2, n_perm + ci * common.lookup_block)
                         for ci in range(nc)]
    batches = [(batch0_polys, batch_points[0], reduced_openings[0]),
               (batch1_polys, batch_points[1], reduced_openings[1])]

    lde_bits = fp.lde_bits
    for q_idx, x_index in enumerate(challenges.fri_query_indices):
        rp = op.query_round_proofs[q_idx]
        # 1. initial tree Merkle checks
        _check(len(rp.initial_trees_proof.evals_proofs) == len(initial_caps),
               "oracle count mismatch")
        for oi, (leaf, sibs) in enumerate(rp.initial_trees_proof.evals_proofs):
            _check(verify_merkle_proof(leaf, x_index, sibs, initial_caps[oi]),
                   f"initial tree {oi} merkle proof failed @ {x_index}")
        # 2. combine initial evaluations
        rev = int(format(x_index, f"0{lde_bits}b")[::-1], 2)
        subgroup_x = np.uint64(
            (gl64.MULTIPLICATIVE_GROUP_GENERATOR *
             pow(gl64.primitive_root_of_unity(lde_bits), rev, gl64.P)) % gl64.P)
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
            alpha_pow = gl64.ext_pow_const(alpha, len(evals))
            total = alg.mul(total, alpha_pow)
            total = alg.add(total, alg.mul(numerator,
                                           gl64.ext_inv(denominator)))
        old_eval = total
        # 3. fold steps
        cur_index = x_index
        cur_x = subgroup_x
        for si, arity_bits in enumerate(fp.reduction_arity_bits):
            arity = 1 << arity_bits
            step = rp.steps[si]
            within = cur_index & (arity - 1)
            coset_index = cur_index >> arity_bits
            _check(np.array_equal(step.evals[within], old_eval),
                   f"fold consistency failed at step {si}")
            # interpolate the coset at beta
            g_arity = gl64.primitive_root_of_unity(arity_bits)
            rev_within = int(format(within, f"0{arity_bits}b")[::-1], 2)
            coset_start = gl64.mul(
                cur_x, np.uint64(pow(g_arity, (arity - rev_within) % arity,
                                     gl64.P)))
            # permuted evals: y[rev(i)] = evals[i]
            ys = np.zeros_like(step.evals)
            for i in range(arity):
                ri = int(format(i, f"0{arity_bits}b")[::-1], 2)
                ys[ri] = step.evals[i]
            xs = np.zeros((arity, 2), dtype=np.uint64)
            acc_x = coset_start
            for i in range(arity):
                xs[i] = [acc_x, 0]
                acc_x = gl64.mul(acc_x, np.uint64(g_arity))
            old_eval = _interpolate(xs, ys, challenges.fri_betas[si])
            # merkle check of the step leaf
            flat = step.evals.reshape(-1)
            _check(verify_merkle_proof(
                flat, coset_index, step.siblings,
                op.commit_phase_merkle_caps[si]),
                f"commit-phase tree {si} merkle proof failed")
            cur_index = coset_index
            cur_x = gl64.pow_const(cur_x, arity)
        # 4. final poly evaluation
        fx = alg.from_base(cur_x)
        acc = alg.zero()
        for c in op.final_poly[::-1]:
            acc = alg.add(alg.mul(acc, fx), c)
        _check(np.array_equal(acc, old_eval),
               f"final poly mismatch at query {q_idx}")


def _interpolate(xs, ys, beta):
    """Barycentric-free Lagrange interpolation at beta (small arity)."""
    n = xs.shape[0]
    total = np.zeros(2, dtype=np.uint64)
    for i in range(n):
        num = ys[i]
        den = np.array([1, 0], dtype=np.uint64)
        for j in range(n):
            if j == i:
                continue
            num = gl64.ext_mul(num, gl64.ext_sub(beta, xs[j]))
            den = gl64.ext_mul(den, gl64.ext_sub(xs[i], xs[j]))
        total = gl64.ext_add(total, gl64.ext_mul(num, gl64.ext_inv(den)))
    return total


def verify(proof: Proof, verifier_data: VerifierOnlyData, common: CommonData):
    cfg = common.config
    _check(len(proof.public_inputs) == common.num_public_inputs,
           "wrong number of public inputs")
    challenges, pi_hash = get_challenges(common, verifier_data, proof)

    # vanishing polynomial check at zeta
    vanishing, zeta_pow_n, zh_zeta = eval_vanishing_at_zeta(
        common, challenges, proof.openings, pi_hash)
    for ci in range(cfg.num_challenges):
        qdf = common.quotient_degree_factor
        chunk = proof.openings.quotient_polys[ci * qdf: (ci + 1) * qdf]
        acc = np.zeros(2, dtype=np.uint64)
        for v in chunk[::-1]:
            acc = gl64.ext_add(gl64.ext_mul(acc, zeta_pow_n), v)
        rhs = gl64.ext_mul(zh_zeta, acc)
        _check(np.array_equal(vanishing[ci], rhs),
               f"vanishing polynomial check failed (challenge {ci})")

    # FRI
    initial_caps = [verifier_data.constants_sigmas_cap, proof.wires_cap,
                    proof.plonk_zs_partial_products_cap,
                    proof.quotient_polys_cap]
    verify_fri(common, proof, challenges, initial_caps)
    return True
