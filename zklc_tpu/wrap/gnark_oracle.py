"""CPU replay of the gnark-plonky2-verifier: the interop oracle.

Verifies a BN128-wrapped plonky2 proof from its JSON artifacts with EXACTLY
the semantics the Go wrapper enforces in-circuit:

  - challenges:  verifier/verifier.go:44-80 GetChallenges +
                 challenger/challenger.go:42-146 (GL Poseidon duplex sponge;
                 BN254 cap hashes observed through ToVec 56-bit chunks,
                 poseidon/bn254.go:106)
  - gate evals:  plonk/gates/evaluate_gates.go:30-105 (selector filters over
                 the gate set parsed from common_circuit_data's id strings)
  - vanishing:   plonk/plonk.go:60-250
  - FRI:         fri/fri.go:75-548 (BN254-Fr Merkle caps, HashOrNoop leaves,
                 coset interpolation, PoW leading-zero check)

A proof this module accepts, gnark's CircuitFixed accepts — this is the
in-repo compatibility oracle for the wrap pipeline (VERDICT round-1 #3).
It verifies the reference's own testdata/test_circuit proof
(tests/test_gnark_oracle.py), which pins every transcript and algebraic
detail to the Go implementation.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from ..hash import poseidon_bn128 as pb
from ..plonk import serialization as S
from ..plonk.algebra import HostExt, EvalVars
from ..plonk.gates_ext import gate_from_id
from ..plonk.gates import UNUSED_SELECTOR


class OracleError(Exception):
    pass


def _check(cond, msg):
    if not cond:
        raise OracleError(msg)


class BN128Challenger(pos.Challenger):
    """The GL duplex sponge, with BN254-Fr hashes observed via ToVec."""

    def observe_fr(self, fr: int):
        self.observe_elements(pb.fr_to_vec(fr))

    def observe_fr_cap(self, cap):
        for h in cap:
            self.observe_fr(int(h))


def _verify_merkle_fr(leaf_values, leaf_index: int, siblings, cap) -> bool:
    """fri.go:97 verifyMerkleProofToCapWithCapIndex (BN254 nodes)."""
    digest = pb.hash_or_noop_bn128(leaf_values)
    idx = leaf_index
    for sib in siblings:
        if idx & 1:
            digest = pb.two_to_one_bn128(int(sib), digest)
        else:
            digest = pb.two_to_one_bn128(digest, int(sib))
        idx >>= 1
    return digest == int(cap[idx])


class GnarkOracle:
    """Verifier instance bound to one circuit's common data (the parsed
    common_circuit_data.json dict)."""

    def __init__(self, common_json: dict):
        self.c = S.common_data_from_json(common_json)
        self.gates = [gate_from_id(g) for g in self.c["gates"]]
        self.num_selectors = len(self.c["selector_groups"])
        self.degree = 1 << self.c["degree_bits"]
        self.lde_bits = self.c["degree_bits"] + self.c["rate_bits"]

    # -- Fiat-Shamir ------------------------------------------------------

    def get_challenges(self, proof, circuit_digest: int):
        c = self.c
        nc = c["num_challenges"]
        pi_hash = pos.hash_no_pad(proof.public_inputs) \
            if len(proof.public_inputs) else np.zeros(4, dtype=np.uint64)
        ch = BN128Challenger()
        ch.observe_fr(circuit_digest)
        ch.observe_hash(pi_hash)
        ch.observe_fr_cap(proof.wires_cap)
        betas = ch.get_n_challenges(nc)
        gammas = ch.get_n_challenges(nc)
        ch.observe_fr_cap(proof.plonk_zs_partial_products_cap)
        alphas = ch.get_n_challenges(nc)
        ch.observe_fr_cap(proof.quotient_polys_cap)
        zeta = np.array(ch.get_extension_challenge(), dtype=np.uint64)
        for v in self._zeta_batch(proof.openings):
            ch.observe_extension(v)
        for v in proof.openings.plonk_zs_next:
            ch.observe_extension(v)
        fri_alpha = np.array(ch.get_extension_challenge(), dtype=np.uint64)
        fri_betas = []
        for cap in proof.opening_proof.commit_phase_merkle_caps:
            ch.observe_fr_cap(cap)
            fri_betas.append(
                np.array(ch.get_extension_challenge(), dtype=np.uint64))
        for coeff in proof.opening_proof.final_poly:
            ch.observe_extension(coeff)
        ch.observe_element(proof.opening_proof.pow_witness)
        pow_response = ch.get_challenge()
        indices = [int(ch.get_challenge()) & ((1 << self.lde_bits) - 1)
                   for _ in range(c["num_query_rounds"])]
        return dict(betas=betas, gammas=gammas, alphas=alphas, zeta=zeta,
                    fri_alpha=fri_alpha, fri_betas=fri_betas,
                    pow_response=pow_response, indices=indices,
                    pi_hash=pi_hash)

    @staticmethod
    def _zeta_batch(o):
        """fri.go:63 ToOpenings zeta batch order."""
        return list(o.constants) + list(o.plonk_sigmas) + list(o.wires) + \
            list(o.plonk_zs) + list(o.partial_products) + \
            list(o.quotient_polys)

    # -- vanishing polynomial at zeta --------------------------------------

    def eval_vanishing(self, ch, o):
        c = self.c
        alg = HostExt()
        zeta = ch["zeta"]
        n = self.degree
        zeta_pow_n = gl64.ext_pow_const(zeta, n)
        ns = self.num_selectors
        vars_ = EvalVars(
            local_constants=[o.constants[ns + i]
                             for i in range(len(o.constants) - ns)],
            local_wires=list(o.wires),
            public_inputs_hash=[alg.from_base(h) for h in ch["pi_hash"]],
        )
        # gate constraints with selector filters (evaluate_gates.go:30-105)
        terms = [alg.zero() for _ in range(c["num_gate_constraints"])]
        many = ns > 1
        for gi, gate in enumerate(self.gates):
            si = c["selector_indices"][gi]
            start, end = c["selector_groups"][si]
            s = o.constants[si]
            filt = alg.one()
            for k in range(start, end):
                if k == gi:
                    continue
                filt = alg.mul(filt, alg.sub(alg.const(k), s))
            if many:
                filt = alg.mul(filt, alg.sub(alg.const(UNUSED_SELECTOR), s))
            for ci, term in enumerate(gate.eval_unfiltered(alg, vars_)):
                terms[ci] = alg.add(terms[ci], alg.mul(term, filt))

        # L_0(zeta)
        zh_zeta = gl64.ext_sub(zeta_pow_n, alg.one())
        denom = gl64.ext_sub(gl64.ext_scalar_mul(np.uint64(n), zeta),
                             alg.const(n))
        l0_zeta = gl64.ext_mul(zh_zeta, gl64.ext_inv(denom))

        nc = c["num_challenges"]
        npp = c["num_partial_products"]
        routed = c["num_routed_wires"]
        q = c["quotient_degree_factor"]
        z1_terms, pp_terms = [], []
        for ci in range(nc):
            beta = alg.from_base(np.uint64(ch["betas"][ci]))
            gamma = alg.from_base(np.uint64(ch["gammas"][ci]))
            z1_terms.append(alg.mul(l0_zeta,
                                    alg.sub(o.plonk_zs[ci], alg.one())))
            nume, deno = [], []
            for j in range(routed):
                sid = gl64.ext_scalar_mul(np.uint64(c["k_is"][j]), zeta)
                wv_g = alg.add(o.wires[j], gamma)
                nume.append(alg.add(alg.mul(beta, sid), wv_g))
                deno.append(alg.add(alg.mul(beta, o.plonk_sigmas[j]), wv_g))
            accs = [o.plonk_zs[ci]] + \
                [o.partial_products[ci * npp + i] for i in range(npp)] + \
                [o.plonk_zs_next[ci]]
            for m in range(npp + 1):
                np_, dp = alg.one(), alg.one()
                for j in range(m * q, min((m + 1) * q, routed)):
                    np_ = alg.mul(np_, nume[j])
                    dp = alg.mul(dp, deno[j])
                pp_terms.append(alg.sub(alg.mul(accs[m], np_),
                                        alg.mul(accs[m + 1], dp)))
        all_terms = z1_terms + pp_terms + terms
        reduced = []
        for ci in range(nc):
            alpha = alg.from_base(np.uint64(ch["alphas"][ci]))
            acc = alg.zero()
            for t in reversed(all_terms):
                acc = alg.add(alg.mul(acc, alpha), t)
            reduced.append(acc)
        return reduced, zeta_pow_n, zh_zeta

    # -- FRI ----------------------------------------------------------------

    def verify_fri(self, proof, ch, initial_caps):
        c = self.c
        alg = HostExt()
        op = proof.opening_proof
        _check(int(ch["pow_response"]) <
               (1 << (64 - c["proof_of_work_bits"])),
               "proof-of-work check failed")
        _check(len(op.query_round_proofs) == c["num_query_rounds"],
               "bad query round count")
        alpha = ch["fri_alpha"]
        o = proof.openings
        batch0 = self._zeta_batch(o)
        batch1 = list(o.plonk_zs_next)
        reduced_openings = []
        for batch in (batch0, batch1):
            acc = alg.zero()
            for v in batch[::-1]:
                acc = alg.add(alg.mul(acc, alpha), v)
            reduced_openings.append(acc)

        g = gl64.primitive_root_of_unity(c["degree_bits"])
        zeta = ch["zeta"]
        zeta_next = gl64.ext_mul(np.array([g, 0], dtype=np.uint64), zeta)
        # per-batch polynomial (oracle, index) lists (fri_utils.go)
        nc = c["num_challenges"]
        n_cs = c["num_constants"] + c["num_routed_wires"]
        n_wires = c["num_wires"]
        n_zspp = nc * (1 + c["num_partial_products"])
        n_quot = nc * c["quotient_degree_factor"]
        batch0_polys = [(0, i) for i in range(n_cs)] + \
            [(1, i) for i in range(n_wires)] + \
            [(2, i) for i in range(n_zspp)] + \
            [(3, i) for i in range(n_quot)]
        batch1_polys = [(2, i) for i in range(nc)]
        batches = [(batch0_polys, zeta, reduced_openings[0]),
                   (batch1_polys, zeta_next, reduced_openings[1])]

        lde_bits = self.lde_bits
        for q_idx, x_index in enumerate(ch["indices"]):
            rp = op.query_round_proofs[q_idx]
            _check(len(rp.initial_trees_proof.evals_proofs) ==
                   len(initial_caps), "oracle count mismatch")
            for oi, (leaf, sibs) in enumerate(
                    rp.initial_trees_proof.evals_proofs):
                _check(_verify_merkle_fr(leaf, x_index, sibs,
                                         initial_caps[oi]),
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
            for si, arity_bits in enumerate(c["reduction_arity_bits"]):
                arity = 1 << arity_bits
                step = rp.steps[si]
                within = cur_index & (arity - 1)
                coset_index = cur_index >> arity_bits
                _check(np.array_equal(step.evals[within], old_eval),
                       f"fold consistency failed at step {si}")
                g_arity = gl64.primitive_root_of_unity(arity_bits)
                rev_within = int(format(within, f"0{arity_bits}b")[::-1], 2)
                coset_start = gl64.mul(
                    cur_x, np.uint64(pow(g_arity,
                                         (arity - rev_within) % arity,
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

    # -- top level ----------------------------------------------------------

    def verify(self, proof_json: dict, verifier_only_json: dict) -> bool:
        c = self.c
        proof = S.proof_from_json(proof_json)
        cap, digest = S.verifier_only_from_json(verifier_only_json)
        _check(len(proof.public_inputs) == c["num_public_inputs"],
               "wrong number of public inputs")
        ch = self.get_challenges(proof, digest)
        vanishing, zeta_pow_n, zh_zeta = self.eval_vanishing(
            ch, proof.openings)
        for ci in range(c["num_challenges"]):
            q = c["quotient_degree_factor"]
            chunk = proof.openings.quotient_polys[ci * q:(ci + 1) * q]
            acc = np.zeros(2, dtype=np.uint64)
            for v in chunk[::-1]:
                acc = gl64.ext_add(gl64.ext_mul(acc, zeta_pow_n), v)
            rhs = gl64.ext_mul(zh_zeta, acc)
            _check(np.array_equal(vanishing[ci], rhs),
                   f"vanishing check failed (challenge {ci})")
        initial_caps = [cap, proof.wires_cap,
                        proof.plonk_zs_partial_products_cap,
                        proof.quotient_polys_cap]
        self.verify_fri(proof, ch, initial_caps)
        return True


def _interpolate(xs, ys, beta):
    """Lagrange interpolation at beta (fri.go:314 computeEvaluation)."""
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


def verify_artifacts(dirname: str) -> bool:
    """Verify a proof artifact directory (proof.json + verifier_data.json +
    common_data.json) — the exact consumption path of gnark's web-api."""
    import json
    import os
    with open(os.path.join(dirname, "proof.json")) as f:
        pj = json.load(f)
    with open(os.path.join(dirname, "verifier_data.json")) as f:
        vj = json.load(f)
    with open(os.path.join(dirname, "common_data.json")) as f:
        cj = json.load(f)
    return GnarkOracle(cj).verify(pj, vj)
