"""FRI prover: batch opening proof with commit-phase folding and PoW grind.

Protocol semantics mirror the reference verifier exactly
(gnark-plonky2-verifier/fri/fri.go — our unforgiving oracle):
  - leaves live at bit-reversed LDE positions: index i <-> point 7*w^rev(i);
  - the reduced polynomial is sum_batches alpha-combined (f - f(pt))/(X - pt),
    batch 1 (Zs at g*zeta) entering as `acc*alpha^|batch| + next`;
  - commit-phase tree i holds the CURRENT polynomial's values grouped into
    arity-sized cosets per leaf (flattened [re, im] pairs); folding in
    coefficient space is a'_q = sum_r beta^r a_{arity*q + r};
  - PoW: find witness s.t. the next transcript challenge has
    proof_of_work_bits leading zeros.

Device work: coset NTTs of ext components per fold round; host: transcript,
fold (vectorized numpy), query extraction.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..field import gl64
from ..field import gl2x32 as gl
from ..ops import ntt as ntt_ops
from ..hash import poseidon as pos
from . import poly_host as ph
from .commitment import ExtPolynomialBatch, bit_rev_perm
from .proof import (FriProof, FriQueryRound, FriQueryStep, FriInitialTreeProof)


def ext_lde_bitrev(coeffs_ext: np.ndarray, log_n: int, rate_bits: int,
                   shift: int) -> np.ndarray:
    """Ext-coeff poly (m, 2) -> values over coset shift*<w_{m*8}>, bit-reversed.

    NTT is linear over the base field, so components transform independently.
    """
    m = coeffs_ext.shape[0]
    assert m == 1 << log_n
    pad = m * ((1 << rate_bits) - 1)
    comp = np.concatenate(
        [coeffs_ext, np.zeros((pad, 2), dtype=np.uint64)], axis=0).T  # (2, m*8)
    from . import commitment as _c
    if _c._use_host_path():
        vals_u64 = _c.host_coset_ntt(np.ascontiguousarray(comp),
                                     log_n + rate_bits, shift % gl64.P)
    else:
        dev = gl.from_u64_np(np.ascontiguousarray(comp))
        vals = ntt_ops.coset_ntt(dev, log_n + rate_bits, shift % gl64.P)
        vals_u64 = gl.to_u64_np(vals)  # (2, lde)
    rev = bit_rev_perm(log_n + rate_bits)
    return vals_u64[:, rev].T  # (lde, 2)


def fold_coeffs(coeffs_ext: np.ndarray, beta: np.ndarray, arity_bits: int):
    """a'_q = sum_r beta^r a_{arity*q+r}."""
    arity = 1 << arity_bits
    m = coeffs_ext.shape[0]
    grouped = coeffs_ext.reshape(m // arity, arity, 2)
    beta_pows = ph.ext_powers(beta, arity)  # (arity, 2)
    prods = gl64.ext_mul(grouped, beta_pows[None, :, :])
    # field-sum over the arity axis
    out0 = ph.field_sum(prods[..., 0], axis=1)
    out1 = ph.field_sum(prods[..., 1], axis=1)
    return np.stack([out0, out1], axis=-1)


def grind_pow(challenger: pos.Challenger, pow_bits: int,
              batch: int = 1 << 17) -> int:
    """Find pow_witness such that observing it then squeezing a challenge
    yields >= pow_bits leading zeros.

    TPU-native: the grind is a batched device Poseidon search — one duplex
    permutation per candidate, vectorized over the batch axis (the reference
    grinds sequentially on CPU threads; SURVEY.md §7 maps this to a batch
    kernel).  On the CPU backend the native C++ grind loop is used."""
    from ..hash import poseidon_bn128 as pb
    if isinstance(challenger, pb.FrChallenger):
        return pb.grind_pow_fr(challenger, pow_bits)
    from ..ops import poseidon_tpu
    base_state = challenger.sponge_state.copy()
    buf = list(challenger.input_buffer)
    nbuf = len(buf)
    from . import commitment as _c
    if _c._NATIVE is not None and nbuf < 8:
        from .. import native
        return native.poseidon_grind(
            base_state, np.array(buf, dtype=np.uint64), pow_bits)
    start = 0
    while True:
        cands = np.arange(start, start + batch, dtype=np.uint64)
        states = np.tile(base_state, (batch, 1))
        for i, b in enumerate(buf):
            states[:, i] = b
        states[:, nbuf] = cands  # witness goes into the next buffer slot
        out = poseidon_tpu.permute(gl.from_u64_np(states))
        c_hi, c_lo = gl.canonicalize((out[0][:, 7], out[1][:, 7]))
        ok = np.asarray(c_hi) < np.uint32(1 << (32 - pow_bits)) if pow_bits <= 32 \
            else (np.asarray(c_hi) == 0) & (np.asarray(c_lo) < np.uint32(1 << (64 - pow_bits)))
        hits = np.nonzero(ok)[0]
        if len(hits):
            return int(cands[hits[0]])
        start += batch


def prove_fri(
    oracles,                 # list of PolynomialBatch (4: cs, wires, zs, quot)
    poly_coeff_batches,      # [batch0 coeff matrix (num_polys, n),
                             #  batch1 coeff matrix]
    batch_points,            # [zeta, g*zeta] ext (2,) arrays
    challenger: pos.Challenger,
    fri_params,
    hasher: str = "gl",
) -> FriProof:
    cfg = fri_params.config
    n = 1 << fri_params.degree_bits
    lde_bits = fri_params.lde_bits

    alpha = np.array(challenger.get_extension_challenge(), dtype=np.uint64)

    # Reduced polynomial: final = Q0 * alpha^|batch1| + Q1
    reduced = []
    for coeff_mat, point in zip(poly_coeff_batches, batch_points):
        num_polys = coeff_mat.shape[0]
        apows = ph.ext_powers(alpha, num_polys)  # (num_polys, 2)
        comp0 = ph.field_sum(gl64.mul(coeff_mat, apows[:, None, 0]), axis=0)
        comp1 = ph.field_sum(gl64.mul(coeff_mat, apows[:, None, 1]), axis=0)
        R = np.stack([comp0, comp1], axis=-1)  # (n, 2)
        Q = ph.divide_by_linear_ext(R, point)  # (n-1, 2)
        Qp = np.zeros((n, 2), dtype=np.uint64)
        Qp[: Q.shape[0]] = Q
        reduced.append(Qp)
    alpha_shift = ph.ext_powers(alpha, poly_coeff_batches[1].shape[0] + 1)[-1]
    cur = gl64.ext_add(
        gl64.ext_mul(reduced[0], alpha_shift[None, :]), reduced[1])

    # Commit phase
    commit_trees = []
    caps = []
    betas = []
    shift = gl64.MULTIPLICATIVE_GROUP_GENERATOR
    cur_log_n = fri_params.degree_bits
    values_bitrev = ext_lde_bitrev(cur, cur_log_n, cfg.rate_bits, shift)
    for arity_bits in fri_params.reduction_arity_bits:
        tree = ExtPolynomialBatch(values_bitrev, arity_bits, cfg.cap_height,
                                  hasher=hasher)
        commit_trees.append(tree)
        caps.append(tree.cap)
        challenger.observe_cap(tree.cap)
        beta = np.array(challenger.get_extension_challenge(), dtype=np.uint64)
        betas.append(beta)
        cur = fold_coeffs(cur, beta, arity_bits)
        shift = pow(int(shift), 1 << arity_bits, gl64.P)
        cur_log_n -= arity_bits
        if len(commit_trees) < len(fri_params.reduction_arity_bits):
            values_bitrev = ext_lde_bitrev(cur, cur_log_n, cfg.rate_bits, shift)

    final_poly = cur  # (final_poly_len, 2)
    assert final_poly.shape[0] == fri_params.final_poly_len
    for c in final_poly:
        challenger.observe_extension(c)

    pow_witness = grind_pow(challenger, cfg.proof_of_work_bits)
    challenger.observe_element(pow_witness)
    _pow_response = challenger.get_challenge()

    query_indices = [
        int(challenger.get_challenge()) & ((1 << lde_bits) - 1)
        for _ in range(cfg.num_query_rounds)
    ]

    rounds = []
    for idx in query_indices:
        evals_proofs = []
        for oracle in oracles:
            leaf, sibs = oracle.merkle_proof(idx)
            evals_proofs.append((leaf, sibs))
        steps = []
        cur_idx = idx
        for tree, arity_bits in zip(commit_trees,
                                    fri_params.reduction_arity_bits):
            coset_idx = cur_idx >> arity_bits
            leaf, sibs = tree.merkle_proof(coset_idx)
            steps.append(FriQueryStep(
                evals=leaf.reshape(-1, 2).copy(), siblings=sibs))
            cur_idx = coset_idx
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
            steps=steps))

    return FriProof(
        commit_phase_merkle_caps=caps,
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )
