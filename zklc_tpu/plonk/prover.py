"""The prover: witness -> Proof.

Phase structure mirrors plonky2's `prove` (the engine behind every
`CircuitData::prove` call in the reference pipeline, SURVEY.md §3.1 hot
loop), re-organized as array programs:

  1. commit wires (device NTT/LDE + Poseidon Merkle),
  2. permutation argument: Z + partial products via vectorized log-scans,
  3. quotient: vanishing polynomial evaluated over the whole LDE coset at
     once (vectorized gate constraint evaluation), divided by Z_H,
  4. openings at zeta / g*zeta, 5. FRI opening proof (fri.py).

The Fiat-Shamir transcript order is exactly the reference verifier's
(gnark-plonky2-verifier/verifier/verifier.go:45-85 GetChallenges).
"""
from __future__ import annotations

import functools

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from . import poly_host as ph
from .algebra import HostBase, EvalVars
from .builder import ProverData
from .commitment import PolynomialBatch
from .config import FriParams
from .proof import Proof, OpeningSet
from .witness import generate_witness
from . import fri as fri_mod
from . import gates as G


def ensure_constants_sigmas_commitment(data: ProverData):
    if data.constants_sigmas_commitment is not None:
        return
    cfg = data.common.config
    fp = data.common.fri_params
    mat = np.concatenate([data.constants_rows, data.sigmas_rows], axis=1).T
    comm = PolynomialBatch(np.ascontiguousarray(mat), cfg.fri_config.rate_bits,
                           cfg.fri_config.cap_height, hasher=cfg.hasher)
    data.constants_sigmas_commitment = comm
    from .builder import VerifierOnlyData
    if cfg.hasher in ("bn128", "fr"):
        # Wrap config: digest = BN128 sponge over the Fr cap (ToVec chunks)
        # + degree_bits; VerifierOnlyData carries Fr ints.
        from ..hash import poseidon_bn128 as pb
        cap_fr = comm.cap
        digest_input = [c for h in cap_fr for c in pb.fr_to_vec(h)]
        digest_input.append(data.common.degree_bits)
        data.circuit_digest = pb.hash_no_pad_bn128(
            np.array(digest_input, dtype=np.uint64))
        data.verifier_only = VerifierOnlyData(
            constants_sigmas_cap=cap_fr, circuit_digest=data.circuit_digest)
        return
    digest_input = np.concatenate(
        [comm.cap_u64.ravel(),
         np.array([data.common.degree_bits], dtype=np.uint64)])
    data.circuit_digest = pos.hash_no_pad(digest_input)
    data.verifier_only = VerifierOnlyData(
        constants_sigmas_cap=comm.cap_u64, circuit_digest=data.circuit_digest)


@functools.lru_cache(maxsize=None)
def _coset_domain(degree_bits: int, rate_bits: int):
    """Host arrays for the LDE coset: points x, Z_H(x)^-1, L_0(x)."""
    n = 1 << degree_bits
    lde = n << rate_bits
    w = gl64.primitive_root_of_unity(degree_bits + rate_bits)
    x = ph.base_powers(w, lde)
    x = gl64.mul(x, np.uint64(gl64.MULTIPLICATIVE_GROUP_GENERATOR))
    # Z_H(x) = x^n - 1 is periodic with period 2^rate_bits
    shift_n = pow(gl64.MULTIPLICATIVE_GROUP_GENERATOR, n, gl64.P)
    zeta8 = pow(w, n, gl64.P)
    zh_short = np.array(
        [(shift_n * pow(zeta8, k, gl64.P) - 1) % gl64.P
         for k in range(1 << rate_bits)], dtype=np.uint64)
    zh_inv_short = ph.batch_inverse(zh_short)
    zh_inv = np.tile(zh_inv_short, n)
    # L_0(x) = (x^n - 1) / (n * (x - 1))
    zh = np.tile(zh_short, n)
    denom = gl64.mul(np.uint64(n), gl64.sub(x, np.uint64(1)))
    l0 = gl64.mul(zh, ph.batch_inverse(denom))
    return x, zh_inv, l0


def compute_zs_partial_products(common, wires, sigmas_rows, betas, gammas):
    """Returns matrix (num_challenges * (1 + num_pp), n): [all Zs, all pps]."""
    cfg = common.config
    n = common.degree
    routed = cfg.num_routed_wires
    q = common.quotient_degree_factor
    num_chunks = (routed + q - 1) // q
    g_pow = ph.base_powers(gl64.primitive_root_of_unity(common.degree_bits), n)
    sids = gl64.mul(common.k_is[None, :], g_pow[:, None])  # (n, routed)
    w = wires[:, :routed]
    zs, pps = [], []
    for beta, gamma in zip(betas, gammas):
        beta = np.uint64(beta)
        gamma = np.uint64(gamma)
        nums = gl64.add(gl64.add(w, gl64.mul(beta, sids)), gamma)
        dens = gl64.add(gl64.add(w, gl64.mul(beta, sigmas_rows)), gamma)
        # chunk products (n, num_chunks)
        def chunk_prod(m):
            out = np.ones((n, num_chunks), dtype=np.uint64)
            for c in range(num_chunks):
                seg = m[:, c * q: (c + 1) * q]
                acc = seg[:, 0]
                for j in range(1, seg.shape[1]):
                    acc = gl64.mul(acc, seg[:, j])
                out[:, c] = acc
            return out
        num_p = chunk_prod(nums)
        den_p = chunk_prod(dens)
        den_inv = ph.batch_inverse(den_p)
        ratio = gl64.mul(num_p, den_inv)           # (n, num_chunks)
        row_ratio = ratio[:, 0]
        for c in range(1, num_chunks):
            row_ratio = gl64.mul(row_ratio, ratio[:, c])
        # Z: Z[0] = 1, Z[r] = prod_{i<r} row_ratio[i]
        zvals = np.ones(n, dtype=np.uint64)
        zvals[1:] = ph.cumprod(row_ratio)[:-1]
        zs.append(zvals)
        # partial products: pp_i(r) = Z[r] * prod_{m<=i} ratio_m(r), i<num_pp
        cum = ratio.copy()
        for c in range(1, num_chunks):
            cum[:, c] = gl64.mul(cum[:, c], cum[:, c - 1])
        for i in range(common.num_partial_products):
            pps.append(gl64.mul(zvals, cum[:, i]))
    return np.stack(zs + pps, axis=0)  # (nc*(1+npp), n)


_vanishing_device_cache: dict = {}


def make_vanishing_fn(common):
    """Build the traced vanishing-poly evaluator for a circuit.

    Returns fn(wires, cs, zspp, zspp_next, pi_hash_d, betas_d, gammas_d,
    alphas_d, x, zh_inv, l0) over device (hi, lo) pairs whose last axis is
    ANY number of coset points (the TPU prover maps it over chunks);
    zspp_next carries the rate-shifted Z rows.  Gate constraint evaluation
    runs through DeviceBase — the same algebra-generic gate code as the host
    and in-circuit paths.
    """
    import jax.numpy as jnp
    from .algebra import DeviceBase

    cfg = common.config
    num_selectors = common.num_selectors
    nc = cfg.num_challenges
    npp = common.num_partial_products
    routed = cfg.num_routed_wires
    q = common.quotient_degree_factor
    num_chunks = (routed + q - 1) // q
    k_is = [int(k) for k in common.k_is]
    gate_types = common.gate_types
    selector_indices = common.selector_indices
    selector_groups = common.selector_groups
    ngc = common.num_gate_constraints
    nconst = common.num_constants

    lk = common.lookup
    n_perm = nc * (1 + npp)
    num_wire_polys = common.num_wire_polys

    def fn(wires, cs, zspp, zspp_next, pi_hash_d, betas_d, gammas_d,
           alphas_d, deltas_d, x, zh_inv, l0):
        from ..field import gl2x32 as gl
        alg = DeviceBase()

        def row(pair, i):
            return (pair[0][i], pair[1][i])

        constants = [row(cs, i) for i in range(nconst)]
        sigmas = [row(cs, nconst + i) for i in range(routed)]
        wires_rows = [row(wires, i) for i in range(num_wire_polys)]
        zs = [row(zspp, i) for i in range(nc)]
        pps = [row(zspp, nc + i) for i in range(nc * npp)]
        zs_next = [row(zspp_next, i) for i in range(nc)]
        if True:
            vars_ = EvalVars(
                local_constants=constants[num_selectors:],
                local_wires=wires_rows,
                public_inputs_hash=[row(pi_hash_d, i) for i in range(4)],
            )
            terms = [alg.zero() for _ in range(ngc)]
            many = num_selectors > 1
            for gi, gate in enumerate(gate_types):
                si = selector_indices[gi]
                start, end = selector_groups[si]
                s = constants[si]
                filt = alg.one()
                for k in range(start, end):
                    if k == gi:
                        continue
                    filt = alg.mul(filt, alg.sub(alg.const(k), s))
                if many:
                    filt = alg.mul(filt,
                                   alg.sub(alg.const(G.UNUSED_SELECTOR), s))
                if isinstance(gate, G.PoseidonGate):
                    # rolled-loop device evaluator (XLA cannot compile the
                    # unrolled 123-constraint chain)
                    from ..ops.poseidon_gate_device import \
                        eval_poseidon_gate_device
                    cp = eval_poseidon_gate_device(gate, wires)
                    constraints = [(cp[0][i], cp[1][i])
                                   for i in range(gate.num_constraints())]
                else:
                    constraints = gate.eval_unfiltered(alg, vars_)
                for ci, c in enumerate(constraints):
                    terms[ci] = alg.add(terms[ci], alg.mul(c, filt))

            z1_terms, pp_terms = [], []
            for ci in range(nc):
                beta = row(betas_d, ci)
                gamma = row(gammas_d, ci)
                z1_terms.append(alg.mul(l0, alg.sub(zs[ci], alg.one())))
                accs = [zs[ci]] + [pps[ci * npp + i] for i in range(npp)] \
                    + [zs_next[ci]]
                for m in range(num_chunks):
                    nume = alg.one()
                    deno = alg.one()
                    for j in range(m * q, min((m + 1) * q, routed)):
                        sid = alg.mul(alg.const(k_is[j]), x)
                        wv_g = alg.add(wires_rows[j], gamma)
                        nume = alg.mul(nume,
                                       alg.add(alg.mul(beta, sid), wv_g))
                        deno = alg.mul(deno, alg.add(
                            alg.mul(beta, sigmas[j]), wv_g))
                    pp_terms.append(alg.sub(alg.mul(accs[m], nume),
                                            alg.mul(accs[m + 1], deno)))

            lookup_terms = []
            if lk is not None:
                from . import lookup as lk_mod
                block = lk.block_len
                s_val = constants[lk.s_col]
                table_vals = [constants[c] for c in lk.table_cols]
                m_vals = [wires_rows[cfg.num_wires + ti]
                          for ti in range(lk.num_tables)]
                for ci in range(nc):
                    blk = [row(zspp, n_perm + ci * block + j)
                           for j in range(block)]
                    z_next = row(zspp_next, n_perm + ci * block)
                    lookup_terms.extend(lk_mod.lookup_terms_one_round(
                        alg, lk, wires_rows, s_val, table_vals, m_vals,
                        blk, z_next, row(deltas_d, ci), l0))

            all_terms = z1_terms + pp_terms + lookup_terms + terms
            outs_hi, outs_lo = [], []
            for ci in range(nc):
                alpha = row(alphas_d, ci)
                acc = alg.zero()
                for t in reversed(all_terms):
                    acc = alg.add(alg.mul(acc, alpha), t)
                acc = alg.mul(acc, zh_inv)
                acc = gl.canonicalize(acc)
                outs_hi.append(acc[0])
                outs_lo.append(acc[1])
            return (jnp.stack(outs_hi), jnp.stack(outs_lo))

    return fn


def eval_vanishing_on_coset_device(data: ProverData, wires_comm,
                                   cs_comm, zs_pp_comm, pi_hash,
                                   betas, gammas, alphas, deltas=()):
    """Device (jit) vanishing-poly evaluation over the whole LDE coset.
    Compiled once per circuit shape; challenges are traced arguments so
    reproving never recompiles.  Returns device (hi, lo) of shape
    (num_challenges, lde)."""
    import jax
    import jax.numpy as jnp

    common = data.common
    rate_bits = common.config.fri_config.rate_bits
    rate = 1 << rate_bits
    key = id(common)
    if key not in _vanishing_device_cache:
        base_fn = make_vanishing_fn(common)

        def full(wires, cs, zspp, pi_hash_d, betas_d, gammas_d, alphas_d,
                 deltas_d, x, zh_inv, l0):
            zspp_next = (jnp.roll(zspp[0], -rate, -1),
                         jnp.roll(zspp[1], -rate, -1))
            return base_fn(wires, cs, zspp, zspp_next, pi_hash_d, betas_d,
                           gammas_d, alphas_d, deltas_d, x, zh_inv, l0)

        _vanishing_device_cache[key] = jax.jit(full)
    fn = _vanishing_device_cache[key]

    x_np, zh_inv_np, l0_np = _coset_domain(common.degree_bits, rate_bits)
    from ..field import gl2x32 as gl2
    to_dev = gl2.from_u64_np
    pi_hash_d = to_dev(np.asarray(pi_hash, dtype=np.uint64))
    betas_d = to_dev(np.asarray(betas, dtype=np.uint64))
    gammas_d = to_dev(np.asarray(gammas, dtype=np.uint64))
    alphas_d = to_dev(np.asarray(alphas, dtype=np.uint64))
    deltas_d = to_dev(np.asarray(list(deltas) or [0], dtype=np.uint64))
    return fn(wires_comm.lde_natural, cs_comm.lde_natural,
              zs_pp_comm.lde_natural, pi_hash_d, betas_d, gammas_d,
              alphas_d, deltas_d, to_dev(x_np), to_dev(zh_inv_np),
              to_dev(l0_np))


def eval_vanishing_on_coset(data: ProverData, wires_lde, constants_sigmas_lde,
                            zs_pp_lde, pi_hash, betas, gammas, alphas,
                            deltas=()):
    """Host-numpy vanishing-poly evaluation (fallback / cross-check path).

    Returns (num_challenges, lde) uint64 quotient NUMERATOR values.
    """
    common = data.common
    cfg = common.config
    alg = HostBase()
    n = common.degree
    rate_bits = cfg.fri_config.rate_bits
    lde = n << rate_bits
    x, zh_inv, l0 = _coset_domain(common.degree_bits, rate_bits)

    num_selectors = common.num_selectors
    constants_lde = constants_sigmas_lde[: common.num_constants]
    sigmas_lde = constants_sigmas_lde[common.num_constants:]
    nc = cfg.num_challenges
    npp = common.num_partial_products
    n_perm = nc * (1 + npp)
    zs_lde = zs_pp_lde[:nc]
    pps_lde = zs_pp_lde[nc:n_perm]
    rate = 1 << rate_bits
    zs_next_lde = np.roll(zs_lde, -rate, axis=1)

    # --- gate constraint terms ------------------------------------------
    constraint_terms = np.zeros((common.num_gate_constraints, lde),
                                dtype=np.uint64)
    pi_hash_lifted = [np.uint64(h) for h in pi_hash]
    vars_ = EvalVars(
        local_constants=[constants_lde[num_selectors + i]
                         for i in range(common.num_constants - num_selectors)],
        local_wires=[wires_lde[i] for i in range(cfg.num_wires)],
        public_inputs_hash=pi_hash_lifted,
    )
    many = num_selectors > 1
    for gi, gate in enumerate(common.gate_types):
        si = common.selector_indices[gi]
        start, end = common.selector_groups[si]
        s = constants_lde[si]
        filt = np.ones(lde, dtype=np.uint64)
        for k in range(start, end):
            if k == gi:
                continue
            filt = gl64.mul(filt, gl64.sub(np.uint64(k), s))
        if many:
            filt = gl64.mul(filt, gl64.sub(np.uint64(G.UNUSED_SELECTOR), s))
        constraints = gate.eval_unfiltered(alg, vars_)
        for ci, c in enumerate(constraints):
            constraint_terms[ci] = gl64.add(
                constraint_terms[ci], gl64.mul(np.asarray(c, dtype=np.uint64), filt))

    # --- permutation terms ----------------------------------------------
    routed = cfg.num_routed_wires
    q = common.quotient_degree_factor
    num_chunks = (routed + q - 1) // q
    z1_terms = []
    pp_terms = []
    for ci in range(nc):
        beta = np.uint64(betas[ci])
        gamma = np.uint64(gammas[ci])
        z1_terms.append(gl64.mul(l0, gl64.sub(zs_lde[ci], np.uint64(1))))
        accs = [zs_lde[ci]] + [pps_lde[ci * npp + i] for i in range(npp)] \
            + [zs_next_lde[ci]]
        for m in range(num_chunks):
            nume = np.ones(lde, dtype=np.uint64)
            deno = np.ones(lde, dtype=np.uint64)
            for j in range(m * q, min((m + 1) * q, routed)):
                sid = gl64.mul(common.k_is[j], x)
                wv_g = gl64.add(wires_lde[j], gamma)
                nume = gl64.mul(nume, gl64.add(gl64.mul(beta, sid), wv_g))
                deno = gl64.mul(deno, gl64.add(
                    gl64.mul(beta, sigmas_lde[j]), wv_g))
            pp_terms.append(gl64.sub(gl64.mul(accs[m], nume),
                                     gl64.mul(accs[m + 1], deno)))

    # --- lookup (LogUp) terms ---------------------------------------------
    lookup_terms = []
    if common.lookup is not None:
        from . import lookup as lk_mod
        lk = common.lookup
        block = lk.block_len
        lk_lde = zs_pp_lde[n_perm:]
        lk_next = np.roll(lk_lde, -rate, axis=1)
        s_val = constants_lde[lk.s_col]
        table_vals = [constants_lde[c] for c in lk.table_cols]
        m_vals = [wires_lde[cfg.num_wires + ti]
                  for ti in range(lk.num_tables)]
        for ci in range(nc):
            blk = [lk_lde[ci * block + j] for j in range(block)]
            z_next = lk_next[ci * block]
            lookup_terms.extend(lk_mod.lookup_terms_one_round(
                alg, lk, wires_lde, s_val, table_vals, m_vals, blk,
                z_next, np.uint64(deltas[ci]), l0))

    # ordering: [z1 (per challenge)] + [pp checks (challenge-major)] +
    #           [lookup terms (challenge-major)] + gates
    all_terms = z1_terms + pp_terms + lookup_terms + \
        [constraint_terms[i] for i in range(common.num_gate_constraints)]

    out = np.zeros((nc, lde), dtype=np.uint64)
    for ci in range(nc):
        alpha = np.uint64(alphas[ci])
        acc = np.zeros(lde, dtype=np.uint64)
        for t in reversed(all_terms):
            acc = gl64.add(gl64.mul(acc, alpha), t)
        out[ci] = gl64.mul(acc, zh_inv)
    return out


def prove(data: ProverData, inputs: dict) -> Proof:
    import os as _os
    import jax as _jax
    if (_jax.default_backend() == "tpu"
            and data.common.config.hasher == "gl"
            and _os.environ.get("ZKLC_TPU_PROVER", "1") != "0"):
        from . import prover_tpu
        if data.common.lookup is None or prover_tpu.LOOKUP_READY:
            return prover_tpu.prove(data, inputs)
    common = data.common
    cfg = common.config
    fp: FriParams = common.fri_params
    fc = cfg.fri_config
    n = common.degree

    ensure_constants_sigmas_commitment(data)
    cs_comm: PolynomialBatch = data.constants_sigmas_commitment

    # 1. witness + wires commitment
    wr = generate_witness(data, inputs)
    wires = wr.wires                       # (n, num_wires)
    public_inputs = np.array([wr.get(t) for t in data.public_input_targets],
                             dtype=np.uint64)
    pi_hash = pos.hash_no_pad(public_inputs) if len(public_inputs) else \
        np.zeros(4, dtype=np.uint64)
    if common.lookup is not None:
        from . import lookup as lk_mod
        m_cols = lk_mod.compute_multiplicities(common.lookup, wires,
                                               data.constants_rows)
        wires = np.concatenate([wires, m_cols], axis=1)
    wires_comm = PolynomialBatch(np.ascontiguousarray(wires.T),
                                 fc.rate_bits, fc.cap_height,
                                 hasher=cfg.hasher)

    # 2. transcript: betas/gammas (+ lookup deltas)
    if cfg.hasher == "bn128":
        from ..hash.poseidon_bn128 import BN128Challenger
        ch = BN128Challenger()
        ch.observe_fr(data.circuit_digest)
    elif cfg.hasher == "fr":
        from ..hash.poseidon_bn128 import FrChallenger
        ch = FrChallenger()
        ch.observe_fr(data.circuit_digest)
    else:
        ch = pos.Challenger()
        ch.observe_hash(data.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(wires_comm.cap)
    betas = ch.get_n_challenges(cfg.num_challenges)
    gammas = ch.get_n_challenges(cfg.num_challenges)
    deltas = ch.get_n_challenges(cfg.num_challenges) \
        if common.lookup is not None else []

    # 3. Z + partial products (+ lookup helper/Z columns) commitment
    zs_pp = compute_zs_partial_products(common, wires, data.sigmas_rows,
                                        betas, gammas)
    if common.lookup is not None:
        lk_cols = lk_mod.compute_lookup_columns(
            common.lookup, wires, data.constants_rows, deltas,
            cfg.num_wires)
        zs_pp = np.concatenate([zs_pp, lk_cols], axis=0)
    zs_pp_comm = PolynomialBatch(zs_pp, fc.rate_bits, fc.cap_height,
                                 hasher=cfg.hasher)
    ch.observe_cap(zs_pp_comm.cap)
    alphas = ch.get_n_challenges(cfg.num_challenges)

    # 4. quotient. Device path (gate evals via DeviceBase under jit) is the
    # TPU fast path; default remains host-numpy because XLA:CPU chokes
    # compiling the giant fused PoseidonGate evaluation graph.
    import os as _os
    from ..field import gl2x32 as gl
    from ..ops import ntt as ntt_ops
    from . import commitment as _cm
    _q = _os.environ.get("ZKLC_DEVICE_QUOTIENT", "auto")
    import jax as _jax
    if _q == "1" or (_q == "auto" and _jax.default_backend() == "tpu"):
        qdev = eval_vanishing_on_coset_device(
            data, wires_comm, cs_comm, zs_pp_comm, pi_hash,
            betas, gammas, alphas, deltas)
        quotient_values = None
    else:
        quotient_values = eval_vanishing_on_coset(
            data, wires_comm.lde_values_u64, cs_comm.lde_values_u64,
            zs_pp_comm.lde_values_u64, pi_hash, betas, gammas, alphas,
            deltas)
        qdev = None
    lde_log = common.degree_bits + fc.rate_bits
    if quotient_values is not None and _cm._use_host_path():
        qcoeffs = _cm.host_intt(quotient_values, lde_log)
        inv_shift = pow(gl64.MULTIPLICATIVE_GROUP_GENERATOR, gl64.P - 2,
                        gl64.P)
        from .. import native as _nat
        qcoeffs = gl64.mul(qcoeffs, _nat.powers(inv_shift, 1 << lde_log))
    else:
        if qdev is None:
            qdev = gl.from_u64_np(quotient_values)
        qcoeffs = gl.to_u64_np(ntt_ops.coset_intt(qdev, lde_log))
    # chunks: (nc * 8, n)
    chunks = qcoeffs.reshape(cfg.num_challenges, 1 << fc.rate_bits, n)
    quotient_mat = chunks.reshape(cfg.num_challenges * (1 << fc.rate_bits), n)
    quotient_comm = PolynomialBatch(np.ascontiguousarray(quotient_mat),
                                    fc.rate_bits, fc.cap_height,
                                    values_are_coeffs=True,
                                    hasher=cfg.hasher)
    ch.observe_cap(quotient_comm.cap)
    zeta = np.array(ch.get_extension_challenge(), dtype=np.uint64)

    # 5. openings
    g = gl64.primitive_root_of_unity(common.degree_bits)
    zeta_next = gl64.ext_mul(np.array([[g, 0]], dtype=np.uint64)[0], zeta)
    zeta_pows = ph.ext_powers(zeta, n)
    zeta_next_pows = ph.ext_powers(zeta_next, n)

    cs_at_zeta = ph.eval_poly_ext(cs_comm.coeffs, zeta_pows)
    wires_at_zeta = ph.eval_poly_ext(wires_comm.coeffs, zeta_pows)
    zspp_at_zeta = ph.eval_poly_ext(zs_pp_comm.coeffs, zeta_pows)
    nc = cfg.num_challenges
    n_perm = nc * (1 + common.num_partial_products)
    block = common.lookup_block
    next_rows = list(range(nc))
    if block:
        next_rows += [n_perm + ci * block for ci in range(nc)]
    at_next = ph.eval_poly_ext(zs_pp_comm.coeffs[next_rows], zeta_next_pows)
    quot_at_zeta = ph.eval_poly_ext(quotient_comm.coeffs, zeta_pows)

    openings = OpeningSet(
        constants=cs_at_zeta[:common.num_constants],
        plonk_sigmas=cs_at_zeta[common.num_constants:],
        wires=wires_at_zeta,
        plonk_zs=zspp_at_zeta[:nc],
        plonk_zs_next=at_next[:nc],
        partial_products=zspp_at_zeta[nc:n_perm],
        quotient_polys=quot_at_zeta,
        lookups=zspp_at_zeta[n_perm:] if block else None,
        lookup_zs_next=at_next[nc:] if block else None,
    )

    # observe openings (zeta batch then zeta_next batch)
    for v in openings.fri_batch_zeta():
        ch.observe_extension(v)
    for v in openings.fri_batch_zeta_next():
        ch.observe_extension(v)

    # 6. FRI
    batch0_coeffs = np.concatenate(
        [cs_comm.coeffs, wires_comm.coeffs, zs_pp_comm.coeffs,
         quotient_comm.coeffs], axis=0)
    batch1_coeffs = zs_pp_comm.coeffs[next_rows]
    fri_proof = fri_mod.prove_fri(
        oracles=[cs_comm, wires_comm, zs_pp_comm, quotient_comm],
        poly_coeff_batches=[batch0_coeffs, batch1_coeffs],
        batch_points=[zeta, zeta_next],
        challenger=ch,
        fri_params=fp,
        hasher=cfg.hasher,
    )

    return Proof(
        wires_cap=wires_comm.cap,
        plonk_zs_partial_products_cap=zs_pp_comm.cap,
        quotient_polys_cap=quotient_comm.cap,
        openings=openings,
        opening_proof=fri_proof,
        public_inputs=public_inputs,
    )
