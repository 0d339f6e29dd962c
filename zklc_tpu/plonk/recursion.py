"""Recursive verification: the full protocol verifier as a circuit.

The aggregation primitive behind every fold in the reference pipeline
(near_bft_finality/src/prove_crypto/recursion.rs:16 `recursive_proof`, which
wraps plonky2's `builder.verify_proof`).  This module re-expresses
verifier.py's checks as constraints:

  * transcript: in-circuit Poseidon duplex sponge (PoseidonGate rows),
    exact Challenger discipline (hash/poseidon.py:254, mirroring
    gnark-plonky2-verifier/challenger/challenger.go:42-117);
  * vanishing polynomial at zeta: REUSES every gate's `eval_unfiltered`
    verbatim through `CircuitExt` — the same algebra-generic constraint
    code runs on host numpy, device jnp, and now as circuit construction;
  * FRI: Merkle paths via Poseidon rows, coset interpolation via the
    barycentric shortcut L(beta) = (beta^a - x0^a)/(a*x0^a) *
    sum y_i*x_i/(beta - x_i) (the coset is the root set of X^a - x0^a),
    hinted extension inverses, RandomAccessGate index lookups.

The inner circuit is fixed at build time (verifier data baked in as
constants) — the same per-shape circuit caching the reference applies
(recursive aggregation circuits are built per inner common-data shape).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..field import gl64
from ..hash import poseidon as pos
from .builder import CircuitBuilder, CommonData, VerifierOnlyData
from .proof import Proof
from .algebra import EvalVars
from . import gates as G

RATE = pos.RATE

# ExtTarget: pair (t0, t1) of builder targets.


class CircuitExt:
    """Quadratic-extension algebra that EMITS circuit operations."""

    def __init__(self, b: CircuitBuilder):
        self.b = b
        self._one = None
        self._zero = None

    def zero(self):
        z = self.b.zero()
        return (z, z)

    def one(self):
        return (self.b.one(), self.b.zero())

    def const(self, c: int):
        return (self.b.constant(int(c) % gl64.P), self.b.zero())

    def from_base(self, t):
        return (t, self.b.zero())

    def add(self, a, c):
        return (self.b.add(a[0], c[0]), self.b.add(a[1], c[1]))

    def sub(self, a, c):
        return (self.b.sub(a[0], c[0]), self.b.sub(a[1], c[1]))

    def mul(self, a, c):
        b = self.b
        t00 = b.mul(a[0], c[0])
        # c0 = a0*c0 + 7*(a1*c1); c1 = a0*c1 + a1*c0
        t11 = b.mul(a[1], c[1])
        c0 = b.mul_const_add(7, t11, t00)
        c1 = b.mul_add(a[0], c[1], b.mul(a[1], c[0]))
        return (c0, c1)

    def scalar_mul(self, s, a):
        """base target * ext target."""
        return (self.b.mul(s, a[0]), self.b.mul(s, a[1]))

    def inv(self, a):
        """Hinted inverse with in-circuit product check (a must be != 0)."""
        b = self.b
        i0 = b.add_virtual_target()
        i1 = b.add_virtual_target()

        def fn(vals):
            v = np.array([vals[0], vals[1]], dtype=np.uint64)
            out = gl64.ext_inv(v)
            return [np.uint64(out[0]), np.uint64(out[1])]

        b.add_generator([a[0], a[1]], [i0, i1], fn)
        prod = self.mul(a, (i0, i1))
        b.connect(prod[0], b.one())
        b.assert_zero(prod[1])
        return (i0, i1)

    def div(self, a, c):
        return self.mul(a, self.inv(c))

    def select(self, bit, a, c):
        return (self.b.select(bit, a[0], c[0]), self.b.select(bit, a[1], c[1]))

    def connect(self, a, c):
        self.b.connect(a[0], c[0])
        self.b.connect(a[1], c[1])

    def exp_pow2(self, a, k: int):
        for _ in range(k):
            a = self.mul(a, a)
        return a


class RecursiveChallenger:
    """In-circuit duplex sponge; mirrors hash/poseidon.py Challenger."""

    def __init__(self, b: CircuitBuilder):
        self.b = b
        z = b.zero()
        self.state = [z] * 12
        self.inputs: list[int] = []
        self.outputs: list[int] = []

    def observe(self, t: int):
        self.outputs.clear()
        self.inputs.append(t)
        if len(self.inputs) == RATE:
            self._duplex()

    def observe_many(self, ts):
        for t in ts:
            self.observe(t)

    def observe_cap(self, cap_targets):
        for h in cap_targets:
            self.observe_many(h)

    def observe_ext(self, e):
        self.observe(e[0])
        self.observe(e[1])

    def get_challenge(self) -> int:
        if self.inputs or not self.outputs:
            self._duplex()
        return self.outputs.pop()

    def get_n(self, n: int):
        return [self.get_challenge() for _ in range(n)]

    def get_ext(self):
        c = self.get_n(2)
        return (c[0], c[1])

    def _duplex(self):
        st = list(self.state)
        for i, x in enumerate(self.inputs):
            st[i] = x
        self.inputs.clear()
        st = self.b.permute(st)
        self.state = st
        self.outputs = list(st[:RATE])


@dataclass
class ProofTargets:
    """Wire-side mirror of proof.Proof."""
    wires_cap: list              # [cap_size][4] targets
    zs_pp_cap: list
    quotient_cap: list
    # openings (ext targets)
    constants: list
    plonk_sigmas: list
    wires: list
    plonk_zs: list
    plonk_zs_next: list
    partial_products: list
    quotient_polys: list
    # fri
    commit_phase_caps: list      # [round][cap_size][4]
    query_initial: list          # [query][oracle] -> (leaf targets, sib targets)
    query_steps: list            # [query][step] -> (evals ext targets, sibs)
    final_poly: list             # ext targets
    pow_witness: int
    public_inputs: list
    lookups: list = None         # ext targets: LogUp block at zeta
    lookup_zs_next: list = None  # ext targets: LogUp Zs at g*zeta


class RecursiveVerifier:
    """Builds the verification circuit for proofs of a FIXED inner circuit."""

    def __init__(self, b: CircuitBuilder, inner_common: CommonData,
                 inner_verifier: VerifierOnlyData):
        self.b = b
        self.common = inner_common
        self.vdata = inner_verifier
        self.ext = CircuitExt(b)

    # -- proof wire allocation ----------------------------------------------
    def add_virtual_proof(self) -> ProofTargets:
        b = self.b
        common = self.common
        cfg = common.config
        fp = common.fri_params
        fc = cfg.fri_config
        cap_size = 1 << fc.cap_height

        def cap():
            return [[b.add_virtual_target() for _ in range(4)]
                    for _ in range(cap_size)]

        def exts(n):
            return [(b.add_virtual_target(), b.add_virtual_target())
                    for _ in range(n)]

        nc = cfg.num_challenges
        n_cs = common.num_constants
        routed = cfg.num_routed_wires
        npp = common.num_partial_products
        block = common.lookup_block

        oracle_widths = [n_cs + routed, common.num_wire_polys,
                         common.num_zspp_polys,
                         nc * common.quotient_degree_factor]
        depth0 = fp.lde_bits - fc.cap_height

        query_initial = []
        query_steps = []
        for _ in range(fc.num_query_rounds):
            per_oracle = []
            for w in oracle_widths:
                leaf = [b.add_virtual_target() for _ in range(w)]
                sibs = [[b.add_virtual_target() for _ in range(4)]
                        for _ in range(depth0)]
                per_oracle.append((leaf, sibs))
            query_initial.append(per_oracle)
            steps = []
            bits_left = fp.lde_bits
            for ab in fp.reduction_arity_bits:
                bits_left -= ab
                depth = bits_left - fc.cap_height
                evals = exts(1 << ab)
                sibs = [[b.add_virtual_target() for _ in range(4)]
                        for _ in range(depth)]
                steps.append((evals, sibs))
            query_steps.append(steps)

        return ProofTargets(
            wires_cap=cap(), zs_pp_cap=cap(), quotient_cap=cap(),
            constants=exts(n_cs), plonk_sigmas=exts(routed),
            wires=exts(common.num_wire_polys), plonk_zs=exts(nc),
            plonk_zs_next=exts(nc), partial_products=exts(nc * npp),
            quotient_polys=exts(nc * common.quotient_degree_factor),
            commit_phase_caps=[cap() for _ in fp.reduction_arity_bits],
            query_initial=query_initial, query_steps=query_steps,
            final_poly=exts(fp.final_poly_len),
            pow_witness=b.add_virtual_target(),
            public_inputs=[b.add_virtual_target()
                           for _ in range(common.num_public_inputs)],
            lookups=exts(nc * block),
            lookup_zs_next=exts(nc if block else 0),
        )

    # -- helpers -------------------------------------------------------------
    def _constant_hash(self, h) -> list:
        return [self.b.constant(int(x)) for x in h]

    def _fri_batches(self, pt: ProofTargets):
        zeta_batch = (pt.constants + pt.plonk_sigmas + pt.wires + pt.plonk_zs
                      + pt.partial_products + pt.lookups + pt.quotient_polys)
        next_batch = pt.plonk_zs_next + pt.lookup_zs_next
        return zeta_batch, next_batch

    def _merkle_verify(self, leaf_targets, index_bits, sibs, cap_targets):
        """Walk the path; compare against the cap entry selected by the top
        cap_height bits."""
        b = self.b
        digest = b.hash_or_noop(leaf_targets)
        for lvl, sib in enumerate(sibs):
            bit = index_bits[lvl]
            left = [b.select(bit, sib[i], digest[i]) for i in range(4)]
            right = [b.select(bit, digest[i], sib[i]) for i in range(4)]
            state = left + right + [b.zero()] * 4
            out = b.permute(state)
            digest = out[:4]
        cap_bits = index_bits[len(sibs):]
        cap_index = b.le_sum(cap_bits)
        for i in range(4):
            claimed = b.random_access(cap_index,
                                      [entry[i] for entry in cap_targets])
            b.connect(digest[i], claimed)

    # -- main ---------------------------------------------------------------
    def verify_proof(self, pt: ProofTargets):
        b = self.b
        ext = self.ext
        common = self.common
        cfg = common.config
        fp = common.fri_params
        fc = cfg.fri_config
        nc = cfg.num_challenges

        pi_hash = b.hash_n_to_hash_no_pad(list(pt.public_inputs))

        # ---- challenges (verifier.py get_challenges) ----
        ch = RecursiveChallenger(b)
        ch.observe_many(self._constant_hash(self.vdata.circuit_digest))
        ch.observe_many(pi_hash)
        ch.observe_cap(pt.wires_cap)
        betas = ch.get_n(nc)
        gammas = ch.get_n(nc)
        deltas = ch.get_n(nc) if common.lookup is not None else []
        ch.observe_cap(pt.zs_pp_cap)
        alphas = ch.get_n(nc)
        ch.observe_cap(pt.quotient_cap)
        zeta = ch.get_ext()
        zeta_batch, next_batch = self._fri_batches(pt)
        for e in zeta_batch:
            ch.observe_ext(e)
        for e in next_batch:
            ch.observe_ext(e)
        fri_alpha = ch.get_ext()
        fri_betas = []
        for cap in pt.commit_phase_caps:
            ch.observe_cap(cap)
            fri_betas.append(ch.get_ext())
        for e in pt.final_poly:
            ch.observe_ext(e)
        ch.observe(pt.pow_witness)
        pow_response = ch.get_challenge()
        # PoW: response < 2^(64 - pow_bits) enforced by the decomposition
        b.split_le(pow_response, 64 - fc.proof_of_work_bits)
        query_index_bits = []
        for _ in range(fc.num_query_rounds):
            c = ch.get_challenge()
            bits = b.split_le(c, 64)
            query_index_bits.append(bits[: fp.lde_bits])

        # ---- vanishing polynomial at zeta ----
        self._check_vanishing(pt, pi_hash, betas, gammas, alphas, zeta,
                              deltas)

        # ---- FRI ----
        self._verify_fri(pt, zeta, fri_alpha, fri_betas, query_index_bits)

    def _check_vanishing(self, pt, pi_hash, betas, gammas, alphas, zeta,
                         deltas=()):
        b = self.b
        ext = self.ext
        common = self.common
        cfg = common.config
        n = common.degree
        num_sel = common.num_selectors

        vars_ = EvalVars(
            local_constants=pt.constants[num_sel:],
            local_wires=pt.wires,
            public_inputs_hash=[ext.from_base(t) for t in pi_hash],
        )
        constraint_terms = [ext.zero()] * common.num_gate_constraints
        many = num_sel > 1
        for gi, gate in enumerate(common.gate_types):
            si = common.selector_indices[gi]
            start, end = common.selector_groups[si]
            s = pt.constants[si]
            filt = ext.one()
            for k in range(start, end):
                if k == gi:
                    continue
                filt = ext.mul(filt, ext.sub(ext.const(k), s))
            if many:
                filt = ext.mul(filt, ext.sub(ext.const(G.UNUSED_SELECTOR), s))
            for ci, c in enumerate(gate.eval_unfiltered(ext, vars_)):
                constraint_terms[ci] = ext.add(constraint_terms[ci],
                                               ext.mul(c, filt))

        zeta_pow_n = ext.exp_pow2(zeta, common.degree_bits)
        zh_zeta = ext.sub(zeta_pow_n, ext.one())
        denom = ext.sub(ext.scalar_mul(b.constant(n % gl64.P), zeta),
                        ext.const(n))
        l0_zeta = ext.div(zh_zeta, denom)

        nc = cfg.num_challenges
        npp = common.num_partial_products
        routed = cfg.num_routed_wires
        q = common.quotient_degree_factor
        num_chunks = (routed + q - 1) // q

        z1_terms, pp_terms = [], []
        for ci in range(nc):
            beta = ext.from_base(betas[ci])
            gamma = ext.from_base(gammas[ci])
            z1_terms.append(ext.mul(l0_zeta,
                                    ext.sub(pt.plonk_zs[ci], ext.one())))
            nume_vals, deno_vals = [], []
            for j in range(routed):
                k_j = b.constant(int(common.k_is[j]))
                sid = ext.scalar_mul(k_j, zeta)
                wv_g = ext.add(pt.wires[j], gamma)
                nume_vals.append(ext.add(ext.mul(beta, sid), wv_g))
                deno_vals.append(ext.add(ext.mul(beta, pt.plonk_sigmas[j]),
                                         wv_g))
            accs = [pt.plonk_zs[ci]] + \
                [pt.partial_products[ci * npp + i] for i in range(npp)] + \
                [pt.plonk_zs_next[ci]]
            for m in range(num_chunks):
                nume = ext.one()
                deno = ext.one()
                for j in range(m * q, min((m + 1) * q, routed)):
                    nume = ext.mul(nume, nume_vals[j])
                    deno = ext.mul(deno, deno_vals[j])
                pp_terms.append(ext.sub(ext.mul(accs[m], nume),
                                        ext.mul(accs[m + 1], deno)))

        lookup_terms = []
        if common.lookup is not None:
            from . import lookup as lk_mod
            lk = common.lookup
            block = lk.block_len
            s_val = pt.constants[lk.s_col]
            table_vals = [pt.constants[c] for c in lk.table_cols]
            m_vals = [pt.wires[cfg.num_wires + ti]
                      for ti in range(lk.num_tables)]
            for ci in range(nc):
                blk = [pt.lookups[ci * block + j] for j in range(block)]
                z_next = pt.lookup_zs_next[ci]
                lookup_terms.extend(lk_mod.lookup_terms_one_round(
                    ext, lk, pt.wires, s_val, table_vals, m_vals, blk,
                    z_next, ext.from_base(deltas[ci]), l0_zeta))

        all_terms = z1_terms + pp_terms + lookup_terms + constraint_terms
        for ci in range(nc):
            alpha = ext.from_base(alphas[ci])
            acc = ext.zero()
            for t in reversed(all_terms):
                acc = ext.add(ext.mul(acc, alpha), t)
            # quotient recombination: acc == Z_H(zeta) * sum chunk_i zeta^(n i)
            qdf = common.quotient_degree_factor
            chunk = pt.quotient_polys[ci * qdf: (ci + 1) * qdf]
            qacc = ext.zero()
            for v in reversed(chunk):
                qacc = ext.add(ext.mul(qacc, zeta_pow_n), v)
            rhs = ext.mul(zh_zeta, qacc)
            ext.connect(acc, rhs)

    def _verify_fri(self, pt, zeta, fri_alpha, fri_betas, query_index_bits):
        b = self.b
        ext = self.ext
        common = self.common
        fp = common.fri_params
        fc = fp.config
        lde_bits = fp.lde_bits

        zeta_batch, next_batch = self._fri_batches(pt)
        reduced = []
        for batch in (zeta_batch, next_batch):
            acc = ext.zero()
            for v in batch[::-1]:
                acc = ext.add(ext.mul(acc, fri_alpha), v)
            reduced.append(acc)
        g = gl64.primitive_root_of_unity(common.degree_bits)
        zeta_next = ext.scalar_mul(b.constant(g), zeta)
        batches = [(zeta_batch, zeta, reduced[0]),
                   (next_batch, zeta_next, reduced[1])]

        initial_caps = [
            [self._constant_hash(h) for h in self.vdata.constants_sigmas_cap],
            pt.wires_cap, pt.zs_pp_cap, pt.quotient_cap]

        # subgroup generator powers for index-bit -> x reconstruction:
        # x = SHIFT * w^rev(index); rev over lde_bits bits means bit i of the
        # index (LSB) contributes w^(2^(lde_bits-1-i)).
        w = gl64.primitive_root_of_unity(lde_bits)

        for qi in range(fc.num_query_rounds):
            bits = query_index_bits[qi]
            # subgroup_x = SHIFT * prod_i (bits[i] ? w^(2^(L-1-i)) : 1)
            x = b.constant(gl64.MULTIPLICATIVE_GROUP_GENERATOR)
            for i in range(lde_bits):
                wi = pow(w, 1 << (lde_bits - 1 - i), gl64.P)
                factor = b.select(bits[i], b.constant(wi), b.one())
                x = b.mul(x, factor)

            # 1. initial tree Merkle proofs
            for oi, (leaf, sibs) in enumerate(pt.query_initial[qi]):
                self._merkle_verify(leaf, bits, sibs, initial_caps[oi])

            # 2. combine initial evaluations
            sx = ext.from_base(x)
            total = ext.zero()
            leaves = [pt.query_initial[qi][o][0] for o in range(4)]
            flat = []
            for l in leaves:
                flat += l
            # batch poly lists mirror verifier.py: batch0 = oracles 0-3 in
            # order; batch1 = zs polys (oracle 2, first nc entries)
            nc = common.config.num_challenges
            batch0_vals = [ext.from_base(t) for t in flat]
            next_rows = list(range(nc))
            if common.lookup_block:
                n_perm = nc * (1 + common.num_partial_products)
                next_rows += [n_perm + ci * common.lookup_block
                              for ci in range(nc)]
            batch1_vals = [ext.from_base(leaves[2][r]) for r in next_rows]
            for vals, (_batch, point, red_open) in zip(
                    (batch0_vals, batch1_vals), batches):
                acc = ext.zero()
                for v in vals[::-1]:
                    acc = ext.add(ext.mul(acc, fri_alpha), v)
                numerator = ext.sub(acc, red_open)
                denominator = ext.sub(sx, point)
                # total = total * alpha^len + num/den
                apow = ext.one()
                # alpha^len via square-and-multiply on the constant exponent
                e = len(vals)
                base = fri_alpha
                while e:
                    if e & 1:
                        apow = ext.mul(apow, base)
                    e >>= 1
                    if e:
                        base = ext.mul(base, base)
                total = ext.mul(total, apow)
                total = ext.add(total, ext.div(numerator, denominator))
            old_eval = total

            # 3. fold steps
            cur_x = x
            bit_cursor = 0
            for si, arity_bits in enumerate(fp.reduction_arity_bits):
                arity = 1 << arity_bits
                evals, sibs = pt.query_steps[qi][si]
                within_bits = bits[bit_cursor: bit_cursor + arity_bits]
                within = b.le_sum(within_bits)
                # consistency: evals[within] == old_eval
                for comp in range(2):
                    claimed = b.random_access(
                        within, [e[comp] for e in evals])
                    b.connect(claimed, old_eval[comp])
                # coset_start = cur_x * g_arity^(arity - rev(within))
                g_arity = gl64.primitive_root_of_unity(arity_bits)
                # rev(within) over arity_bits: bits reversed
                rev_bits = list(reversed(within_bits))
                rev_within = b.le_sum(rev_bits)
                pow_table = [pow(g_arity, (arity - i) % arity, gl64.P)
                             for i in range(arity)]
                gpow = b.random_access(
                    rev_within, [b.constant(p) for p in pow_table])
                coset_start = b.mul(cur_x, gpow)
                # interpolate at beta via the coset-vanishing shortcut:
                #   xs = coset_start * g^i;  ys[rev(i)] = evals[i]
                #   L(beta) = (beta^a - cs^a) / (a * cs^a)
                #             * sum_i y_i * x_i / (beta - x_i)
                beta = fri_betas[si]
                beta_pow = ext.exp_pow2(beta, arity_bits)
                cs_pow = coset_start
                for _ in range(arity_bits):
                    cs_pow = b.mul(cs_pow, cs_pow)
                ssum = ext.zero()
                xi = coset_start
                for i in range(arity):
                    ri = int(format(i, f"0{arity_bits}b")[::-1], 2)
                    yi = evals[ri]
                    term = ext.div(ext.scalar_mul(xi, yi),
                                   ext.sub(beta, ext.from_base(xi)))
                    ssum = ext.add(ssum, term)
                    if i + 1 < arity:
                        xi = b.mul(xi, b.constant(g_arity))
                front = ext.div(ext.sub(beta_pow, ext.from_base(cs_pow)),
                                ext.from_base(b.mul_const(arity % gl64.P,
                                                          cs_pow)))
                old_eval = ext.mul(front, ssum)
                # merkle check of the step leaf (flattened ext pairs)
                flat_leaf = [t for e in evals for t in e]
                coset_bits = bits[bit_cursor + arity_bits:]
                self._merkle_verify(flat_leaf, coset_bits, sibs,
                                    pt.commit_phase_caps[si])
                bit_cursor += arity_bits
                # cur_x^arity = coset_start^arity (g_arity^arity = 1)
                cur_x = cs_pow

            # 4. final polynomial evaluation at cur_x
            fx = ext.from_base(cur_x)
            acc = ext.zero()
            for c in pt.final_poly[::-1]:
                acc = ext.add(ext.mul(acc, fx), c)
            ext.connect(acc, old_eval)

    def _pow2k(self, t, k: int):
        for _ in range(k):
            t = self.b.mul(t, t)
        return t

    # -- witness --------------------------------------------------------------
    @staticmethod
    def set_proof_targets(pt: ProofTargets, proof: Proof, inputs: dict):
        def set_t(t, v):
            inputs[t] = np.uint64(int(v) % gl64.P)

        def set_cap(ct, cap):
            for row_t, row_v in zip(ct, cap):
                for t, v in zip(row_t, row_v):
                    set_t(t, v)

        def set_exts(ts, vs):
            for (t0, t1), v in zip(ts, vs):
                set_t(t0, v[0])
                set_t(t1, v[1])

        set_cap(pt.wires_cap, proof.wires_cap)
        set_cap(pt.zs_pp_cap, proof.plonk_zs_partial_products_cap)
        set_cap(pt.quotient_cap, proof.quotient_polys_cap)
        o = proof.openings
        set_exts(pt.constants, o.constants)
        set_exts(pt.plonk_sigmas, o.plonk_sigmas)
        set_exts(pt.wires, o.wires)
        set_exts(pt.plonk_zs, o.plonk_zs)
        set_exts(pt.plonk_zs_next, o.plonk_zs_next)
        set_exts(pt.partial_products, o.partial_products)
        set_exts(pt.quotient_polys, o.quotient_polys)
        if pt.lookups:
            set_exts(pt.lookups, o.lookups)
            set_exts(pt.lookup_zs_next, o.lookup_zs_next)
        op = proof.opening_proof
        for ct, cap in zip(pt.commit_phase_caps, op.commit_phase_merkle_caps):
            set_cap(ct, cap)
        for qi, rp in enumerate(op.query_round_proofs):
            for oi, (leaf, sibs) in enumerate(rp.initial_trees_proof.evals_proofs):
                leaf_t, sibs_t = pt.query_initial[qi][oi]
                for t, v in zip(leaf_t, leaf):
                    set_t(t, v)
                for row_t, row_v in zip(sibs_t, sibs):
                    for t, v in zip(row_t, row_v):
                        set_t(t, v)
            for si, step in enumerate(rp.steps):
                evals_t, sibs_t = pt.query_steps[qi][si]
                set_exts(evals_t, step.evals)
                for row_t, row_v in zip(sibs_t, step.siblings):
                    for t, v in zip(row_t, row_v):
                        set_t(t, v)
        set_exts(pt.final_poly, op.final_poly)
        set_t(pt.pow_witness, op.pow_witness)
        for t, v in zip(pt.public_inputs, proof.public_inputs):
            set_t(t, v)


def recursive_proof_circuit(inner_common: CommonData,
                            inner_verifier: VerifierOnlyData,
                            config=None, register_inner_pis: bool = True):
    """Build a circuit verifying ONE inner proof; returns (builder, pt).

    Mirrors the single-proof form of recursion.rs:16 `recursive_proof` — the
    caller adds more statements / registers PIs, then builds."""
    from .config import CircuitConfig
    b = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    rv = RecursiveVerifier(b, inner_common, inner_verifier)
    pt = rv.add_virtual_proof()
    rv.verify_proof(pt)
    if register_inner_pis:
        b.register_public_inputs(pt.public_inputs)
    return b, pt


def recursive_aggregate_circuit(inners: list, config=None,
                                register_inner_pis: bool = True):
    """Verify N inner proofs (possibly of different circuits) in one circuit
    — the two-proof form of recursion.rs:16 used by every fold in
    signatures.rs:97-106 / block_finality.rs:294-731.  `inners` is a list of
    (CommonData, VerifierOnlyData).  Returns (builder, [ProofTargets])."""
    from .config import CircuitConfig
    b = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    pts = []
    for common, vdata in inners:
        rv = RecursiveVerifier(b, common, vdata)
        pt = rv.add_virtual_proof()
        rv.verify_proof(pt)
        pts.append(pt)
    if register_inner_pis:
        for pt in pts:
            b.register_public_inputs(pt.public_inputs)
    return b, pts
