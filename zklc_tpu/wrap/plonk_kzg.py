"""KZG-PLONK proving backend over BN254 — the reference's second wrap
flavor.

The reference compiles the plonky2-verifier circuit with BOTH gnark
backends and publishes both proof systems
(/root/reference/gnark-plonky2-verifier/cmd/compile.go:102-115; published
numbers in BASELINE.md: PLONK compile 17 min / prove 2.3 min / verify
2 ms / 928 B).  This module is the in-repo PLONK flavor: the SAME
R1CS-compiled statement (wrap/verifier_r1cs.py via wrap/r1cs_builder.py)
lowered to a plonkish constraint system and proven with the standard
PLONK protocol [GWC19] over KZG polynomial commitments, using the native
BN254 kernels (Fr NTT, Pippenger MSM) for the hot paths.

Pieces:
  * `kzg_setup` — powers-of-tau SRS (DEV-MODE toxic tau, the gnark
    test.NewKZGSRS pattern; a production deployment substitutes a
    ceremony transcript);
  * `PlonkishCS` + `from_r1cs` — lower {(A·z)(B·z)=(C·z)} to rows of
    qL·a + qR·b + qM·a·b + qO·c + qC + PI = 0 with copy constraints via
    the variable-id permutation (LC trees become addition-gate chains);
  * `PlonkProver`/`plonk_verify` — the 5-round protocol: blinded wire
    polys, permutation accumulator, coset-evaluated quotient split in 3,
    ζ/ζω openings, linearization, batched KZG opening checked with one
    pairing equation.

Transcript: SHA-256 Fiat-Shamir over point/scalar bytes (domain tagged).
This is NOT byte-compatible with gnark's PLONK transcript — the verifier
here is in-repo; byte-compat matters only for the Groth16 flavor, whose
on-chain interface contracts/ carries.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

from . import bn254 as C
from ..native import bn254 as NB

R = C.R
TWO_ADICITY = 28
# order-2^28 root: 5 generates Fr^*
_ROOT28 = pow(5, (R - 1) >> TWO_ADICITY, R)
K1, K2 = 2, 3            # coset ids for wire columns b, c (paper §8)


def _omega(log_n: int) -> int:
    assert log_n <= TWO_ADICITY
    w = _ROOT28
    for _ in range(TWO_ADICITY - log_n):
        w = w * w % R
    return w


# ---------------------------------------------------------------------------
# Fr polynomial helpers (native NTT on (n, 4)-limb arrays)
# ---------------------------------------------------------------------------

def _to_arr(vals, n) -> np.ndarray:
    a = NB.ints_to_limbs([v % R for v in vals])
    if a.shape[0] < n:
        a = np.concatenate(
            [a, np.zeros((n - a.shape[0], 4), dtype=np.uint64)])
    return np.ascontiguousarray(a)


def _ints(a: np.ndarray) -> list:
    return NB.limbs_to_ints(a)


def _intt(vals, log_n: int) -> list:
    """Evaluations on <omega> -> coefficients."""
    a = _to_arr(vals, 1 << log_n)
    NB.fr_ntt(a, log_n, True)
    return _ints(a)


def _ntt(coeffs, log_n: int) -> list:
    a = _to_arr(coeffs, 1 << log_n)
    NB.fr_ntt(a, log_n, False)
    return _ints(a)


def _coset_ntt(coeffs, log_n: int, shift: int) -> list:
    a = _to_arr(coeffs, 1 << log_n)
    NB.fr_vec_scale_powers(a, 1, shift)
    NB.fr_ntt(a, log_n, False)
    return _ints(a)


def _coset_intt(evals, log_n: int, shift: int) -> list:
    a = _to_arr(evals, 1 << log_n)
    NB.fr_ntt(a, log_n, True)
    NB.fr_vec_scale_powers(a, 1, pow(shift, R - 2, R))
    return _ints(a)


def _poly_eval(coeffs, x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % R
    return acc


# ---------------------------------------------------------------------------
# KZG
# ---------------------------------------------------------------------------

@dataclass
class KzgSrs:
    g1_powers: np.ndarray     # (n, 8) affine [tau^i]G1
    g2: tuple                 # [1]G2
    g2_tau: tuple             # [tau]G2

    def commit(self, coeffs) -> tuple:
        coeffs = [c % R for c in coeffs]
        while coeffs and coeffs[-1] == 0:
            coeffs.pop()
        if not coeffs:
            return None
        assert len(coeffs) <= self.g1_powers.shape[0], "SRS too small"
        return NB.g1_msm(self.g1_powers[:len(coeffs)],
                         NB.ints_to_limbs(coeffs))


def kzg_setup(max_degree: int, tau: int | None = None) -> KzgSrs:
    """DEV-MODE SRS from a locally sampled tau (test.NewKZGSRS pattern —
    NOT a production ceremony)."""
    import secrets
    tau = tau if tau is not None else secrets.randbelow(R - 2) + 2
    powers = []
    acc = 1
    for _ in range(max_degree + 1):
        powers.append(acc)
        acc = acc * tau % R
    g1p = NB.g1_fixed_msm(C.G1_GEN, NB.ints_to_limbs(powers))
    return KzgSrs(g1_powers=g1p, g2=C.G2_GEN, g2_tau=C.g2_mul(C.G2_GEN, tau))


def kzg_verify_open(srs: KzgSrs, comm, z: int, y: int, w) -> bool:
    """e(C - y·G1 + z·W, G2) == e(W, [tau]G2)  <=>
    e(C - y·G1 + z·W, G2) · e(-W, [tau]G2) == 1."""
    lhs = C.g1_add(comm, C.g1_neg(C.g1_mul(C.G1_GEN, y % R)))
    lhs = C.g1_add(lhs, C.g1_mul(w, z % R))
    return C.pairing_product_is_one([(lhs, srs.g2),
                                     (C.g1_neg(w), srs.g2_tau)])


# ---------------------------------------------------------------------------
# plonkish constraint system + R1CS lowering
# ---------------------------------------------------------------------------

@dataclass
class PlonkishCS:
    ql: list
    qr: list
    qm: list
    qo: list
    qc: list
    wa: list                  # variable id per row, column a
    wb: list
    wc: list
    num_vars: int
    num_pub: int              # public inputs = first num_pub rows (col a)

    @property
    def num_rows(self):
        return len(self.ql)


def from_r1cs(r1cs) -> PlonkishCS:
    """Lower R1CS (groth16.R1CS: sparse-LC rows over z, z[0]=1, publics
    z[1..num_pub]) to plonkish rows.

    * public input i gets row i: qL=1, PI_i = -x_i (PI handled at prove /
      verify time), binding wire a to the public value;
    * each LC reduces to a single wire by a chain of addition gates
      (qL, qR, qO=-1; constant term folded into qC);
    * each constraint emits one multiplication gate qM·a·b - c = 0.
    """
    ql, qr, qm, qo, qc = [], [], [], [], []
    wa, wb, wc = [], [], []
    nv = [r1cs.num_vars]
    ZERO = 0                 # variable 0 is the constant-1 wire of R1CS

    def fresh():
        v = nv[0]
        nv[0] += 1
        return v

    def row(l, r, m, o, c, a_v, b_v, c_v):
        ql.append(l % R)
        qr.append(r % R)
        qm.append(m % R)
        qo.append(o % R)
        qc.append(c % R)
        wa.append(a_v)
        wb.append(b_v)
        wc.append(c_v)

    # public-input rows first (verifier recomputes PI(X) over these rows)
    for i in range(r1cs.num_pub):
        row(1, 0, 0, 0, 0, 1 + i, ZERO, ZERO)

    lc_wire_cache: dict = {}

    def wire_of(lc) -> tuple[int, int]:
        """Reduce an LC {var: coeff} to (var, scale): value = scale*z[var]
        when single-term, else a fresh output wire (scale 1)."""
        items = sorted((v, c % R) for v, c in lc.items() if c % R)
        if not items:
            return ZERO, 0                      # value 0 via 0 * z0
        if len(items) == 1:
            return items[0][0], items[0][1]
        key = tuple(items)
        if key in lc_wire_cache:
            return lc_wire_cache[key], 1
        # addition tree: fold two terms per gate
        const = 0
        terms = []
        for v, cf in items:
            if v == 0:
                const = cf
            else:
                terms.append((v, cf))
        if not terms:
            return ZERO, const                   # pure constant: const * 1
        cur_v, cur_c = terms[0]
        # first gate folds terms[0], terms[1] (+ const); later gates chain
        i = 1
        first = True
        while i < len(terms) or first:
            t_v, t_c = terms[i] if i < len(terms) else (ZERO, 0)
            out = fresh()
            row(cur_c if first else 1, t_c, 0, R - 1,
                const if first else 0, cur_v, t_v, out)
            cur_v, cur_c = out, 1
            first = False
            i += 1
        lc_wire_cache[key] = cur_v
        return cur_v, 1

    for a_lc, b_lc, c_lc in zip(r1cs.a, r1cs.b, r1cs.c):
        av, ac = wire_of(a_lc)
        bv, bc = wire_of(b_lc)
        cv, cc = wire_of(c_lc)
        # ac*za * bc*zb = cc*zc  ->  (ac*bc) za·zb - cc zc = 0
        row(0, 0, ac * bc % R, R - cc % R, 0, av, bv, cv)

    n = len(ql)
    return PlonkishCS(ql, qr, qm, qo, qc, wa, wb, wc, nv[0],
                      r1cs.num_pub)


def plonkish_witness(cs: PlonkishCS, z: list) -> list:
    """Extend the R1CS witness with the addition-chain wires by replaying
    the gate rows (each non-mul gate defines wc from wa/wb)."""
    vals = list(z) + [0] * (cs.num_vars - len(z))
    for i in range(cs.num_rows):
        if cs.qo[i] == R - 1 and cs.qm[i] == 0:
            out = (cs.ql[i] * vals[cs.wa[i]] + cs.qr[i] * vals[cs.wb[i]]
                   + cs.qc[i]) % R
            vals[cs.wc[i]] = out
    return vals


def check_plonkish(cs: PlonkishCS, vals: list, pub: list) -> bool:
    for i in range(cs.num_rows):
        pi = (-pub[i]) % R if i < cs.num_pub else 0
        a, b, c = vals[cs.wa[i]], vals[cs.wb[i]], vals[cs.wc[i]]
        if (cs.ql[i] * a + cs.qr[i] * b + cs.qm[i] * a * b
                + cs.qo[i] * c + cs.qc[i] + pi) % R != 0:
            return False
    return True


# ---------------------------------------------------------------------------
# transcript
# ---------------------------------------------------------------------------

class Transcript:
    def __init__(self, tag: bytes = b"zklc-plonk-v1"):
        self._h = hashlib.sha256(tag)

    def absorb_point(self, p):
        if p is None:
            self._h.update(b"\x00" * 64)
        else:
            self._h.update(int(p[0]).to_bytes(32, "big"))
            self._h.update(int(p[1]).to_bytes(32, "big"))

    def absorb_scalar(self, s: int):
        self._h.update(int(s % R).to_bytes(32, "big"))

    def challenge(self, label: bytes) -> int:
        self._h.update(label)
        out = int.from_bytes(self._h.digest(), "big") % R
        self._h.update(self._h.digest())
        return out


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------

@dataclass
class PlonkProvingKey:
    log_n: int
    cs: PlonkishCS
    srs: KzgSrs
    q_coeffs: dict            # name -> coeff list
    sigma_coeffs: list        # 3 coeff lists
    sigma_evals: list         # 3 eval lists (id values, for z build)
    id_evals: list


@dataclass
class PlonkVerifyingKey:
    log_n: int
    num_pub: int
    q_comms: dict
    sigma_comms: list
    g2: tuple
    g2_tau: tuple


def plonk_setup(cs: PlonkishCS, srs: KzgSrs | None = None,
                tau: int | None = None):
    n_rows = cs.num_rows
    log_n = max(2, (n_rows - 1).bit_length())
    n = 1 << log_n
    if srs is None:
        srs = kzg_setup(n + 6, tau=tau)
    w = _omega(log_n)

    def pad(xs):
        return list(xs) + [0] * (n - len(xs))

    q_coeffs = {name: _intt(pad(getattr(cs, name)), log_n)
                for name in ("ql", "qr", "qm", "qo", "qc")}

    # permutation: slots (col, row); same-variable slots form cycles
    dom = [pow(w, i, R) for i in range(n)]
    ids = [dom, [K1 * x % R for x in dom], [K2 * x % R for x in dom]]
    occurrences: dict = {}
    for col, wires in enumerate((cs.wa, cs.wb, cs.wc)):
        for i, v in enumerate(wires):
            occurrences.setdefault(v, []).append((col, i))
    sigma_evals = [list(ids[0]), list(ids[1]), list(ids[2])]
    for slots in occurrences.values():
        # cyclic shift: slot_k's sigma = id of slot_{k+1}
        for k, (col, i) in enumerate(slots):
            ncol, ni = slots[(k + 1) % len(slots)]
            sigma_evals[col][i] = ids[ncol][ni]
    sigma_coeffs = [_intt(s, log_n) for s in sigma_evals]

    pk = PlonkProvingKey(log_n=log_n, cs=cs, srs=srs, q_coeffs=q_coeffs,
                         sigma_coeffs=sigma_coeffs,
                         sigma_evals=sigma_evals, id_evals=ids)
    vk = PlonkVerifyingKey(
        log_n=log_n, num_pub=cs.num_pub,
        q_comms={k: srs.commit(v) for k, v in q_coeffs.items()},
        sigma_comms=[srs.commit(s) for s in sigma_coeffs],
        g2=srs.g2, g2_tau=srs.g2_tau)
    return pk, vk


# ---------------------------------------------------------------------------
# prover
# ---------------------------------------------------------------------------

def _zh_at(x: int, n: int) -> int:
    return (pow(x, n, R) - 1) % R


def plonk_prove(pk: PlonkProvingKey, witness_vals: list, pub: list,
                rng=None):
    import secrets
    rand = (lambda: secrets.randbelow(R)) if rng is None else rng
    cs, srs = pk.cs, pk.srs
    log_n = pk.log_n
    n = 1 << log_n
    w = _omega(log_n)

    def pad(xs):
        return list(xs) + [0] * (n - len(xs))

    a_ev = pad([witness_vals[v] for v in cs.wa])
    b_ev = pad([witness_vals[v] for v in cs.wb])
    c_ev = pad([witness_vals[v] for v in cs.wc])
    pi_ev = pad([(-pub[i]) % R for i in range(cs.num_pub)])

    def blind(coeffs, k):
        # + Z_H(X) * (b_0 + b_1 X + ...): preserves evals on the domain
        bs = [rand() for _ in range(k)]
        out = list(coeffs) + [0] * (k)
        for j, bj in enumerate(bs):
            out[j] = (out[j] - bj) % R
            out = out + [0] * max(0, n + j + 1 - len(out))
            out[n + j] = (out[n + j] + bj) % R
        return out

    tr = Transcript()
    for x in pub:
        tr.absorb_scalar(x)

    a_c = blind(_intt(a_ev, log_n), 2)
    b_c = blind(_intt(b_ev, log_n), 2)
    c_c = blind(_intt(c_ev, log_n), 2)
    com_a, com_b, com_c = (srs.commit(a_c), srs.commit(b_c),
                           srs.commit(c_c))
    for p in (com_a, com_b, com_c):
        tr.absorb_point(p)
    beta = tr.challenge(b"beta")
    gamma = tr.challenge(b"gamma")

    # round 2: permutation accumulator z
    ids = pk.id_evals
    sig = pk.sigma_evals
    z_ev = [1]
    for i in range(n - 1):
        num = ((a_ev[i] + beta * ids[0][i] + gamma)
               * (b_ev[i] + beta * ids[1][i] + gamma)
               * (c_ev[i] + beta * ids[2][i] + gamma)) % R
        den = ((a_ev[i] + beta * sig[0][i] + gamma)
               * (b_ev[i] + beta * sig[1][i] + gamma)
               * (c_ev[i] + beta * sig[2][i] + gamma)) % R
        z_ev.append(z_ev[-1] * num * pow(den, R - 2, R) % R)
    z_c = blind(_intt(z_ev, log_n), 3)
    com_z = srs.commit(z_c)
    tr.absorb_point(com_z)
    alpha = tr.challenge(b"alpha")

    # round 3: quotient on an 8n coset — the blinded permutation term
    # has degree 3n+5 > 4n-1 for small n, so 4n points alias it
    big_log = log_n + 3
    shift = 5                                    # Fr generator coset
    def on_coset(coeffs):
        return _coset_ntt(coeffs, big_log, shift)

    A = on_coset(a_c)
    B = on_coset(b_c)
    Cv = on_coset(c_c)
    Z = on_coset(z_c)
    # z(omega X) on the coset: evaluate z at (shift*w4^i*omega)
    zw_c = [z_c[j] * pow(w, j, R) % R for j in range(len(z_c))]
    Zw = on_coset(zw_c)
    QL, QR, QM, QO, QC = (on_coset(pk.q_coeffs[k])
                          for k in ("ql", "qr", "qm", "qo", "qc"))
    S1, S2, S3 = (on_coset(s) for s in pk.sigma_coeffs)
    PIc = on_coset(_intt(pi_ev, log_n))
    N4 = 1 << big_log
    w4 = _omega(big_log)
    # L1 on coset: L1(X) = (X^n - 1) / (n (X - 1))
    l1_c = on_coset(_intt([1] + [0] * (n - 1), log_n))
    x_pows = [shift * pow(w4, i, R) % R for i in range(N4)]
    t_ev = []
    for i in range(N4):
        x = x_pows[i]
        gate = (QL[i] * A[i] + QR[i] * B[i] + QM[i] * A[i] * B[i]
                + QO[i] * Cv[i] + QC[i] + PIc[i]) % R
        perm = ((A[i] + beta * x + gamma)
                * (B[i] + beta * K1 * x + gamma)
                * (C_ := (Cv[i] + beta * K2 * x + gamma)) * Z[i]
                - (A[i] + beta * S1[i] + gamma)
                * (B[i] + beta * S2[i] + gamma)
                * (Cv[i] + beta * S3[i] + gamma) * Zw[i]) % R
        bound = (Z[i] - 1) * l1_c[i] % R
        zh_inv = pow(_zh_at(x, n), R - 2, R)
        t_ev.append((gate + alpha * perm + alpha * alpha * bound)
                    * zh_inv % R)
    t_c = _coset_intt(t_ev, big_log, shift)
    while len(t_c) > 3 * n + 6 and t_c[-1] == 0:
        t_c.pop()
    # split into three degree-<n+2 chunks with stitching blinders
    b10, b11 = rand(), rand()
    t_lo = t_c[:n] + [b10]
    t_mid = t_c[n:2 * n]
    t_mid[0] = (t_mid[0] - b10) % R
    t_mid = t_mid + [b11]
    t_hi = t_c[2 * n:]
    t_hi[0] = (t_hi[0] - b11) % R
    com_tl, com_tm, com_th = (srs.commit(t_lo), srs.commit(t_mid),
                              srs.commit(t_hi))
    for p in (com_tl, com_tm, com_th):
        tr.absorb_point(p)
    zeta = tr.challenge(b"zeta")

    # round 4: evaluations
    a_z = _poly_eval(a_c, zeta)
    b_z = _poly_eval(b_c, zeta)
    c_z = _poly_eval(c_c, zeta)
    s1_z = _poly_eval(pk.sigma_coeffs[0], zeta)
    s2_z = _poly_eval(pk.sigma_coeffs[1], zeta)
    zw_z = _poly_eval(z_c, zeta * w % R)
    for s in (a_z, b_z, c_z, s1_z, s2_z, zw_z):
        tr.absorb_scalar(s)
    v = tr.challenge(b"v")

    # round 5: linearization polynomial r(X)
    zh_z = _zh_at(zeta, n)
    l1_z = zh_z * pow(n * (zeta - 1) % R, R - 2, R) % R
    pi_z = _poly_eval(_intt(pi_ev, log_n), zeta)

    def add_poly(p, q, s=1):
        out = list(p) + [0] * max(0, len(q) - len(p))
        for i, qi in enumerate(q):
            out[i] = (out[i] + s * qi) % R
        return out

    r_c = [0]
    # gate terms
    r_c = add_poly(r_c, pk.q_coeffs["ql"], a_z)
    r_c = add_poly(r_c, pk.q_coeffs["qr"], b_z)
    r_c = add_poly(r_c, pk.q_coeffs["qm"], a_z * b_z % R)
    r_c = add_poly(r_c, pk.q_coeffs["qo"], c_z)
    r_c = add_poly(r_c, pk.q_coeffs["qc"])
    r_c[0] = (r_c[0] + pi_z) % R
    # permutation terms
    t1 = ((a_z + beta * zeta + gamma)
          * (b_z + beta * K1 * zeta + gamma)
          * (c_z + beta * K2 * zeta + gamma)) % R
    r_c = add_poly(r_c, z_c, alpha * t1 % R)
    t2 = ((a_z + beta * s1_z + gamma)
          * (b_z + beta * s2_z + gamma) * alpha * zw_z) % R
    r_c = add_poly(r_c, pk.sigma_coeffs[2], (-t2 * beta) % R)
    r_c[0] = (r_c[0] - t2 * (c_z + gamma)) % R
    # boundary
    r_c = add_poly(r_c, z_c, alpha * alpha * l1_z % R)
    r_c[0] = (r_c[0] - alpha * alpha * l1_z) % R
    # minus Z_H(zeta) * (t_lo + zeta^(n+2) t_mid + zeta^(2n+4) t_hi)
    zn2 = pow(zeta, n, R)       # X^n chunk stitching
    r_c = add_poly(r_c, t_lo, (-zh_z) % R)
    r_c = add_poly(r_c, t_mid, (-zh_z * zn2) % R)
    r_c = add_poly(r_c, t_hi, (-zh_z * zn2 * zn2) % R)
    assert _poly_eval(r_c, zeta) % R == 0, "linearization sanity"

    # batched opening at zeta: W = [r + v a + v^2 b + v^3 c + v^4 s1 +
    # v^5 s2](X) - (evals) / (X - zeta)
    batch = list(r_c)
    evals = [0, a_z, b_z, c_z, s1_z, s2_z]
    polys = [None, a_c, b_c, c_c, pk.sigma_coeffs[0], pk.sigma_coeffs[1]]
    vp = 1
    for k in range(1, 6):
        vp = vp * v % R
        batch = add_poly(batch, polys[k], vp)
    y = sum(e * pow(v, k, R) for k, e in enumerate(evals)) % R

    def div_linear(p, root):
        """p(X) / (X - root), exact when p(root) == 0 (synthetic
        division)."""
        d = len(p) - 1
        q = [0] * d
        acc = p[d] % R
        for i in range(d - 1, -1, -1):
            q[i] = acc
            acc = (p[i] + acc * root) % R
        assert acc == 0, "division remainder nonzero"
        return q

    batch[0] = (batch[0] - y) % R
    w_z = div_linear(batch, zeta)
    com_wz = srs.commit(w_z)
    # opening of z at zeta*omega
    zw_poly = list(z_c)
    zw_poly[0] = (zw_poly[0] - zw_z) % R
    w_zw = div_linear(zw_poly, zeta * w % R)
    com_wzw = srs.commit(w_zw)

    return {
        "a": com_a, "b": com_b, "c": com_c, "z": com_z,
        "t_lo": com_tl, "t_mid": com_tm, "t_hi": com_th,
        "w_z": com_wz, "w_zw": com_wzw,
        "a_z": a_z, "b_z": b_z, "c_z": c_z,
        "s1_z": s1_z, "s2_z": s2_z, "zw_z": zw_z,
    }


def plonk_verify(vk: PlonkVerifyingKey, proof: dict, pub: list) -> bool:
    n = 1 << vk.log_n
    w = _omega(vk.log_n)
    tr = Transcript()
    for x in pub:
        tr.absorb_scalar(x)
    for kk in ("a", "b", "c"):
        tr.absorb_point(proof[kk])
    beta = tr.challenge(b"beta")
    gamma = tr.challenge(b"gamma")
    tr.absorb_point(proof["z"])
    alpha = tr.challenge(b"alpha")
    for kk in ("t_lo", "t_mid", "t_hi"):
        tr.absorb_point(proof[kk])
    zeta = tr.challenge(b"zeta")
    a_z, b_z, c_z = proof["a_z"], proof["b_z"], proof["c_z"]
    s1_z, s2_z, zw_z = proof["s1_z"], proof["s2_z"], proof["zw_z"]
    for s in (a_z, b_z, c_z, s1_z, s2_z, zw_z):
        tr.absorb_scalar(s)
    v = tr.challenge(b"v")

    zh_z = _zh_at(zeta, n)
    l1_z = zh_z * pow(n * (zeta - 1) % R, R - 2, R) % R
    # PI(zeta) over the first num_pub rows
    pi_z = 0
    wi = 1
    for i in range(vk.num_pub):
        li = (zh_z * wi % R) * pow(n * (zeta - wi) % R, R - 2, R) % R
        pi_z = (pi_z + (-pub[i]) * li) % R
        wi = wi * w % R

    # linearized commitment D (scalar-weighted combination)
    g1m, g1a = C.g1_mul, C.g1_add
    D = None
    D = g1a(D, g1m(vk.q_comms["ql"], a_z))
    D = g1a(D, g1m(vk.q_comms["qr"], b_z))
    D = g1a(D, g1m(vk.q_comms["qm"], a_z * b_z % R))
    D = g1a(D, g1m(vk.q_comms["qo"], c_z))
    D = g1a(D, vk.q_comms["qc"])
    t1 = ((a_z + beta * zeta + gamma)
          * (b_z + beta * K1 * zeta + gamma)
          * (c_z + beta * K2 * zeta + gamma) * alpha
          + alpha * alpha * l1_z) % R
    D = g1a(D, g1m(proof["z"], t1))
    t2 = ((a_z + beta * s1_z + gamma)
          * (b_z + beta * s2_z + gamma) * alpha * zw_z) % R
    D = g1a(D, g1m(C.g1_neg(vk.sigma_comms[2]), t2 * beta % R))
    zn2 = pow(zeta, n, R)       # X^n chunk stitching
    D = g1a(D, g1m(C.g1_neg(proof["t_lo"]), zh_z))
    D = g1a(D, g1m(C.g1_neg(proof["t_mid"]), zh_z * zn2 % R))
    D = g1a(D, g1m(C.g1_neg(proof["t_hi"]), zh_z * zn2 % R * zn2 % R))
    # constant part of r evaluated at zeta (moved to the eval side)
    r0 = (pi_z - t2 * (c_z + gamma) - alpha * alpha * l1_z) % R

    # batched commitment F and evaluation E
    F = D
    E = (-r0) % R
    vp = 1
    for comm, ev in ((proof["a"], a_z), (proof["b"], b_z),
                     (proof["c"], c_z), (vk.sigma_comms[0], s1_z),
                     (vk.sigma_comms[1], s2_z)):
        vp = vp * v % R
        F = g1a(F, g1m(comm, vp))
        E = (E + vp * ev) % R
    # r(zeta) = 0 by construction, so the batch's eval at zeta is E

    u = 1  # single-point batches checked separately (two pairings)
    ok1 = kzg_verify_open(
        KzgSrs(g1_powers=np.zeros((0, 8), dtype=np.uint64),
               g2=vk.g2, g2_tau=vk.g2_tau),
        F, zeta, E, proof["w_z"])
    ok2 = kzg_verify_open(
        KzgSrs(g1_powers=np.zeros((0, 8), dtype=np.uint64),
               g2=vk.g2, g2_tau=vk.g2_tau),
        proof["z"], zeta * w % R, zw_z, proof["w_zw"])
    return ok1 and ok2
