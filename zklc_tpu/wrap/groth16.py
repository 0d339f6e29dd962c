"""Groth16 over BN254: setup / prove / verify on R1CS.

The L5 final stage (SURVEY.md §2.5): the reference compiles the wrapped
plonky2 proof into a BN254 R1CS with gnark and proves it with Groth16
(`groth16.Setup`/`Prove` in cmd/compile.go:20, web-api.go:78), landing in
the 8-word proof the Solidity verifier checks on-chain
(contracts/foundry/verifier/src/Verifier.sol, 4 public inputs).

This module implements the scheme itself — trusted setup, proving, and the
pairing-equation verification — over an explicit R1CS.  It is the
keys/proof/verify semantics the contracts and the wrap client consume;
compiling the FULL plonky2-verifier statement to R1CS at gnark scale
(~8k LoC of circuit Go) remains external, as in the reference's docker
topology.  Tests drive it end-to-end on small R1CS instances and check the
Solidity verifier's exact pairing equation (test_groth16.py).

Proof encoding matches the web-api/contract wire format: 8 Fp words
[A.x, A.y, B.x_im, B.x_re, B.y_im, B.y_re, C.x, C.y] (gnark's EIP-197
ordering) and up to 4 public inputs.
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass

from . import bn254 as C

R = C.R


# -- R1CS ---------------------------------------------------------------------

@dataclass
class R1CS:
    """Constraints (A_k·z)(B_k·z) = (C_k·z) over z = (1, pub…, priv…).

    a/b/c: lists of {var_index: coeff} sparse rows; num_pub counts the
    public slots AFTER the constant-1 slot."""
    num_vars: int
    num_pub: int
    a: list
    b: list
    c: list

    def satisfied(self, z) -> bool:
        def dot(row):
            return sum(coeff * z[i] for i, coeff in row.items()) % R
        return all(dot(ar) * dot(br) % R == dot(cr)
                   for ar, br, cr in zip(self.a, self.b, self.c))


def _lagrange_coeffs_at(points, k, xs):
    """Coefficient vector of the k-th Lagrange basis over `points`
    evaluated symbolically is unnecessary — we only ever need polynomial
    VALUES at tau during setup, so return L_k(xs)."""
    num, den = 1, 1
    for j, pj in enumerate(points):
        if j == k:
            continue
        num = num * ((xs - pj) % R) % R
        den = den * ((points[k] - pj) % R) % R
    return num * pow(den, R - 2, R) % R


@dataclass
class ProvingKey:
    alpha1: tuple
    beta1: tuple
    beta2: tuple
    delta1: tuple
    delta2: tuple
    a_tau1: list        # [A_i(tau)]_1 per variable
    b_tau1: list        # [B_i(tau)]_1
    b_tau2: list        # [B_i(tau)]_2
    k_priv1: list       # [(beta A_i + alpha B_i + C_i)/delta]_1, private i
    h_tau1: list        # [tau^j t(tau)/delta]_1
    points: list        # interpolation domain


@dataclass
class VerifyingKey:
    alpha1: tuple
    beta2: tuple
    gamma2: tuple
    delta2: tuple
    ic: list            # [(beta A_i + alpha B_i + C_i)/gamma]_1, public i


def setup(r1cs: R1CS, rng=None):
    """Trusted setup (Groth16 §3.1 CRS).  rng only for tests."""
    rand = (lambda: secrets.randbelow(R - 1) + 1) if rng is None else rng
    alpha, beta, gamma, delta, tau = (rand() for _ in range(5))
    n = len(r1cs.a)
    points = [pow(5, k, R) for k in range(n)]   # distinct domain points
    t_tau = 1
    for pk_ in points:
        t_tau = t_tau * ((tau - pk_) % R) % R

    # per-variable QAP evals at tau: A_i(tau) = sum_k a[k][i] L_k(tau)
    lag = [_lagrange_coeffs_at(points, k, tau) for k in range(n)]
    m = r1cs.num_vars
    a_tau = [0] * m
    b_tau = [0] * m
    c_tau = [0] * m
    for k in range(n):
        for i, coeff in r1cs.a[k].items():
            a_tau[i] = (a_tau[i] + coeff * lag[k]) % R
        for i, coeff in r1cs.b[k].items():
            b_tau[i] = (b_tau[i] + coeff * lag[k]) % R
        for i, coeff in r1cs.c[k].items():
            c_tau[i] = (c_tau[i] + coeff * lag[k]) % R

    g1, g2 = C.G1_GEN, C.G2_GEN
    ginv = pow(gamma, R - 2, R)
    dinv = pow(delta, R - 2, R)
    n_pub = 1 + r1cs.num_pub
    ic = [C.g1_mul(g1, (beta * a_tau[i] + alpha * b_tau[i] + c_tau[i])
                   * ginv % R) for i in range(n_pub)]
    k_priv = [C.g1_mul(g1, (beta * a_tau[i] + alpha * b_tau[i] + c_tau[i])
                       * dinv % R) for i in range(n_pub, m)]
    h1 = [C.g1_mul(g1, pow(tau, j, R) * t_tau % R * dinv % R)
          for j in range(n)]    # degree(H) <= n-2, one spare
    pk = ProvingKey(
        alpha1=C.g1_mul(g1, alpha), beta1=C.g1_mul(g1, beta),
        beta2=C.g2_mul(g2, beta), delta1=C.g1_mul(g1, delta),
        delta2=C.g2_mul(g2, delta),
        a_tau1=[C.g1_mul(g1, v) for v in a_tau],
        b_tau1=[C.g1_mul(g1, v) for v in b_tau],
        b_tau2=[C.g2_mul(g2, v) for v in b_tau],
        k_priv1=k_priv, h_tau1=h1, points=points)
    vk = VerifyingKey(alpha1=pk.alpha1, beta2=pk.beta2,
                      gamma2=C.g2_mul(g2, gamma), delta2=pk.delta2, ic=ic)
    return pk, vk


def _poly_from_evals(points, evals):
    """Interpolating polynomial coefficients via the barycentric trick:
    L_k = T(x)/(x - p_k) * 1/T'(p_k) with T = prod (x - p_j); each quotient
    comes from one synthetic division — O(n^2) total."""
    n = len(points)
    t = [1]
    for pt_ in points:
        t = _poly_mul(t, [(-pt_) % R, 1])
    coeffs = [0] * n
    for k in range(n):
        if evals[k] % R == 0:
            continue
        # synthetic division T / (x - p_k)
        q = [0] * n
        carry = 0
        for i in range(n, 0, -1):
            carry = (t[i] + carry * points[k]) % R
            q[i - 1] = carry
        # T'(p_k) = q(p_k)
        dk = 0
        for cf in reversed(q):
            dk = (dk * points[k] + cf) % R
        scale = evals[k] * pow(dk, R - 2, R) % R
        for i in range(n):
            coeffs[i] = (coeffs[i] + q[i] * scale) % R
    return coeffs


def _poly_mul(x, y):
    out = [0] * (len(x) + len(y) - 1)
    for i, a in enumerate(x):
        for j, b in enumerate(y):
            out[i + j] = (out[i + j] + a * b) % R
    return out


def _poly_divmod(num, den):
    num = list(num)
    q = [0] * (len(num) - len(den) + 1)
    dinv = pow(den[-1], R - 2, R)
    for i in range(len(q) - 1, -1, -1):
        q[i] = num[len(den) - 1 + i] * dinv % R
        for j, cf in enumerate(den):
            num[i + j] = (num[i + j] - q[i] * cf) % R
    return q, num[:len(den) - 1]


def prove(pk: ProvingKey, r1cs: R1CS, z: list, rng=None):
    """z: full assignment (1, pub…, priv…). Returns (proof8, pub_inputs)."""
    assert z[0] == 1 and r1cs.satisfied(z)
    rand = (lambda: secrets.randbelow(R)) if rng is None else rng
    r_, s_ = rand(), rand()
    n = len(r1cs.a)
    pts = pk.points

    def row_evals(rows):
        return [sum(coeff * z[i] for i, coeff in rows[k].items()) % R
                for k in range(n)]
    az, bz, cz = row_evals(r1cs.a), row_evals(r1cs.b), row_evals(r1cs.c)
    # H = (A*B - C) / t over the domain
    pa = _poly_from_evals(pts, az)
    pb = _poly_from_evals(pts, bz)
    pc = _poly_from_evals(pts, cz)
    num = _poly_mul(pa, pb)
    num = [(x - y) % R for x, y in
           zip(num, pc + [0] * (len(num) - len(pc)))]
    t = [1]
    for pt_ in pts:
        t = _poly_mul(t, [(-pt_) % R, 1])
    h, rem = _poly_divmod(num, t)
    assert all(v == 0 for v in rem), "A*B - C not divisible by t"

    def msm(bases, scalars, add, mul):
        acc = None
        for b_, s2 in zip(bases, scalars):
            if s2 % R == 0 or b_ is None:
                continue
            acc = add(acc, mul(b_, s2))
        return acc

    g1a, g1m = C.g1_add, C.g1_mul
    a_pt = msm(pk.a_tau1, z, g1a, g1m)
    a_pt = g1a(g1a(a_pt, pk.alpha1), g1m(pk.delta1, r_))
    b2 = msm(pk.b_tau2, z, C.g2_add, C.g2_mul)
    b2 = C.g2_add(C.g2_add(b2, pk.beta2), C.g2_mul(pk.delta2, s_))
    b1 = msm(pk.b_tau1, z, g1a, g1m)
    b1 = g1a(g1a(b1, pk.beta1), g1m(pk.delta1, s_))

    n_pub = 1 + r1cs.num_pub
    c_pt = msm(pk.k_priv1, z[n_pub:], g1a, g1m)
    c_pt = g1a(c_pt, msm(pk.h_tau1[:len(h)], h, g1a, g1m))
    c_pt = g1a(c_pt, g1m(a_pt, s_))
    c_pt = g1a(c_pt, g1m(b1, r_))
    c_pt = g1a(c_pt, g1m(pk.delta1, (-r_ * s_) % R))

    proof8 = encode_proof(a_pt, b2, c_pt)
    return proof8, [v % R for v in z[1:n_pub]]


def encode_proof(a_pt, b2, c_pt) -> list:
    """The contract's uint256[8]: [A.x, A.y, B.x_im, B.x_re, B.y_im,
    B.y_re, C.x, C.y] (EIP-197 G2 ordering, as gnark serializes)."""
    return [a_pt[0], a_pt[1],
            b2[0][1], b2[0][0], b2[1][1], b2[1][0],
            c_pt[0], c_pt[1]]


def decode_proof(proof8):
    a_pt = (proof8[0], proof8[1])
    b2 = ((proof8[3], proof8[2]), (proof8[5], proof8[4]))
    c_pt = (proof8[6], proof8[7])
    return a_pt, b2, c_pt


def verify(vk: VerifyingKey, proof8: list, pub_inputs: list) -> bool:
    """EXACTLY the Solidity verifier's check (Verifier.sol / EIP-197
    precompile 0x08):  e(-A, B) * e(alpha, beta) * e(vk_x, gamma) *
    e(C, delta) == 1, with range/curve checks on every point."""
    a_pt, b2, c_pt = decode_proof(proof8)
    for w in proof8:
        if not (0 <= w < C.P):
            return False
    if not (C.g1_on_curve(a_pt) and C.g2_on_curve(b2)
            and C.g1_on_curve(c_pt)):
        return False
    if len(pub_inputs) != len(vk.ic) - 1:
        return False
    vk_x = vk.ic[0]
    for base, val in zip(vk.ic[1:], pub_inputs):
        if not (0 <= val < R):
            return False
        vk_x = C.g1_add(vk_x, C.g1_mul(base, val))
    return C.pairing_product_is_one([
        (C.g1_neg(a_pt), b2),
        (vk.alpha1, vk.beta2),
        (vk_x, vk.gamma2),
        (c_pt, vk.delta2),
    ])


# -- the wrap-PI statement as an R1CS ------------------------------------------

def pi_packing_r1cs() -> tuple:
    """A real (small) R1CS for the deployed interface: the 4 BN254 public
    inputs are the byte-packings of 16 private u32 words
    (wrap/api.pack_public_inputs, web-api.go:50-66) — packed[j] =
    sum_i words[4j+i] * 2^(32*(3-i)) with each word range-bounded by 32
    squared-bit constraints.

    Returns (r1cs, assign) where assign(words16) -> full z vector."""
    a, b, c = [], [], []
    # z = (1, packed[0..4), words[0..16), bits…)
    num_pub = 4
    word0 = 1 + num_pub
    var = word0 + 16

    bit_vars = []
    for _w in range(16):
        bit_vars.append(list(range(var, var + 32)))
        var += 32
    num_vars = var

    for w in range(16):
        # bits are boolean: b*(b-1) = 0
        for bv in bit_vars[w]:
            a.append({bv: 1})
            b.append({bv: 1, 0: R - 1})
            c.append({})
        # word = sum bits * 2^k
        row = {bv: pow(2, k, R) for k, bv in enumerate(bit_vars[w])}
        a.append(row)
        b.append({0: 1})
        c.append({word0 + w: 1})
    for j in range(4):
        row = {word0 + 4 * j + i: pow(2, 32 * (3 - i), R) for i in range(4)}
        a.append(row)
        b.append({0: 1})
        c.append({1 + j: 1})

    r1cs = R1CS(num_vars=num_vars, num_pub=num_pub, a=a, b=b, c=c)

    def assign(words16):
        from .api import pack_public_inputs
        packed = pack_public_inputs(words16)
        z = [1] + [v % R for v in packed] + [int(w) for w in words16]
        for w in range(16):
            for k in range(32):
                z.append((int(words16[w]) >> k) & 1)
        return z

    return r1cs, assign
