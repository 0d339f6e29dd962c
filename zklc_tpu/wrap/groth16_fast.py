"""Groth16 at proving scale: radix-2 QAP domain + native BN254 kernels.

The production counterpart of wrap/groth16.py's reference implementation
(same scheme, same proof/vk wire formats, same verify), sized for the
wrap-verifier statement (~2-4M constraints, wrap/verifier_r1cs.py):

  - QAP over a radix-2 evaluation domain (Fr has 2-adicity 28), so
    L_k(tau) and the quotient h are O(d log d) instead of O(d^2);
  - CRS generation with batched fixed-base scalar multiplication and
    proving with Pippenger MSMs in C++ (native/bn254_curve.cpp),
    mirroring what gnark's Go+asm backend does for the reference
    (groth16.Setup/Prove in cmd/compile.go:20, web-api.go:78);
  - h via coset evaluation: t(g w^k) = g^d - 1 is constant on the coset,
    so the quotient needs 6 NTTs and two pointwise passes.

Proof encoding/verification are groth16.py's (the contract's uint256[8] /
4-PI interface) — proofs from this module verify under groth16.verify and
the Solidity behavioral twin.
"""
from __future__ import annotations

import secrets
from dataclasses import dataclass

import numpy as np

from . import bn254 as C
from .groth16 import R1CS, VerifyingKey, encode_proof
from ..native import bn254 as NB

R = C.R
COSET_G = 5          # multiplicative generator of Fr (5 generates Fr^*)


def _batch_inverse(xs: list) -> list:
    n = len(xs)
    pref = [1] * (n + 1)
    for i, x in enumerate(xs):
        pref[i + 1] = pref[i] * x % R
    inv_all = pow(pref[n], R - 2, R)
    out = [0] * n
    for i in range(n - 1, -1, -1):
        out[i] = pref[i] * inv_all % R
        inv_all = inv_all * xs[i] % R
    return out


@dataclass
class FastProvingKey:
    """CRS with G1/G2 points as (n, 8)/(n, 16) u64 limb arrays."""
    alpha1: tuple
    beta1: tuple
    beta2: tuple
    delta1: tuple
    delta2: tuple
    a_tau1: np.ndarray      # (m, 8)
    b_tau1: np.ndarray      # (m, 8)
    b_tau2: np.ndarray      # (m, 16)
    k_priv1: np.ndarray     # (m - 1 - num_pub, 8)
    h_tau1: np.ndarray      # (d - 1, 8)
    domain_bits: int

    def save(self, path: str):
        np.savez_compressed(
            path,
            meta=np.array([self.domain_bits], dtype=np.int64),
            scalars=np.array(
                [self.beta1[0], self.beta1[1],
                 self.beta2[0][0], self.beta2[0][1],
                 self.beta2[1][0], self.beta2[1][1],
                 self.delta1[0], self.delta1[1],
                 self.delta2[0][0], self.delta2[0][1],
                 self.delta2[1][0], self.delta2[1][1],
                 self.alpha1[0], self.alpha1[1]], dtype=object),
            a_tau1=self.a_tau1, b_tau1=self.b_tau1, b_tau2=self.b_tau2,
            k_priv1=self.k_priv1, h_tau1=self.h_tau1)

    @staticmethod
    def load(path: str) -> "FastProvingKey":
        z = np.load(path, allow_pickle=True)
        s = [int(x) for x in z["scalars"]]
        return FastProvingKey(
            alpha1=(s[12], s[13]), beta1=(s[0], s[1]),
            beta2=((s[2], s[3]), (s[4], s[5])), delta1=(s[6], s[7]),
            delta2=((s[8], s[9]), (s[10], s[11])),
            a_tau1=z["a_tau1"], b_tau1=z["b_tau1"], b_tau2=z["b_tau2"],
            k_priv1=z["k_priv1"], h_tau1=z["h_tau1"],
            domain_bits=int(z["meta"][0]))


def setup(r1cs: R1CS, rng=None, progress=None):
    """Radix-2 trusted setup; returns (FastProvingKey, VerifyingKey)."""
    assert NB.available, "native bn254 library required for fast setup"
    rand = (lambda: secrets.randbelow(R - 1) + 1) if rng is None else rng
    alpha, beta, gamma, delta, tau = (rand() for _ in range(5))
    n = len(r1cs.a)
    d_bits = max(1, (n - 1).bit_length())
    d = 1 << d_bits
    m = r1cs.num_vars

    def log(msg):
        if progress:
            progress(msg)

    # Lagrange values at tau over the radix-2 domain:
    # L_k(tau) = (tau^d - 1) * w^k / (d * (tau - w^k))
    w = pow(COSET_G, (R - 1) >> d_bits, R)
    t_tau = (pow(tau, d, R) - 1) % R
    log(f"setup: domain 2^{d_bits}, {m} vars, Lagrange evals")
    wk = [1] * d
    for k in range(1, d):
        wk[k] = wk[k - 1] * w % R
    denoms = [(tau - wk[k]) % R for k in range(d)]
    dinv = _batch_inverse(denoms)
    d_inv = pow(d, R - 2, R)
    lag = [t_tau * wk[k] % R * dinv[k] % R * d_inv % R for k in range(d)]

    log("setup: per-variable QAP evals")
    a_tau = [0] * m
    b_tau = [0] * m
    c_tau = [0] * m
    for k in range(n):
        lk = lag[k]
        for i, coeff in r1cs.a[k].items():
            a_tau[i] = (a_tau[i] + coeff * lk) % R
        for i, coeff in r1cs.b[k].items():
            b_tau[i] = (b_tau[i] + coeff * lk) % R
        for i, coeff in r1cs.c[k].items():
            c_tau[i] = (c_tau[i] + coeff * lk) % R

    gamma_inv = pow(gamma, R - 2, R)
    delta_inv = pow(delta, R - 2, R)
    n_pub = 1 + r1cs.num_pub
    k_all = [(beta * a_tau[i] + alpha * b_tau[i] + c_tau[i]) % R
             for i in range(m)]
    k_pub = [k_all[i] * gamma_inv % R for i in range(n_pub)]
    k_priv = [k_all[i] * delta_inv % R for i in range(n_pub, m)]
    h_scalars = [pow(tau, j, R) * t_tau % R * delta_inv % R
                 for j in range(d - 1)]

    log("setup: G1 fixed-base CRS")
    a_tau1 = NB.g1_fixed_msm(C.G1_GEN, NB.ints_to_limbs(a_tau))
    b_tau1 = NB.g1_fixed_msm(C.G1_GEN, NB.ints_to_limbs(b_tau))
    k_priv1 = NB.g1_fixed_msm(C.G1_GEN, NB.ints_to_limbs(k_priv))
    h_tau1 = NB.g1_fixed_msm(C.G1_GEN, NB.ints_to_limbs(h_scalars))
    ic_pts = NB.g1_fixed_msm(C.G1_GEN, NB.ints_to_limbs(k_pub))
    log("setup: G2 fixed-base CRS")
    b_tau2 = NB.g2_fixed_msm(C.G2_GEN, NB.ints_to_limbs(b_tau))

    def g1p(k):
        return C.g1_mul(C.G1_GEN, k)

    def g2p(k):
        return C.g2_mul(C.G2_GEN, k)

    def aff1(row):
        v = NB.limbs_to_ints(row)
        return None if v[0] == 0 and v[1] == 0 else (v[0], v[1])

    pk = FastProvingKey(
        alpha1=g1p(alpha), beta1=g1p(beta), beta2=g2p(beta),
        delta1=g1p(delta), delta2=g2p(delta),
        a_tau1=a_tau1, b_tau1=b_tau1, b_tau2=b_tau2,
        k_priv1=k_priv1, h_tau1=h_tau1, domain_bits=d_bits)
    vk = VerifyingKey(alpha1=g1p(alpha), beta2=g2p(beta),
                      gamma2=g2p(gamma), delta2=g2p(delta),
                      ic=[aff1(ic_pts[i]) for i in range(n_pub)])
    return pk, vk


def _csr(rows, m):
    indptr = np.zeros(len(rows) + 1, dtype=np.int64)
    idx, cf = [], []
    for k, row in enumerate(rows):
        for i, coeff in row.items():
            idx.append(i)
            cf.append(coeff % R)
        indptr[k + 1] = len(idx)
    coeffs = NB.ints_to_limbs(cf)
    NB.fr_to_mont_vec(coeffs)
    return indptr, np.array(idx, dtype=np.int64), coeffs


def prove(pk: FastProvingKey, r1cs: R1CS, z: list, rng=None,
          progress=None, csr_cache=None):
    """Returns (proof8, pub_inputs); native MSM/NTT throughout."""
    assert NB.available, "native bn254 library required for fast prove"
    rand = (lambda: secrets.randbelow(R)) if rng is None else rng
    r_, s_ = rand(), rand()
    d_bits = pk.domain_bits
    d = 1 << d_bits
    n = len(r1cs.a)
    m = r1cs.num_vars

    def log(msg):
        if progress:
            progress(msg)

    log("prove: witness matvecs")
    zl = NB.ints_to_limbs(z)
    zm = zl.copy()
    NB.fr_to_mont_vec(zm)
    if csr_cache is None:
        csr_cache = {}
    evals = {}
    for name, rows in (("a", r1cs.a), ("b", r1cs.b), ("c", r1cs.c)):
        if name not in csr_cache:
            csr_cache[name] = _csr(rows, m)
        indptr, idx, cf = csr_cache[name]
        out = np.zeros((d, 4), dtype=np.uint64)
        NB.r1cs_matvec(indptr, idx, cf, zm, out[:n].reshape(-1, 4))
        NB.fr_from_mont_vec(out[:n])
        evals[name] = out

    log("prove: quotient via coset NTTs")
    g = COSET_G
    gd = pow(g, d, R)
    tinv = pow((gd - 1) % R, R - 2, R)
    coset_evals = {}
    for name in ("a", "b", "c"):
        v = evals[name]
        NB.fr_ntt(v, d_bits, True)              # coeffs
        NB.fr_vec_scale_powers(v, 1, g)         # coeff_j *= g^j
        NB.fr_ntt(v, d_bits, False)             # evals on coset
        coset_evals[name] = v
    ab = np.zeros_like(coset_evals["a"])
    NB.fr_vec_mul(coset_evals["a"], coset_evals["b"], ab)
    NB.fr_vec_sub(ab, coset_evals["c"], ab)
    NB.fr_vec_scale_powers(ab, tinv, 1)         # / t(coset) (constant)
    NB.fr_ntt(ab, d_bits, True)
    NB.fr_vec_scale_powers(ab, 1, pow(g, R - 2, R))   # undo coset shift
    h = ab[:d - 1]                               # deg(h) <= d - 2

    log("prove: MSMs")
    a_msm = NB.g1_msm(pk.a_tau1, zl)
    b1_msm = NB.g1_msm(pk.b_tau1, zl)
    b2_msm = NB.g2_msm(pk.b_tau2, zl)
    n_pub = 1 + r1cs.num_pub
    c_msm = NB.g1_msm(pk.k_priv1, zl[n_pub:])
    h_msm = NB.g1_msm(pk.h_tau1, np.ascontiguousarray(h))

    g1a, g1m = C.g1_add, C.g1_mul
    a_pt = g1a(g1a(a_msm, pk.alpha1), g1m(pk.delta1, r_))
    b2 = C.g2_add(C.g2_add(b2_msm, pk.beta2), C.g2_mul(pk.delta2, s_))
    b1 = g1a(g1a(b1_msm, pk.beta1), g1m(pk.delta1, s_))
    c_pt = g1a(c_msm, h_msm)
    c_pt = g1a(c_pt, g1m(a_pt, s_))
    c_pt = g1a(c_pt, g1m(b1, r_))
    c_pt = g1a(c_pt, g1m(pk.delta1, (-r_ * s_) % R))

    proof8 = encode_proof(a_pt, b2, c_pt)
    return proof8, [v % R for v in z[1:n_pub]]
