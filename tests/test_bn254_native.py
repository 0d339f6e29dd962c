"""Native BN254 kernels vs the Python curve oracle (wrap/bn254.py).

MSM / fixed-base / NTT / matvec each checked against independent Python
big-int computations on random inputs."""
import random

import numpy as np
import pytest

from zklc_tpu.wrap import bn254 as C
from zklc_tpu.native import bn254 as NB

pytestmark = pytest.mark.skipif(not NB.available,
                                reason="native bn254 library unavailable")

rng = random.Random(1234)
R = C.R


def rand_fr():
    return rng.randrange(R)


def g1_scale_py(k):
    return C.g1_mul(C.G1_GEN, k)


def test_g1_fixed_msm_matches_python():
    ks = [0, 1, 2, rand_fr(), rand_fr(), R - 1]
    out = NB.g1_fixed_msm(C.G1_GEN, NB.ints_to_limbs(ks))
    for i, k in enumerate(ks):
        want = C.g1_mul(C.G1_GEN, k)
        got = NB.limbs_to_ints(out[i])
        if want is None:
            assert got == [0, 0]
        else:
            assert (got[0], got[1]) == want, f"scalar {k}"


def test_g1_msm_matches_python():
    n = 37
    ks = [rand_fr() for _ in range(n)]
    bases_pts = [C.g1_mul(C.G1_GEN, rng.randrange(1, 2**40))
                 for _ in range(n)]
    bases = np.zeros((n, 8), dtype=np.uint64)
    for i, p in enumerate(bases_pts):
        bases[i] = NB.ints_to_limbs([p[0], p[1]]).reshape(-1)
    got = NB.g1_msm(bases, NB.ints_to_limbs(ks))
    want = None
    for p, k in zip(bases_pts, ks):
        want = C.g1_add(want, C.g1_mul(p, k))
    assert got == want


def test_g2_fixed_and_msm_match_python():
    ks = [1, rand_fr(), rand_fr()]
    out = NB.g2_fixed_msm(C.G2_GEN, NB.ints_to_limbs(ks))
    pts = []
    for i, k in enumerate(ks):
        want = C.g2_mul(C.G2_GEN, k)
        v = NB.limbs_to_ints(out[i])
        got = ((v[0], v[1]), (v[2], v[3]))
        assert got == want, f"g2 scalar {k}"
        pts.append(want)
    # msm of those points
    ws = [rand_fr() for _ in pts]
    bases = np.zeros((len(pts), 16), dtype=np.uint64)
    for i, p in enumerate(pts):
        bases[i] = NB.ints_to_limbs([p[0][0], p[0][1],
                                     p[1][0], p[1][1]]).reshape(-1)
    got = NB.g2_msm(bases, NB.ints_to_limbs(ws))
    want = None
    for p, w in zip(pts, ws):
        want = C.g2_add(want, C.g2_mul(p, w))
    assert got == want


def test_fr_ntt_roundtrip_and_convolution():
    log_n = 10
    n = 1 << log_n
    vals = [rand_fr() for _ in range(n)]
    a = NB.ints_to_limbs(vals)
    NB.fr_ntt(a, log_n, False)
    evals = NB.limbs_to_ints(a)
    # forward-transform check at a couple of points: NTT output k should be
    # sum_j vals[j] * w^(jk) for the library's root w (self-consistency +
    # explicit DFT definition)
    w = pow(5, (R - 1) >> 28, R)
    w = pow(w, 1 << (28 - log_n), R)
    for k in (0, 1, 7):
        want = sum(v * pow(w, j * k, R) for j, v in enumerate(vals)) % R
        assert evals[k] == want, f"DFT mismatch at {k}"
    NB.fr_ntt(a, log_n, True)
    assert NB.limbs_to_ints(a) == vals


def test_r1cs_matvec_matches_python():
    rows, cols = 50, 30
    indptr = [0]
    indices, coeffs = [], []
    z = [rand_fr() for _ in range(cols)]
    for r in range(rows):
        nnz = rng.randrange(0, 5)
        for _ in range(nnz):
            indices.append(rng.randrange(cols))
            coeffs.append(rand_fr())
        indptr.append(len(indices))
    cf = NB.ints_to_limbs(coeffs)
    NB.fr_to_mont_vec(cf)
    zv = NB.ints_to_limbs(z)
    NB.fr_to_mont_vec(zv)
    out = np.zeros((rows, 4), dtype=np.uint64)
    NB.r1cs_matvec(np.array(indptr, dtype=np.int64),
                   np.array(indices, dtype=np.int64), cf, zv, out)
    NB.fr_from_mont_vec(out)
    got = NB.limbs_to_ints(out)
    for r in range(rows):
        want = sum(coeffs[k] * z[indices[k]]
                   for k in range(indptr[r], indptr[r + 1])) % R
        assert got[r] == want


def test_fr_vec_ops():
    n = 17
    xs = [rand_fr() for _ in range(n)]
    ys = [rand_fr() for _ in range(n)]
    a, b = NB.ints_to_limbs(xs), NB.ints_to_limbs(ys)
    out = np.zeros_like(a)
    NB.fr_vec_mul(a, b, out)
    assert NB.limbs_to_ints(out) == [x * y % R for x, y in zip(xs, ys)]
    NB.fr_vec_sub(a, b, out)
    assert NB.limbs_to_ints(out) == [(x - y) % R for x, y in zip(xs, ys)]
    s0, st = rand_fr(), rand_fr()
    NB.fr_vec_scale_powers(a, s0, st)
    assert NB.limbs_to_ints(a) == \
        [x * s0 * pow(st, i, R) % R for i, x in enumerate(xs)]
