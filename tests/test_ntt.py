"""NTT/LDE tests vs naive host evaluation."""
import numpy as np

from zklc_tpu.field import gl64
from zklc_tpu.field import gl2x32 as gl
from zklc_tpu.ops import ntt

P = gl64.P
rng = np.random.default_rng(7)


def naive_eval(coeffs: np.ndarray, points: np.ndarray) -> np.ndarray:
    """Horner evaluation with Python ints (oracle)."""
    out = []
    for x in points.astype(object):
        acc = 0
        for c in coeffs.astype(object)[::-1]:
            acc = (acc * int(x) + int(c)) % P
        out.append(acc)
    return np.array(out, dtype=np.uint64)


def test_ntt_matches_naive():
    for log_n in [1, 2, 5, 8]:
        n = 1 << log_n
        coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
        pts = gl64.two_adic_subgroup(log_n)
        expect = naive_eval(coeffs, pts)
        got = gl.to_u64_np(ntt.ntt(gl.from_u64_np(coeffs), log_n))
        np.testing.assert_array_equal(got, expect)


def test_intt_roundtrip():
    log_n = 10
    n = 1 << log_n
    vals = rng.integers(0, P, size=(3, n), dtype=np.uint64)
    d = gl.from_u64_np(vals)
    back = gl.to_u64_np(ntt.ntt(ntt.intt(d, log_n), log_n))
    np.testing.assert_array_equal(back, vals)


def test_coset_ntt():
    log_n = 6
    n = 1 << log_n
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
    g = gl64.primitive_root_of_unity(log_n)
    shift = 7
    pts = np.array([(shift * pow(g, i, P)) % P for i in range(n)], dtype=np.uint64)
    expect = naive_eval(coeffs, pts)
    got = gl.to_u64_np(ntt.coset_ntt(gl.from_u64_np(coeffs), log_n))
    np.testing.assert_array_equal(got, expect)
    back = gl.to_u64_np(ntt.coset_intt(gl.from_u64_np(expect), log_n))
    np.testing.assert_array_equal(back, coeffs)


def test_lde_extends_degree():
    """LDE of degree-(n-1) poly evaluated on extended coset matches Horner."""
    log_n, rate = 4, 3
    n = 1 << log_n
    coeffs = rng.integers(0, P, size=n, dtype=np.uint64)
    vals = naive_eval(coeffs, gl64.two_adic_subgroup(log_n))
    out = gl.to_u64_np(ntt.lde(gl.from_u64_np(vals), log_n, rate))
    big_g = gl64.primitive_root_of_unity(log_n + rate)
    pts = np.array([(7 * pow(big_g, i, P)) % P for i in range(n << rate)],
                   dtype=np.uint64)
    expect = naive_eval(coeffs, pts)
    np.testing.assert_array_equal(out, expect)
