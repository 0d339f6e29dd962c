"""Host-side vectorized polynomial helpers over Goldilocks (numpy u64).

Log-depth scans replace the reference's sequential rayon loops: prefix
products, batch inversion, field reductions — all numpy-vectorized so the
host never loops per element.
"""
from __future__ import annotations

import numpy as np

from ..field import gl64

try:
    from .. import native as _native
    _NATIVE = _native if _native.available else None
except Exception:  # pragma: no cover
    _NATIVE = None


def field_sum(a: np.ndarray, axis: int = -1) -> np.ndarray:
    """Sum mod p along axis via pairwise tree reduction."""
    a = np.moveaxis(np.asarray(a, dtype=np.uint64), axis, 0)
    n = a.shape[0]
    while n > 1:
        half = n // 2
        s = gl64.add(a[:half], a[half: 2 * half])
        if n % 2:
            a = np.concatenate([s, a[2 * half: n]], axis=0)
        else:
            a = s
        n = a.shape[0]
    return a[0]


def cumprod(a: np.ndarray) -> np.ndarray:
    """Inclusive prefix product mod p along axis 0 (Hillis-Steele scan)."""
    if _NATIVE is not None and np.asarray(a).ndim == 1:
        return _NATIVE.cumprod(a)
    out = np.asarray(a, dtype=np.uint64).copy()
    n = out.shape[0]
    s = 1
    while s < n:
        prev = out.copy()
        out[s:] = gl64.mul(out[s:], prev[:-s])
        s *= 2
    return out


def batch_inverse(a: np.ndarray) -> np.ndarray:
    """Elementwise inverse via exclusive prefix/suffix product trick:
    inv_i = (prod_{j != i} a_j) * (prod_all)^-1 — two scans + one inversion."""
    flat = np.asarray(a, dtype=np.uint64).ravel()
    n = flat.shape[0]
    if n == 0:
        return flat.reshape(np.asarray(a).shape)
    if _NATIVE is not None:
        return _NATIVE.batch_inverse(flat).reshape(np.asarray(a).shape)
    pre = cumprod(flat)                     # inclusive prefix
    suf = cumprod(flat[::-1])[::-1]         # inclusive suffix
    total = pre[-1]
    inv_total = np.uint64(pow(int(total), gl64.P - 2, gl64.P))
    others = np.empty_like(flat)
    others[0] = suf[1] if n > 1 else np.uint64(1)
    others[-1] = pre[-2] if n > 1 else np.uint64(1)
    if n > 2:
        others[1:-1] = gl64.mul(pre[:-2], suf[2:])
    return gl64.mul(others, inv_total).reshape(np.asarray(a).shape)


def ext_powers(x: np.ndarray, n: int) -> np.ndarray:
    """[1, x, x^2, ..., x^(n-1)] for extension x (shape (2,)) -> (n, 2)."""
    out = np.tile(np.asarray(x, dtype=np.uint64), (n, 1))
    out[0] = [1, 0]
    # inclusive scan with ext mul
    s = 1
    while s < n:
        prev = out.copy()
        out[s:] = gl64.ext_mul(out[s:], prev[:-s])
        s *= 2
    return out


def base_powers(x: int, n: int) -> np.ndarray:
    if _NATIVE is not None:
        return _NATIVE.powers(int(x) % gl64.P, n)
    out = np.full(n, np.uint64(int(x) % gl64.P), dtype=np.uint64)
    out[0] = 1
    s = 1
    while s < n:
        prev = out.copy()
        out[s:] = gl64.mul(out[s:], prev[:-s])
        s *= 2
    return out


def eval_poly_ext(coeffs_base: np.ndarray, zeta_pows: np.ndarray) -> np.ndarray:
    """Evaluate base-coeff polys at an extension point.

    coeffs_base: (..., n) uint64; zeta_pows: (n, 2).  Returns (..., 2).
    """
    c = np.asarray(coeffs_base, dtype=np.uint64)
    p0 = gl64.mul(c, zeta_pows[..., :, 0])
    p1 = gl64.mul(c, zeta_pows[..., :, 1])
    return np.stack([field_sum(p0, -1), field_sum(p1, -1)], axis=-1)


def eval_poly_ext_coeffs(coeffs_ext: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Horner-evaluate ext-coeff poly (n, 2) at ext point x (2,)."""
    acc = np.zeros(2, dtype=np.uint64)
    for c in coeffs_ext[::-1]:
        acc = gl64.ext_add(gl64.ext_mul(acc, x), c)
    return acc


def divide_by_linear_ext(coeffs: np.ndarray, zeta: np.ndarray) -> np.ndarray:
    """(f(X) - f(zeta)) / (X - zeta) for ext coeffs (n, 2) -> (n-1, 2).

    Synthetic division: q_{n-2} = c_{n-1}; q_{k-1} = c_k + zeta * q_k.
    Implemented as an affine-composition scan to stay vectorized:
    walking from high to low coefficients, acc_k = sum_{j>=k+1} c_j zeta^{j-k-1}
    = zeta^{-k-1} * (partial sums of c_j zeta^j).  We use the direct scan on
    (mul-by-zeta, add-c) affine maps via prefix products of zeta.
    """
    n = coeffs.shape[0]
    if n <= 1:
        return np.zeros((0, 2), dtype=np.uint64)
    # q_k = sum_{j > k} c_j * zeta^(j-k-1), k = 0..n-2
    # Let S_k = sum_{j>k} c_j zeta^j = suffix sums of d_j = c_j zeta^j.
    # Then q_k = S_k * zeta^(-k-1).
    zp = ext_powers(zeta, n)
    d = gl64.ext_mul(coeffs, zp)
    # suffix sums of d (exclusive at k: j > k)
    rev = d[::-1]
    s = 1
    acc = rev.copy()
    while s < n:
        prev = acc.copy()
        acc[s:] = gl64.ext_add(acc[s:], prev[:-s])
        s *= 2
    suffix_incl = acc[::-1]            # S'_k = sum_{j >= k} d_j
    S = np.zeros_like(d)
    S[:-1] = suffix_incl[1:]           # exclusive: sum_{j > k}
    zeta_inv = gl64.ext_inv(zeta)
    zinv_pows = ext_powers(zeta_inv, n + 1)
    q = gl64.ext_mul(S[:-1], zinv_pows[1:n])
    return q
