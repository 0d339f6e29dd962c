"""Matmul-form NTT over Goldilocks: DFT as int8 limb matmuls on the MXU.

The radix-2 butterfly NTT (ntt.py) is VPU/bandwidth-bound and its unrolled
stage graph compiles slowly.  This module reformulates the NTT the TPU-native
way (SURVEY.md §7.2 step 2): a size-n DFT is a matrix multiply Y = W @ X with
W[k,j] = w^{kj}, and matmuls are what the MXU does at speed of light.  Large
sizes use the four-step (Cooley-Tukey n = n1*n2) decomposition so every
matrix stays <= 2^11 x 2^11:

    x.reshape(n2, n1)  --DFT_n2 over axis 0-->  A[k2, j1]
    A *= w^(j1*k2)                                 (twiddle, field mul)
    A  --DFT_n1 over axis 1-->  Y'[k2, k1];  out[k2 + n2*k1] = Y'[k2, k1]

Modular 64-bit multiply-accumulate on an int8 MXU:
  * W entries are decomposed offline into 9 BALANCED base-256 digits
    (each in [-128, 127], exact integer reconstruction).
  * X values (u32 hi/lo planes, any representative < 2^64) are decomposed
    on device into 8 bytes, centered to [-128, 127] by subtracting 128.
    The -128 offset is corrected analytically: sum_j W[k,j] = n*delta_{k0}
    (mod p), so only output row 0 needs a precomputed constant added.
  * P_a = W_a @ X  (int8 x int8 -> int32; |acc| <= n*128^2 <= 2^25 for
    n <= 2^11).  S_s = sum_{a+b=s} P_{a,b} <= 2^28 — no overflow.
  * Y = sum_s 2^(8s) * S_s (mod p), evaluated per element in u32-pair
    arithmetic with the offset trick to keep S_s unsigned.

Natural order in / natural order out — no bit reversal anywhere.

Equivalent of the plonky2 fork's `fft`/`ifft`/`coset_fft` (reference hot
loop: every `CircuitData::prove`, SURVEY.md §3.1).
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gl64
from ..field import gl2x32 as gl

MAX_DFT_LOG = 11          # largest direct DFT matrix (2^11 = 2048)
_OFFSET_BITS = 29         # S_s in (-2^28, 2^28); +2^28 keeps it unsigned
_OFFSET = 1 << 28

# O = 128 * sum_{b=0}^{7} 2^(8b): the integer subtracted from X by centering.
_O_INT = 128 * ((1 << 64) - 1) // 255


def _balanced_digits(x: np.ndarray) -> np.ndarray:
    """uint64 array -> (9, ...) int8 balanced base-256 digits (exact)."""
    x = np.asarray(x, dtype=np.uint64)
    digits = np.zeros((9,) + x.shape, dtype=np.int16)
    for b in range(8):
        digits[b] = ((x >> np.uint64(8 * b)) & np.uint64(0xFF)).astype(np.int16)
    carry = np.zeros(x.shape, dtype=np.int16)
    out = np.zeros_like(digits)
    for b in range(9):
        d = digits[b] + carry
        adj = (d >= 128).astype(np.int16)
        out[b] = d - 256 * adj
        carry = adj
    assert np.all(carry == 0)
    return out.astype(np.int8)


@functools.lru_cache(maxsize=None)
def _dft_tables(log_n: int, inverse: bool):
    """(W_digits int8 (9, n, n), row0_correction int) for the size-n DFT."""
    n = 1 << log_n
    w = gl64.primitive_root_of_unity(log_n)
    if inverse:
        w = pow(w, gl64.P - 2, gl64.P)
    pw = gl64.powers(w, n)                     # w^t for t < n
    exps = (np.outer(np.arange(n, dtype=np.int64),
                     np.arange(n, dtype=np.int64)) % n)
    W = pw[exps]                               # (n, n) uint64
    digits = _balanced_digits(W)               # (9, n, n)
    # centering correction: + O * sum_j W[k,j] = O * n (mod p) at k = 0 only
    corr0 = (_O_INT % gl64.P) * n % gl64.P
    return digits, corr0


@functools.lru_cache(maxsize=None)
def _twiddle_planes(l1: int, l2: int, inverse: bool):
    """(hi, lo) u32 (n2, n1) plane of w^(j1*k2) for the four-step middle."""
    n1, n2 = 1 << l1, 1 << l2
    w = gl64.primitive_root_of_unity(l1 + l2)
    if inverse:
        w = pow(w, gl64.P - 2, gl64.P)
    pw = gl64.powers(w, 1 << (l1 + l2))
    exps = (np.outer(np.arange(n2, dtype=np.int64),
                     np.arange(n1, dtype=np.int64)))
    tw = pw[exps.ravel() % (1 << (l1 + l2))].reshape(n2, n1)
    return ((tw >> np.uint64(32)).astype(np.uint32),
            (tw & np.uint64(0xFFFFFFFF)).astype(np.uint32))


@functools.lru_cache(maxsize=None)
def _shift_consts():
    """c_s = 2^(8s) mod p for s in 0..16 and K = 2^28 * sum c_s mod p."""
    cs = [pow(2, 8 * s, gl64.P) for s in range(17)]
    k_corr = (_OFFSET * sum(cs[:16])) % gl64.P
    return cs, k_corr


def _to_centered_bytes(x: gl.GL) -> jnp.ndarray:
    """(hi, lo) u32 [...] -> int8 (8, ...) centered byte limbs."""
    hi, lo = x
    planes = []
    for k in range(4):
        planes.append(((lo >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32))
    for k in range(4):
        planes.append(((hi >> (8 * k)) & jnp.uint32(0xFF)).astype(jnp.int32))
    b = jnp.stack(planes)                       # (8, ...) int32 in [0, 255]
    return (b - 128).astype(jnp.int8)


def _reduce_limb_sums(S: jnp.ndarray, corr0: int) -> gl.GL:
    """S: int32 (16, n, cols) limb-weight sums -> GL (n, cols) mod p.

    Y[k] = sum_s 2^(8s) * S_s + O*n*delta_{k0}  (mod p), via the unsigned
    offset trick U_s = S_s + 2^28, then a mul-free recombination: pack four
    consecutive limb sums into V_j = sum_k U_{4j+k} 2^(8k) < 2^54, and use
    the weights 2^(32j) mod p directly (2^64 = 2^32 - 1, 2^96 = -1):
        Y = V0 + V1*2^32 + V2*(2^32 - 1) - V3 - K.
    """
    _, k_corr = _shift_consts()
    n = S.shape[1]
    U = (S + jnp.int32(_OFFSET)).astype(jnp.uint32)   # < 2^29
    zero = jnp.zeros(S.shape[1:], jnp.uint32)
    vs = []
    for j in range(4):
        pair = (zero, U[4 * j])
        for k in range(1, 4):
            u = U[4 * j + k]
            term = (u >> (32 - 8 * k), u << (8 * k))
            pair, _carry = gl.add64(pair, term)       # V_j < 2^54: no wrap
        vs.append(pair)
    v1_shift = gl.reduce128(zero, vs[1][0], vs[1][1], zero)   # V1 * 2^64>>32
    v2_shift = gl.reduce128(zero, vs[2][0], vs[2][1], zero)
    acc = gl.add(vs[0], v1_shift)
    acc = gl.add(acc, gl.sub(v2_shift, vs[2]))        # V2 * (2^32 - 1)
    acc = gl.sub(acc, vs[3])
    # subtract the offset correction K
    acc = gl.sub(acc, (jnp.uint32(k_corr >> 32), jnp.uint32(k_corr & 0xFFFFFFFF)))
    # add O*n (mod p) to output row k = 0
    row_idx = jnp.arange(n, dtype=jnp.uint32).reshape((n,) + (1,) * (S.ndim - 2))
    c0 = gl.add(acc, (jnp.full_like(acc[0], corr0 >> 32),
                      jnp.full_like(acc[1], corr0 & 0xFFFFFFFF)))
    acc = gl.select(row_idx == 0, c0, acc)
    return acc


def _dft_matmul(x: gl.GL, log_n: int, inverse: bool, Wd=None) -> gl.GL:
    """Direct DFT over the LAST axis via limb matmuls; x: (..., n).

    Wd defaults to the numpy constant digit table (embedded in the lowered
    program — fine up to ~2^10 where it is a few MB); callers of LARGE
    sizes pass the table as a runtime ARGUMENT instead (see ntt_mm_big):
    multi-tens-of-MB inline constants make compile payloads the tunneled
    backend cannot reliably swallow, while device_put of the same bytes is
    the robust direction."""
    n = 1 << log_n
    digits_np, corr0 = _dft_tables(log_n, inverse)
    if Wd is None:
        Wd = digits_np   # numpy constant; see ntt.py NB
    lead = x[0].shape[:-1]
    cols = int(np.prod(lead, dtype=np.int64)) if lead else 1
    xb = _to_centered_bytes(x)                  # (8, *lead, n)
    # -> (n, 8*cols): contraction axis first
    xb = xb.reshape(8, cols, n).transpose(2, 0, 1).reshape(n, 8 * cols)
    # P[a] = Wd[a] @ xb : (n, 8*cols) int32;  S_s = sum_{a+b=s} P[a][:, b, :]
    S_terms: list = [None] * 16
    for a in range(9):
        Pa = jax.lax.dot(Wd[a], xb, preferred_element_type=jnp.int32)
        Pa = Pa.reshape(n, 8, cols)
        for b in range(8):
            s = a + b
            t = Pa[:, b, :]
            S_terms[s] = t if S_terms[s] is None else S_terms[s] + t
    S = jnp.stack(S_terms)                      # (16, n, cols)
    y = _reduce_limb_sums(S, corr0)             # GL (n, cols)
    if not lead:
        return (y[0].reshape(n), y[1].reshape(n))
    perm = tuple(range(1, len(lead) + 1)) + (0,)
    hi = jnp.transpose(y[0].reshape((n,) + lead), perm)
    lo = jnp.transpose(y[1].reshape((n,) + lead), perm)
    return (hi, lo)


def _ntt_mm_core(x: gl.GL, log_n: int, inverse: bool) -> gl.GL:
    if log_n == 0:
        return x
    if log_n <= MAX_DFT_LOG:
        out = _dft_matmul(x, log_n, inverse)
    else:
        l1 = (log_n + 1) // 2
        l2 = log_n - l1
        assert l1 <= MAX_DFT_LOG, "sizes beyond 2^22 unsupported"
        n1, n2 = 1 << l1, 1 << l2
        lead = x[0].shape[:-1]
        # x[j1 + n1*j2] -> M[j2, j1]
        hi = x[0].reshape(lead + (n2, n1))
        lo = x[1].reshape(lead + (n2, n1))
        # inner DFT over j2 (axis -2): put it last, transform, put back
        hi_t = jnp.swapaxes(hi, -1, -2)
        lo_t = jnp.swapaxes(lo, -1, -2)
        A = _dft_matmul((hi_t, lo_t), l2, inverse)   # (..., n1, n2) over k2
        A = (jnp.swapaxes(A[0], -1, -2), jnp.swapaxes(A[1], -1, -2))
        # twiddle: A[k2, j1] *= w^(j1*k2)
        th, tl = _twiddle_planes(l1, l2, inverse)
        A = gl.mul(A, (th, tl))
        # outer DFT over j1 (last axis)
        Yp = _dft_matmul(A, l1, inverse)             # (..., n2, k1)
        # out[k2 + n2*k1] = Y'[k2, k1]  ->  out.reshape(n1, n2)[k1, k2]
        hi = jnp.swapaxes(Yp[0], -1, -2).reshape(lead + (1 << log_n,))
        lo = jnp.swapaxes(Yp[1], -1, -2).reshape(lead + (1 << log_n,))
        out = (hi, lo)
    if inverse:
        n_inv = pow(1 << log_n, gl64.P - 2, gl64.P)
        out = gl.mul(out, (jnp.uint32(n_inv >> 32),
                           jnp.uint32(n_inv & 0xFFFFFFFF)))
    return out


# ---------------------------------------------------------------------------
# Large transforms (>= 2^BIG_LOG): the four-step stages as SEPARATE jits
# whose digit/twiddle tables are runtime ARGUMENTS (device_put once, cached).
# Inline-constant tables at these sizes put tens of MB into the compile
# payload, which the tunneled backend cannot reliably swallow; device_put is
# the robust direction and the host->device copy happens once per process.
# ---------------------------------------------------------------------------

BIG_LOG = 21


@functools.lru_cache(maxsize=None)
def _dft_table_dev(log_n: int, inverse: bool):
    digits_np, _ = _dft_tables(log_n, inverse)
    return jax.device_put(digits_np)


@functools.lru_cache(maxsize=None)
def _twiddle_planes_dev(l1: int, l2: int, inverse: bool):
    th, tl = _twiddle_planes(l1, l2, inverse)
    return jax.device_put(th), jax.device_put(tl)


@functools.partial(jax.jit, static_argnums=(5, 6))
def _big_stage_a(hi, lo, Wd, th, tl, l2: int, inverse: bool):
    """Inner DFT over j2 + twiddle: (..., n2, n1) -> (..., n2, n1)."""
    xt = (jnp.swapaxes(hi, -1, -2), jnp.swapaxes(lo, -1, -2))
    A = _dft_matmul(xt, l2, inverse, Wd=Wd)          # (..., n1, n2) over k2
    A = (jnp.swapaxes(A[0], -1, -2), jnp.swapaxes(A[1], -1, -2))
    return gl.mul(A, (th, tl))


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def _big_stage_b(Ah, Al, Wd, l1: int, log_n: int, inverse: bool):
    """Outer DFT over j1 + output interleave: -> (..., 2^log_n)."""
    lead = Ah.shape[:-2]
    Yp = _dft_matmul((Ah, Al), l1, inverse, Wd=Wd)   # (..., n2, k1)
    hi = jnp.swapaxes(Yp[0], -1, -2).reshape(lead + (1 << log_n,))
    lo = jnp.swapaxes(Yp[1], -1, -2).reshape(lead + (1 << log_n,))
    if inverse:
        n_inv = pow(1 << log_n, gl64.P - 2, gl64.P)
        hi, lo = gl.mul((hi, lo), (jnp.uint32(n_inv >> 32),
                                   jnp.uint32(n_inv & 0xFFFFFFFF)))
    return hi, lo


def _ntt_mm_big(x: gl.GL, log_n: int, inverse: bool) -> gl.GL:
    l1 = (log_n + 1) // 2
    l2 = log_n - l1
    assert l1 <= MAX_DFT_LOG
    n1, n2 = 1 << l1, 1 << l2
    lead = x[0].shape[:-1]
    hi = x[0].reshape(lead + (n2, n1))
    lo = x[1].reshape(lead + (n2, n1))
    th, tl = _twiddle_planes_dev(l1, l2, inverse)
    Ah, Al = _big_stage_a(hi, lo, _dft_table_dev(l2, inverse), th, tl,
                          l2, inverse)
    return _big_stage_b(Ah, Al, _dft_table_dev(l1, inverse), l1, log_n,
                        inverse)


_ntt_mm_jit = jax.jit(lambda x, log_n: _ntt_mm_core(x, log_n, False),
                      static_argnums=1)
_intt_mm_jit = jax.jit(lambda x, log_n: _ntt_mm_core(x, log_n, True),
                       static_argnums=1)


_warned_traced_big: set = set()


def _route(x, log_n: int, inverse: bool) -> gl.GL:
    if log_n >= BIG_LOG:
        if not isinstance(x[0], jax.core.Tracer):
            return _ntt_mm_big(x, log_n, inverse)
        # Under an enclosing jit the staged-table path is unavailable (its
        # device-resident tables would be baked into the enclosing trace
        # as inline constants — the exact payload the staging avoids), so
        # we fall back to the inline-constant kernel.  That regression
        # must not be silent (ADVICE r3): callers should hoist big
        # transforms out of their jit.
        import warnings
        key = (log_n, inverse)
        if key not in _warned_traced_big:
            _warned_traced_big.add(key)
            warnings.warn(
                f"ntt_mm: 2^{log_n} transform traced inside an enclosing "
                "jit falls back to the inline-constant path (tens-of-MB "
                "compile payload); call it un-jitted to use the staged "
                "runtime-table kernel", RuntimeWarning, stacklevel=3)
    return (_intt_mm_jit if inverse else _ntt_mm_jit)(x, log_n)


def ntt_mm(x: gl.GL, log_n: int) -> gl.GL:
    """Coefficients -> evaluations (natural order), matmul formulation."""
    return _route(x, log_n, False)


def intt_mm(x: gl.GL, log_n: int) -> gl.GL:
    """Evaluations -> coefficients (natural order), matmul formulation."""
    return _route(x, log_n, True)
