"""Radix-2 NTT / LDE over Goldilocks on TPU.

The reference's prover spends its hot loop in the plonky2 fork's NTT/LDE
(`CircuitData::prove` → FFT of wire polynomials; SURVEY.md §2.1, §3.1).  This
is the TPU-native equivalent: a decimation-in-time radix-2 butterfly network
over (hi, lo) uint32 planes, stages unrolled at trace time (static shapes),
twiddles precomputed host-side per size and closed over as constants.

Batched over leading axes: a whole polynomial batch (e.g. all 135 wire
columns) transforms in one jit call — the butterflies vectorize over the
batch axis, filling the 8x128 VPU lanes even at small stage strides.

Ordering convention: `ntt` maps coefficients (natural order) to evaluations
``X[i] = poly(g^i)`` (natural order), matching plonky2's `fft`.  Bit-reversal
permutations are explicit gathers with precomputed index vectors.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..field import gl64
from ..field import gl2x32 as gl


@functools.lru_cache(maxsize=None)
def _bit_rev_indices(log_n: int) -> np.ndarray:
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


@functools.lru_cache(maxsize=None)
def _twiddles(log_n: int, inverse: bool) -> tuple:
    """Per-stage twiddle tables (hi, lo) numpy arrays, stage s has 2^(s-1)."""
    n = 1 << log_n
    g = gl64.primitive_root_of_unity(log_n)
    if inverse:
        g = pow(g, gl64.P - 2, gl64.P)
    out = []
    for s in range(1, log_n + 1):
        m = 1 << s
        w_m = pow(g, n // m, gl64.P)
        tw = gl64.powers(w_m, m // 2)
        out.append(((tw >> np.uint64(32)).astype(np.uint32), (tw & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    return tuple(out)


def _ntt_core(x, log_n: int, inverse: bool):
    """x: (hi, lo) with last axis n = 2^log_n. Returns transformed (hi, lo)."""
    n = 1 << log_n
    hi, lo = x
    # NB: constant tables stay NUMPY — a jnp.asarray here would create a
    # committed device array that jit lowering must pull BACK through the
    # tunnel to embed as an MLIR constant (device->host is the slow/fragile
    # direction); numpy constants embed directly.
    rev = _bit_rev_indices(log_n)
    hi = jnp.take(hi, rev, axis=-1)
    lo = jnp.take(lo, rev, axis=-1)
    lead = hi.shape[:-1]
    tws = _twiddles(log_n, inverse)
    for s in range(1, log_n + 1):
        m = 1 << s
        half = m // 2
        tw_hi, tw_lo = tws[s - 1]
        hi = hi.reshape(lead + (n // m, m))
        lo = lo.reshape(lead + (n // m, m))
        u = (hi[..., :half], lo[..., :half])
        v = (hi[..., half:], lo[..., half:])
        vw = gl.mul(v, (tw_hi, tw_lo))
        a = gl.add(u, vw)
        b = gl.sub(u, vw)
        hi = jnp.concatenate([a[0], b[0]], axis=-1)
        lo = jnp.concatenate([a[1], b[1]], axis=-1)
    hi = hi.reshape(lead + (n,))
    lo = lo.reshape(lead + (n,))
    if inverse:
        n_inv = pow(n, gl64.P - 2, gl64.P)
        ninv = gl.full((), n_inv)
        hi, lo = gl.mul((hi, lo), (ninv[0], ninv[1]))
    return hi, lo


@functools.partial(jax.jit, static_argnums=1)
def ntt_radix2(x, log_n: int):
    """Radix-2 butterfly forward NTT (kept for cross-checking)."""
    return _ntt_core(x, log_n, inverse=False)


@functools.partial(jax.jit, static_argnums=1)
def intt_radix2(x, log_n: int):
    """Radix-2 butterfly inverse NTT (kept for cross-checking)."""
    return _ntt_core(x, log_n, inverse=True)


def ntt(x, log_n: int):
    """Coefficients -> evaluations on the order-2^log_n subgroup.

    Routed through the MXU matmul formulation (ntt_mm.py) — the radix-2
    butterfly path remains available as `ntt_radix2` for cross-checks.
    """
    from . import ntt_mm
    return ntt_mm.ntt_mm(x, log_n)


def intt(x, log_n: int):
    """Evaluations -> coefficients (matmul formulation)."""
    from . import ntt_mm
    return ntt_mm.intt_mm(x, log_n)


@functools.lru_cache(maxsize=None)
def _coset_powers(log_n: int, shift: int) -> tuple:
    n = 1 << log_n
    pw = gl64.powers(shift, n)
    return ((pw >> np.uint64(32)).astype(np.uint32), (pw & np.uint64(0xFFFFFFFF)).astype(np.uint32))


@functools.partial(jax.jit, static_argnums=(1, 2))
def _coset_ntt_jit(coeffs, log_n: int, shift: int):
    ph, plo = _coset_powers(log_n, shift)
    scaled = gl.mul(coeffs, (ph, plo))
    return ntt(scaled, log_n)


def coset_ntt(coeffs, log_n: int, shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Evaluate poly on the coset shift * <g>: scale coeff i by shift^i, then NTT.

    Large transforms run EAGERLY so ntt_mm routes them to the staged
    runtime-table kernels — a jitted wrapper would trace them into the
    inline-constant path, whose compiled program needs tens of GB of HBM
    (observed: a 2^21 header-commit compile demanding 55 GB; the exact
    regression ADVICE r3 #1 warned about)."""
    from . import ntt_mm
    if log_n >= ntt_mm.BIG_LOG and not isinstance(coeffs[0],
                                                  jax.core.Tracer):
        ph, plo = _coset_powers(log_n, shift)
        scaled = gl.mul(coeffs, (ph, plo))
        return ntt(scaled, log_n)
    return _coset_ntt_jit(coeffs, log_n, shift)


@functools.partial(jax.jit, static_argnums=(1, 2))
def _coset_intt_jit(values, log_n: int, shift: int):
    coeffs = intt(values, log_n)
    inv_shift = pow(shift, gl64.P - 2, gl64.P)
    ph, plo = _coset_powers(log_n, inv_shift)
    return gl.mul(coeffs, (ph, plo))


def coset_intt(values, log_n: int, shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Inverse of coset_ntt (same big-transform routing)."""
    from . import ntt_mm
    if log_n >= ntt_mm.BIG_LOG and not isinstance(values[0],
                                                  jax.core.Tracer):
        coeffs = intt(values, log_n)
        inv_shift = pow(shift, gl64.P - 2, gl64.P)
        ph, plo = _coset_powers(log_n, inv_shift)
        return gl.mul(coeffs, (ph, plo))
    return _coset_intt_jit(values, log_n, shift)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def lde(values, log_n: int, rate_bits: int,
        shift: int = gl64.MULTIPLICATIVE_GROUP_GENERATOR):
    """Low-degree extension: values on <g_n> -> values on shift*<g_{n*2^rate}>.

    Mirrors plonky2's `PolynomialBatch::lde_values` (SURVEY.md §2.1): iNTT to
    coefficients, zero-pad by 2^rate_bits, coset-NTT with shift 7.
    """
    coeffs = intt(values, log_n)
    n = 1 << log_n
    pad = n * ((1 << rate_bits) - 1)
    lead = coeffs[0].shape[:-1]
    zhi = jnp.zeros(lead + (pad,), jnp.uint32)
    chi = jnp.concatenate([coeffs[0], zhi], axis=-1)
    clo = jnp.concatenate([coeffs[1], zhi], axis=-1)
    return coset_ntt((chi, clo), log_n + rate_bits, shift)


# Back-compat aliases; the public functions are already jitted.
ntt_jit = ntt
intt_jit = intt
lde_jit = lde
