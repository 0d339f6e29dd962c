"""Device-side Goldilocks field arithmetic for TPU: 2 x uint32 structure-of-arrays.

TPU vector lanes are 32-bit; there is no native 64-bit integer path worth
using (XLA emulates s64 poorly and Pallas/Mosaic has none).  A Goldilocks
element therefore lives as a pair of uint32 planes ``(hi, lo)`` with value
``hi * 2^32 + lo``, kept in the *non-canonical* range [0, 2^64) between
operations and canonicalized on demand — the same discipline as the
reference's CPU field (see SURVEY.md §2.1; reference semantics mirrored by
/root/reference/gnark-plonky2-verifier/goldilocks/base.go, re-derived here
for 32-bit lanes rather than translated).

Multiplication decomposes into 16-bit half-products so every intermediate
fits a uint32 lane; reduction uses 2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p).

All functions are shape-polymorphic and jit/vmap/shard_map-friendly: no
data-dependent control flow, everything `jnp.where`-predicated.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .gl64 import P, EPSILON

U32 = jnp.uint32
MASK16 = jnp.uint32(0xFFFF)
P_HI = jnp.uint32(0xFFFFFFFF)
P_LO = jnp.uint32(0x00000001)
EPS = jnp.uint32(0xFFFFFFFF)  # 2^64 - p = 2^32 - 1

# A Goldilocks array is the pair (hi, lo); a tuple keeps it a pytree.
GL = tuple  # (hi: u32[...], lo: u32[...])


def from_u64_np(x):
    """numpy uint64 array -> (hi, lo) device pair."""
    import numpy as np

    x = np.asarray(x, dtype=np.uint64)
    return (
        jnp.asarray((x >> np.uint64(32)).astype(np.uint32)),
        jnp.asarray((x & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
    )


def to_u64_np(a: GL):
    """(hi, lo) device pair -> numpy uint64 array (canonical)."""
    import numpy as np

    hi, lo = canonicalize(a)
    hi = np.asarray(jax.device_get(hi)).astype(np.uint64)
    lo = np.asarray(jax.device_get(lo)).astype(np.uint64)
    return (hi << np.uint64(32)) | lo


def zeros(shape, ) -> GL:
    z = jnp.zeros(shape, U32)
    return (z, z)


def ones(shape) -> GL:
    return (jnp.zeros(shape, U32), jnp.ones(shape, U32))


def full(shape, value: int) -> GL:
    value = int(value) % P
    return (
        jnp.full(shape, (value >> 32) & 0xFFFFFFFF, U32),
        jnp.full(shape, value & 0xFFFFFFFF, U32),
    )


def _addc(a, b):
    """uint32 add with carry-out: returns (sum, carry in {0,1})."""
    s = a + b
    return s, (s < a).astype(U32)


def _subb(a, b):
    """uint32 subtract with borrow-out: returns (diff, borrow in {0,1})."""
    d = a - b
    return d, (a < b).astype(U32)


def add64(a: GL, b: GL):
    """Plain 64-bit add, returns ((hi, lo), carry_out)."""
    lo, c = _addc(a[1], b[1])
    hi = a[0] + b[0] + c
    # carry out of hi: overflow if a0 + b0 + c wraps
    h1, c1 = _addc(a[0], b[0])
    h2, c2 = _addc(h1, c)
    return (h2, lo), c1 | c2


def sub64(a: GL, b: GL):
    """Plain 64-bit subtract, returns ((hi, lo), borrow_out)."""
    lo, brw = _subb(a[1], b[1])
    h1, b1 = _subb(a[0], b[0])
    h2, b2 = _subb(h1, brw)
    return (h2, lo), b1 | b2


def add(a: GL, b: GL) -> GL:
    """Field add; inputs in [0, 2^64), output in [0, 2^64) ≡-correct mod p.

    true sum = s + carry * 2^64 ≡ s + carry * EPSILON (mod p).  The EPSILON
    correction itself cannot re-wrap into an incorrect residue because when
    carry=1 we had s ≤ 2^64 - 2; s + EPSILON may wrap at most once more and
    wrapping adds another EPSILON, handled below.
    """
    s, c = add64(a, b)
    # add c * EPSILON
    lo, c2 = _addc(s[1], c * EPS)
    hi, c3 = _addc(s[0], c2)
    # if that wrapped again (c3), add EPSILON once more (cannot wrap a third time)
    lo2, c4 = _addc(lo, c3 * EPS)
    hi2 = hi + c4
    return (hi2, lo2)


def sub(a: GL, b: GL) -> GL:
    d, brw = sub64(a, b)
    # true diff = d - borrow * 2^64 ≡ d - borrow * EPSILON (mod p)
    lo, b2 = _subb(d[1], brw * EPS)
    hi, b3 = _subb(d[0], b2)
    lo2, b4 = _subb(lo, b3 * EPS)
    hi2 = hi - b4
    return (hi2, lo2)


def neg(a: GL) -> GL:
    hi, lo = canonicalize(a)
    is_zero = (hi | lo) == 0
    nhi, _ = _subb(P_HI, hi)
    d_lo, brw = _subb(P_LO, lo)
    n_hi = nhi - brw
    return (jnp.where(is_zero, 0, n_hi), jnp.where(is_zero, 0, d_lo))


def canonicalize(a: GL) -> GL:
    """Map [0, 2^64) to [0, p)."""
    hi, lo = a
    ge_p = (hi == P_HI) & (lo >= P_LO)
    lo2, brw = _subb(lo, P_LO)
    hi2 = hi - P_HI - brw
    return (jnp.where(ge_p, hi2, hi), jnp.where(ge_p, lo2, lo))


def eq(a: GL, b: GL):
    ah, al = canonicalize(a)
    bh, bl = canonicalize(b)
    return (ah == bh) & (al == bl)


def select(pred, a: GL, b: GL) -> GL:
    """where(pred, a, b) elementwise; pred is a bool array."""
    return (jnp.where(pred, a[0], b[0]), jnp.where(pred, a[1], b[1]))


def mul32_wide(a, b):
    """uint32 x uint32 -> (hi, lo) uint32 full product via 16-bit halves."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    m00 = a0 * b0
    m01 = a0 * b1
    m10 = a1 * b0
    m11 = a1 * b1
    t = (m00 >> 16) + (m01 & MASK16) + (m10 & MASK16)  # ≤ ~3*2^16, fits
    lo = (m00 & MASK16) | (t << 16)
    hi = m11 + (m01 >> 16) + (m10 >> 16) + (t >> 16)  # ≤ 2^32 - 2, fits
    return hi, lo


def mul_wide(a: GL, b: GL):
    """64x64 -> 128-bit product as four uint32 words (w3, w2, w1, w0)."""
    ah, al = a
    bh, bl = b
    h00, l00 = mul32_wide(al, bl)  # 2^0
    h01, l01 = mul32_wide(al, bh)  # 2^32
    h10, l10 = mul32_wide(ah, bl)  # 2^32
    h11, l11 = mul32_wide(ah, bh)  # 2^64
    w0 = l00
    # w1 = h00 + l01 + l10 (with carries into w2)
    s1, c1 = _addc(h00, l01)
    w1, c2 = _addc(s1, l10)
    carry1 = c1 + c2
    # w2 = l11 + h01 + h10 + carry1 (with carries into w3)
    s2, c3 = _addc(l11, h01)
    s3, c4 = _addc(s2, h10)
    w2, c5 = _addc(s3, carry1)
    carry2 = c3 + c4 + c5
    w3 = h11 + carry2
    return w3, w2, w1, w0


def reduce128(w3, w2, w1, w0) -> GL:
    """Reduce w3·2^96 + w2·2^64 + w1·2^32 + w0 mod p.

    2^64 ≡ 2^32 - 1 and 2^96 ≡ -1 (mod p):
      x ≡ (w1·2^32 + w0) - w3 + w2·(2^32 - 1)
    Mirrors the branch-free u64 algorithm, done on 32-bit lanes.
    """
    # t0 = lo64 - w3  (borrow → subtract EPSILON once more)
    lo_l, brw = _subb(w0, w3)
    lo_h, brw2 = _subb(w1, brw)
    # on borrow2: t0 -= EPSILON
    l2, b3 = _subb(lo_l, brw2 * EPS)
    h2 = lo_h - b3
    # t1 = w2 * EPSILON = (w2 << 32) - w2 : as 64-bit (w2 - borrow_adj, -w2)?
    # compute t1 = w2·2^32 - w2 directly: lo = 0 - w2 (borrow if w2 != 0), hi = w2 - borrow
    t1_lo = jnp.zeros_like(w2) - w2
    t1_brw = (w2 != 0).astype(U32)
    t1_hi = w2 - t1_brw
    # t2 = t0 + t1 (carry → add EPSILON)
    s_lo, c1 = _addc(l2, t1_lo)
    s_hi_a, c2 = _addc(h2, t1_hi)
    s_hi, c3 = _addc(s_hi_a, c1)
    carry = c2 | c3
    f_lo, c4 = _addc(s_lo, carry * EPS)
    f_hi = s_hi + c4
    return (f_hi, f_lo)


def mul(a: GL, b: GL) -> GL:
    return reduce128(*mul_wide(a, b))


def square(a: GL) -> GL:
    return mul(a, a)


def mul_small(a: GL, c: int):
    """Multiply by a small constant c < 2^16; returns 96-bit (w2, w1, w0).

    Used by the Poseidon MDS layer where all matrix entries are < 64.
    """
    cc = jnp.uint32(c)
    ah, al = a
    h_lo, l_lo = mul32_wide(al, cc)  # fits since c < 2^16: h_lo < 2^16
    h_hi, l_hi = mul32_wide(ah, cc)
    w0 = l_lo
    w1, c1 = _addc(h_lo, l_hi)
    w2 = h_hi + c1
    return w2, w1, w0


def pow_const(a: GL, e: int) -> GL:
    result = ones(a[0].shape)
    base = a
    first = True
    while e > 0:
        if e & 1:
            result = base if first else mul(result, base)
            first = False
        base = square(base)
        e >>= 1
    return result


def inv(a: GL) -> GL:
    """Fermat inversion on device (63 squarings); use sparingly."""
    return pow_const(a, P - 2)


# ---------------------------------------------------------------------------
# Quadratic extension F_p[X]/(X^2 - 7): element = (a0: GL, a1: GL).
# ---------------------------------------------------------------------------

GL2 = tuple  # ((hi0, lo0), (hi1, lo1))

_W_SMALL = 7


def ext_add(a: GL2, b: GL2) -> GL2:
    return (add(a[0], b[0]), add(a[1], b[1]))


def ext_sub(a: GL2, b: GL2) -> GL2:
    return (sub(a[0], b[0]), sub(a[1], b[1]))


def ext_mul(a: GL2, b: GL2) -> GL2:
    a0, a1 = a
    b0, b1 = b
    t00 = mul(a0, b0)
    t11 = mul(a1, b1)
    # 7 * t11 via mul_small + reduce96
    w2, w1, w0 = mul_small(t11, _W_SMALL)
    t11_7 = reduce128(jnp.zeros_like(w2), w2, w1, w0)
    c0 = add(t00, t11_7)
    c1 = add(mul(a0, b1), mul(a1, b0))
    return (c0, c1)


def ext_scalar_mul(s: GL, a: GL2) -> GL2:
    return (mul(s, a[0]), mul(s, a[1]))


def ext_neg(a: GL2) -> GL2:
    return (neg(a[0]), neg(a[1]))


def ext_select(pred, a: GL2, b: GL2) -> GL2:
    return (select(pred, a[0], b[0]), select(pred, a[1], b[1]))


def ext_zeros(shape) -> GL2:
    return (zeros(shape), zeros(shape))


def ext_from_base(a: GL) -> GL2:
    return (a, zeros(a[0].shape))
