"""BN254 (alt_bn128) pairing-friendly curve: G1, G2, optimal-ate pairing.

The algebra under the L5 Groth16 stage (gnark-plonky2-verifier compiles the
wrapped proof into a BN254 R1CS; the Ethereum precompiles 0x06/0x07/0x08
verify it on-chain — contracts/foundry/verifier/src/Verifier.sol).  This is
a host-side reference implementation: the pairing is only ever evaluated a
handful of times per proof (4 pairings in the Groth16 check), so pure
Python ints are adequate; the MSM-heavy proving side lives in groth16.py.

Parameters are the public alt_bn128 constants (EIP-196/197).
"""
from __future__ import annotations

# base field
P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
# scalar field (group order) — equals poseidon_bn128.FR
R = 21888242871839275222246405745257275088548364400416034343698204186575808495617
# curve: y^2 = x^3 + 3;  twist: y^2 = x^3 + 3/(9+u)
B = 3
# BN parameter x (t = 6x^2+1, p = 36x^4+36x^3+24x^2+6x+1)
BN_X = 4965661367192848881

G1_GEN = (1, 2)
G2_GEN = (
    (10857046999023057135944570762232829481370756359578518086990519993285655852781,
     11559732032986387107991004021392285783925812861821192530917403151452391805634),
    (8495653923123431417604973247489272438418190587263600148770280649306958101930,
     4082367875863433681332203403145435568316851327593401208105741076214120093531),
)


# -- Fp2 = Fp[u]/(u^2+1), elements as (a, b) = a + b*u ------------------------

def f2_add(x, y):
    return ((x[0] + y[0]) % P, (x[1] + y[1]) % P)


def f2_sub(x, y):
    return ((x[0] - y[0]) % P, (x[1] - y[1]) % P)


def f2_mul(x, y):
    a = x[0] * y[0] % P
    b = x[1] * y[1] % P
    c = (x[0] + x[1]) * (y[0] + y[1]) % P
    return ((a - b) % P, (c - a - b) % P)


def f2_sqr(x):
    return f2_mul(x, x)


def f2_scalar(x, k):
    return (x[0] * k % P, x[1] * k % P)


def f2_neg(x):
    return ((-x[0]) % P, (-x[1]) % P)


def f2_conj(x):
    return (x[0], (-x[1]) % P)


def f2_inv(x):
    n = (x[0] * x[0] + x[1] * x[1]) % P
    ninv = pow(n, P - 2, P)
    return (x[0] * ninv % P, (-x[1] * ninv) % P)


F2_ONE = (1, 0)
F2_ZERO = (0, 0)
# twist curve coefficient b' = 3 / (9 + u)
B2 = f2_mul((B, 0), f2_inv((9, 1)))
# Frobenius twist constants: gamma = (9+u)^((p-1)/3), (9+u)^((p-1)/2)
FROB_X = f2_mul((0, 1), (0, 0))  # placeholder, computed below


def _pow_f2(x, e):
    r = F2_ONE
    while e:
        if e & 1:
            r = f2_mul(r, x)
        x = f2_sqr(x)
        e >>= 1
    return r


_XI = (9, 1)
FROB_COEFF_X = _pow_f2(_XI, (P - 1) // 3)
FROB_COEFF_Y = _pow_f2(_XI, (P - 1) // 2)


def g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = 3 * x1 * x1 * pow(2 * y1, P - 2, P) % P
    else:
        lam = (y2 - y1) * pow(x2 - x1, P - 2, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return (x3, (lam * (x1 - x3) - y1) % P)


def g1_neg(p1):
    return None if p1 is None else (p1[0], (-p1[1]) % P)


def g1_mul(p1, k):
    r = None
    k %= R
    while k:
        if k & 1:
            r = g1_add(r, p1)
        p1 = g1_add(p1, p1)
        k >>= 1
    return r


def g1_on_curve(p1) -> bool:
    if p1 is None:
        return True
    x, y = p1
    return (y * y - x * x * x - B) % P == 0


def g2_add(q1, q2):
    if q1 is None:
        return q2
    if q2 is None:
        return q1
    x1, y1 = q1
    x2, y2 = q2
    if x1 == x2:
        if f2_add(y1, y2) == F2_ZERO:
            return None
        lam = f2_mul(f2_scalar(f2_sqr(x1), 3),
                     f2_inv(f2_scalar(y1, 2)))
    else:
        lam = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    return (x3, f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1))


def g2_neg(q):
    return None if q is None else (q[0], f2_neg(q[1]))


def g2_mul(q, k):
    r = None
    k %= R
    while k:
        if k & 1:
            r = g2_add(r, q)
        q = g2_add(q, q)
        k >>= 1
    return r


def g2_on_curve(q) -> bool:
    if q is None:
        return True
    x, y = q
    return f2_sub(f2_sqr(y), f2_add(f2_mul(f2_sqr(x), x), B2)) == F2_ZERO



# -- Fp12 as Fp[w]/(w^12 - 18 w^6 + 82) ---------------------------------------
# Polynomial-basis representation: mul is 144 base muls + reduction — plenty
# for the 4 pairings of a Groth16 verification.  The sextic twist maps G2
# points into Fp12 coordinates so one generic affine line function serves
# the whole Miller loop.

F12_MOD = [82, 0, 0, 0, 0, 0, -18, 0, 0, 0, 0, 0]   # w^12 = 18w^6 - 82
F12_ONE = (1,) + (0,) * 11
F12_ZERO = (0,) * 12


def f12_add(x, y):
    return tuple((a + b) % P for a, b in zip(x, y))


def f12_sub(x, y):
    return tuple((a - b) % P for a, b in zip(x, y))


def f12_scalar(x, k):
    return tuple(a * k % P for a in x)


def f12_mul(x, y):
    t = [0] * 23
    for i, a in enumerate(x):
        if not a:
            continue
        for j, b in enumerate(y):
            t[i + j] += a * b
    for d in range(22, 11, -1):
        c = t[d]
        if c:
            t[d - 6] += 18 * c
            t[d - 12] -= 82 * c
    return tuple(v % P for v in t[:12])


def f12_sqr(x):
    return f12_mul(x, x)


def f12_inv(x):
    # extended Euclid over Fp[w] against the modulus polynomial
    lm, hm = [1] + [0] * 12, [0] * 13
    low = list(x) + [0]
    high = [v % P for v in F12_MOD] + [1]

    def deg(pp):
        for i in range(len(pp) - 1, -1, -1):
            if pp[i]:
                return i
        return 0

    def poly_rounded_div(a, b):
        dega, degb = deg(a), deg(b)
        temp = [v for v in a]
        o = [0] * len(a)
        binv = pow(b[degb], P - 2, P)
        for i in range(dega - degb, -1, -1):
            o[i] = (o[i] + temp[degb + i] * binv) % P
            for c in range(degb + 1):
                temp[c + i] = (temp[c + i] - o[i] * b[c]) % P
        return [v % P for v in o]

    while deg(low):
        r = poly_rounded_div(high, low)
        r += [0] * (13 - len(r))
        nm = [v for v in hm]
        new = [v for v in high]
        for i in range(13):
            for j in range(13 - i):
                nm[i + j] -= lm[i] * r[j]
                new[i + j] -= low[i] * r[j]
        nm = [v % P for v in nm]
        new = [v % P for v in new]
        lm, low, hm, high = nm, new, lm, low
    inv0 = pow(low[0], P - 2, P)
    return tuple(v * inv0 % P for v in lm[:12])


def f12_pow(x, e):
    r = F12_ONE
    while e:
        if e & 1:
            r = f12_mul(r, x)
        x = f12_sqr(x)
        e >>= 1
    return r


def f12_neg(x):
    return tuple((-a) % P for a in x)


# twist: G2 (Fp2 coords) -> E(Fp12); Fp2 element a+bu with u = w^6 - 9
def _twist(q):
    if q is None:
        return None
    (x0, x1), (y0, y1) = q
    nx = [0] * 12
    ny = [0] * 12
    nx[0] = (x0 - 9 * x1) % P
    nx[6] = x1
    ny[0] = (y0 - 9 * y1) % P
    ny[6] = y1
    # multiply by w^2 / w^3
    W2 = tuple(1 if i == 2 else 0 for i in range(12))
    W3 = tuple(1 if i == 3 else 0 for i in range(12))
    return (f12_mul(tuple(nx), W2), f12_mul(tuple(ny), W3))


def _cast_g1(p1):
    x, y = p1
    return ((x,) + (0,) * 11, (y,) + (0,) * 11)


def _f12_pt_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and y1 == y2:
        lam = f12_mul(f12_scalar(f12_sqr(x1), 3), f12_inv(f12_scalar(y1, 2)))
    elif x1 == x2:
        return None
    else:
        lam = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
    x3 = f12_sub(f12_sub(f12_sqr(lam), x1), x2)
    return (x3, f12_sub(f12_mul(lam, f12_sub(x1, x3)), y1))


def _linefunc(p1, p2, t):
    """Line through p1,p2 (E(Fp12) affine) evaluated at t."""
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 != x2:
        m = f12_mul(f12_sub(y2, y1), f12_inv(f12_sub(x2, x1)))
        return f12_sub(f12_mul(m, f12_sub(xt, x1)), f12_sub(yt, y1))
    if y1 == y2:
        m = f12_mul(f12_scalar(f12_sqr(x1), 3), f12_inv(f12_scalar(y1, 2)))
        return f12_sub(f12_mul(m, f12_sub(xt, x1)), f12_sub(yt, y1))
    return f12_sub(xt, x1)


ATE_LOOP_COUNT = 6 * BN_X + 2


def miller_loop(q, p1):
    """q: twisted G2 point in Fp12 coords; p1: G1 point in Fp12 coords."""
    if q is None or p1 is None:
        return F12_ONE
    r_pt = q
    f = F12_ONE
    for i in range(ATE_LOOP_COUNT.bit_length() - 2, -1, -1):
        f = f12_mul(f12_sqr(f), _linefunc(r_pt, r_pt, p1))
        r_pt = _f12_pt_add(r_pt, r_pt)
        if ATE_LOOP_COUNT & (1 << i):
            f = f12_mul(f, _linefunc(r_pt, q, p1))
            r_pt = _f12_pt_add(r_pt, q)
    q1 = (f12_pow(q[0], P), f12_pow(q[1], P))
    nq2 = (f12_pow(q1[0], P), f12_neg(f12_pow(q1[1], P)))
    f = f12_mul(f, _linefunc(r_pt, q1, p1))
    r_pt = _f12_pt_add(r_pt, q1)
    f = f12_mul(f, _linefunc(r_pt, nq2, p1))
    return f


FINAL_EXP = (P ** 12 - 1) // R


def final_exponentiation(f):
    return f12_pow(f, FINAL_EXP)


def pairing(q, p1):
    """e(P, Q): P in G1 (affine Fp pair), Q in G2 (affine Fp2 pairs)."""
    assert g1_on_curve(p1) and g2_on_curve(q)
    if q is None or p1 is None:
        return F12_ONE
    return final_exponentiation(miller_loop(_twist(q), _cast_g1(p1)))


def pairing_product_is_one(pairs) -> bool:
    """prod e(P_i, Q_i) == 1 — the multi-pairing form of the on-chain
    precompile 0x08 (one shared final exponentiation)."""
    f = F12_ONE
    for p1, q in pairs:
        if p1 is None or q is None:
            continue
        f = f12_mul(f, miller_loop(_twist(q), _cast_g1(p1)))
    return final_exponentiation(f) == F12_ONE
