"""Ed25519 curve gadget: extended twisted Edwards points in-circuit.

Statement surface mirrors crypto/plonky2_ed25519/src/gadgets/curve.rs:35-330
(`curve_assert_valid`, `curve_add`, `curve_double`, scalar muls,
`point_decompress`) but the formulas are re-chosen for this framework:
extended homogeneous coordinates (X:Y:Z:T), a = -1, with the UNIFIED
add/double formulas (add-2008-hwcd-3 / dbl-2008-hwcd) — complete on the
prime-order subgroup, no per-operation field inversions (the reference's
affine formulas need two hinted inversions per add; curve.rs:192-222).

Windowed scalar multiplication uses 4-bit windows with RandomAccessGate
limb lookups (the same shape as curve_windowed_mul.rs:64-110's
`random_access_curve_points`), used for BOTH the variable-base h*A and the
fixed-base s*B products (the base-point table is built in-circuit from the
curve constant; a dedicated constant-table fixed-base path like
curve_fixed_base.rs:16 is a planned optimization).
"""
from __future__ import annotations

from dataclasses import dataclass

from ..plonk.builder import CircuitBuilder
from .nonnative import NonNativeOps, NonNativeTarget, ED25519_BASE_P

P = ED25519_BASE_P
D_ED25519 = 37095705934669439343138083508754565189542113879843219016388785533085940283555
K_2D = (2 * D_ED25519) % P

# Base point B (RFC 8032).
B_Y = 46316835694926478169428394003475163141307993866256225615783033603165251855960
B_X = 15112221349535400772501151409588531511454012693041857206046113283949847762202


@dataclass
class AffinePointTarget:
    x: NonNativeTarget
    y: NonNativeTarget


@dataclass
class ExtPointTarget:
    X: NonNativeTarget
    Y: NonNativeTarget
    Z: NonNativeTarget
    T: NonNativeTarget


# ---------------------------------------------------------------------------
# Native helpers (witness-side math on Python ints)
# ---------------------------------------------------------------------------

def affine_add_native(p1, p2):
    """(x, y) affine twisted Edwards addition over ints."""
    x1, y1 = p1
    x2, y2 = p2
    t = D_ED25519 * x1 * x2 % P * y1 * y2 % P
    x3 = (x1 * y2 + x2 * y1) * pow(1 + t, P - 2, P) % P
    y3 = (y1 * y2 + x1 * x2) * pow(1 - t + P, P - 2, P) % P
    return (x3, y3)


def affine_mul_native(p, k: int):
    acc = (0, 1)
    add = p
    while k:
        if k & 1:
            acc = affine_add_native(acc, add)
        add = affine_add_native(add, add)
        k >>= 1
    return acc


def decompress_native(comp: bytes):
    """32-byte compressed point -> (x, y); raises on invalid."""
    y = int.from_bytes(comp, "little") & ((1 << 255) - 1)
    sign = comp[31] >> 7
    y2 = y * y % P
    u = (y2 - 1) % P
    v = (D_ED25519 * y2 + 1) % P
    x = (u * pow(v, 3, P)) % P * pow(u * pow(v, 7, P) % P, (P - 5) // 8, P) % P
    vx2 = v * x * x % P
    if vx2 == (P - u) % P:
        x = x * pow(2, (P - 1) // 4, P) % P
    elif vx2 != u % P:
        raise ValueError("not a square: invalid point")
    if x == 0 and sign:
        raise ValueError("invalid sign for x=0")
    if x & 1 != sign:
        x = P - x
    return (x, y)


# ---------------------------------------------------------------------------
# Circuit ops
# ---------------------------------------------------------------------------

class CurveOps:
    def __init__(self, b: CircuitBuilder, nn: NonNativeOps):
        assert nn.modulus == P
        self.b = b
        self.nn = nn

    # -- construction ------------------------------------------------------
    def constant_affine(self, x: int, y: int) -> AffinePointTarget:
        return AffinePointTarget(self.nn.constant_nonnative(x),
                                 self.nn.constant_nonnative(y))

    def identity_ext(self) -> ExtPointTarget:
        nn = self.nn
        return ExtPointTarget(nn.constant_nonnative(0), nn.constant_nonnative(1),
                              nn.constant_nonnative(1), nn.constant_nonnative(0))

    def affine_to_ext(self, p: AffinePointTarget) -> ExtPointTarget:
        t = self.nn.mul_nonnative(p.x, p.y)
        return ExtPointTarget(p.x, p.y, self.nn.constant_nonnative(1), t)

    def curve_assert_valid(self, p: AffinePointTarget):
        """-x^2 + y^2 = 1 + d x^2 y^2 (curve.rs:117)."""
        nn = self.nn
        x2 = nn.mul_nonnative(p.x, p.x)
        y2 = nn.mul_nonnative(p.y, p.y)
        lhs = nn.sub_nonnative(y2, x2)
        d = nn.constant_nonnative(D_ED25519)
        rhs = nn.add_nonnative(nn.constant_nonnative(1),
                               nn.mul_nonnative(d, nn.mul_nonnative(x2, y2)))
        nn.connect_nonnative(lhs, rhs)

    # -- group law ---------------------------------------------------------
    def ext_add(self, p: ExtPointTarget, q: ExtPointTarget) -> ExtPointTarget:
        """add-2008-hwcd-3 (a=-1, k=2d): complete unified addition."""
        nn = self.nn
        a = nn.mul_nonnative(nn.sub_nonnative(p.Y, p.X),
                             nn.sub_nonnative(q.Y, q.X))
        b2 = nn.mul_nonnative(nn.add_nonnative(p.Y, p.X),
                              nn.add_nonnative(q.Y, q.X))
        k = nn.constant_nonnative(K_2D)
        c = nn.mul_nonnative(nn.mul_nonnative(p.T, k), q.T)
        zz = nn.mul_nonnative(p.Z, q.Z)
        d2 = nn.add_nonnative(zz, zz)
        e = nn.sub_nonnative(b2, a)
        f = nn.sub_nonnative(d2, c)
        g = nn.add_nonnative(d2, c)
        h = nn.add_nonnative(b2, a)
        return ExtPointTarget(
            X=nn.mul_nonnative(e, f), Y=nn.mul_nonnative(g, h),
            Z=nn.mul_nonnative(f, g), T=nn.mul_nonnative(e, h))

    def ext_double(self, p: ExtPointTarget) -> ExtPointTarget:
        """dbl-2008-hwcd (a=-1)."""
        nn = self.nn
        a = nn.mul_nonnative(p.X, p.X)
        b2 = nn.mul_nonnative(p.Y, p.Y)
        zz = nn.mul_nonnative(p.Z, p.Z)
        c = nn.add_nonnative(zz, zz)
        xy = nn.add_nonnative(p.X, p.Y)
        xy2 = nn.mul_nonnative(xy, xy)
        e = nn.sub_nonnative(xy2, nn.add_nonnative(a, b2))
        g = nn.sub_nonnative(b2, a)              # D + B with D = -A
        f = nn.sub_nonnative(g, c)
        h = nn.sub_nonnative(nn.neg_nonnative(a), b2)
        return ExtPointTarget(
            X=nn.mul_nonnative(e, f), Y=nn.mul_nonnative(g, h),
            Z=nn.mul_nonnative(f, g), T=nn.mul_nonnative(e, h))

    def ext_assert_equal(self, p: ExtPointTarget, q: ExtPointTarget):
        """Projective equality: X1 Z2 == X2 Z1, Y1 Z2 == Y2 Z1."""
        nn = self.nn
        nn.connect_nonnative(nn.mul_nonnative(p.X, q.Z),
                             nn.mul_nonnative(q.X, p.Z))
        nn.connect_nonnative(nn.mul_nonnative(p.Y, q.Z),
                             nn.mul_nonnative(q.Y, p.Z))

    # -- window lookup -----------------------------------------------------
    def _select_point(self, digit: int, table: list[ExtPointTarget]) -> ExtPointTarget:
        """table[digit] via per-limb RandomAccessGate lookups
        (curve_windowed_mul.rs:64 random_access_curve_points equivalent)."""
        b = self.b
        coords = []
        for attr in ("X", "Y", "Z", "T"):
            limbs = []
            nl = getattr(table[0], attr).value.num_limbs
            for li in range(nl):
                items = [getattr(pt, attr).value.limbs[li] for pt in table]
                limbs.append(b.random_access(digit, items))
            from .biguint import BigUintTarget
            coords.append(NonNativeTarget(BigUintTarget(limbs), self.nn.modulus))
        return ExtPointTarget(*coords)

    def precompute_window(self, p: ExtPointTarget) -> list[ExtPointTarget]:
        """[0, P, 2P, ..., 15P] in-circuit (curve_windowed_mul.rs:43)."""
        table = [self.identity_ext(), p]
        for i in range(2, 16):
            if i % 2 == 0:
                table.append(self.ext_double(table[i // 2]))
            else:
                table.append(self.ext_add(table[i - 1], p))
        return table

    def scalar_mul_windowed(self, p: ExtPointTarget,
                            scalar_bits_le: list) -> ExtPointTarget:
        """sum over 4-bit windows, MSB first (curve_windowed_mul.rs:110)."""
        b = self.b
        assert len(scalar_bits_le) % 4 == 0
        table = self.precompute_window(p)
        digits = []
        for w in range(len(scalar_bits_le) // 4):
            digits.append(b.le_sum(scalar_bits_le[4 * w: 4 * w + 4]))
        acc = self.identity_ext()
        for digit in reversed(digits):
            for _ in range(4):
                acc = self.ext_double(acc)
            acc = self.ext_add(acc, self._select_point(digit, table))
        return acc

    def fixed_base_mul(self, scalar_bits_le: list) -> ExtPointTarget:
        """s*B via the same windowed routine, table rooted at the constant
        base point (cf. curve_fixed_base.rs:16)."""
        base = self.affine_to_ext(self.constant_affine(B_X, B_Y))
        return self.scalar_mul_windowed(base, scalar_bits_le)

    # -- decompression -----------------------------------------------------
    def point_decompress(self, y_limbs_le: list, sign_bit: int) -> AffinePointTarget:
        """Recover (x, y) from the 255-bit y limbs + sign bit
        (curve.rs:309: hint the root natively, constrain in-circuit).

        y_limbs_le: 8 u32 targets (top bit already cleared by the caller).
        """
        from .biguint import BigUintTarget
        nn = self.nn
        b = self.b
        y_big = BigUintTarget(list(y_limbs_le))
        y = nn.reduce_biguint(y_big)

        deps = list(y.value.limbs) + [sign_bit]

        def x_fn(vals):
            yv = 0
            for i, v in enumerate(vals[:-1]):
                yv |= int(v) << (32 * i)
            sign = int(vals[-1])
            comp = (yv | (sign << 255)).to_bytes(32, "little")
            return decompress_native(comp)[0]

        x_big = nn._hint_biguint(nn.num_limbs, deps, x_fn)
        nn.assert_lt_modulus(x_big)
        x = NonNativeTarget(x_big, nn.modulus)
        pt = AffinePointTarget(x, y)
        self.curve_assert_valid(pt)       # forces x = ±correct root
        # parity of x must equal the sign bit
        x0_bits = b.split_le(x.value.limbs[0], 32)
        b.connect(x0_bits[0], sign_bit)
        return pt

    # -- witness -----------------------------------------------------------
    def set_affine_inputs(self, t: AffinePointTarget, x: int, y: int,
                          inputs: dict):
        self.nn.set_nonnative_inputs(t.x, x, inputs)
        self.nn.set_nonnative_inputs(t.y, y, inputs)
