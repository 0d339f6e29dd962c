"""Native ed25519 arithmetic (witness side).

Equivalent of crypto/plonky2_ed25519/src/curve/{curve_types,ed25519,
curve_adds,eddsa}.rs and src/field/* — the out-of-circuit math used for
witness generation and pre-proving signature validation (the reference
native-verifies each approval before proving it, signatures.rs:79).

Pure-Python big ints: exactness over speed; the batch witness-generation
kernels vectorize the hot limb arithmetic separately.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

# Base field p = 2^255 - 19; curve -x^2 + y^2 = 1 + d x^2 y^2
P = (1 << 255) - 19
D = (-121665 * pow(121666, P - 2, P)) % P
# scalar field order l = 2^252 + 27742317777372353535851937790883648493
L = (1 << 252) + 27742317777372353535851937790883648493

# base point
_BY = (4 * pow(5, P - 2, P)) % P


def _recover_x(y: int, sign: int) -> int | None:
    """x from y: x^2 = (y^2 - 1) / (d y^2 + 1)."""
    x2 = (y * y - 1) * pow(D * y * y + 1, P - 2, P) % P
    if x2 == 0:
        return None if sign else 0
    # p ≡ 5 (mod 8): candidate x = x2^((p+3)/8)
    x = pow(x2, (P + 3) // 8, P)
    if (x * x - x2) % P != 0:
        x = x * pow(2, (P - 1) // 4, P) % P
    if (x * x - x2) % P != 0:
        return None
    if x & 1 != sign:
        x = P - x
    return x


_BX = _recover_x(_BY, 0)
BASE = (_BX, _BY)


@dataclass(frozen=True)
class Point:
    """Extended homogeneous coordinates (X, Y, Z, T) with x=X/Z, y=Y/Z,
    T = XY/Z (curve_types.rs ProjectivePoint analogue)."""
    X: int
    Y: int
    Z: int
    T: int

    @staticmethod
    def identity() -> "Point":
        return Point(0, 1, 1, 0)

    @staticmethod
    def from_affine(x: int, y: int) -> "Point":
        return Point(x % P, y % P, 1, x * y % P)

    def to_affine(self) -> tuple[int, int]:
        zi = pow(self.Z, P - 2, P)
        return (self.X * zi % P, self.Y * zi % P)

    def add(self, o: "Point") -> "Point":
        # twisted Edwards extended addition (a = -1), complete
        A = (self.Y - self.X) * (o.Y - o.X) % P
        B = (self.Y + self.X) * (o.Y + o.X) % P
        C = 2 * self.T * o.T * D % P
        Dv = 2 * self.Z * o.Z % P
        E, F, G, H = B - A, Dv - C, Dv + C, B + A
        return Point(E * F % P, G * H % P, F * G % P, E * H % P)

    def double(self) -> "Point":
        return self.add(self)

    def scalar_mul(self, k: int) -> "Point":
        acc = Point.identity()
        add = self
        while k:
            if k & 1:
                acc = acc.add(add)
            add = add.double()
            k >>= 1
        return acc

    def equal(self, o: "Point") -> bool:
        return (self.X * o.Z - o.X * self.Z) % P == 0 and \
            (self.Y * o.Z - o.Y * self.Z) % P == 0

    def is_on_curve(self) -> bool:
        x, y = self.to_affine()
        return (-x * x + y * y - 1 - D * x * x % P * y * y) % P == 0


BASE_POINT = Point.from_affine(*BASE)


def point_decompress(data: bytes) -> Point | None:
    """curve/eddsa.rs:19: 32-byte LE y with sign bit in MSB."""
    if len(data) != 32:
        return None
    y = int.from_bytes(data, "little")
    sign = y >> 255
    y &= (1 << 255) - 1
    if y >= P:
        return None
    x = _recover_x(y, sign)
    if x is None:
        return None
    return Point.from_affine(x, y)


def point_compress(pt: Point) -> bytes:
    x, y = pt.to_affine()
    return (y | ((x & 1) << 255)).to_bytes(32, "little")


def keypair_from_seed(seed: bytes) -> tuple[bytes, bytes]:
    """RFC 8032 key generation; returns (seed, compressed public key).
    Test/fixture helper — the production path only ever verifies."""
    h = hashlib.sha512(seed).digest()
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    A = Point.from_affine(*BASE).scalar_mul(a)
    return seed, point_compress(A)


def sign_message(msg: bytes, seed: bytes) -> bytes:
    """RFC 8032 signing (test/fixture helper)."""
    h = hashlib.sha512(seed).digest()
    a = int.from_bytes(h[:32], "little")
    a &= (1 << 254) - 8
    a |= 1 << 254
    prefix = h[32:]
    A = point_compress(Point.from_affine(*BASE).scalar_mul(a))
    r = int.from_bytes(hashlib.sha512(prefix + msg).digest(), "little") % L
    R = point_compress(Point.from_affine(*BASE).scalar_mul(r))
    k = int.from_bytes(hashlib.sha512(R + A + msg).digest(), "little") % L
    s = (r + k * a) % L
    return R + s.to_bytes(32, "little")


def verify_message(msg: bytes, sig: bytes, pk: bytes) -> bool:
    """curve/eddsa.rs:33 native EdDSA verification.

    sig = R (32) || s (32); checks s*B == R + H(R||A||M)*A.
    """
    if len(sig) != 64 or len(pk) != 32:
        return False
    A = point_decompress(pk)
    if A is None:
        return False
    Rs = sig[:32]
    R = point_decompress(Rs)
    if R is None:
        return False
    s = int.from_bytes(sig[32:], "little")
    if s >= L:
        return False
    h = int.from_bytes(
        hashlib.sha512(Rs + pk + msg).digest(), "little") % L
    sB = BASE_POINT.scalar_mul(s)
    hA = A.scalar_mul(h)
    return sB.equal(R.add(hA))
