"""BN254 proof compression: 256-byte Groth16 proofs -> 128 bytes.

The deployed verifier accepts proofs in two formats: uncompressed
uint256[8] via verifyProof and compressed uint256[4] via
verifyCompressedProof, with compressProof as an on-chain view helper
(contracts/foundry/verifier/src/Verifier.sol:102,201-360 — the
2π.com/23/bn254-compression encoding).  This module is the host-side
implementation: G1 points compress to x with a sign bit, G2 points to
(x0 with sign+hint bits, x1), and decompression recovers y by square
roots in Fp / Fp2 with full on-curve validation.

Encodings (Verifier.sol:197-360 semantics, bit-exact):
  * G1: c = (x << 1) | sign;  infinity = 0.  sqrt exists iff on curve.
  * G2: c0 = (x0 << 2) | (hint << 1) | sign, c1 = x1; infinity = (0,0).
    The hint bit disambiguates the two candidate Fp2 square roots via
    the norm trick: d = sqrt(a0^2 + a1^2), y0^2 = (a0 + d)/2 unless the
    hint flips it to (a0 - d)/2.
  * proof4 = [c(A), c0(B), c1(B), c(C)] for proof8 =
    [A.x, A.y, B.x_im, B.x_re, B.y_im, B.y_re, C.x, C.y]
    (gnark EIP-197 wire ordering, wrap/groth16.py:17-20).
"""
from __future__ import annotations

from . import bn254 as C

P = C.P

# G2 curve constant b2 = 3 / (9 + i) = 27/82 - (3/82) i  (Verifier.sol
# FRACTION_27_82_FP / FRACTION_3_82_FP, computed instead of pinned).
_INV82 = pow(82, P - 2, P)
FRACTION_27_82_FP = 27 * _INV82 % P
FRACTION_3_82_FP = 3 * _INV82 % P
_EXP_SQRT = (P + 1) // 4          # P ≡ 3 (mod 4)
_EXP_LEGENDRE = (P - 1) // 2
_INV2 = pow(2, P - 2, P)


class CompressionError(ValueError):
    """ProofInvalid() analogue: malformed or off-curve point."""


def _sqrt_fp(a: int) -> int:
    """Square root in Fp; raises if a is not a QR (Verifier.sol:141)."""
    a %= P
    x = pow(a, _EXP_SQRT, P)
    if x * x % P != a:
        raise CompressionError("not a square in Fp")
    return x


def _is_square_fp(a: int) -> bool:
    return pow(a % P, _EXP_LEGENDRE, P) in (0, 1)


def _sqrt_fp2(a0: int, a1: int, hint: bool) -> tuple[int, int]:
    """Square root of a0 + a1*i in Fp[i]/(i^2+1) (Verifier.sol:160-183).

    d = sqrt(a0^2 + a1^2) — negated when the hint bit says the other
    root branch was used at compression time — then
    x0 = sqrt((a0 + d)/2), x1 = a1 / (2 x0)."""
    d = _sqrt_fp((a0 * a0 + a1 * a1) % P)
    if hint:
        d = P - d
    x0 = _sqrt_fp((a0 + d) * _INV2 % P)
    x1 = a1 * pow(2 * x0 % P, P - 2, P) % P if x0 else 0
    if (x0 * x0 - x1 * x1 - a0) % P != 0 or (2 * x0 * x1 - a1) % P != 0:
        raise CompressionError("no Fp2 square root")
    return x0, x1


def compress_g1(x: int, y: int) -> int:
    """Verifier.sol:201 — (x << 1) | sign; infinity -> 0."""
    if not (0 <= x < P and 0 <= y < P):
        raise CompressionError("G1 coordinate not in field")
    if x == 0 and y == 0:
        return 0
    y_pos = _sqrt_fp((x * x % P * x + 3) % P)
    if y == y_pos:
        return x << 1
    if y == P - y_pos:
        return (x << 1) | 1
    raise CompressionError("G1 point not on curve")


def decompress_g1(c: int) -> tuple[int, int]:
    """Verifier.sol:229."""
    if c == 0:
        return 0, 0
    negate = bool(c & 1)
    x = c >> 1
    if x >= P:
        raise CompressionError("G1 x not in field")
    y = _sqrt_fp((x * x % P * x + 3) % P)
    return x, (P - y) if negate else y


def _g2_rhs(x0: int, x1: int) -> tuple[int, int]:
    """y^2 = x^3 + b2 over Fp2, components of the right-hand side."""
    n3ab = x0 * x1 % P * (P - 3) % P
    a_3 = x0 * x0 % P * x0 % P
    b_3 = x1 * x1 % P * x1 % P
    y0 = (FRACTION_27_82_FP + a_3 + n3ab * x1) % P
    y1 = (P - (FRACTION_3_82_FP + b_3 + n3ab * x0) % P) % P
    return y0, y1


def compress_g2(x0: int, x1: int, y0: int, y1: int) -> tuple[int, int]:
    """Verifier.sol:264 — c0 = (x0 << 2) | (hint << 1) | sign, c1 = x1."""
    if not all(0 <= v < P for v in (x0, x1, y0, y1)):
        raise CompressionError("G2 coordinate not in field")
    if x0 == x1 == y0 == y1 == 0:
        return 0, 0
    y0_pos, y1_pos = _g2_rhs(x0, x1)
    d = _sqrt_fp((y0_pos * y0_pos + y1_pos * y1_pos) % P)
    hint = not _is_square_fp((y0_pos + d) * _INV2 % P)
    y0_pos, y1_pos = _sqrt_fp2(y0_pos, y1_pos, hint)
    if (y0, y1) == (y0_pos, y1_pos):
        return (x0 << 2) | (2 if hint else 0), x1
    if (y0, y1) == ((P - y0_pos) % P, (P - y1_pos) % P):
        return (x0 << 2) | (2 if hint else 0) | 1, x1
    raise CompressionError("G2 point not on curve")


def decompress_g2(c0: int, c1: int) -> tuple[int, int, int, int]:
    """Verifier.sol:323."""
    if c0 == 0 and c1 == 0:
        return 0, 0, 0, 0
    negate = bool(c0 & 1)
    hint = bool(c0 & 2)
    x0 = c0 >> 2
    x1 = c1
    if x0 >= P or x1 >= P:
        raise CompressionError("G2 x not in field")
    y0, y1 = _sqrt_fp2(*_g2_rhs(x0, x1), hint)
    if negate:
        y0, y1 = (P - y0) % P, (P - y1) % P
    return x0, x1, y0, y1


def compress_proof(proof8: list) -> list:
    """Verifier.sol:423 compressProof: uint256[8] -> uint256[4]."""
    if len(proof8) != 8:
        raise CompressionError("proof must be 8 words")
    ax, ay, bxi, bxr, byi, byr, cx, cy = [int(v) for v in proof8]
    ca = compress_g1(ax, ay)
    cb0, cb1 = compress_g2(bxr, bxi, byr, byi)
    cc = compress_g1(cx, cy)
    return [ca, cb0, cb1, cc]


def decompress_proof(proof4: list) -> list:
    """verifyCompressedProof's decompression half: uint256[4] ->
    the uint256[8] wire proof."""
    if len(proof4) != 4:
        raise CompressionError("compressed proof must be 4 words")
    ca, cb0, cb1, cc = [int(v) for v in proof4]
    ax, ay = decompress_g1(ca)
    bxr, bxi, byr, byi = decompress_g2(cb0, cb1)
    cx, cy = decompress_g1(cc)
    return [ax, ay, bxi, bxr, byi, byr, cx, cy]
