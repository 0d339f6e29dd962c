"""EdDSA (ed25519) verification circuit.

The statement of crypto/plonky2_ed25519/src/gadgets/eddsa.rs:34-84:
    h  = SHA-512(R || A || M)  reduced mod the group order l
    checks  s*B == R + h*A   with R, A decompressed in-circuit, s < l.

Layout differences from the reference (documented deviations, same
statement): message/pk enter the transcript as 64-bit sha words rather than
per-bit targets (public inputs = padded message words + pk words instead of
bit targets), and the curve work runs in extended coordinates (see
curve.py).  fill_eddsa mirrors fill_ecdsa_targets (eddsa.rs:87).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from .u32 import U32Ops
from .biguint import BigUintOps, BigUintTarget
from .nonnative import (NonNativeOps, NonNativeTarget,
                        ED25519_BASE_P, ED25519_SCALAR_L)
from .sha512 import Sha512Ops, Sha512Targets, sha512_pad
from .curve import CurveOps


@dataclass
class EddsaTargets:
    sha: Sha512Targets           # words: R(0..3) | A(4..7) | M + padding
    s_limbs: list                # 8 u32 targets, little-endian limbs of s
    msg_len: int


class EddsaOps:
    def __init__(self, b: CircuitBuilder):
        self.b = b
        self.u32 = U32Ops(b)
        self.big = BigUintOps(b, self.u32)
        self.nn_base = NonNativeOps(b, ED25519_BASE_P, self.big)
        self.nn_scalar = NonNativeOps(b, ED25519_SCALAR_L, self.big)
        self.curve = CurveOps(b, self.nn_base)

    # -- bit utilities -----------------------------------------------------
    def _byteswap32(self, x: int, drop_top_bit: bool = False):
        """Returns (swapped_target, bits_le_of_x).  Reassembles the u32 with
        byte order reversed; optionally clears bit 7 of the output's top
        byte (= bit 7 of input byte 0 ... for compressed-point sign
        handling the caller picks the right bit from bits_le)."""
        b = self.b
        bits = b.split_le(x, 32)
        out_bits = [None] * 32
        for k in range(4):            # input byte k -> output byte 3-k
            for j in range(8):
                out_bits[8 * (3 - k) + j] = bits[8 * k + j]
        if drop_top_bit:
            out_bits[31] = b.zero()
        return b.le_sum(out_bits), bits

    def _words_to_le_limbs(self, words, n_bytes_offset=0, drop_sign=False):
        """sha 64-bit words (BE semantics) -> little-endian u32 limbs of the
        byte string, via byteswap of each 32-bit half.

        words: list of W64 (lo, hi); limb 2w = swap(hi_w), limb 2w+1 =
        swap(lo_w).  If drop_sign, clears the top bit of the LAST limb and
        returns (limbs, sign_bit)."""
        limbs = []
        sign_bit = None
        total = 2 * len(words)
        for w, (lo, hi) in enumerate(words):
            for half_idx, half in ((2 * w, hi), (2 * w + 1, lo)):
                is_last = half_idx == total - 1
                if drop_sign and is_last:
                    swapped, bits = self._byteswap32(half, drop_top_bit=True)
                    sign_bit = bits[7]   # bit 7 of the input's byte 0? no:
                    # output top byte = input byte 0 (BE MSB)... for the LAST
                    # half (bytes ..-4..-1 of the string) the string's final
                    # byte is the input's LSB byte, whose bit 7 is bits[7].
                    limbs.append(swapped)
                else:
                    swapped, _ = self._byteswap32(half)
                    limbs.append(swapped)
        return (limbs, sign_bit) if drop_sign else limbs

    # -- circuit -----------------------------------------------------------
    def ed25519_circuit(self, msg_len: int) -> EddsaTargets:
        """Build the verification circuit for a message of msg_len bytes."""
        b = self.b
        sha = Sha512Ops(b, self.u32)
        total_len = 64 + msg_len
        blocks = (total_len * 8 + 1 + 128 + 1023) // 1024
        words = sha.add_virtual_message(blocks)
        sha_t = sha.sha512(words)

        # public inputs: padded message words (incl. R, A) — binds the
        # whole transcript input; cf. eddsa.rs:46-57 registering msg+pk bits
        for lo, hi in words:
            b.register_public_input(hi)
            b.register_public_input(lo)

        # R = bytes 0..31 -> words 0..3; A = bytes 32..63 -> words 4..7
        r_limbs, r_sign = self._words_to_le_limbs(words[0:4], drop_sign=True)
        a_limbs, a_sign = self._words_to_le_limbs(words[4:8], drop_sign=True)
        r_pt = self.curve.point_decompress(r_limbs, r_sign)
        a_pt = self.curve.point_decompress(a_limbs, a_sign)

        # h = sha512 digest (LE integer) mod l
        h_limbs = self._words_to_le_limbs(sha_t.digest)
        h = self.nn_scalar.reduce_biguint(BigUintTarget(h_limbs))
        h_bits = self.nn_scalar.bits_le(h)

        # s: separate witness limbs, canonical (< l)
        s = self.nn_scalar.add_virtual_nonnative(range_check=True)
        s_bits = self.nn_scalar.bits_le(s)

        # group equation
        a_ext = self.curve.affine_to_ext(a_pt)
        r_ext = self.curve.affine_to_ext(r_pt)
        ha = self.curve.scalar_mul_windowed(a_ext, h_bits)
        sb = self.curve.fixed_base_mul(s_bits)
        rhs = self.curve.ext_add(r_ext, ha)
        self.curve.ext_assert_equal(sb, rhs)

        return EddsaTargets(sha=sha_t, s_limbs=list(s.value.limbs),
                            msg_len=msg_len)

    def ed25519_batch_circuit(self, msg_len: int, k: int) -> list:
        """K independent EdDSA verifications in ONE circuit.

        TPU-first replacement for the reference's one-circuit-per-signature
        NATS fan-out (signatures.rs:144): with the LogUp gates one
        verification occupies ~14k rows while the 16-bit lookup table forces
        2^16 rows, so batching K=4 signatures fills the padding for free —
        same prove cost, 4x throughput.  Public inputs are the K slots'
        padded transcript words concatenated in slot order, so a batch leaf
        is PI-layout-identical to K folded single leaves
        (near/block_finality.py's word binding needs no changes)."""
        return [self.ed25519_circuit(msg_len) for _ in range(k)]

    # -- witness -----------------------------------------------------------
    @staticmethod
    def fill_eddsa(targets: EddsaTargets, msg: bytes, sig: bytes, pk: bytes,
                   inputs: dict):
        """eddsa.rs:87 fill_ecdsa_targets equivalent."""
        assert len(sig) == 64 and len(pk) == 32
        assert len(msg) == targets.msg_len
        Sha512Ops.set_sha512_input(targets.sha, sig[:32] + pk + msg, inputs)
        s_val = int.from_bytes(sig[32:], "little")
        for i, t in enumerate(targets.s_limbs):
            inputs[t] = np.uint64((s_val >> (32 * i)) & 0xFFFFFFFF)

    @staticmethod
    def expected_public_inputs(msg: bytes, pk: bytes, r_bytes: bytes,
                               blocks: int) -> list[int]:
        """The PI vector a verifier should check against: padded sha words
        as [hi, lo] u32 pairs in word order."""
        padded = sha512_pad(r_bytes + pk + msg, blocks)
        out = []
        for i in range(len(padded) // 8):
            word = int.from_bytes(padded[8 * i: 8 * i + 8], "big")
            out.append(word >> 32)
            out.append(word & 0xFFFFFFFF)
        return out
