"""SHA-512 circuit gadget, word-level on u32 limb pairs.

Proves the SHA-512 compression function over 1024-bit blocks.  Semantics
match crypto/plonky2_sha512/src/circuit.rs:308 (the bit-level circuit used
inside the reference's EdDSA gadget, gadgets/eddsa.rs:40), but the design is
re-derived for this framework's u32 gate library instead of per-bit targets:

  * a 64-bit word is a pair (lo, hi) of u32 targets (little-endian limbs);
  * rotations/shifts are TWO u32 multiply gates (the 2^k multiply splits a
    limb at the rotation point) + recombination adds — not 64 bit wires;
  * xor3 AND maj come from ONE interleaved 3-way add each: in a sum of three
    interleaved words every 2-bit field holds a+b+c, whose low bit is XOR
    and high bit is MAJ (the same spread-bits trick as
    crypto/plonky2_u32/src/gadgets/interleaved_u32.rs, extended to 3 terms);
  * ch(e,f,g) = g ^ (e & (f ^ g)) — two and/xor gates;
  * mod-2^64 additions are limb add-many chains with the final carry dropped.

This makes a 2-block SHA-512 a few thousand gate slots instead of the
reference's tens of thousands of bit gates — the reason its ed25519 circuit
needs `wide_ecc_config` (SURVEY.md §2.3).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..plonk.builder import CircuitBuilder
from .u32 import U32Ops

# FIPS 180-4 constants.
H512 = [
    0x6A09E667F3BCC908, 0xBB67AE8584CAA73B, 0x3C6EF372FE94F82B,
    0xA54FF53A5F1D36F1, 0x510E527FADE682D1, 0x9B05688C2B3E6C1F,
    0x1F83D9ABFB41BD6B, 0x5BE0CD19137E2179,
]

K512 = [
    0x428A2F98D728AE22, 0x7137449123EF65CD, 0xB5C0FBCFEC4D3B2F, 0xE9B5DBA58189DBBC,
    0x3956C25BF348B538, 0x59F111F1B605D019, 0x923F82A4AF194F9B, 0xAB1C5ED5DA6D8118,
    0xD807AA98A3030242, 0x12835B0145706FBE, 0x243185BE4EE4B28C, 0x550C7DC3D5FFB4E2,
    0x72BE5D74F27B896F, 0x80DEB1FE3B1696B1, 0x9BDC06A725C71235, 0xC19BF174CF692694,
    0xE49B69C19EF14AD2, 0xEFBE4786384F25E3, 0x0FC19DC68B8CD5B5, 0x240CA1CC77AC9C65,
    0x2DE92C6F592B0275, 0x4A7484AA6EA6E483, 0x5CB0A9DCBD41FBD4, 0x76F988DA831153B5,
    0x983E5152EE66DFAB, 0xA831C66D2DB43210, 0xB00327C898FB213F, 0xBF597FC7BEEF0EE4,
    0xC6E00BF33DA88FC2, 0xD5A79147930AA725, 0x06CA6351E003826F, 0x142929670A0E6E70,
    0x27B70A8546D22FFC, 0x2E1B21385C26C926, 0x4D2C6DFC5AC42AED, 0x53380D139D95B3DF,
    0x650A73548BAF63DE, 0x766A0ABB3C77B2A8, 0x81C2C92E47EDAEE6, 0x92722C851482353B,
    0xA2BFE8A14CF10364, 0xA81A664BBC423001, 0xC24B8B70D0F89791, 0xC76C51A30654BE30,
    0xD192E819D6EF5218, 0xD69906245565A910, 0xF40E35855771202A, 0x106AA07032BBD1B8,
    0x19A4C116B8D2D0C8, 0x1E376C085141AB53, 0x2748774CDF8EEB99, 0x34B0BCB5E19B48A8,
    0x391C0CB3C5C95A63, 0x4ED8AA4AE3418ACB, 0x5B9CCA4F7763E373, 0x682E6FF3D6B2B8A3,
    0x748F82EE5DEFB2FC, 0x78A5636F43172F60, 0x84C87814A1F0AB72, 0x8CC702081A6439EC,
    0x90BEFFFA23631E28, 0xA4506CEBDE82BDE9, 0xBEF9A3F7B2C67915, 0xC67178F2E372532B,
    0xCA273ECEEA26619C, 0xD186B8C721C0C207, 0xEADA7DD6CDE0EB1E, 0xF57D4F7FEE6ED178,
    0x06F067AA72176FBA, 0x0A637DC5A2C898A6, 0x113F9804BEF90DAE, 0x1B710B35131C471B,
    0x28DB77F523047D84, 0x32CAAB7B40C72493, 0x3C9EBE0A15C9BEBC, 0x431D67C49C100D4C,
    0x4CC5D4BECB3E42B6, 0x597F299CFC657E2A, 0x5FCB6FAB3AD6FAEC, 0x6C44198C4A475817,
]


# A 64-bit circuit word: (lo, hi) u32 targets (value = hi * 2^32 + lo).
W64 = tuple


@dataclass
class Sha512Targets:
    """message: list of W64 (16 per block, big-endian word semantics);
    digest: 8 W64 words."""
    message: list
    digest: list
    blocks: int


def sha512_pad(message: bytes, blocks: int | None = None) -> bytes:
    """FIPS 180-4 padding; optionally force a block count (must fit)."""
    L = len(message) * 8
    padded = message + b"\x80"
    min_blocks = (len(message) * 8 + 1 + 128 + 1023) // 1024
    nblocks = blocks if blocks is not None else min_blocks
    assert nblocks >= min_blocks
    total = nblocks * 128
    padded += b"\x00" * (total - len(padded) - 16)
    padded += L.to_bytes(16, "big")
    assert len(padded) == total
    return padded


class Sha512Ops:
    def __init__(self, b: CircuitBuilder, u32: U32Ops | None = None):
        self.b = b
        self.u32 = u32 or U32Ops(b)

    # -- word helpers ------------------------------------------------------
    def c64(self, v: int) -> W64:
        return (self.u32.constant_u32(v & 0xFFFFFFFF),
                self.u32.constant_u32((v >> 32) & 0xFFFFFFFF))

    def add64_many(self, words: list[W64]) -> W64:
        """Sum mod 2^64 (carry out of the high limb dropped)."""
        assert len(words) <= 15
        lo, c = self.u32.add_many_u32([w[0] for w in words])
        hi, _ = self.u32.add_u32s_with_carry([w[1] for w in words], c)
        return (lo, hi)

    def rot64(self, w: W64, r: int) -> W64:
        r %= 64
        if r == 0:
            return w
        lo, hi = w
        if r >= 32:
            lo, hi = hi, lo
            r -= 32
        if r == 0:
            return (lo, hi)
        # mul by 2^(32-r): (x << (32-r) mod 2^32, x >> r)
        k = self.u32.constant_u32(1 << (32 - r))
        lo_l, lo_h = self.u32.mul_u32(lo, k)   # lo_h = lo >> r
        hi_l, hi_h = self.u32.mul_u32(hi, k)   # hi_l = hi << (32-r)
        # disjoint bit ranges: plain field adds stay < 2^32
        return (self.b.add(lo_h, hi_l), self.b.add(hi_h, lo_l))

    def shr64(self, w: W64, r: int) -> W64:
        assert 0 < r < 64
        lo, hi = w
        z = self.u32.zero_u32()
        if r >= 32:
            if r == 32:
                return (hi, z)
            k = self.u32.constant_u32(1 << (64 - r))
            _, h = self.u32.mul_u32(hi, k)     # hi >> (r-32)
            return (h, z)
        k = self.u32.constant_u32(1 << (32 - r))
        _, lo_h = self.u32.mul_u32(lo, k)      # lo >> r
        hi_l, hi_h = self.u32.mul_u32(hi, k)   # hi << (32-r) | hi >> r
        return (self.b.add(lo_h, hi_l), hi_h)

    def _xor3_maj3_limb(self, x: int, y: int, z: int) -> tuple[int, int]:
        """(xor, maj) of three u32s via one interleaved 3-way add."""
        ix = self.u32.interleave_u32(x)
        iy = self.u32.interleave_u32(y)
        iz = self.u32.interleave_u32(z)
        s = self.b.add(self.b.add(ix, iy), iz)
        maj, xor = self.u32.uninterleave_to_u32(s)  # (evens=carry, odds=xor)
        return xor, maj

    def xor3_64(self, a: W64, b2: W64, c: W64) -> W64:
        return (self._xor3_maj3_limb(a[0], b2[0], c[0])[0],
                self._xor3_maj3_limb(a[1], b2[1], c[1])[0])

    def maj64(self, a: W64, b2: W64, c: W64) -> W64:
        return (self._xor3_maj3_limb(a[0], b2[0], c[0])[1],
                self._xor3_maj3_limb(a[1], b2[1], c[1])[1])

    def xor64(self, a: W64, b2: W64) -> W64:
        return (self.u32.xor_u32(a[0], b2[0]), self.u32.xor_u32(a[1], b2[1]))

    def and64(self, a: W64, b2: W64) -> W64:
        return (self.u32.and_u32(a[0], b2[0]), self.u32.and_u32(a[1], b2[1]))

    def ch64(self, e: W64, f: W64, g: W64) -> W64:
        """ch = g ^ (e & (f ^ g))."""
        fxg = self.xor64(f, g)
        a = self.and64(e, fxg)
        return self.xor64(g, a)

    def big_sigma0(self, a: W64) -> W64:
        return self.xor3_64(self.rot64(a, 28), self.rot64(a, 34),
                            self.rot64(a, 39))

    def big_sigma1(self, e: W64) -> W64:
        return self.xor3_64(self.rot64(e, 14), self.rot64(e, 18),
                            self.rot64(e, 41))

    def small_sigma0(self, w: W64) -> W64:
        return self.xor3_64(self.rot64(w, 1), self.rot64(w, 8),
                            self.shr64(w, 7))

    def small_sigma1(self, w: W64) -> W64:
        return self.xor3_64(self.rot64(w, 19), self.rot64(w, 61),
                            self.shr64(w, 6))

    # -- circuit -----------------------------------------------------------
    def add_virtual_message(self, blocks: int) -> list[W64]:
        """16 * blocks virtual 64-bit words (not range-checked; connect them
        to range-checked producers, or use set_sha512_input which sets u32
        values and relies on the interleave gates' internal bit decomposition
        to range-check every word that enters the bitwise ops)."""
        out = []
        for _ in range(16 * blocks):
            lo = self.b.add_virtual_target()
            hi = self.b.add_virtual_target()
            out.append((lo, hi))
        return out

    def sha512(self, message: list[W64]) -> Sha512Targets:
        assert len(message) % 16 == 0
        blocks = len(message) // 16
        # range-check every input limb (the schedule's first 16 words enter
        # arithmetic before any interleave gate sees them)
        self.u32.range_check_u32([t for w in message for t in w])
        state = [self.c64(h) for h in H512]
        for blk in range(blocks):
            w = list(message[16 * blk: 16 * blk + 16])
            for i in range(16, 80):
                w.append(self.add64_many([
                    self.small_sigma1(w[i - 2]), w[i - 7],
                    self.small_sigma0(w[i - 15]), w[i - 16]]))
            a, b2, c, d, e, f, g, h = state
            for i in range(80):
                t1 = self.add64_many([
                    h, self.big_sigma1(e), self.ch64(e, f, g),
                    self.c64(K512[i]), w[i]])
                t2 = self.add64_many([self.big_sigma0(a), self.maj64(a, b2, c)])
                h = g
                g = f
                f = e
                e = self.add64_many([d, t1])
                d = c
                c = b2
                b2 = a
                a = self.add64_many([t1, t2])
            state = [self.add64_many([s, v])
                     for s, v in zip(state, [a, b2, c, d, e, f, g, h])]
        return Sha512Targets(message=message, digest=state, blocks=blocks)

    def sha512_circuit(self, msg_len_bytes: int) -> Sha512Targets:
        """Build for a fixed message byte length (block count derived)."""
        blocks = (msg_len_bytes * 8 + 1 + 128 + 1023) // 1024
        msg = self.add_virtual_message(blocks)
        return self.sha512(msg)

    # -- witness -----------------------------------------------------------
    @staticmethod
    def set_sha512_input(targets: Sha512Targets, message: bytes, inputs: dict):
        padded = sha512_pad(message, targets.blocks)
        for i, (lo, hi) in enumerate(targets.message):
            word = int.from_bytes(padded[8 * i: 8 * i + 8], "big")
            inputs[lo] = np.uint64(word & 0xFFFFFFFF)
            inputs[hi] = np.uint64(word >> 32)

    @staticmethod
    def digest_value(targets: Sha512Targets, wr) -> bytes:
        out = b""
        for lo, hi in targets.digest:
            word = (int(wr.get(hi)) << 32) | int(wr.get(lo))
            out += word.to_bytes(8, "big")
        return out
