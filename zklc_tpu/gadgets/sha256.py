"""SHA-256 circuit gadget (word-level, u32 flavor).

Re-derivation of crypto/plonky2_sha256_u32/src/sha256.rs: the message lives
as big-endian u32 word limbs (padding applied witness-side), the compression
uses the interleave AND/XOR trick for sigma/ch/maj, and the digest comes out
as 8 u32 limbs.  This is the hash used for every NEAR header-hash proof
(SURVEY.md §2.4 `sha256_proof_u32`).
"""
from __future__ import annotations

import numpy as np

from ..plonk.builder import CircuitBuilder
from .u32 import U32Ops
from .biguint import BigUintOps, BigUintTarget

# Standard SHA-256 initial state / round constants (FIPS 180-4).
H256 = [
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19,
]
K32 = [
    0x428a2f98, 0x71374491, 0xb5c0fbcf, 0xe9b5dba5, 0x3956c25b, 0x59f111f1,
    0x923f82a4, 0xab1c5ed5, 0xd807aa98, 0x12835b01, 0x243185be, 0x550c7dc3,
    0x72be5d74, 0x80deb1fe, 0x9bdc06a7, 0xc19bf174, 0xe49b69c1, 0xefbe4786,
    0x0fc19dc6, 0x240ca1cc, 0x2de92c6f, 0x4a7484aa, 0x5cb0a9dc, 0x76f988da,
    0x983e5152, 0xa831c66d, 0xb00327c8, 0xbf597fc7, 0xc6e00bf3, 0xd5a79147,
    0x06ca6351, 0x14292967, 0x27b70a85, 0x2e1b2138, 0x4d2c6dfc, 0x53380d13,
    0x650a7354, 0x766a0abb, 0x81c2c92e, 0x92722c85, 0xa2bfe8a1, 0xa81a664b,
    0xc24b8b70, 0xc76c51a3, 0xd192e819, 0xd6990624, 0xf40e3585, 0x106aa070,
    0x19a4c116, 0x1e376c08, 0x2748774c, 0x34b0bcb5, 0x391c0cb3, 0x4ed8aa4a,
    0x5b9cca4f, 0x682e6ff3, 0x748f82ee, 0x78a5636f, 0x84c87814, 0x8cc70208,
    0x90befffa, 0xa4506ceb, 0xbef9a3f7, 0xc67178f2,
]


class HashInputTarget:
    """input_bits total (multiple of 512); limbs = BE u32 words."""

    def __init__(self, input_: BigUintTarget, input_bits: int):
        self.input = input_
        self.input_bits = input_bits


class Sha256Ops:
    def __init__(self, b: CircuitBuilder):
        self.b = b
        self.u32 = U32Ops(b)
        self.big = BigUintOps(b, self.u32)

    def add_virtual_hash_input_target(self, blocks_num: int,
                                      blocksize: int = 512) -> HashInputTarget:
        bits = blocks_num * blocksize
        big = self.big.add_virtual_biguint_target(bits // 32)
        return HashInputTarget(big, bits)

    def add_virtual_hash256_target(self) -> list[int]:
        return self.big.add_virtual_biguint_target(8).limbs

    # -- sigma helpers (sha256.rs:73-129) ---------------------------------
    def _sigma(self, a, r1, r2, s3):
        x = self.u32.rrot_u32(a, r1)
        y = self.u32.rrot_u32(a, r2)
        z = self.u32.rsh_u32(a, s3)
        return self.u32.unsafe_xor_many_u32([x, y, z])

    def _big_sigma(self, a, r1, r2, r3):
        x = self.u32.rrot_u32(a, r1)
        y = self.u32.rrot_u32(a, r2)
        z = self.u32.rrot_u32(a, r3)
        return self.u32.unsafe_xor_many_u32([x, y, z])

    def _ch(self, e, f, g):
        not_e = self.u32.not_u32(e)
        ef = self.u32.and_xor_u32(e, f)[0]
        eg = self.u32.and_xor_u32(not_e, g)[0]
        return self.u32.and_xor_b32_to_u32(ef, eg)[1]

    def _maj(self, a, b, c):
        b_and_c, b_xor_c = self.u32.and_xor_u32(b, c)
        ai = self.u32.interleave_u32(a)
        abc = self.u32.and_xor_b32(ai, b_xor_c)[0]
        return self.u32.and_xor_b32_to_u32(abc, b_and_c)[1]

    def _compress(self, state, w_words, k256):
        u = self.u32
        w = list(w_words)
        a, b, c, d, e, f, g, h = state
        for i in range(64):
            if i >= 16:
                s0 = self._sigma(w[(i + 1) & 0xF], 7, 18, 3)
                s1 = self._sigma(w[(i + 14) & 0xF], 17, 19, 10)
                w[i & 0xF] = u.add_many_u32(
                    [s0, s1, w[(i + 9) & 0xF], w[i & 0xF]])[0]
            big_s1_e = self._big_sigma(e, 6, 11, 25)
            ch_efg = self._ch(e, f, g)
            temp1 = u.add_many_u32([h, big_s1_e, ch_efg, k256[i], w[i & 0xF]])[0]
            big_s0_a = self._big_sigma(a, 2, 13, 22)
            maj_abc = self._maj(a, b, c)
            temp2 = u.add_u32(big_s0_a, maj_abc)[0]
            h, g, f = g, f, e
            e = u.add_u32(d, temp1)[0]
            d, c, b = c, b, a
            a = u.add_u32(temp1, temp2)[0]
        return [a, b, c, d, e, f, g, h]

    def hash_sha256(self, hash_input: HashInputTarget) -> BigUintTarget:
        """sha256.rs:162-246: multi-block compression; returns 8-limb digest."""
        u = self.u32
        out = self.big.add_virtual_biguint_target(8, range_check=False)
        input_limbs = hash_input.input.limbs
        block_num = hash_input.input_bits // 512
        state = [u.constant_u32(x) for x in H256]
        k256 = [u.constant_u32(x) for x in K32]
        for blk in range(block_num):
            w = input_limbs[blk * 16: blk * 16 + 16]
            new = self._compress(state, w, k256)
            state = [u.add_u32(s, n)[0] for s, n in zip(state, new)]
        for i in range(8):
            self.b.connect(out.limbs[i], state[i])
        return out

    def hash_sha256_variable(self, hash_input: HashInputTarget
                             ) -> tuple[BigUintTarget, list[int]]:
        """Variable-length multi-block SHA-256: the digest is the chained
        state after a witness-selected block count.

        Returns (digest, sel_bits): sel_bits[j] is a boolean target meaning
        "the padded message occupies exactly j+1 blocks"; the circuit
        enforces one-hot-ness (sum == 1) and selects
        digest_limb = sum_j sel_bits[j] * state_after_block_j[limb].

        This is the shape-bucketing primitive (SURVEY.md §7.4.6): one
        circuit per BUCKET of block counts instead of one per exact message
        length, so XLA compiles each header-circuit kernel once per bucket.
        Soundness note: like the fixed-length flavor (and the reference's
        sha256.rs:18-33), SHA padding lives in the witness words — the
        digest is bound to whatever words were absorbed, and the outer
        statement (signature / prev-hash / trusted-hash linkage) rejects
        digests of mis-padded or mis-selected messages."""
        u = self.u32
        b = self.b
        out = self.big.add_virtual_biguint_target(8, range_check=False)
        input_limbs = hash_input.input.limbs
        block_num = hash_input.input_bits // 512
        state = [u.constant_u32(x) for x in H256]
        k256 = [u.constant_u32(x) for x in K32]
        sel_bits = []
        acc = [b.zero()] * 8
        for blk in range(block_num):
            w = input_limbs[blk * 16: blk * 16 + 16]
            new = self._compress(state, w, k256)
            state = [u.add_u32(s, n)[0] for s, n in zip(state, new)]
            s_t = b.add_virtual_target()
            b.assert_bool(s_t)
            sel_bits.append(s_t)
            for i in range(8):
                acc[i] = b.arithmetic(1, 1, s_t, state[i], acc[i])
        total = b.zero()
        for s_t in sel_bits:
            total = b.arithmetic(1, 1, total, b.one(), s_t)
        b.connect(total, b.one())
        for i in range(8):
            self.b.connect(out.limbs[i], acc[i])
        return out, sel_bits

    def two_to_one_sha256(self, left: list[int], right: list[int]) -> list[int]:
        """sha256.rs:248+: compress one 512-bit block of left||right digests,
        then a constant second block holding SHA padding for 512-bit input."""
        u = self.u32
        state = [u.constant_u32(x) for x in H256]
        k256 = [u.constant_u32(x) for x in K32]
        new = self._compress(state, list(left) + list(right), k256)
        state = [u.add_u32(s, n)[0] for s, n in zip(state, new)]
        # second block: 0x80000000, zeros..., bit length 512
        pad = [0x80000000] + [0] * 14 + [512]
        pad_t = [u.constant_u32(x) for x in pad]
        new2 = self._compress(state, pad_t, k256)
        return [u.add_u32(s, n)[0] for s, n in zip(state, new2)]

    # -- witness-side padding (sha256.rs:18-33) ---------------------------
    @staticmethod
    def sha256_pad_words(message: bytes, total_bits: int) -> list[int]:
        """Pad per FIPS 180-4, return BE u32 words filling total_bits."""
        ml = len(message) * 8
        data = bytearray(message)
        data.append(0x80)
        while (len(data) * 8) % 512 != 448:
            data.append(0)
        data += ml.to_bytes(8, "big")
        assert len(data) * 8 == total_bits, \
            f"padded {len(data)*8} bits != target {total_bits}"
        return [int.from_bytes(data[i:i + 4], "big")
                for i in range(0, len(data), 4)]

    def set_sha256_input(self, target: HashInputTarget, message: bytes,
                         inputs: dict):
        words = self.sha256_pad_words(message, target.input_bits)
        for t, wv in zip(target.input.limbs, words):
            inputs[t] = np.uint64(wv)

    @staticmethod
    def num_blocks_for(message_len_bytes: int) -> int:
        """block_num = (len*8 + 64 + 512) / 512 (reference
        near_bft_finality/src/prove_crypto/sha256.rs:70)."""
        return (message_len_bytes * 8 + 64 + 512) // 512

    # -- SHA-256 Merkle gadgets (sha256_merkle.rs:9-140) -------------------
    def _select_hash256(self, bit: int, left: list[int],
                        right: list[int]) -> list[int]:
        return [self.b.select(bit, l, r) for l, r in zip(left, right)]

    def compute_merkle_root(self, index_bits: list[int], value: list[int],
                            siblings: list[list[int]]) -> list[int]:
        """sha256_merkle.rs:27: walk up the path; bit i selects whether the
        current node is the right child at level i."""
        current = value
        for bit, sibling in zip(index_bits, siblings):
            left = self._select_hash256(bit, sibling, current)
            right = self._select_hash256(bit, current, sibling)
            current = self.two_to_one_sha256(left, right)
        return current

    def add_merkle_proof_gadget(self, height: int):
        """MerkleProofSha256Gadget (sha256_merkle.rs:44-89): returns
        (root, value, siblings, index) targets; root is computed in-circuit
        from (value, index, siblings)."""
        siblings = [self.add_virtual_hash256_target() for _ in range(height)]
        value = self.add_virtual_hash256_target()
        index = self.b.add_virtual_target()
        index_bits = self.b.split_le(index, height)
        root = self.compute_merkle_root(index_bits, value, siblings)
        return root, value, siblings, index

    def add_delta_merkle_proof_gadget(self, height: int):
        """DeltaMerkleProofSha256Gadget (sha256_merkle.rs:91-140): proves an
        update old_value -> new_value at `index` transforms old_root into
        new_root against shared siblings."""
        siblings = [self.add_virtual_hash256_target() for _ in range(height)]
        old_value = self.add_virtual_hash256_target()
        new_value = self.add_virtual_hash256_target()
        index = self.b.add_virtual_target()
        index_bits = self.b.split_le(index, height)
        old_root = self.compute_merkle_root(index_bits, old_value, siblings)
        new_root = self.compute_merkle_root(index_bits, new_value, siblings)
        return old_root, old_value, new_root, new_value, siblings, index

    @staticmethod
    def set_hash256_target(target: list[int], digest: bytes, inputs: dict):
        assert len(digest) == 32
        for i, t in enumerate(target):
            inputs[t] = np.uint64(
                int.from_bytes(digest[4 * i: 4 * i + 4], "big"))
