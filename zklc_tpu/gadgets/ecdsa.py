"""ECDSA (secp256k1) signature verification circuit.

The statement of crypto/plonky2_ecdsa/src/gadgets/ecdsa.rs:27
(`verify_message_circuit`):

    given msg hash h, signature (r, s), public key Q:
        c  = s^-1 mod N
        u1 = h*c,  u2 = r*c
        R  = u1*G + u2*Q
        accept iff  R.x mod N == r

Like the reference, both scalar products go through the GLV endomorphism
(gadgets/glv.rs); unlike the reference's two separate `glv_mul` calls, the
four half-width products are evaluated in ONE Straus-interleaved MSM
(shared doubling chain — the reference's curve_msm.rs machinery exists but
ecdsa.rs does not use it).  Witness-side signing is deterministic
(RFC-6979-flavoured: k derived by hashing key+digest) for test vectors.
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass

from ..plonk.builder import CircuitBuilder
from .biguint import BigUintTarget
from .nonnative import NonNativeTarget
from .secp256k1 import (G_X, G_Y, N, P, K1PointTarget, Secp256k1Ops,
                        k1_add_native, k1_mul_native)


# ---------------------------------------------------------------------------
# Native sign / verify (witness side + test vectors)
# ---------------------------------------------------------------------------

def ecdsa_sign_native(h: int, d: int):
    """Deterministic ECDSA: returns (r, s)."""
    h %= N
    k = int.from_bytes(hashlib.sha256(
        d.to_bytes(32, "big") + h.to_bytes(32, "big")).digest(), "big") % N
    while True:
        pt = k1_mul_native((G_X, G_Y), k)
        r = pt[0] % N
        s = pow(k, N - 2, N) * (h + r * d) % N
        if r and s:
            return r, s
        k = (k + 1) % N


def ecdsa_verify_native(h: int, sig, pk) -> bool:
    r, s = sig
    if not (0 < r < N and 0 < s < N):
        return False
    c = pow(s, N - 2, N)
    pt = k1_add_native(k1_mul_native((G_X, G_Y), h * c % N),
                       k1_mul_native(pk, r * c % N))
    return pt is not None and pt[0] % N == r


def pubkey_native(d: int):
    return k1_mul_native((G_X, G_Y), d)


# ---------------------------------------------------------------------------
# Circuit
# ---------------------------------------------------------------------------

@dataclass
class EcdsaTargets:
    h: NonNativeTarget        # message hash, scalar field
    r: NonNativeTarget
    s: NonNativeTarget
    pk: K1PointTarget


class EcdsaOps:
    def __init__(self, b: CircuitBuilder):
        self.b = b
        self.k1 = Secp256k1Ops(b)

    def verify_message_circuit(self) -> EcdsaTargets:
        """Builds the full verification statement over virtual inputs.
        All inputs are range-checked canonical; r, s are additionally
        constrained nonzero via the inverse hint inside inv/mul."""
        k1, nns = self.k1, self.k1.nns
        h = nns.add_virtual_nonnative()
        r = nns.add_virtual_nonnative()
        s = nns.add_virtual_nonnative()
        pk = k1.add_virtual_point()
        k1.curve_assert_valid(pk)

        c = nns.inv_nonnative(s)               # forces s != 0
        u1 = nns.mul_nonnative(h, c)
        u2 = nns.mul_nonnative(r, c)

        pts1, bits1 = k1.glv_terms(k1.constant_point((G_X, G_Y)), u1)
        pts2, bits2 = k1.glv_terms(pk, u2)
        R = k1.msm_windowed(pts1 + pts2, bits1 + bits2)

        # R.x (base field, < P) reduced mod N must equal r; r != 0 via inv.
        x_mod_n = nns.reduce_biguint(BigUintTarget(list(R.x.value.limbs)))
        nns.connect_nonnative(x_mod_n, r)
        nns.inv_nonnative(r)
        return EcdsaTargets(h, r, s, pk)

    def fill_ecdsa(self, t: EcdsaTargets, h: int, sig, pk, inputs: dict):
        nns = self.k1.nns
        nns.set_nonnative_inputs(t.h, h, inputs)
        nns.set_nonnative_inputs(t.r, sig[0], inputs)
        nns.set_nonnative_inputs(t.s, sig[1], inputs)
        self.k1.set_point_inputs(t.pk, pk, inputs)
