"""secp256k1 / GLV / ECDSA gadget tests.

Mirrors the reference's inline test shapes for crypto/plonky2_ecdsa
(curve round-trips, GLV decomposition correctness, ecdsa.rs:27 statement
accept + tamper-reject).  The full verify circuit is validated at the
witness/constraint level like the EdDSA stack (test_ed25519_gadgets.py);
proving such circuits end-to-end is exercised by the TPU pipeline scripts.
"""
import random

import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk.witness import generate_witness, WitnessConflict
from zklc_tpu.plonk.testing import check_constraints
from zklc_tpu.gadgets.secp256k1 import (
    G_X, G_Y, LAMBDA, N, P, Secp256k1Ops, glv_decompose, k1_add_native,
    k1_mul_native, k1_on_curve)
from zklc_tpu.gadgets.ecdsa import (EcdsaOps, ecdsa_sign_native,
                                    ecdsa_verify_native, pubkey_native)

rng = random.Random(1337)
G = (G_X, G_Y)


def _nn_value(wr, t):
    v = 0
    for i, limb in enumerate(t.value.limbs):
        v |= int(wr.get(limb)) << (32 * i)
    return v


def test_native_curve_and_glv():
    assert k1_on_curve(G)
    for _ in range(8):
        k = rng.randrange(1, N)
        pt = k1_mul_native(G, k)
        assert k1_on_curve(pt)
        # endomorphism law: LAMBDA*P == (BETA*x, y)
        from zklc_tpu.gadgets.secp256k1 import BETA
        lp = k1_mul_native(pt, LAMBDA)
        assert lp == (BETA * pt[0] % P, pt[1])
        k1, k2 = glv_decompose(k)
        assert (k1 + k2 * LAMBDA - k) % N == 0
        assert abs(k1) < 1 << 129 and abs(k2) < 1 << 129
    # group law consistency
    a, b = rng.randrange(1, N), rng.randrange(1, N)
    assert k1_add_native(k1_mul_native(G, a), k1_mul_native(G, b)) == \
        k1_mul_native(G, (a + b) % N)


def test_native_ecdsa_roundtrip():
    d = rng.randrange(1, N)
    pk = pubkey_native(d)
    h = rng.randrange(1, N)
    sig = ecdsa_sign_native(h, d)
    assert ecdsa_verify_native(h, sig, pk)
    assert not ecdsa_verify_native((h + 1) % N, sig, pk)
    assert not ecdsa_verify_native(h, (sig[0], (sig[1] + 1) % N), pk)


def test_curve_gadget_add_double_valid():
    b = CircuitBuilder(CircuitConfig.wide_lookup_config())
    k1 = Secp256k1Ops(b)
    p_t = k1.add_virtual_point()
    q_t = k1.add_virtual_point()
    k1.curve_assert_valid(p_t)
    s_t = k1.curve_add(p_t, q_t)
    d_t = k1.curve_double(p_t)
    e_t = k1.endo(p_t)
    data = b.build()

    pv = k1_mul_native(G, rng.randrange(1, N))
    qv = k1_mul_native(G, rng.randrange(1, N))
    inputs = {}
    k1.set_point_inputs(p_t, pv, inputs)
    k1.set_point_inputs(q_t, qv, inputs)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    assert (_nn_value(wr, s_t.x), _nn_value(wr, s_t.y)) == \
        k1_add_native(pv, qv)
    assert (_nn_value(wr, d_t.x), _nn_value(wr, d_t.y)) == \
        k1_add_native(pv, pv)
    assert (_nn_value(wr, e_t.x), _nn_value(wr, e_t.y)) == \
        k1_mul_native(pv, LAMBDA)


def test_curve_gadget_rejects_off_curve_point():
    b = CircuitBuilder(CircuitConfig.wide_lookup_config())
    k1 = Secp256k1Ops(b)
    p_t = k1.add_virtual_point()
    k1.curve_assert_valid(p_t)
    data = b.build()
    inputs = {}
    k1.set_point_inputs(p_t, (5, 7), inputs)   # not on curve
    with pytest.raises((WitnessConflict, AssertionError)):
        wr = generate_witness(data, inputs)
        check_constraints(data, wr)


def test_glv_mul_gadget():
    b = CircuitBuilder(CircuitConfig.wide_lookup_config())
    k1 = Secp256k1Ops(b)
    p_t = k1.add_virtual_point()
    k_t = k1.nns.add_virtual_nonnative()
    r_t = k1.glv_mul(p_t, k_t)
    data = b.build()

    pv = k1_mul_native(G, rng.randrange(1, N))
    kv = rng.randrange(1, N)
    inputs = {}
    k1.set_point_inputs(p_t, pv, inputs)
    k1.nns.set_nonnative_inputs(k_t, kv, inputs)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)
    assert (_nn_value(wr, r_t.x), _nn_value(wr, r_t.y)) == \
        k1_mul_native(pv, kv)


def _build_verify():
    b = CircuitBuilder(CircuitConfig.wide_lookup_config())
    ops = EcdsaOps(b)
    tg = ops.verify_message_circuit()
    return b.build(), ops, tg


def test_ecdsa_verify_circuit_accepts_real_signature():
    data, ops, tg = _build_verify()
    d = rng.randrange(1, N)
    pk = pubkey_native(d)
    h = rng.randrange(1, N)
    sig = ecdsa_sign_native(h, d)
    inputs = {}
    ops.fill_ecdsa(tg, h, sig, pk, inputs)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)


def test_ecdsa_verify_circuit_rejects_tampered_signature():
    data, ops, tg = _build_verify()
    d = rng.randrange(1, N)
    pk = pubkey_native(d)
    h = rng.randrange(1, N)
    r, s = ecdsa_sign_native(h, d)
    inputs = {}
    ops.fill_ecdsa(tg, h, (r, (s + 1) % N), pk, inputs)
    with pytest.raises((WitnessConflict, AssertionError, ValueError)):
        wr = generate_witness(data, inputs)
        check_constraints(data, wr)
