"""ed25519 circuit-stack gadget tests (witness-level; the full EdDSA circuit
is exercised by the slower pipeline scripts, cf. BASELINE config 2)."""
import hashlib
import random

import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.witness import generate_witness, WitnessConflict
from zklc_tpu.plonk.testing import check_constraints
from zklc_tpu.gadgets.sha512 import Sha512Ops
from zklc_tpu.gadgets.nonnative import NonNativeOps, ED25519_BASE_P as P
from zklc_tpu.gadgets.curve import (CurveOps, affine_mul_native,
                                    decompress_native, B_X, B_Y)

rng = random.Random(7)


def test_sha512_circuit_matches_hashlib():
    msg = b"abc"
    b = CircuitBuilder()
    sha = Sha512Ops(b)
    tg = sha.sha512_circuit(len(msg))
    data = b.build()
    inputs = {}
    sha.set_sha512_input(tg, msg, inputs)
    wr = generate_witness(data, inputs)
    assert sha.digest_value(tg, wr) == hashlib.sha512(msg).digest()
    check_constraints(data, wr)


def test_nonnative_ops():
    b = CircuitBuilder()
    nn = NonNativeOps(b, P)
    a = nn.add_virtual_nonnative()
    c = nn.add_virtual_nonnative()
    outs = {
        "add": nn.add_nonnative(a, c),
        "sub": nn.sub_nonnative(a, c),
        "mul": nn.mul_nonnative(a, c),
        "inv": nn.inv_nonnative(a),
    }
    data = b.build()
    av, cv = rng.randrange(P), rng.randrange(P)
    inputs = {}
    nn.set_nonnative_inputs(a, av, inputs)
    nn.set_nonnative_inputs(c, cv, inputs)
    wr = generate_witness(data, inputs)

    def val(t):
        v = 0
        for k, limb in enumerate(t.value.limbs):
            v |= int(wr.get(limb)) << (32 * k)
        return v

    assert val(outs["add"]) == (av + cv) % P
    assert val(outs["sub"]) == (av - cv) % P
    assert val(outs["mul"]) == av * cv % P
    assert val(outs["inv"]) == pow(av, P - 2, P)
    check_constraints(data, wr)


def _ext_affine(wr, pt):
    def val(t):
        v = 0
        for k, limb in enumerate(t.value.limbs):
            v |= int(wr.get(limb)) << (32 * k)
        return v
    zi = pow(val(pt.Z), P - 2, P)
    return (val(pt.X) * zi % P, val(pt.Y) * zi % P)


def test_curve_add_double_identity():
    b = CircuitBuilder()
    nn = NonNativeOps(b, P)
    cu = CurveOps(b, nn)
    base = cu.constant_affine(B_X, B_Y)
    cu.curve_assert_valid(base)
    bext = cu.affine_to_ext(base)
    dbl = cu.ext_double(bext)
    tri = cu.ext_add(dbl, bext)
    idt = cu.ext_add(bext, cu.identity_ext())
    data = b.build()
    wr = generate_witness(data, {})
    check_constraints(data, wr)
    assert _ext_affine(wr, dbl) == affine_mul_native((B_X, B_Y), 2)
    assert _ext_affine(wr, tri) == affine_mul_native((B_X, B_Y), 3)
    assert _ext_affine(wr, idt) == (B_X, B_Y)


def test_windowed_scalar_mul_one_window():
    """4-bit scalar exercises table precompute + RandomAccess lookup."""
    k = 11
    b = CircuitBuilder()
    nn = NonNativeOps(b, P)
    cu = CurveOps(b, nn)
    bext = cu.affine_to_ext(cu.constant_affine(B_X, B_Y))
    kt = b.add_virtual_target()
    bits = b.split_le(kt, 4)
    out = cu.scalar_mul_windowed(bext, bits)
    data = b.build()
    wr = generate_witness(data, {kt: k})
    check_constraints(data, wr)
    assert _ext_affine(wr, out) == affine_mul_native((B_X, B_Y), k)


def test_point_decompress_real_key():
    """Decompress a real NEAR validator key in-circuit."""
    import os
    fixture = "/root/reference/data"
    if not os.path.isdir(fixture):
        pytest.skip("fixtures not mounted")
    from zklc_tpu.near import utils as U
    vals = U.load_validators(os.path.join(
        U.epoch_dir(U.list_epochs()[0]), "validators.json"))
    comp = vals[0].public_key[1:]
    x_exp, y_exp = decompress_native(comp)

    b = CircuitBuilder()
    nn = NonNativeOps(b, P)
    cu = CurveOps(b, nn)
    y_limbs = [b.add_virtual_target() for _ in range(8)]
    sign = b.add_virtual_target()
    pt = cu.point_decompress(y_limbs, sign)
    data = b.build()
    yv = int.from_bytes(comp, "little") & ((1 << 255) - 1)
    inputs = {sign: comp[31] >> 7}
    for i, t in enumerate(y_limbs):
        inputs[t] = np.uint64((yv >> (32 * i)) & 0xFFFFFFFF)
    wr = generate_witness(data, inputs)
    check_constraints(data, wr)

    def val(t):
        v = 0
        for k2, limb in enumerate(t.value.limbs):
            v |= int(wr.get(limb)) << (32 * k2)
        return v

    assert (val(pt.x), val(pt.y)) == (x_exp, y_exp)
