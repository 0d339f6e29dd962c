"""R1CS frontend + fr-wrap chips vs their host oracles.

Each chip's output is checked against the independent host implementation
(gl64 big-int math, hash.poseidon, hash.poseidon_bn128) on random inputs,
and the resulting R1CS must be satisfied by the solved witness."""
import random

import numpy as np
import pytest

from zklc_tpu.field import gl64
from zklc_tpu.hash import poseidon as pos
from zklc_tpu.hash import poseidon_bn128 as pb
from zklc_tpu.wrap.bn254 import R
from zklc_tpu.wrap.r1cs_builder import R1CSBuilder, lc_var, lc_const
from zklc_tpu.wrap.gl_fr import GLChip, GLVar, ExtAlg, GLExt
from zklc_tpu.wrap import fr_chips

rng = random.Random(42)


def solved(b: R1CSBuilder, pubs):
    z = b.solve(pubs)
    r1cs = b.build()
    assert r1cs.satisfied(z), "R1CS not satisfied"
    return z


def test_builder_basics():
    b = R1CSBuilder()
    x = b.public_input()
    y = b.public_input()
    prod = b.mul(lc_var(x), lc_var(y))
    bits = b.to_bits(lc_var(x), 8)
    inv = b.inverse(lc_var(y))
    z = solved(b, [200, 7])
    assert b.eval_lc(prod, z) == 1400
    assert b.eval_lc(bits[3], z) == (200 >> 3) & 1
    assert b.eval_lc(inv, z) == pow(7, R - 2, R)


def test_builder_rejects_bad_witness():
    b = R1CSBuilder()
    x = b.public_input()
    b.to_bits(lc_var(x), 8)
    r1cs = b.build()
    z = b.solve([300])          # 300 >= 2^8: hint bits can't recompose
    assert not r1cs.satisfied(z)


def test_gl_chip_mul_add_chain_matches_gl64():
    b = R1CSBuilder()
    chip = GLChip(b)
    xs = [rng.randrange(gl64.P) for _ in range(6)]
    pvs = [b.public_input() for _ in xs]
    gls = [chip.from_var(v) for v in pvs]
    # chained ops exercising deferred reduction: ((x0*x1 + x2) * x3 - x4)*x5
    acc = chip.mul(gls[0], gls[1])
    acc = chip.add(acc, gls[2])
    acc = chip.mul(acc, gls[3])
    acc = chip.sub(acc, gls[4])
    acc = chip.mul(acc, gls[5])
    out = chip.reduce_canonical(acc)
    z = solved(b, xs)
    want = ((xs[0] * xs[1] + xs[2]) * xs[3] - xs[4]) * xs[5] % gl64.P
    assert b.eval_lc(out.lc, z) == want


def test_gl_chip_inverse():
    b = R1CSBuilder()
    chip = GLChip(b)
    x = rng.randrange(1, gl64.P)
    v = b.public_input()
    inv = chip.inverse(chip.from_var(v))
    z = solved(b, [x])
    assert b.eval_lc(inv.lc, z) == pow(x, gl64.P - 2, gl64.P)


def test_ext_alg_matches_gl64_ext():
    b = R1CSBuilder()
    chip = GLChip(b)
    alg = ExtAlg(chip)
    a = [rng.randrange(gl64.P) for _ in range(2)]
    c = [rng.randrange(gl64.P) for _ in range(2)]
    pv = [b.public_input() for _ in range(4)]
    ea = GLExt(chip.from_var(pv[0]), chip.from_var(pv[1]))
    ec = GLExt(chip.from_var(pv[2]), chip.from_var(pv[3]))
    prod = alg.mul(ea, ec)
    s = alg.add(prod, ea)
    inv = alg.inverse(ec)
    pr = chip.reduce_canonical(s.c0), chip.reduce_canonical(s.c1)
    ir = chip.reduce_canonical(inv.c0), chip.reduce_canonical(inv.c1)
    z = solved(b, a + c)
    av = np.array(a, dtype=np.uint64)
    cv = np.array(c, dtype=np.uint64)
    want_s = gl64.ext_add(gl64.ext_mul(av, cv), av)
    want_i = gl64.ext_inv(cv)
    assert [b.eval_lc(p.lc, z) for p in pr] == [int(x) for x in want_s]
    assert [b.eval_lc(p.lc, z) for p in ir] == [int(x) for x in want_i]


def test_poseidon_bn254_chip_matches_host():
    b = R1CSBuilder()
    state_vals = [rng.randrange(R) for _ in range(4)]
    pvs = [b.public_input() for _ in range(4)]
    out = fr_chips.permute_bn254_lc(b, [lc_var(v) for v in pvs])
    z = solved(b, state_vals)
    want = pb.permute_bn128(state_vals)
    assert [b.eval_lc(o, z) for o in out] == want


def test_to_bits_canonical_rejects_noncanonical():
    b = R1CSBuilder()
    x = b.public_input()
    fr_chips.to_bits_canonical(b, lc_var(x))
    r1cs = b.build()
    z = b.solve([12345])
    assert r1cs.satisfied(z)
    # forge: replace the bit decomposition with bits of x + R (< 2^254)
    small = 3                       # 3 + R < 2^254
    b2 = R1CSBuilder()
    x2 = b2.public_input()
    bits = fr_chips.to_bits_canonical(b2, lc_var(x2))
    r2 = b2.build()
    z2 = b2.solve([small])
    assert r2.satisfied(z2)
    # manually patch witness to the non-canonical decomposition
    forged = small + R
    bit_vars = [next(iter(bv.items()))[0] for bv in bits]
    for i, var in enumerate(bit_vars):
        z2[var] = (forged >> i) & 1
    # re-solve downstream equalities can't fix lt: must now violate
    assert not r2.satisfied(z2)


def test_gl_poseidon_chip_matches_host():
    b = R1CSBuilder()
    chip = GLChip(b)
    state_vals = [rng.randrange(gl64.P) for _ in range(12)]
    pvs = [b.public_input() for _ in range(12)]
    out = fr_chips.permute_gl_chip(chip, [chip.from_var(v) for v in pvs])
    outs = [chip.reduce_canonical(o) for o in out]
    z = solved(b, state_vals)
    want = pos.permute(np.array(state_vals, dtype=np.uint64))
    got = [b.eval_lc(o.lc, z) for o in outs]
    assert got == [int(x) for x in want]


def test_fr_challenger_circuit_matches_host():
    b = R1CSBuilder()
    chip = GLChip(b)
    gl_vals = [rng.randrange(gl64.P) for _ in range(11)]
    fr_val = rng.randrange(R)
    pvs = [b.public_input() for _ in gl_vals]
    fv = b.public_input()

    cc = fr_chips.FrChallengerCircuit(b)
    cc.observe_fr(lc_var(fv))
    cc.observe_gls([chip.from_var(v) for v in pvs])
    c1 = cc.get_challenge()
    c2 = cc.get_challenge()
    cc.observe_gl(chip.from_var(pvs[0]))
    c3, c4 = cc.get_extension_challenge()

    host = pb.FrChallenger()
    host.observe_fr(fr_val)
    host.observe_elements(gl_vals)
    h1 = host.get_challenge()
    h2 = host.get_challenge()
    host.observe_element(gl_vals[0])
    h3, h4 = host.get_extension_challenge()

    z = solved(b, gl_vals + [fr_val])
    assert [b.eval_lc(c.lc, z) for c in (c1, c2, c3, c4)] == \
        [h1, h2, h3, h4]


def test_hash_no_pad_gl_chip_matches_host():
    b = R1CSBuilder()
    chip = GLChip(b)
    vals = [rng.randrange(gl64.P) for _ in range(16)]   # 2 absorb rounds
    pvs = [b.public_input() for _ in vals]
    out = fr_chips.hash_no_pad_gl_chip(chip, [chip.from_var(v) for v in pvs])
    outc = [chip.reduce_canonical(o) for o in out]
    z = solved(b, vals)
    want = pos.hash_no_pad(np.array(vals, dtype=np.uint64))
    assert [b.eval_lc(o.lc, z) for o in outc] == [int(x) for x in want]
