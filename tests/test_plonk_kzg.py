"""KZG-PLONK wrap backend (wrap/plonk_kzg.py) — the reference's second
wrap flavor (gnark PLONK, cmd/compile.go:102-115).

Covers: KZG open/verify, R1CS -> plonkish lowering (wire/copy-constraint
soundness checked row by row), full prove/verify round-trip on a hand
R1CS and on the deployed-interface pi-packing statement, and rejection of
tampered publics/evals/commitments."""
import pytest

from zklc_tpu.wrap import plonk_kzg as PK
from zklc_tpu.wrap.groth16 import R1CS, pi_packing_r1cs
from zklc_tpu.wrap import bn254 as C
from zklc_tpu.native import bn254 as NB

pytestmark = [pytest.mark.heavy,
              pytest.mark.skipif(not NB.available,
                                 reason="native bn254 library required")]

R = PK.R


@pytest.fixture(scope="module")
def tiny():
    """Statement: public (p, q); private x, y with x*y = p, (x+y)*y = q.
    z = (1, p, q, x, y)."""
    x, y = 1234567, 7654321
    p = x * y % R
    q = (x + y) * y % R
    r1cs = R1CS(
        num_vars=5, num_pub=2,
        a=[{3: 1}, {3: 1, 4: 1}],
        b=[{4: 1}, {4: 1}],
        c=[{1: 1}, {2: 1}],
    )
    z = [1, p, q, x, y]
    assert r1cs.satisfied(z)
    return r1cs, z


def test_kzg_open_verify():
    srs = PK.kzg_setup(16, tau=0x1234567)
    coeffs = [3, 1, 4, 1, 5, 9, 2, 6]
    comm = srs.commit(coeffs)
    zp = 0xABCDEF
    y = PK._poly_eval(coeffs, zp)
    num = list(coeffs)
    num[0] = (num[0] - y) % R
    # witness poly w = (p - y)/(X - z)
    d = len(num) - 1
    w = [0] * d
    acc = num[d] % R
    for i in range(d - 1, -1, -1):
        w[i] = acc
        acc = (num[i] + acc * zp) % R
    assert acc == 0
    wc = srs.commit(w)
    assert PK.kzg_verify_open(srs, comm, zp, y, wc)
    assert not PK.kzg_verify_open(srs, comm, zp, (y + 1) % R, wc)


def test_lowering_sound(tiny):
    r1cs, z = tiny
    cs = PK.from_r1cs(r1cs)
    vals = PK.plonkish_witness(cs, z)
    assert PK.check_plonkish(cs, vals, z[1:1 + r1cs.num_pub])
    # a wrong witness must break some row
    bad = list(vals)
    bad[3] = (bad[3] + 1) % R
    assert not PK.check_plonkish(cs, bad, z[1:1 + r1cs.num_pub])


def test_plonk_roundtrip_tiny(tiny):
    r1cs, z = tiny
    cs = PK.from_r1cs(r1cs)
    pk, vk = PK.plonk_setup(cs, tau=0xDEADBEEF12345)
    vals = PK.plonkish_witness(cs, z)
    pub = z[1:1 + r1cs.num_pub]
    proof = PK.plonk_prove(pk, vals, pub)
    assert PK.plonk_verify(vk, proof, pub) is True


def test_plonk_rejects_wrong_public(tiny):
    r1cs, z = tiny
    cs = PK.from_r1cs(r1cs)
    pk, vk = PK.plonk_setup(cs, tau=0xDEADBEEF12345)
    vals = PK.plonkish_witness(cs, z)
    pub = z[1:1 + r1cs.num_pub]
    proof = PK.plonk_prove(pk, vals, pub)
    bad_pub = [(pub[0] + 1) % R, pub[1]]
    assert PK.plonk_verify(vk, proof, bad_pub) is False


def test_plonk_rejects_tampered_proof(tiny):
    r1cs, z = tiny
    cs = PK.from_r1cs(r1cs)
    pk, vk = PK.plonk_setup(cs, tau=0xDEADBEEF12345)
    vals = PK.plonkish_witness(cs, z)
    pub = z[1:1 + r1cs.num_pub]
    proof = PK.plonk_prove(pk, vals, pub)
    bad = dict(proof)
    bad["a_z"] = (bad["a_z"] + 1) % R
    assert PK.plonk_verify(vk, bad, pub) is False
    bad2 = dict(proof)
    bad2["z"] = C.g1_mul(C.G1_GEN, 42)
    assert PK.plonk_verify(vk, bad2, pub) is False


def test_plonk_pi_packing_statement():
    """The deployed uint256[4] interface statement (16 u32 words packed
    into 4 public words, web-api.go:50-66) through the PLONK flavor."""
    r1cs, assign = pi_packing_r1cs()
    words = [0xDEADBEEF, 1, 2, 3, 4, 5, 6, 7,
             8, 9, 10, 11, 12, 13, 14, 0xCAFEBABE]
    z = assign(words)
    assert r1cs.satisfied(z)
    cs = PK.from_r1cs(r1cs)
    vals = PK.plonkish_witness(cs, z)
    pub = z[1:1 + r1cs.num_pub]
    assert PK.check_plonkish(cs, vals, pub)
    pk, vk = PK.plonk_setup(cs, tau=0x987654321)
    proof = PK.plonk_prove(pk, vals, pub)
    assert PK.plonk_verify(vk, proof, pub) is True
    assert PK.plonk_verify(vk, proof, [1, 2, 3, 4]) is False
