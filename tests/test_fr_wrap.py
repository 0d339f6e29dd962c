"""The "fr" wrap flavor: BN254-native transcript proof round-trip.

This flavor is the statement the in-repo Groth16 compiles
(wrap/verifier_r1cs.py); its host verifier (wrap/fr_wrap.verify_fr) is the
executable spec.  The gnark-compatible "bn128" flavor keeps its own tests
(test_wrap_proof.py)."""
import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig, FriConfig
from zklc_tpu.plonk import prover
from zklc_tpu.wrap import fr_wrap
from zklc_tpu.wrap.gnark_oracle import OracleError



pytestmark = pytest.mark.heavy

def small_fr_config():
    """fr transcript flavor with test-sized FRI (full-size fr_wrap_config
    pushes LDE to 2^20 — production shape, exercised by the wrap bench)."""
    return CircuitConfig(
        hasher="fr",
        fri_config=FriConfig(rate_bits=3, cap_height=2,
                             proof_of_work_bits=4, arity_bits=2,
                             final_poly_bits=3, num_query_rounds=8))


@pytest.fixture(scope="module")
def inner():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    z = b.mul_add(x, y, x)
    for t in (x, y, z):
        b.register_public_input(t)
    data = b.build()
    proof = prover.prove(data, {x: 3, y: 4})
    return data, proof


@pytest.fixture(scope="module")
def wrapped(inner):
    data, proof = inner
    return fr_wrap.wrap_proof_fr(data, proof, config=small_fr_config())


def test_fr_wrap_verifies(wrapped):
    wdata, wproof = wrapped
    assert fr_wrap.verify_fr(wproof, wdata.verifier_only, wdata.common)
    assert [int(v) for v in wproof.public_inputs] == [3, 4, 15]


def test_fr_wrap_rejects_tampered_pi(wrapped):
    import copy
    wdata, wproof = wrapped
    bad = copy.copy(wproof)
    bad.public_inputs = wproof.public_inputs.copy()
    bad.public_inputs[2] = np.uint64(16)
    with pytest.raises(OracleError):
        fr_wrap.verify_fr(bad, wdata.verifier_only, wdata.common)


def test_fr_wrap_rejects_tampered_opening(wrapped):
    import copy
    wdata, wproof = wrapped
    bad = copy.copy(wproof)
    import dataclasses
    o = wproof.openings
    wires = np.array(o.wires)
    wires[0] = (wires[0] + 1) % np.uint64(2**64 - 2**32 + 1)
    bad.openings = dataclasses.replace(o, wires=wires)
    with pytest.raises(OracleError):
        fr_wrap.verify_fr(bad, wdata.verifier_only, wdata.common)


def test_fr_challenger_duplex_discipline():
    """Squeeze chunks are 56-bit; observing clears pending outputs; packing
    is 3 GL per Fr slot."""
    from zklc_tpu.hash.poseidon_bn128 import FrChallenger, permute_bn128, FR
    ch = FrChallenger()
    ch.observe_elements([1, 2, 3, 4, 5, 6, 7, 8, 9])   # 3 slots -> duplex
    st = permute_bn128([0,
                        (1 + (2 << 64) + (3 << 128)) % FR,
                        (4 + (5 << 64) + (6 << 128)) % FR,
                        (7 + (8 << 64) + (9 << 128)) % FR])
    c0 = ch.get_challenge()
    assert c0 == st[0] & ((1 << 56) - 1)
    c1 = ch.get_challenge()
    assert c1 == (st[0] >> 56) & ((1 << 56) - 1)
    ch2 = FrChallenger()
    ch2.observe_elements([1, 2, 3, 4, 5, 6, 7, 8, 9])
    ch2.observe_element(10)      # partial slot; must reflush on squeeze
    assert ch2.get_challenge() != c0


@pytest.fixture(scope="module")
def statement(wrapped):
    from zklc_tpu.wrap.verifier_r1cs import WrapVerifierR1CS
    wdata, _ = wrapped
    return WrapVerifierR1CS(wdata.common, wdata.verifier_only)


def test_r1cs_statement_satisfied(statement, wrapped):
    _, wproof = wrapped
    st = statement
    packed, z = st.solve(wproof)
    r1cs = st.b.build()
    print(f"r1cs: {len(r1cs.a)} constraints, {r1cs.num_vars} vars")
    assert r1cs.satisfied(z)


def test_r1cs_statement_rejects_tampered_proof(statement, wrapped):
    import copy
    _, wproof = wrapped
    st = statement
    bad = copy.copy(wproof)
    import dataclasses
    o = wproof.openings
    wires = np.array(o.wires)
    wires[0] = (wires[0] + 1) % np.uint64(2**64 - 2**32 + 1)
    bad.openings = dataclasses.replace(o, wires=wires)
    packed, z = st.solve(bad)
    assert not st.b.build().satisfied(z)


def test_r1cs_statement_rejects_wrong_public(statement, wrapped):
    _, wproof = wrapped
    st = statement
    packed, wvals = st.assign(wproof)
    packed = list(packed)
    packed[0] ^= 1 << 32        # flip a bit of PI word
    z = st.b.solve(packed, wvals)
    assert not st.b.build().satisfied(z)
