import pytest
"""Device-resident prover (prover_tpu.py) must produce BYTE-IDENTICAL proofs
to the host prover — same transcript, same openings, same FRI data.  Runs on
the CPU backend here; on real TPU hardware the same code path is the default
(prover.prove dispatches when jax.default_backend() == 'tpu')."""
import numpy as np

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk import prover, prover_tpu, verifier


def _build_circuit():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    xs = b.add_virtual_targets(8)
    h = b.hash_n_to_hash_no_pad(xs)
    bits = b.split_le(xs[0], 32)
    r = b.random_access(bits[0], [xs[0], xs[1], xs[2], xs[3]])
    e = b.is_equal(xs[4], xs[5])
    out = b.mul_add(r, e, h[0])
    b.register_public_inputs([out] + h)
    data = b.build()
    inputs = {t: np.uint64(i * 987654321 + 11) for i, t in enumerate(xs)}
    return data, inputs


def _assert_proofs_equal(p1, p2):
    assert np.array_equal(p1.wires_cap, p2.wires_cap)
    assert np.array_equal(p1.plonk_zs_partial_products_cap,
                          p2.plonk_zs_partial_products_cap)
    assert np.array_equal(p1.quotient_polys_cap, p2.quotient_polys_cap)
    for name in ("constants", "plonk_sigmas", "wires", "plonk_zs",
                 "plonk_zs_next", "partial_products", "quotient_polys"):
        assert np.array_equal(np.asarray(getattr(p1.openings, name)),
                              np.asarray(getattr(p2.openings, name))), name
    f1, f2 = p1.opening_proof, p2.opening_proof
    assert len(f1.commit_phase_merkle_caps) == len(f2.commit_phase_merkle_caps)
    for c1, c2 in zip(f1.commit_phase_merkle_caps, f2.commit_phase_merkle_caps):
        assert np.array_equal(c1, c2)
    assert np.array_equal(f1.final_poly, f2.final_poly)
    assert int(f1.pow_witness) == int(f2.pow_witness)
    for r1, r2 in zip(f1.query_round_proofs, f2.query_round_proofs):
        for (e1, s1), (e2, s2) in zip(r1.initial_trees_proof.evals_proofs,
                                      r2.initial_trees_proof.evals_proofs):
            assert np.array_equal(np.asarray(e1, dtype=np.uint64),
                                  np.asarray(e2, dtype=np.uint64))
            assert np.array_equal(s1, s2)
        for st1, st2 in zip(r1.steps, r2.steps):
            assert np.array_equal(st1.evals, st2.evals)
            assert np.array_equal(st1.siblings, st2.siblings)


@pytest.mark.heavy
def test_device_prover_matches_host_prover():
    data, inputs = _build_circuit()
    p_host = prover.prove(data, dict(inputs))
    p_dev = prover_tpu.prove(data, dict(inputs))
    _assert_proofs_equal(p_host, p_dev)
    assert verifier.verify(p_dev, data.verifier_only, data.common)


def test_device_prover_proof_verifies_standalone():
    data, inputs = _build_circuit()
    p = prover_tpu.prove(data, dict(inputs))
    assert verifier.verify(p, data.verifier_only, data.common)
