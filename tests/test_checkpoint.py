"""Stage-checkpoint store tests (plonk/checkpoint.py).

The reference has no intra-proof checkpointing (SURVEY.md §5 — a crash
restarts the whole block proof, bin/prove_block.rs); the framework adds a
per-stage proof store so the pipeline resumes across interrupted runs.
These tests cover: miss -> prove+persist, hit -> verified reuse, reuse
feeding recursion (digest unpacking round-trip), corrupt/stale checkpoint
rejection, and the no-store passthrough.
"""
import json
import os

import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk import prover, checkpoint
from zklc_tpu.plonk.witness import generate_witness
from zklc_tpu.plonk.testing import check_constraints
from zklc_tpu.plonk.recursion import RecursiveVerifier, recursive_proof_circuit

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def circuit():
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    z = b.mul_add(x, y, x)
    for t in (x, y, z):
        b.register_public_input(t)
    return b.build(), (x, y)


@pytest.fixture(autouse=True)
def _clear_store():
    yield
    checkpoint.set_store(None)


def test_miss_then_hit(circuit, tmp_path):
    data, (x, y) = circuit
    store = checkpoint.CheckpointStore(str(tmp_path))
    p1 = store.prove("stage_a", data, {x: 3, y: 4})
    assert store.misses == 1 and store.hits == 0
    assert os.path.exists(tmp_path / "stage_a.json")
    p2 = store.prove("stage_a", data, {x: 3, y: 4})
    assert store.hits == 1
    assert [int(v) for v in p2.public_inputs] == [3, 4, 15]
    assert np.array_equal(p1.public_inputs, p2.public_inputs)


def test_reused_proof_feeds_recursion(circuit, tmp_path):
    """A checkpoint-loaded proof must satisfy the recursive verifier —
    exercises the packed-int -> 4-limb digest unpacking."""
    data, (x, y) = circuit
    store = checkpoint.CheckpointStore(str(tmp_path))
    store.prove("stage_a", data, {x: 3, y: 4})
    loaded = store.prove("stage_a", data, {x: 3, y: 4})
    prover.ensure_constants_sigmas_commitment(data)
    rb, pt = recursive_proof_circuit(data.common, data.verifier_only)
    rdata = rb.build()
    inputs = {}
    RecursiveVerifier.set_proof_targets(pt, loaded, inputs)
    wr = generate_witness(rdata, inputs)
    check_constraints(rdata, wr)
    assert [int(wr.get(t)) for t in rdata.public_input_targets] == [3, 4, 15]


def test_corrupt_checkpoint_reproves(circuit, tmp_path):
    data, (x, y) = circuit
    store = checkpoint.CheckpointStore(str(tmp_path))
    store.prove("stage_a", data, {x: 3, y: 4})
    path = tmp_path / "stage_a.json"
    doc = json.loads(path.read_text())
    doc["public_inputs"][2] = 16                   # tamper
    path.write_text(json.dumps(doc))
    p = store.prove("stage_a", data, {x: 3, y: 4})
    assert store.misses == 2 and store.hits == 0   # tampered copy rejected
    assert [int(v) for v in p.public_inputs] == [3, 4, 15]
    assert os.path.exists(str(path) + ".stale")


def test_unparsable_checkpoint_reproves(circuit, tmp_path):
    data, (x, y) = circuit
    store = checkpoint.CheckpointStore(str(tmp_path))
    (tmp_path / "stage_a.json").write_text("{not json")
    p = store.prove("stage_a", data, {x: 3, y: 4})
    assert store.misses == 1
    assert [int(v) for v in p.public_inputs] == [3, 4, 15]


def test_global_prove_passthrough(circuit):
    """No active store (or key=None): checkpoint.prove == prover.prove."""
    data, (x, y) = circuit
    checkpoint.set_store(None)
    p = checkpoint.prove("ignored", data, {x: 5, y: 6})
    assert [int(v) for v in p.public_inputs] == [5, 6, 35]


def test_pipeline_keys_resume(circuit, tmp_path):
    """With an active global store, keyed proves persist and a second run
    reuses them (the real_bft_prove.py resume path)."""
    data, (x, y) = circuit
    store = checkpoint.CheckpointStore(str(tmp_path))
    checkpoint.set_store(store)
    checkpoint.prove("hdr_abc_finality", data, {x: 3, y: 4})
    checkpoint.prove("hdr_abc_finality", data, {x: 3, y: 4})
    assert store.misses == 1 and store.hits == 1
