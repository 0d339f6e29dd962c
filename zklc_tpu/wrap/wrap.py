"""BN128-transcript wrap of a Goldilocks-transcript proof.

Equivalent of bin/prove_block.rs:279-300: the final pipeline proof is
re-proven once under `PoseidonBN128GoldilocksConfig` (crypto/plonky2_bn128/
src/config.rs:21) — a standard recursion circuit that verifies the inner
GL-Poseidon proof in-circuit and re-registers its public inputs, but whose
OWN commitments and Fiat-Shamir transcript hash in BN254-Fr so the gnark
Groth16 circuit (gnark-plonky2-verifier) verifies the transcript with
native-field permutations.

The wrap circuit is restricted to the gnark-supported gate set (the 16
evaluators under gnark-plonky2-verifier/plonk/gates/) — the recursion
gadget only emits core gates; `assert_gnark_gate_set` enforces it.
"""
from __future__ import annotations

from ..plonk import prover
from ..plonk.config import CircuitConfig
from ..plonk.recursion import RecursiveVerifier, recursive_proof_circuit

# gate id prefixes gnark's evaluate_gates.go registry can evaluate
GNARK_GATES = (
    "ArithmeticGate", "ArithmeticExtensionGate", "BaseSumGate",
    "ConstantGate", "CosetInterpolationGate", "ExponentiationGate",
    "MulExtensionGate", "MultiplicationExtensionGate", "NoopGate",
    "PoseidonGate", "PoseidonMdsGate", "PublicInputGate",
    "RandomAccessGate", "ReducingGate", "ReducingExtensionGate",
)


def assert_gnark_gate_set(common) -> None:
    for g in common.gate_types:
        name = g.id().split("{")[0].split("(")[0].strip()
        if name not in GNARK_GATES:
            raise ValueError(
                f"wrap circuit uses gate {name!r} with no gnark evaluator "
                f"(gnark-plonky2-verifier/plonk/gates/)")


_wrap_cache: dict = {}


def wrap_proof(inner_data, inner_proof, ckpt_key: str | None = None):
    """Produce the BN128-transcript wrap of (inner_data, inner_proof).

    Returns (wrap_data, wrap_proof); the wrap proof's public inputs are the
    inner proof's, re-registered (prove_block.rs:293-299 passes
    Some(&proof.public_inputs)).  Verify with wrap.gnark_oracle.GnarkOracle
    — the CPU replay of the gnark circuit that will consume it.

    With an active checkpoint store and a key, the wrap proof persists and
    resumes like every other pipeline stage (oracle-verified on load).
    """
    from ..plonk import checkpoint
    prover.ensure_constants_sigmas_commitment(inner_data)
    key = id(inner_data)
    if key not in _wrap_cache:
        b, pt = recursive_proof_circuit(
            inner_data.common, inner_data.verifier_only,
            config=CircuitConfig.bn128_wrap_config())
        data = b.build()
        assert_gnark_gate_set(data.common)
        _wrap_cache[key] = (data, pt)
    data, pt = _wrap_cache[key]
    inputs: dict = {}
    RecursiveVerifier.set_proof_targets(pt, inner_proof, inputs)
    proof = checkpoint.prove(ckpt_key, data, inputs)
    return data, proof


def wrap_and_verify(inner_data, inner_proof):
    """Wrap + self-check under the in-repo gnark oracle (JSON round-trip
    through the exact artifact schema the Go wrapper parses)."""
    from ..plonk import serialization as S
    from .gnark_oracle import GnarkOracle
    data, proof = wrap_proof(inner_data, inner_proof)
    pj = S.proof_to_json(proof, data.common)
    vj = S.verifier_only_to_json(data.verifier_only)
    cj = S.common_data_to_json(data.common)
    assert GnarkOracle(cj).verify(pj, vj)
    return data, proof
