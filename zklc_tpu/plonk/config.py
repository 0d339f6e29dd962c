"""Circuit / FRI configuration presets.

Mirrors plonky2's `CircuitConfig` presets used by the reference pipeline:
`standard_recursion_config` for SHA-256/recursion/primitive circuits and
`wide_ecc_config` for ed25519 (SURVEY.md §5 "Config / flag system"; exact
standard-recursion parameters cross-checked against
gnark-plonky2-verifier/testdata/test_circuit/common_circuit_data.json).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class FriConfig:
    rate_bits: int = 3
    cap_height: int = 4
    proof_of_work_bits: int = 16
    # ConstantArityBits reduction strategy
    arity_bits: int = 4
    final_poly_bits: int = 5
    num_query_rounds: int = 28

    def reduction_arity_bits(self, degree_bits: int) -> list[int]:
        """plonky2 ReductionStrategy::ConstantArityBits semantics."""
        out = []
        d = degree_bits
        while d > self.final_poly_bits and \
                d + self.rate_bits - self.arity_bits >= self.cap_height:
            assert d >= self.arity_bits
            out.append(self.arity_bits)
            d -= self.arity_bits
        return out


@dataclass(frozen=True)
class FriParams:
    config: FriConfig
    degree_bits: int
    reduction_arity_bits: tuple

    @property
    def lde_bits(self) -> int:
        return self.degree_bits + self.config.rate_bits

    @property
    def lde_size(self) -> int:
        return 1 << self.lde_bits

    @property
    def final_poly_len(self) -> int:
        return 1 << (self.degree_bits - sum(self.reduction_arity_bits))


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int = 135
    num_routed_wires: int = 80
    num_constants: int = 2
    use_base_arithmetic_gate: bool = True
    security_bits: int = 100
    num_challenges: int = 2
    zero_knowledge: bool = False
    max_quotient_degree_factor: int = 8
    fri_config: FriConfig = field(default_factory=FriConfig)
    lookup: object = None        # plonk.lookup.LookupConfig | None
    # transcript/Merkle hasher: "gl" (PoseidonGoldilocksConfig) or "bn128"
    # (PoseidonBN128GoldilocksConfig outer hash, plonky2_bn128 config.rs:21)
    hasher: str = "gl"

    @staticmethod
    def standard_recursion_config() -> "CircuitConfig":
        return CircuitConfig()

    @staticmethod
    def bn128_wrap_config() -> "CircuitConfig":
        """The final-wrap config (used once, bin/prove_block.rs:279-300):
        standard recursion parameters with the BN254-Fr outer transcript so
        the gnark circuit verifies ~one native permutation per absorb."""
        return CircuitConfig(hasher="bn128")

    @staticmethod
    def fr_wrap_config() -> "CircuitConfig":
        """The in-repo-Groth16 wrap flavor: BN254-native transcript
        (hash.poseidon_bn128.FrChallenger) + Fr Merkle caps, with FRI
        parameters chosen to MINIMIZE THE R1CS VERIFIER (wrap/verifier_r1cs):
        high rate -> few queries, small arity -> cheap in-circuit coset
        interpolation, tall caps -> short Merkle paths, tiny PoW (query
        count carries the security budget: 12 x 8 + 8 = 104 bits).  The
        "bn128" flavor remains the gnark-compatible one."""
        return CircuitConfig(
            hasher="fr",
            fri_config=FriConfig(rate_bits=8, cap_height=5,
                                 proof_of_work_bits=8, arity_bits=2,
                                 final_poly_bits=5, num_query_rounds=12))

    @staticmethod
    def standard_ecc_config() -> "CircuitConfig":
        return CircuitConfig(num_wires=136)

    @staticmethod
    def wide_ecc_config() -> "CircuitConfig":
        return CircuitConfig(num_wires=234)

    @staticmethod
    def wide_lookup_config() -> "CircuitConfig":
        """Wide config with LogUp lanes sized for the one-row foreign-field
        mul gate (the TPU-native replacement of the reference's u32-limb
        nonnative stack): 110 16-bit lanes + 30 6-bit carry-high lanes at
        the top of the 234-wire space."""
        from .lookup import LookupConfig
        return CircuitConfig(
            num_wires=234,
            lookup=LookupConfig(tables=(16, 6), lanes=(110, 30)))

    @staticmethod
    def standard_lookup_config() -> "CircuitConfig":
        """Standard-width config with a 16-bit lookup table and 24 lanes —
        for u32-heavy hash circuits (SHA-256/512) once their gates use
        lookup lanes for range pieces."""
        from .lookup import LookupConfig
        return CircuitConfig(
            num_wires=135,
            lookup=LookupConfig(tables=(16,), lanes=(24,)))

    def fri_params(self, degree_bits: int) -> FriParams:
        return FriParams(
            config=self.fri_config,
            degree_bits=degree_bits,
            reduction_arity_bits=tuple(
                self.fri_config.reduction_arity_bits(degree_bits)),
        )
