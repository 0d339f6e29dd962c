"""Proof object model (mirrors plonky2's proof structure / the JSON schema
parsed by gnark-plonky2-verifier/variables/deserialize.go)."""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class OpeningSet:
    constants: np.ndarray        # (num_constants, 2) — incl. lookup s/tables
    plonk_sigmas: np.ndarray     # (num_routed_wires, 2)
    wires: np.ndarray            # (num_wire_polys, 2) — incl. multiplicities
    plonk_zs: np.ndarray         # (num_challenges, 2)
    plonk_zs_next: np.ndarray    # (num_challenges, 2)
    partial_products: np.ndarray  # (num_challenges * num_partial_products, 2)
    quotient_polys: np.ndarray   # (num_challenges * quotient_degree_factor, 2)
    lookups: np.ndarray = None   # (num_challenges * lookup_block, 2) at zeta
    lookup_zs_next: np.ndarray = None  # (num_challenges, 2) at g*zeta

    def fri_batch_zeta(self) -> np.ndarray:
        """Opening order for the zeta batch: matches the oracle concat order
        [constants_sigmas | wires | zs_partial_products(+lookup) | quotient]
        (fri.go ToOpenings, extended with the LogUp block)."""
        parts = [self.constants, self.plonk_sigmas, self.wires,
                 self.plonk_zs, self.partial_products]
        if self.lookups is not None and len(self.lookups):
            parts.append(self.lookups)
        parts.append(self.quotient_polys)
        return np.concatenate(parts, axis=0)

    def fri_batch_zeta_next(self) -> np.ndarray:
        if self.lookup_zs_next is not None and len(self.lookup_zs_next):
            return np.concatenate([self.plonk_zs_next, self.lookup_zs_next],
                                  axis=0)
        return self.plonk_zs_next


@dataclass
class FriQueryStep:
    evals: np.ndarray            # (arity, 2) ext values of the coset
    siblings: np.ndarray         # (depth, 4)


@dataclass
class FriInitialTreeProof:
    # per oracle: (leaf_values (num_polys,), siblings (depth, 4))
    evals_proofs: list


@dataclass
class FriQueryRound:
    initial_trees_proof: FriInitialTreeProof
    steps: list


@dataclass
class FriProof:
    commit_phase_merkle_caps: list   # [(2^cap, 4) u64]
    query_round_proofs: list         # [FriQueryRound]
    final_poly: np.ndarray           # (m, 2) ext coeffs
    pow_witness: int


@dataclass
class Proof:
    wires_cap: np.ndarray
    plonk_zs_partial_products_cap: np.ndarray
    quotient_polys_cap: np.ndarray
    openings: OpeningSet
    opening_proof: FriProof
    public_inputs: np.ndarray        # (num_pis,) u64


@dataclass
class ProofChallenges:
    plonk_betas: list
    plonk_gammas: list
    plonk_alphas: list
    plonk_zeta: np.ndarray           # (2,)
    fri_alpha: np.ndarray            # (2,)
    fri_betas: list                  # [(2,)]
    fri_pow_response: int
    fri_query_indices: list
    plonk_deltas: list = None    # LogUp challenges (lookup circuits only)
