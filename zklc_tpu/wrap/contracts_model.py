"""Behavioral twin of the L7 contracts, bound to the real Groth16 verifier.

No Solidity toolchain exists in this image (no solc/forge/node), so the
contracts are validated the way the risc0 stack validates its guest — by an
executable model with the SAME semantics, driven by the same tests the
reference's forge suite runs (contracts/foundry/verifier/test/
NearBlockVerification.t.sol):

  * `Groth16VerifierModel.verify_proof` is wrap/groth16.verify — the exact
    pairing equation + bounds checks Verifier.sol delegates to precompile
    0x08 (the Python pairing IS the precompile's math);
  * `NearBlockVerificationModel` mirrors contracts/NearBlockVerification.sol
    line for line: owner/pause guards, keccak key of the two packed PI
    words, isProofed/isProofedHash, epoch checkpoint storage.

State-transition parity with the Solidity source is asserted in
tests/test_groth16.py.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from . import groth16 as G

from ..utils.keccak import keccak256 as _keccak256      # real Keccak-256


class NotOwner(Exception):
    pass


class ContractPaused(Exception):
    pass


class InvalidProof(Exception):
    pass


@dataclass
class Groth16VerifierModel:
    """Verifier.sol: vk constants + verifyProof via the pairing check."""
    vk: G.VerifyingKey

    def verify_proof(self, input4: list, proof8: list) -> bool:
        if len(input4) != 4 or len(proof8) != 8:
            raise InvalidProof("bad calldata shape")
        return G.verify(self.vk, list(proof8), list(input4))

    def verify_compressed_proof(self, compressed4: list,
                                input4: list) -> bool:
        """Verifier.sol verifyCompressedProof(uint256[4], uint256[4]):
        decompress (full on-curve validation), then the pairing check."""
        from . import compress as Z
        if len(input4) != 4 or len(compressed4) != 4:
            raise InvalidProof("bad calldata shape")
        try:
            proof8 = Z.decompress_proof(list(compressed4))
        except Z.CompressionError as e:
            raise InvalidProof(str(e)) from e
        return G.verify(self.vk, proof8, list(input4))

    def compress_proof(self, proof8: list) -> list:
        """Verifier.sol compressProof view helper."""
        from . import compress as Z
        try:
            return Z.compress_proof(list(proof8))
        except Z.CompressionError as e:
            raise InvalidProof(str(e)) from e


@dataclass
class NearBlockVerificationModel:
    """contracts/NearBlockVerification.sol state machine."""
    verifier: Groth16VerifierModel
    owner: str = "deployer"
    paused: bool = False
    proven: dict = field(default_factory=dict)
    epoch_hashes: dict = field(default_factory=dict)
    latest_checkpoint: int = 0
    events: list = field(default_factory=list)

    # -- modifiers ----------------------------------------------------------
    def _only_owner(self, sender):
        if sender != self.owner:
            raise NotOwner(sender)

    def _when_not_paused(self):
        if self.paused:
            raise ContractPaused()

    # -- external surface ----------------------------------------------------
    def set_paused(self, p: bool, sender: str):
        self._only_owner(sender)
        self.paused = p

    def verify_and_save_proof(self, input4, proof8, sender: str = "anyone"):
        self._when_not_paused()
        if not self.verifier.verify_proof(input4, proof8):
            raise InvalidProof()
        self.proven[self._key(input4[0], input4[1])] = True
        self.events.append(("ProofVerifiedAndSaved", tuple(input4)))

    def verify_and_save_compressed_proof(self, input4, compressed4,
                                         sender: str = "anyone"):
        """NearBlockVerification.sol:102 verifyAndSaveCompressedProof —
        the 128-byte-calldata entry point."""
        self._when_not_paused()
        if not self.verifier.verify_compressed_proof(compressed4, input4):
            raise InvalidProof()
        self.proven[self._key(input4[0], input4[1])] = True
        self.events.append(("CompressedProofVerifiedAndSaved",
                            tuple(input4)))

    def is_proofed(self, hash_words) -> bool:
        return self.proven.get(self._key(hash_words[0], hash_words[1]),
                               False)

    def is_proofed_hash(self, block_hash: bytes) -> bool:
        assert len(block_hash) == 32, "bad hash length"
        w0 = int.from_bytes(block_hash[:16], "big")
        w1 = int.from_bytes(block_hash[16:], "big")
        return self.is_proofed([w0, w1])

    def save_epoch_hashes_and_set_checkpoint(self, height: int, hashes,
                                             sender: str):
        self._only_owner(sender)
        self._when_not_paused()
        self.epoch_hashes[height] = tuple(hashes)
        if height > self.latest_checkpoint:
            self.latest_checkpoint = height
            self.events.append(("CheckpointUpdated", height))

    def get_epoch_hashes_by_height(self, height: int):
        """(previousHash, currentHash) bytes pair (eth-helper.ts:396)."""
        prev, cur = self.epoch_hashes[height]
        return bytes(prev), bytes(cur)

    @staticmethod
    def _key(w0: int, w1: int) -> bytes:
        return _keccak256(w0.to_bytes(32, "big") + w1.to_bytes(32, "big"))
