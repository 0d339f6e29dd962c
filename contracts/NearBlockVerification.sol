// SPDX-License-Identifier: MIT
pragma solidity ^0.8.24;

import {IGroth16Verifier} from "./IGroth16Verifier.sol";

/// @title NearBlockVerification
/// @notice On-chain registry of proven NEAR block hashes.
///
/// Functional equivalent of the reference's
/// contracts/foundry/verifier/src/NearBlockVerification.sol (SURVEY.md §2.9):
/// verify a Groth16 proof wrapping the BFT-finality statement and persist the
/// proven hashes.  Re-designed without the upgradeable-proxy machinery (plain
/// owner/pause), same external surface:
///   verifyAndSaveProof(uint256[4] input, uint256[8] proof)
///   isProofed(uint256[2]) / isProofedHash(bytes)
///
/// The 4 public inputs are the wrap layer's packing of 16 u32 transcript
/// words (zklc_tpu/wrap/api.py pack_public_inputs): inputs[0..1] = current
/// block hash (2 x 16 bytes big-endian), inputs[2..3] = epoch block hash.
///
/// NOTE: authored without a Solidity toolchain in this environment — not
/// compiled or forge-tested yet (see STATUS.md).
contract NearBlockVerification {
    IGroth16Verifier public verifier;
    address public owner;
    bool public paused;

    /// proven current-block hashes, keyed by the two packed PI words
    mapping(bytes32 => bool) private provenHashes;
    /// latest proven epoch checkpoint height (set off-chain via the
    /// orchestrator's epoch loop)
    uint256 public latestCheckpoint;
    /// per-height epoch hashes (epoch processor bookkeeping)
    mapping(uint256 => bytes32[2]) public epochHashesByHeight;

    event ProofVerifiedAndSaved(uint256[4] publicInputs, uint256[8] proof);
    event CompressedProofVerifiedAndSaved(
        uint256[4] publicInputs,
        uint256[4] compressedProof
    );
    event CheckpointUpdated(uint256 height);

    error NotOwner();
    error Paused();
    error InvalidProof();

    modifier onlyOwner() {
        if (msg.sender != owner) revert NotOwner();
        _;
    }

    modifier whenNotPaused() {
        if (paused) revert Paused();
        _;
    }

    constructor(IGroth16Verifier _verifier) {
        verifier = _verifier;
        owner = msg.sender;
    }

    function setPaused(bool p) external onlyOwner {
        paused = p;
    }

    function setVerifier(IGroth16Verifier v) external onlyOwner {
        verifier = v;
    }

    /// @notice Verify a wrapped BFT-finality proof and store the block hash.
    /// Reference surface: NearBlockVerification.sol:83.
    function verifyAndSaveProof(
        uint256[4] calldata input,
        uint256[8] calldata proof
    ) external whenNotPaused {
        if (!verifier.verifyProof(input, proof)) revert InvalidProof();
        provenHashes[_key(input[0], input[1])] = true;
        emit ProofVerifiedAndSaved(input, proof);
    }

    /// @notice 128-byte-calldata variant: verify a compressed proof and
    /// store the block hash (reference surface:
    /// NearBlockVerification.sol:102 verifyAndSaveCompressedProof).
    function verifyAndSaveCompressedProof(
        uint256[4] calldata input,
        uint256[4] calldata compressedProof
    ) external whenNotPaused {
        if (!verifier.verifyCompressedProof(compressedProof, input))
            revert InvalidProof();
        provenHashes[_key(input[0], input[1])] = true;
        emit CompressedProofVerifiedAndSaved(input, compressedProof);
    }

    /// @notice Query by the two packed PI words (reference :124).
    function isProofed(uint256[2] calldata hashWords)
        external
        view
        returns (bool)
    {
        return provenHashes[_key(hashWords[0], hashWords[1])];
    }

    /// @notice Query by the raw 32-byte NEAR block hash (reference :132):
    /// repack bytes into the two 16-byte big-endian PI words.
    function isProofedHash(bytes calldata blockHash)
        external
        view
        returns (bool)
    {
        require(blockHash.length == 32, "bad hash length");
        uint256 w0 = uint256(uint128(bytes16(blockHash[0:16])));
        uint256 w1 = uint256(uint128(bytes16(blockHash[16:32])));
        return provenHashes[_key(w0, w1)];
    }

    /// @notice Store proven epoch hashes + move the checkpoint
    /// (eth-helper.ts:420 saveEpochHashesAndSetCheckpoint counterpart).
    function saveEpochHashesAndSetCheckpoint(
        uint256 height,
        bytes32[2] calldata hashes
    ) external onlyOwner whenNotPaused {
        epochHashesByHeight[height] = hashes;
        if (height > latestCheckpoint) {
            latestCheckpoint = height;
            emit CheckpointUpdated(height);
        }
    }

    function _key(uint256 w0, uint256 w1) private pure returns (bytes32) {
        return keccak256(abi.encodePacked(w0, w1));
    }
}
