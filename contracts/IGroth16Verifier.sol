// SPDX-License-Identifier: MIT
pragma solidity ^0.8.24;

/// @notice Interface of the generated BN254 Groth16 verifier with 4 public
/// inputs (the reference's contracts/foundry/verifier/src/Verifier.sol is a
/// gnark-generated instance of this shape; the concrete verifier is emitted
/// by the wrap layer's trusted setup and dropped in next to this interface).
interface IGroth16Verifier {
    function verifyProof(
        uint256[4] calldata input,
        uint256[8] calldata proof
    ) external view returns (bool);

    function verifyCompressedProof(
        uint256[4] calldata compressedProof,
        uint256[4] calldata input
    ) external view returns (bool);

    function compressProof(uint256[8] calldata proof)
        external
        view
        returns (uint256[4] memory);
}
