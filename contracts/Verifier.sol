// SPDX-License-Identifier: MIT
pragma solidity ^0.8.24;

/// @title Groth16 BN254 verifier, 4 public inputs
/// @notice Equivalent of the reference's generated verifier
/// (contracts/foundry/verifier/src/Verifier.sol, 549 LoC) re-authored for
/// the zklc_tpu wrap pipeline: checks the Groth16 pairing equation
///   e(-A, B) * e(alpha, beta) * e(vk_x, gamma) * e(C, delta) == 1
/// over alt_bn128 via the EIP-196/197 precompiles (0x06 add, 0x07 mul,
/// 0x08 pairing).  Proof layout matches zklc_tpu/wrap/groth16.py
/// encode_proof: [A.x, A.y, B.x_im, B.x_re, B.y_im, B.y_re, C.x, C.y].
///
/// The verifying-key constants are emitted by
/// `python -m zklc_tpu.bins.export_vk` from a groth16.VerifyingKey; the
/// placeholder zeros below MUST be replaced at deployment time.
///
/// Behavioral twin: zklc_tpu/contracts sim (tests/test_groth16.py drives
/// the SAME pairing equation + bounds checks through wrap/groth16.verify —
/// no Solidity toolchain exists in this environment; see STATUS.md).
contract Verifier {
    // BN254 base and scalar field moduli
    uint256 constant P =
        21888242871839275222246405745257275088696311157297823662689037894645226208583;
    uint256 constant R =
        21888242871839275222246405745257275088548364400416034343698204186575808495617;

    // verifying key (deployment-time constants)
    uint256 constant ALPHA_X = 0;
    uint256 constant ALPHA_Y = 0;
    uint256 constant BETA_X_IM = 0;
    uint256 constant BETA_X_RE = 0;
    uint256 constant BETA_Y_IM = 0;
    uint256 constant BETA_Y_RE = 0;
    uint256 constant GAMMA_X_IM = 0;
    uint256 constant GAMMA_X_RE = 0;
    uint256 constant GAMMA_Y_IM = 0;
    uint256 constant GAMMA_Y_RE = 0;
    uint256 constant DELTA_X_IM = 0;
    uint256 constant DELTA_X_RE = 0;
    uint256 constant DELTA_Y_IM = 0;
    uint256 constant DELTA_Y_RE = 0;
    // IC: 5 G1 points (constant term + 4 public inputs)
    uint256 constant IC0_X = 0;
    uint256 constant IC0_Y = 0;
    uint256 constant IC1_X = 0;
    uint256 constant IC1_Y = 0;
    uint256 constant IC2_X = 0;
    uint256 constant IC2_Y = 0;
    uint256 constant IC3_X = 0;
    uint256 constant IC3_Y = 0;
    uint256 constant IC4_X = 0;
    uint256 constant IC4_Y = 0;

    error InvalidProof();
    error InvalidInput();

    /// @notice verify a Groth16 proof with 4 public inputs
    function verifyProof(uint256[4] calldata input, uint256[8] calldata proof)
        external
        view
        returns (bool)
    {
        // scalar bounds (the Solidity mirror of groth16.verify's checks)
        for (uint256 i = 0; i < 4; i++) {
            if (input[i] >= R) revert InvalidInput();
        }
        for (uint256 i = 0; i < 8; i++) {
            if (proof[i] >= P) revert InvalidProof();
        }

        // vk_x = IC0 + sum input[i] * IC(i+1)   (precompiles 0x06/0x07)
        uint256[2] memory vkx = [IC0_X, IC0_Y];
        vkx = _g1Add(vkx, _g1Mul([IC1_X, IC1_Y], input[0]));
        vkx = _g1Add(vkx, _g1Mul([IC2_X, IC2_Y], input[1]));
        vkx = _g1Add(vkx, _g1Mul([IC3_X, IC3_Y], input[2]));
        vkx = _g1Add(vkx, _g1Mul([IC4_X, IC4_Y], input[3]));

        // pairing product: e(-A,B) e(alpha,beta) e(vkx,gamma) e(C,delta)
        uint256[24] memory pairs;
        // -A, B
        pairs[0] = proof[0];
        pairs[1] = proof[1] == 0 ? 0 : P - proof[1];
        pairs[2] = proof[2];
        pairs[3] = proof[3];
        pairs[4] = proof[4];
        pairs[5] = proof[5];
        // alpha, beta
        pairs[6] = ALPHA_X;
        pairs[7] = ALPHA_Y;
        pairs[8] = BETA_X_IM;
        pairs[9] = BETA_X_RE;
        pairs[10] = BETA_Y_IM;
        pairs[11] = BETA_Y_RE;
        // vk_x, gamma
        pairs[12] = vkx[0];
        pairs[13] = vkx[1];
        pairs[14] = GAMMA_X_IM;
        pairs[15] = GAMMA_X_RE;
        pairs[16] = GAMMA_Y_IM;
        pairs[17] = GAMMA_Y_RE;
        // C, delta
        pairs[18] = proof[6];
        pairs[19] = proof[7];
        pairs[20] = DELTA_X_IM;
        pairs[21] = DELTA_X_RE;
        pairs[22] = DELTA_Y_IM;
        pairs[23] = DELTA_Y_RE;

        uint256[1] memory out;
        bool ok;
        assembly {
            ok := staticcall(gas(), 0x08, pairs, 768, out, 32)
        }
        if (!ok) revert InvalidProof();
        return out[0] == 1;
    }

    function _g1Add(uint256[2] memory a, uint256[2] memory b)
        private
        view
        returns (uint256[2] memory out)
    {
        uint256[4] memory inp = [a[0], a[1], b[0], b[1]];
        bool ok;
        assembly {
            ok := staticcall(gas(), 0x06, inp, 128, out, 64)
        }
        if (!ok) revert InvalidProof();
    }

    function _g1Mul(uint256[2] memory a, uint256 s)
        private
        view
        returns (uint256[2] memory out)
    {
        uint256[3] memory inp = [a[0], a[1], s];
        bool ok;
        assembly {
            ok := staticcall(gas(), 0x07, inp, 96, out, 64)
        }
        if (!ok) revert InvalidProof();
    }
}
