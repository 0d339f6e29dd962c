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

    // compressed-format constants (Verifier.sol:102,197-360 of the
    // reference generator — the 2π.com/23/bn254-compression encoding)
    uint256 constant EXP_SQRT =
        5472060717959818805561601436314318772174077789324455915672259473661306552146; // (P+1)/4
    uint256 constant EXP_LEGENDRE =
        10944121435919637611123202872628637544348155578648911831344518947322613104291; // (P-1)/2
    uint256 constant FRACTION_27_82_FP =
        19485874751759354771024239261021720505790618469301721065564631296452457478373; // 27/82
    uint256 constant FRACTION_3_82_FP =
        21621313080719284060999498358119991246151234191964923374119659383734918571893; // 3/82
    uint256 constant FRACTION_1_2_FP =
        10944121435919637611123202872628637544348155578648911831344518947322613104292; // 1/2

    error InvalidProof();
    error InvalidInput();

    /// @notice verify a Groth16 proof with 4 public inputs
    function verifyProof(uint256[4] calldata input, uint256[8] calldata proof)
        external
        view
        returns (bool)
    {
        return _verify(input, proof);
    }

    /// @notice verify a 128-byte compressed proof (A, B, C compressed to
    /// x-coordinates + sign/hint bits); decompression fully validates the
    /// points are on curve before the pairing check.
    function verifyCompressedProof(
        uint256[4] calldata compressedProof,
        uint256[4] calldata input
    ) external view returns (bool) {
        return _verify(input, _decompressProof(compressedProof));
    }

    /// @notice compress an uncompressed proof (view helper for callers)
    function compressProof(uint256[8] calldata proof)
        external
        view
        returns (uint256[4] memory compressed)
    {
        (uint256 c0, uint256 c1) =
            _compressG2(proof[3], proof[2], proof[5], proof[4]);
        compressed[0] = _compressG1(proof[0], proof[1]);
        compressed[1] = c0;
        compressed[2] = c1;
        compressed[3] = _compressG1(proof[6], proof[7]);
    }

    function _verify(uint256[4] calldata input, uint256[8] memory proof)
        private
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

    // ---- compressed-format helpers (modexp precompile 0x05) ------------

    function _modExp(uint256 base, uint256 exponent)
        private
        view
        returns (uint256 out)
    {
        uint256[6] memory inp = [uint256(32), 32, 32, base, exponent, P];
        uint256[1] memory o;
        bool ok;
        assembly {
            ok := staticcall(gas(), 0x05, inp, 192, o, 32)
        }
        if (!ok) revert InvalidProof();
        out = o[0];
    }

    /// sqrt in Fp; reverts via InvalidProof when no root exists
    function _sqrtFp(uint256 a) private view returns (uint256 x) {
        x = _modExp(a, EXP_SQRT);
        if (mulmod(x, x, P) != a % P) revert InvalidProof();
    }

    function _isSquareFp(uint256 a) private view returns (bool) {
        uint256 l = _modExp(a % P, EXP_LEGENDRE);
        return l == 0 || l == 1;
    }

    /// sqrt of a0 + a1*i in Fp[i]/(i^2+1); the hint bit selects the
    /// branch of d = ±sqrt(a0^2 + a1^2) used at compression time
    function _sqrtFp2(uint256 a0, uint256 a1, bool hint)
        private
        view
        returns (uint256 x0, uint256 x1)
    {
        uint256 d = _sqrtFp(addmod(mulmod(a0, a0, P), mulmod(a1, a1, P), P));
        if (hint) d = P - d;
        x0 = _sqrtFp(mulmod(addmod(a0, d, P), FRACTION_1_2_FP, P));
        x1 = x0 == 0
            ? 0
            : mulmod(a1, _modExp(mulmod(2, x0, P), P - 2), P);
        if (
            addmod(mulmod(x0, x0, P), P - mulmod(x1, x1, P), P) != a0 % P ||
            mulmod(2, mulmod(x0, x1, P), P) != a1 % P
        ) revert InvalidProof();
    }

    function _compressG1(uint256 x, uint256 y) private view returns (uint256 c) {
        if (x >= P || y >= P) revert InvalidProof();
        if (x == 0 && y == 0) return 0;
        uint256 yPos = _sqrtFp(addmod(mulmod(mulmod(x, x, P), x, P), 3, P));
        if (y == yPos) return x << 1;
        if (y == P - yPos) return (x << 1) | 1;
        revert InvalidProof();
    }

    function _decompressG1(uint256 c) private view returns (uint256 x, uint256 y) {
        if (c == 0) return (0, 0);
        x = c >> 1;
        if (x >= P) revert InvalidProof();
        y = _sqrtFp(addmod(mulmod(mulmod(x, x, P), x, P), 3, P));
        if (c & 1 == 1) y = P - y;
    }

    /// y^2 = x^3 + 3/(9+i) over Fp2 — right-hand-side components
    function _g2Rhs(uint256 x0, uint256 x1)
        private
        pure
        returns (uint256 y0, uint256 y1)
    {
        uint256 n3ab = mulmod(mulmod(x0, x1, P), P - 3, P);
        y0 = addmod(
            FRACTION_27_82_FP,
            addmod(mulmod(mulmod(x0, x0, P), x0, P), mulmod(n3ab, x1, P), P),
            P
        );
        y1 = P - addmod(
            FRACTION_3_82_FP,
            addmod(mulmod(mulmod(x1, x1, P), x1, P), mulmod(n3ab, x0, P), P),
            P
        );
        if (y1 == P) y1 = 0;
    }

    function _compressG2(uint256 x0, uint256 x1, uint256 y0, uint256 y1)
        private
        view
        returns (uint256 c0, uint256 c1)
    {
        if (x0 >= P || x1 >= P || y0 >= P || y1 >= P) revert InvalidProof();
        if ((x0 | x1 | y0 | y1) == 0) return (0, 0);
        (uint256 r0, uint256 r1) = _g2Rhs(x0, x1);
        uint256 d = _sqrtFp(addmod(mulmod(r0, r0, P), mulmod(r1, r1, P), P));
        bool hint = !_isSquareFp(mulmod(addmod(r0, d, P), FRACTION_1_2_FP, P));
        (r0, r1) = _sqrtFp2(_g2Rhs2_0(x0, x1), _g2Rhs2_1(x0, x1), hint);
        if (y0 == r0 && y1 == r1) return ((x0 << 2) | (hint ? 2 : 0), x1);
        if (y0 == (P - r0) % P && y1 == (P - r1) % P)
            return ((x0 << 2) | (hint ? 2 : 0) | 1, x1);
        revert InvalidProof();
    }

    function _g2Rhs2_0(uint256 x0, uint256 x1) private pure returns (uint256 r) {
        (r, ) = _g2Rhs(x0, x1);
    }

    function _g2Rhs2_1(uint256 x0, uint256 x1) private pure returns (uint256 r) {
        (, r) = _g2Rhs(x0, x1);
    }

    function _decompressG2(uint256 c0, uint256 c1)
        private
        view
        returns (uint256 x0, uint256 x1, uint256 y0, uint256 y1)
    {
        if (c0 == 0 && c1 == 0) return (0, 0, 0, 0);
        x0 = c0 >> 2;
        x1 = c1;
        if (x0 >= P || x1 >= P) revert InvalidProof();
        (y0, y1) = _sqrtFp2(_g2Rhs2_0(x0, x1), _g2Rhs2_1(x0, x1), c0 & 2 == 2);
        if (c0 & 1 == 1) {
            y0 = y0 == 0 ? 0 : P - y0;
            y1 = y1 == 0 ? 0 : P - y1;
        }
    }

    /// uint256[4] -> the uint256[8] wire layout
    /// [A.x, A.y, B.x_im, B.x_re, B.y_im, B.y_re, C.x, C.y]
    function _decompressProof(uint256[4] calldata compressed)
        private
        view
        returns (uint256[8] memory proof)
    {
        (proof[0], proof[1]) = _decompressG1(compressed[0]);
        (uint256 bxr, uint256 bxi, uint256 byr, uint256 byi) =
            _decompressG2(compressed[1], compressed[2]);
        proof[2] = bxi;
        proof[3] = bxr;
        proof[4] = byi;
        proof[5] = byr;
        (proof[6], proof[7]) = _decompressG1(compressed[3]);
    }
}
