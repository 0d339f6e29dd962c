// SPDX-License-Identifier: MIT
pragma solidity ^0.8.24;

/// @title Groth16 BN254 verifier, 25 public inputs
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
/// GENERATED CONTRACT — verifying-key constants spliced by export_vk.
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
    uint256 constant ALPHA_X =
        4568681121570127943266433179387324283399164269897276031420465496926762958663;
    uint256 constant ALPHA_Y =
        21005971628851316602078591114953153914833679966177948012511668702962052049224;
    uint256 constant BETA_X_IM =
        18387002520603235051631320746610611495830622126333681533059966295363782015141;
    uint256 constant BETA_X_RE =
        19493973697688909904500163585207477563178469181708954103338932673440000824964;
    uint256 constant BETA_Y_IM =
        7977311610655566083517451632120826225418059469092555736763222466180804861339;
    uint256 constant BETA_Y_RE =
        17733704921032428671430534790356061653817434546803769787844834706352569163669;
    uint256 constant GAMMA_X_IM =
        12834230047558660404204420640918535718256835334180902548184096159619107427052;
    uint256 constant GAMMA_X_RE =
        8501954576934097762619652820667345223814113236655928162683586411217060463938;
    uint256 constant GAMMA_Y_IM =
        15301473464455976453350014621784324366859192545978633201525090331868575432652;
    uint256 constant GAMMA_Y_RE =
        306318709012698944556665645081334731825762524788828058257300276352826278778;
    uint256 constant DELTA_X_IM =
        2744256108851939484627590246531598256693736044876194071555505286222427004657;
    uint256 constant DELTA_X_RE =
        10788068294300421340166183255488382367482945464007398213734180972163753330761;
    uint256 constant DELTA_Y_IM =
        16495284975216554778692362896992763494752717499371010101523624146389880928938;
    uint256 constant DELTA_Y_RE =
        9125215819520572155460771051612938807331516977923036719277156952722493314185;
    // IC: 26 G1 points (constant term + 25 public inputs)
    uint256 constant IC0_X =
        4155136526628240601410685197164011796337119463094997432729960321706357658560;
    uint256 constant IC0_Y =
        20133866135626308349354212735725450526655182623332586535395274280952402683851;
    uint256 constant IC1_X =
        9958811042149439844111864448546115801947125500194386682966092522946538838207;
    uint256 constant IC1_Y =
        894354609506813739461231390939326814833505545606728918759288871327105901036;
    uint256 constant IC2_X =
        19420813584978995409084186139769737054396374943833735133257492873889755107856;
    uint256 constant IC2_Y =
        9370945977004825047395994513116417150853197198583908909908440174600609156535;
    uint256 constant IC3_X =
        1729854404053346720290651753383525705018325746361914405709324750419201761202;
    uint256 constant IC3_Y =
        17083036303864789252636542198753538553694495799018170899587503808999589509817;
    uint256 constant IC4_X =
        11833392237268036377811144043119513171486364625110137479793385148086555450656;
    uint256 constant IC4_Y =
        11042135300774651025403825398606367729735781753413134817865021948125948115869;
    uint256 constant IC5_X =
        17619283451875216045527450649211495536229089099796709516076673698005206104593;
    uint256 constant IC5_Y =
        12856211051676794648673246911594004784056589893530566535243340322382320319028;
    uint256 constant IC6_X =
        19182882579143239167289595610663337224211443560334614376102148662144378125909;
    uint256 constant IC6_Y =
        8693522448096165761417276280262290084460933827336151250081594720259049602693;
    uint256 constant IC7_X =
        21164096292660310926572768281305143437411964174115040507691851208333062057878;
    uint256 constant IC7_Y =
        16140180012134134551327403343734288525268430375622245051905493757734024137010;
    uint256 constant IC8_X =
        17532469642385044021300351800135079071632914670408079950385825016746726804421;
    uint256 constant IC8_Y =
        10185028047480737207811878493200464134674945956212736361320821061264718167881;
    uint256 constant IC9_X =
        3289964428574514133465783044568006533671252605325246163664032185904448971208;
    uint256 constant IC9_Y =
        19513461649461494686344123621070375895743274422589441768521094499869427248818;
    uint256 constant IC10_X =
        15506943087096944422718133231415579044301180699075240883733810383707993532434;
    uint256 constant IC10_Y =
        17402393545412491220629968742892604156866271599043565851549154727519227481002;
    uint256 constant IC11_X =
        11361931093887699291602247971936954773286932822483971667838273165470254554066;
    uint256 constant IC11_Y =
        10726934580186943253052585053207483880537694539873364332074077524599581512879;
    uint256 constant IC12_X =
        21830876724996321426391283105217352928645900832681719458745335555883387581385;
    uint256 constant IC12_Y =
        8875286213569770846597702734050867792082980867776348673898459981756630710460;
    uint256 constant IC13_X =
        7512324241359199069291556839438855842889100713712461628735546255009497591449;
    uint256 constant IC13_Y =
        1117931719420264553884004985991072301402226041620157858985738904814497485595;
    uint256 constant IC14_X =
        10415131808546456133846680297243728578522546023122955596924953068667777550118;
    uint256 constant IC14_Y =
        10845662295343208821339107395849733634911030143656987028377147742968993926964;
    uint256 constant IC15_X =
        2201531862790832912773808889599447554764062649156541620104382146659295168416;
    uint256 constant IC15_Y =
        18510963152372876433362904494803475228480010206819403179455027932970248399706;
    uint256 constant IC16_X =
        9709647856943709473642796190932745166099432370197438239881997819895141786816;
    uint256 constant IC16_Y =
        17721893696564517416512936109552793963542701083259627960302050126080908666426;
    uint256 constant IC17_X =
        1878319818317106484614395784573650579188714400476672298819428863358707511879;
    uint256 constant IC17_Y =
        10897765843961131578371801488842986136287026959906533971554012744447111000844;
    uint256 constant IC18_X =
        12600535945767009455735030781891230475536606869283978745694851877926759456099;
    uint256 constant IC18_Y =
        2526763783374621303077853301761926287082743673873678044636543630137301471012;
    uint256 constant IC19_X =
        3260617495390267290624993064252025224155774471836441417823038801492552249510;
    uint256 constant IC19_Y =
        14694741516895052315934757727586413880762648666731935868322767113247866337678;
    uint256 constant IC20_X =
        12507663547156436221924261331040282742475004296885393983179007091203504330756;
    uint256 constant IC20_Y =
        11351609571235437081131289949123677634598691877382841458936342808743363360325;
    uint256 constant IC21_X =
        5911496004349761091673856117923973839805050946308137286984578069703506142762;
    uint256 constant IC21_Y =
        2576254587086117903921710269380656333117087015898627332724604618764203470196;
    uint256 constant IC22_X =
        16439782013174379267656434470440747222547064108362577583599656675205645271873;
    uint256 constant IC22_Y =
        11210621851651057433549814056338570434699698468316587658122062684218761175170;
    uint256 constant IC23_X =
        8226211077173478120169073710629124983993300524557503699016151578191028749406;
    uint256 constant IC23_Y =
        14861448357912298233972182664910482629406409889838831420775676403701355635496;
    uint256 constant IC24_X =
        20065123874277529608924423210466421097376047734508753411393198353233260415322;
    uint256 constant IC24_Y =
        2269960111398714212103373478726975871208360657591681216617509680235285281440;
    uint256 constant IC25_X =
        2682900994242100203134611064235650037461013152212310327936059114238517521769;
    uint256 constant IC25_Y =
        9078615383404059820449828304203789578506722203799043557015423487248476536042;

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

    /// @notice verify a Groth16 proof with 25 public inputs
    function verifyProof(uint256[25] calldata input, uint256[8] calldata proof)
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
        uint256[25] calldata input
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

    function _verify(uint256[25] calldata input, uint256[8] memory proof)
        private
        view
        returns (bool)
    {
        // scalar bounds (the Solidity mirror of groth16.verify's checks)
        for (uint256 i = 0; i < 25; i++) {
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
        vkx = _g1Add(vkx, _g1Mul([IC5_X, IC5_Y], input[4]));
        vkx = _g1Add(vkx, _g1Mul([IC6_X, IC6_Y], input[5]));
        vkx = _g1Add(vkx, _g1Mul([IC7_X, IC7_Y], input[6]));
        vkx = _g1Add(vkx, _g1Mul([IC8_X, IC8_Y], input[7]));
        vkx = _g1Add(vkx, _g1Mul([IC9_X, IC9_Y], input[8]));
        vkx = _g1Add(vkx, _g1Mul([IC10_X, IC10_Y], input[9]));
        vkx = _g1Add(vkx, _g1Mul([IC11_X, IC11_Y], input[10]));
        vkx = _g1Add(vkx, _g1Mul([IC12_X, IC12_Y], input[11]));
        vkx = _g1Add(vkx, _g1Mul([IC13_X, IC13_Y], input[12]));
        vkx = _g1Add(vkx, _g1Mul([IC14_X, IC14_Y], input[13]));
        vkx = _g1Add(vkx, _g1Mul([IC15_X, IC15_Y], input[14]));
        vkx = _g1Add(vkx, _g1Mul([IC16_X, IC16_Y], input[15]));
        vkx = _g1Add(vkx, _g1Mul([IC17_X, IC17_Y], input[16]));
        vkx = _g1Add(vkx, _g1Mul([IC18_X, IC18_Y], input[17]));
        vkx = _g1Add(vkx, _g1Mul([IC19_X, IC19_Y], input[18]));
        vkx = _g1Add(vkx, _g1Mul([IC20_X, IC20_Y], input[19]));
        vkx = _g1Add(vkx, _g1Mul([IC21_X, IC21_Y], input[20]));
        vkx = _g1Add(vkx, _g1Mul([IC22_X, IC22_Y], input[21]));
        vkx = _g1Add(vkx, _g1Mul([IC23_X, IC23_Y], input[22]));
        vkx = _g1Add(vkx, _g1Mul([IC24_X, IC24_Y], input[23]));
        vkx = _g1Add(vkx, _g1Mul([IC25_X, IC25_Y], input[24]));

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
