"""Execute a generated Verifier.sol AS WRITTEN, without a Solidity
toolchain.

The environment has no solc/forge (STATUS.md), so the deployable contract
emitted by bins/export_vk cannot be compiled here.  The next-best rigor —
VERDICT r3 next #8's fallback — is to interpret the CONTRACT TEXT itself:
this module parses the generated source (constants, the vk_x accumulation,
the pairs[] layout feeding precompile 0x08, the bounds checks) and
executes that parsed program against the in-repo BN254 implementation
(wrap/bn254.py, the behavioral model of precompiles 0x06/0x07/0x08).

What this catches that a vk.json-level check cannot: constant-splicing
bugs, IM/RE coordinate-order swaps in the emitted text, wrong IC wiring in
the accumulation lines, pairs[] layout mistakes, missing bounds checks —
i.e. every failure mode of the *generator*, since the program executed is
the one recovered from the emitted text, not the one we meant to emit.
"""
from __future__ import annotations

import re

from . import bn254 as C

R = 21888242871839275222246405745257275088548364400416034343698204186575808495617


class SolError(Exception):
    """Mirror of the contract's revert reasons."""


def _parse_constants(src: str) -> dict:
    out = {}
    for m in re.finditer(
            r"uint256 constant (\w+) =\s*\n?\s*(\d+);", src):
        out[m.group(1)] = int(m.group(2))
    return out


def _parse_vkx_program(src: str) -> list:
    """[(ic_x_name, ic_y_name, input_index), ...] in source order."""
    prog = []
    for m in re.finditer(
            r"vkx = _g1Add\(vkx, _g1Mul\(\[(\w+), (\w+)\], "
            r"input\[(\d+)\]\)\);", src):
        prog.append((m.group(1), m.group(2), int(m.group(3))))
    return prog


def _parse_pairs_program(src: str) -> list:
    """pairs[i] = <expr>;  for i in 0..24, exprs as source strings."""
    exprs = {}
    for m in re.finditer(r"pairs\[(\d+)\] = ([^;]+);", src):
        exprs[int(m.group(1))] = m.group(2).strip()
    if sorted(exprs) != list(range(24)):
        raise SolError(f"pairs[] layout incomplete: {sorted(exprs)}")
    return [exprs[i] for i in range(24)]


def _eval_expr(expr: str, env: dict) -> int:
    """Evaluate the tiny expression language of the pairs block:
    names, proof[i], vkx[i], and the A-negation conditional."""
    expr = expr.strip()
    m = re.fullmatch(r"proof\[(\d+)\] == 0 \? 0 : P - proof\[(\d+)\]", expr)
    if m:
        v = env["proof"][int(m.group(1))]
        assert m.group(1) == m.group(2)
        return 0 if v == 0 else C.P - v
    m = re.fullmatch(r"proof\[(\d+)\]", expr)
    if m:
        return env["proof"][int(m.group(1))]
    m = re.fullmatch(r"vkx\[(\d+)\]", expr)
    if m:
        return env["vkx"][int(m.group(1))]
    if expr in env["constants"]:
        return env["constants"][expr]
    raise SolError(f"unparseable pairs expression: {expr!r}")


def verify_via_contract_text(src: str, inputs: list, proof8: list) -> bool:
    """Run verifyProof(input, proof) as the contract text specifies."""
    constants = _parse_constants(src)

    # input arity from the function signature
    m = re.search(r"uint256\[(\d+)\] calldata input", src)
    if not m:
        raise SolError("input array not found")
    n_inputs = int(m.group(1))
    if len(inputs) != n_inputs:
        raise SolError(f"arity: contract wants {n_inputs} inputs")

    # bounds checks (revert semantics)
    if re.search(r"input\[i\] >= R\) revert InvalidInput", src):
        for v in inputs:
            if not (0 <= v < R):
                raise SolError("InvalidInput")
    if re.search(r"proof\[i\] >= P\) revert InvalidProof", src):
        for v in proof8:
            if not (0 <= v < C.P):
                raise SolError("InvalidProof")

    # vk_x accumulation exactly as the emitted lines wire it
    vkx = (constants["IC0_X"], constants["IC0_Y"])
    prog = _parse_vkx_program(src)
    if len(prog) != n_inputs:
        raise SolError(f"vkx accumulation has {len(prog)} terms, "
                       f"arity {n_inputs}")
    for xn, yn, idx in prog:
        base = (constants[xn], constants[yn])
        if not C.g1_on_curve(base):
            raise SolError(f"IC point {xn[:-2]} off-curve")
        vkx = C.g1_add(vkx, C.g1_mul(base, inputs[idx]))

    # pairing input exactly as the pairs[] block lays it out
    env = {"constants": constants, "proof": list(proof8),
           "vkx": [vkx[0] if vkx else 0, vkx[1] if vkx else 0]}
    flat = [_eval_expr(e, env) for e in _parse_pairs_program(src)]

    pairs = []
    for i in range(4):
        g1 = (flat[6 * i], flat[6 * i + 1])
        # EIP-197 G2 encoding: x_im, x_re, y_im, y_re
        g2 = ((flat[6 * i + 3], flat[6 * i + 2]),
              (flat[6 * i + 5], flat[6 * i + 4]))
        g1 = None if g1 == (0, 0) else g1
        g2 = None if g2 == ((0, 0), (0, 0)) else g2
        if g1 is not None and not C.g1_on_curve(g1):
            raise SolError(f"pairing slot {i}: G1 off-curve")
        if g2 is not None and not C.g2_on_curve(g2):
            raise SolError(f"pairing slot {i}: G2 off-curve")
        pairs.append((g1, g2))
    return C.pairing_product_is_one(pairs)


# ---------------------------------------------------------------------------
# compressed path (verifyCompressedProof / compressProof in the emitted
# text — Verifier.sol:102's 128-byte entry)
# ---------------------------------------------------------------------------

def _compressed_constants(src: str) -> dict:
    """Parse the compression constants from the emitted text and validate
    each against its mathematical definition — a corrupted splice of
    EXP_SQRT or a 3/(9+i) fraction silently breaks every decompression,
    so they are cross-checked, not trusted."""
    consts = _parse_constants(src)
    expected = {
        "EXP_SQRT": (C.P + 1) // 4,
        "EXP_LEGENDRE": (C.P - 1) // 2,
        "FRACTION_27_82_FP": 27 * pow(82, C.P - 2, C.P) % C.P,
        "FRACTION_3_82_FP": 3 * pow(82, C.P - 2, C.P) % C.P,
        "FRACTION_1_2_FP": pow(2, C.P - 2, C.P),
    }
    for name, want in expected.items():
        if name not in consts:
            raise SolError(f"compressed constant {name} missing from text")
        if consts[name] != want:
            raise SolError(f"compressed constant {name} corrupt: "
                           f"{consts[name]} != {want}")
    return consts


def _parse_decompress_wiring(src: str) -> dict:
    """Recover the B-point im/re wiring of _decompressProof as written:
    {proof_slot: component_name} for the four G2 assignments."""
    m = re.search(
        r"\(uint256 (\w+), uint256 (\w+), uint256 (\w+), uint256 (\w+)\) =\s*"
        r"_decompressG2\(compressed\[1\], compressed\[2\]\);", src)
    if not m:
        raise SolError("decompressG2 destructuring not found")
    # _decompressG2 returns (x0=re, x1=im, y0=re, y1=im) by its signature
    names = {m.group(1): "x_re", m.group(2): "x_im",
             m.group(3): "y_re", m.group(4): "y_im"}
    wiring = {}
    for mm in re.finditer(r"proof\[([2-5])\] = (\w+);", src):
        nm = mm.group(2)
        if nm not in names:
            raise SolError(f"unknown component {nm} wired into proof[]")
        wiring[int(mm.group(1))] = names[nm]
    if sorted(wiring) != [2, 3, 4, 5]:
        raise SolError(f"incomplete B wiring: {sorted(wiring)}")
    return wiring


def decompress_via_contract_text(src: str, proof4: list) -> list:
    """Run _decompressProof(compressed) as the emitted text specifies,
    returning the 8-word wire proof."""
    if not re.search(
            r"function verifyCompressedProof\(", src):
        raise SolError("contract has no verifyCompressedProof")
    if not re.search(
            r"_verify\(input, _decompressProof\(compressedProof\)\)", src):
        raise SolError("verifyCompressedProof does not route through "
                       "_decompressProof + _verify")
    _compressed_constants(src)
    wiring = _parse_decompress_wiring(src)
    from . import compress as Z
    try:
        ax, ay = Z.decompress_g1(int(proof4[0]))
        x0, x1, y0, y1 = Z.decompress_g2(int(proof4[1]), int(proof4[2]))
        cx, cy = Z.decompress_g1(int(proof4[3]))
    except Z.CompressionError as e:
        raise SolError(f"InvalidProof: {e}") from e
    comp = {"x_re": x0, "x_im": x1, "y_re": y0, "y_im": y1}
    proof8 = [ax, ay, 0, 0, 0, 0, cx, cy]
    for slot, name in wiring.items():
        proof8[slot] = comp[name]
    # the wire layout demands im-first (EIP-197); a generator that wires
    # re-first produces B outside the curve check in _verify, but catch
    # the swap explicitly here for a precise error
    if wiring != {2: "x_im", 3: "x_re", 4: "y_im", 5: "y_re"}:
        raise SolError(f"B-point im/re wiring swapped: {wiring}")
    return proof8


def verify_compressed_via_contract_text(src: str, inputs: list,
                                        proof4: list) -> bool:
    """Run verifyCompressedProof(compressedProof, input) as written."""
    return verify_via_contract_text(
        src, inputs, decompress_via_contract_text(src, proof4))
