"""State-proof verifier: wire-format vectors (raw_node.rs:124-185 inline
tests) + a synthetic end-to-end trie walk."""
import hashlib

from zklc_tpu.near.state_proofs import (NibbleSlice, ProofVerifier,
                                        decode_node, contract_data_key,
                                        ValueRef)


def _h(b):
    return hashlib.sha256(b).digest()


def test_decode_leaf_vector():
    value_hash = _h(bytes([123, 245, 255]))
    encoded = bytes([0, 3, 0, 0, 0, 1, 2, 3, 3, 0, 0, 0]) + value_hash + \
        (42).to_bytes(8, "little")
    n = decode_node(encoded)
    assert n.kind == "leaf" and n.key == bytes([1, 2, 3])
    assert n.value == ValueRef(3, value_hash) and n.memory_usage == 42


def test_decode_branch_vector():
    encoded = bytes([1, 40, 0]) + bytes([1] * 32) + bytes([2] * 32) + \
        (42).to_bytes(8, "little")
    n = decode_node(encoded)
    assert n.kind == "branch" and n.value is None
    assert n.children[3] == bytes([1] * 32)
    assert n.children[5] == bytes([2] * 32)
    assert sum(c is not None for c in n.children) == 2


def test_decode_extension_vector():
    encoded = bytes([3, 2, 0, 0, 0, 7, 8]) + bytes([9] * 32) + \
        (42).to_bytes(8, "little")
    n = decode_node(encoded)
    assert n.kind == "extension" and n.key == bytes([7, 8])
    assert n.child == bytes([9] * 32)


def _encode_leaf(key_hpe: bytes, value: bytes) -> bytes:
    return (bytes([0]) + len(key_hpe).to_bytes(4, "little") + key_hpe
            + len(value).to_bytes(4, "little") + _h(value)
            + (1).to_bytes(8, "little"))


def _encode_branch(children: dict[int, bytes]) -> bytes:
    bitmap = 0
    body = b""
    for idx in sorted(children):
        bitmap |= 1 << idx
        body += children[idx]
    return (bytes([1]) + bitmap.to_bytes(2, "little") + body
            + (1).to_bytes(8, "little"))


def _encode_extension(key_hpe: bytes, child: bytes) -> bytes:
    return (bytes([3]) + len(key_hpe).to_bytes(4, "little") + key_hpe
            + child + (1).to_bytes(8, "little"))


def test_synthetic_trie_inclusion_and_absence():
    """Build a tiny trie: extension -> branch -> two leaves, prove both
    inclusion and (sound) absence."""
    account, key_a, key_b = "alice.near", b"A", b"B"
    qa = contract_data_key(account, key_a)
    qb = contract_data_key(account, key_b)
    na = [NibbleSlice(qa).at(i) for i in range(len(NibbleSlice(qa)))]
    nb = [NibbleSlice(qb).at(i) for i in range(len(NibbleSlice(qb)))]
    # common prefix splits at the first differing nibble
    split = next(i for i in range(min(len(na), len(nb))) if na[i] != nb[i])
    leaf_a = _encode_leaf(NibbleSlice.encode_nibbles(na[split + 1:], True),
                          b"value-a")
    leaf_b = _encode_leaf(NibbleSlice.encode_nibbles(nb[split + 1:], True),
                          b"value-b")
    branch = _encode_branch({na[split]: _h(leaf_a), nb[split]: _h(leaf_b)})
    ext = _encode_extension(
        NibbleSlice.encode_nibbles(na[:split], False), _h(branch))
    root = _h(ext)

    pv = ProofVerifier([ext, branch, leaf_a, leaf_b])
    assert pv.verify(root, account, key_a, b"value-a")
    assert pv.verify(root, account, key_b, b"value-b")
    assert not pv.verify(root, account, key_a, b"wrong")
    # absence: a key diverging inside the branch (no child there)
    assert pv.verify(root, account, b"C", None)
    assert not pv.verify(root, account, key_a, None)   # present != absent
