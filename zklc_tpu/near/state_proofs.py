"""NEAR state-trie proof-of-inclusion verification.

Equivalent of near_state_proofs/script/src (SURVEY.md §2.9): given the
`proof` node list from a `view_state(include_proof=true)` RPC response,
check that every claimed key/value is consistent with the block's state
root.  Wire formats re-derived from near-core's public trie encoding
(verified against the reference's inline encode/decode vectors,
raw_node.rs:124-185):

  RawTrieNodeWithSize = node || memory_usage u64 LE
  node: tag 0 Leaf(key vec<u8>, ValueRef{len u32, hash 32})
        tag 1 BranchNoValue(bitmap u16 LE, children by ascending index)
        tag 2 BranchWithValue(ValueRef, bitmap, children)
        tag 3 Extension(key vec<u8>, child hash 32)
  node keys use hex-prefix encoding (nibble_slice.rs:87-151).
"""
from __future__ import annotations

import hashlib
from dataclasses import dataclass


def _sha256(b: bytes) -> bytes:
    return hashlib.sha256(b).digest()


class NibbleSlice:
    """nibble_slice.rs semantics: a view over half-bytes."""

    def __init__(self, data: bytes, offset: int = 0):
        self.data = data
        self.offset = offset

    @staticmethod
    def from_encoded(data: bytes) -> tuple["NibbleSlice", bool]:
        return (NibbleSlice(data, 1 if data[0] & 16 else 2),
                bool(data[0] & 32))

    def __len__(self):
        return len(self.data) * 2 - self.offset

    def at(self, i: int) -> int:
        j = self.offset + i
        b = self.data[j // 2]
        return (b & 15) if j & 1 else (b >> 4)

    def mid(self, i: int) -> "NibbleSlice":
        return NibbleSlice(self.data, self.offset + i)

    def starts_with(self, other: "NibbleSlice") -> bool:
        return self.common_prefix(other) == len(other)

    def common_prefix(self, other: "NibbleSlice") -> int:
        s = min(len(self), len(other))
        for i in range(s):
            if self.at(i) != other.at(i):
                return i
        return s

    def __eq__(self, other):
        return len(self) == len(other) and self.starts_with(other)

    @staticmethod
    def encode_nibbles(nibbles: list[int], is_leaf: bool) -> bytes:
        l = len(nibbles)
        i = l % 2
        out = bytearray([(0x10 + nibbles[0] if i else 0)
                         + (0x20 if is_leaf else 0)])
        while i < l:
            out.append(nibbles[i] * 16 + nibbles[i + 1])
            i += 2
        return bytes(out)


@dataclass
class ValueRef:
    length: int
    hash: bytes


@dataclass
class TrieNode:
    kind: str                 # leaf | branch | extension
    key: bytes = b""          # HPE-encoded (leaf/extension)
    value: ValueRef | None = None
    children: list | None = None    # 16 entries of bytes|None
    child: bytes = b""        # extension child hash
    memory_usage: int = 0


def decode_node(raw: bytes) -> TrieNode:
    """RawTrieNodeWithSize wire decoding (strict: no trailing bytes)."""
    pos = 0

    def take(n):
        nonlocal pos
        out = raw[pos: pos + n]
        assert len(out) == n, "truncated node"
        pos += n
        return out

    def take_vec():
        n = int.from_bytes(take(4), "little")
        return take(n)

    def take_value():
        length = int.from_bytes(take(4), "little")
        return ValueRef(length, take(32))

    def take_children():
        bitmap = int.from_bytes(take(2), "little")
        children = [None] * 16
        for idx in range(16):
            if bitmap & (1 << idx):
                children[idx] = take(32)
        return children

    tag = take(1)[0]
    if tag == 0:
        node = TrieNode("leaf", key=take_vec(), value=take_value())
    elif tag == 1:
        node = TrieNode("branch", children=take_children())
    elif tag == 2:
        v = take_value()
        node = TrieNode("branch", value=v, children=take_children())
    elif tag == 3:
        node = TrieNode("extension", key=take_vec(), child=take(32))
    else:
        raise ValueError(f"unknown node tag {tag}")
    node.memory_usage = int.from_bytes(take(8), "little")
    assert pos == len(raw), "trailing bytes after node"
    return node


CONTRACT_DATA_COLUMN = 9
ACCOUNT_DATA_SEPARATOR = b","


def contract_data_key(account_id: str, key: bytes) -> bytes:
    """trie_key_parsers::get_raw_prefix_for_contract_data."""
    return (bytes([CONTRACT_DATA_COLUMN]) + account_id.encode()
            + ACCOUNT_DATA_SEPARATOR + key)


class ProofVerifier:
    """proof_verifier.rs:12-104: verify key/value pairs against a state
    root given the RPC proof node set."""

    def __init__(self, proof_nodes: list[bytes]):
        self.nodes = {_sha256(b): decode_node(b) for b in proof_nodes}

    def verify(self, state_root: bytes, account_id: str, key: bytes,
               expected: bytes | None) -> bool:
        query = contract_data_key(account_id, key)
        k = NibbleSlice(query)
        expected_ref = None if expected is None else \
            ValueRef(len(expected), _sha256(expected))
        h = state_root
        while h in self.nodes:
            node = self.nodes[h]
            if node.kind == "leaf":
                nib, _ = NibbleSlice.from_encoded(node.key)
                if not (k == nib):
                    return expected is None
                return expected_ref is not None and \
                    node.value == expected_ref
            if node.kind == "extension":
                nib, _ = NibbleSlice.from_encoded(node.key)
                if not k.starts_with(nib):
                    return expected is None
                k = k.mid(len(nib))
                h = node.child
                continue
            # branch
            if len(k) == 0:
                if node.value is not None:
                    return expected_ref is not None and \
                        node.value == expected_ref
                return expected is None
            child = node.children[k.at(0)]
            if child is None:
                return expected is None
            k = k.mid(1)
            h = child
        return False
