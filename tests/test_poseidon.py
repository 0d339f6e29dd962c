"""Poseidon: host vs known-answer vectors, device vs host, Merkle, challenger."""
import numpy as np

from zklc_tpu.field import gl64
from zklc_tpu.field import gl2x32 as gl
from zklc_tpu.hash import poseidon
from zklc_tpu.ops import poseidon_tpu

rng = np.random.default_rng(42)
P = gl64.P


def test_permute_zero_vector():
    # Known-answer vector: gnark-plonky2-verifier/tests/goldilocks_test.go:47-57
    out = poseidon.permute(np.zeros(12, dtype=np.uint64))
    expect = np.array([
        4330397376401421145, 14124799381142128323, 8742572140681234676,
        14345658006221440202, 15524073338516903644, 5091405722150716653,
        15002163819607624508, 2047012902665707362, 16106391063450633726,
        4680844749859802542, 15019775476387350140, 1698615465718385111,
    ], dtype=np.uint64)
    np.testing.assert_array_equal(out, expect)


def test_hash_no_pad_vector():
    # gnark-plonky2-verifier/tests/public_inputs_hash_test.go:53-55
    inp = np.array([0, 1, 3736710860384812976], dtype=np.uint64)
    out = poseidon.hash_no_pad(inp)
    expect = np.array([8416658900775745054, 12574228347150446423,
                       9629056739760131473, 3119289788404190010], dtype=np.uint64)
    np.testing.assert_array_equal(out, expect)


def test_device_permute_matches_host():
    batch = 16
    states = rng.integers(0, P, size=(batch, 12), dtype=np.uint64)
    host = poseidon.permute(states)
    out = poseidon_tpu.permute(gl.from_u64_np(states))
    np.testing.assert_array_equal(gl.to_u64_np(out), host)


def test_device_hash_no_pad_matches_host():
    for L in [3, 4, 7, 8, 9, 17]:
        data = rng.integers(0, P, size=(5, L), dtype=np.uint64)
        host = np.stack([poseidon.hash_or_noop(row) for row in data])
        dev = poseidon_tpu.hash_or_noop_batch(gl.from_u64_np(data))
        np.testing.assert_array_equal(gl.to_u64_np(dev), host, err_msg=f"L={L}")


def test_merkle_tree():
    n, L, cap_h = 16, 6, 1
    leaves = rng.integers(0, P, size=(n, L), dtype=np.uint64)
    levels, cap = poseidon_tpu.merkle_tree_levels(gl.from_u64_np(leaves), cap_h)
    # host recompute
    digests = np.stack([poseidon.hash_or_noop(row) for row in leaves])
    np.testing.assert_array_equal(_u64(levels[0]), digests)
    cur = digests
    for lvl in levels[1:]:
        nxt = np.stack([poseidon.two_to_one(cur[2 * i], cur[2 * i + 1])
                        for i in range(len(cur) // 2)])
        np.testing.assert_array_equal(_u64(lvl), nxt)
        cur = nxt
    assert cap[0].shape[0] == 1 << cap_h


def _u64(pair):
    return gl.to_u64_np(pair)


def test_challenger_duplex_order():
    ch = poseidon.Challenger()
    ch.observe_elements([1, 2, 3])
    c1 = ch.get_challenge()
    # manual replay: duplex with state[0..3] = [1,2,3], pop from END
    st = np.zeros(12, dtype=np.uint64)
    st[0], st[1], st[2] = 1, 2, 3
    st = poseidon.permute(st)
    assert c1 == int(st[7])
    c2 = ch.get_challenge()
    assert c2 == int(st[6])
    # observing clears output buffer
    ch.observe_element(99)
    st2 = st.copy()
    st2[0] = 99
    st2 = poseidon.permute(st2)
    assert ch.get_challenge() == int(st2[7])
