"""BN254-Fr Poseidon: bit-exact vs the reference verifier's KATs
(gnark-plonky2-verifier/tests/bn254_test.go:31-60)."""
from zklc_tpu.hash.poseidon_bn128 import (permute_bn128, hash_no_pad_bn128,
                                          fr_to_hash_bytes, FR)


def test_permutation_zero_state():
    assert permute_bn128([0, 0, 0, 0]) == [
        5317387130258456662214331362918410991734007599705406860481038345552731150762,
        17768273200467269691696191901389126520069745877826494955630904743826040320364,
        19413739268543925182080121099097652227979760828059217876810647045303340666757,
        3717738800218482999400886888123026296874264026760636028937972004600663725187,
    ]


def test_permutation_0123():
    assert permute_bn128([0, 1, 2, 3]) == [
        6542985608222806190361240322586112750744169038454362455181422643027100751666,
        3478427836468552423396868478117894008061261013954248157992395910462939736589,
        1904980799580062506738911865015687096398867595589699208837816975692422464009,
        11971464497515232077059236682405357499403220967704831154657374522418385384151,
    ]


def test_hash_no_pad_packing():
    # 3 GL elements pack little-endian into one Fr limb of the state
    out = hash_no_pad_bn128([1, 2, 3])
    exp = permute_bn128([0, 1 + (2 << 64) + (3 << 128), 0, 0])[0]
    assert out == exp
    assert len(fr_to_hash_bytes(out)) == 32
    assert int.from_bytes(fr_to_hash_bytes(out), "little") == out


def test_native_bn128_kernels_match_python():
    """Native C++ BN254-Fr Poseidon (native/zklc_native.cpp bn128_*) is
    bit-exact vs the Python KAT-checked implementation."""
    import random

    import numpy as np
    import pytest

    from zklc_tpu import native
    from zklc_tpu.hash import poseidon_bn128 as pb

    if not native.available:
        pytest.skip("native library unavailable")

    rng = random.Random(1234)
    P = (1 << 64) - (1 << 32) + 1

    states = [[rng.randrange(FR) for _ in range(4)] for _ in range(4)]
    arr = np.array([[native.fr_int_to_limbs(x) for x in st] for st in states],
                   dtype=np.uint64)
    out = native.bn128_permute_batch(arr)
    for k, st in enumerate(states):
        assert [native.fr_limbs_to_int(out[k, i]) for i in range(4)] == \
            permute_bn128(list(st))

    for row_len in (2, 3, 4, 9, 12):
        rows = [[rng.randrange(P) for _ in range(row_len)] for _ in range(3)]
        out = native.bn128_hash_leaves(np.array(rows, dtype=np.uint64))
        for k, row in enumerate(rows):
            assert native.fr_limbs_to_int(out[k]) == pb.hash_or_noop_bn128(row)

    digests = [rng.randrange(FR) for _ in range(8)]
    arr = np.array([native.fr_int_to_limbs(x) for x in digests],
                   dtype=np.uint64)
    out = native.bn128_merkle_level(arr)
    for k in range(4):
        assert native.fr_limbs_to_int(out[k]) == \
            pb.two_to_one_bn128(digests[2 * k], digests[2 * k + 1])
