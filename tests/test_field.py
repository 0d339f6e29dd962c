"""Field layer tests: host gl64 vs Python big-int, device gl2x32 vs host."""
import numpy as np
import pytest

from zklc_tpu.field import gl64
from zklc_tpu.field import gl2x32 as gl

pytestmark = pytest.mark.smoke


P = gl64.P
rng = np.random.default_rng(0xA11CE)


def rand_fe(n):
    """Random canonical field elements, biased to include edge cases."""
    vals = rng.integers(0, P, size=n, dtype=np.uint64)
    edge = np.array([0, 1, P - 1, P - 2, 0xFFFFFFFF, 0x100000000, P >> 1],
                    dtype=np.uint64)
    vals[: len(edge)] = edge
    return vals


class TestGl64:
    def test_add_sub_mul_vs_bigint(self):
        a = rand_fe(512)
        b = rand_fe(512)[::-1].copy()
        ai = a.astype(object)
        bi = b.astype(object)
        np.testing.assert_array_equal(gl64.add(a, b).astype(object), (ai + bi) % P)
        np.testing.assert_array_equal(gl64.sub(a, b).astype(object), (ai - bi) % P)
        np.testing.assert_array_equal(gl64.mul(a, b).astype(object), (ai * bi) % P)
        np.testing.assert_array_equal(gl64.neg(a).astype(object), (-ai) % P)

    def test_inv(self):
        a = rand_fe(64)
        a[a == 0] = 1
        inv = gl64.inv(a)
        np.testing.assert_array_equal(gl64.mul(a, inv), np.ones(64, dtype=np.uint64))

    def test_batch_inv(self):
        a = rand_fe(33)
        a[a == 0] = 1
        np.testing.assert_array_equal(gl64.batch_inv(a), gl64.inv(a))

    def test_roots_of_unity(self):
        for k in [0, 1, 4, 10]:
            g = gl64.primitive_root_of_unity(k)
            assert pow(g, 1 << k, P) == 1
            if k > 0:
                assert pow(g, 1 << (k - 1), P) == P - 1

    def test_ext_mul(self):
        a = np.stack([rand_fe(32), rand_fe(32)[::-1].copy()], axis=-1)
        b = np.stack([rand_fe(32)[::-1].copy(), rand_fe(32)], axis=-1)
        c = gl64.ext_mul(a, b)
        # (a0 + a1 X)(b0 + b1 X) = a0b0 + 7 a1b1 + (a0b1 + a1b0) X
        a0, a1 = a[..., 0].astype(object), a[..., 1].astype(object)
        b0, b1 = b[..., 0].astype(object), b[..., 1].astype(object)
        np.testing.assert_array_equal(c[..., 0].astype(object), (a0 * b0 + 7 * a1 * b1) % P)
        np.testing.assert_array_equal(c[..., 1].astype(object), (a0 * b1 + a1 * b0) % P)

    def test_ext_inv(self):
        a = np.stack([rand_fe(16), rand_fe(16)], axis=-1)
        a[0] = [3, 0]
        c = gl64.ext_mul(a, gl64.ext_inv(a))
        np.testing.assert_array_equal(c[..., 0], np.ones(16, dtype=np.uint64))
        np.testing.assert_array_equal(c[..., 1], np.zeros(16, dtype=np.uint64))


class TestGl2x32:
    def test_roundtrip(self):
        a = rand_fe(256)
        np.testing.assert_array_equal(gl.to_u64_np(gl.from_u64_np(a)), a)

    def test_add_sub_mul_neg(self):
        a = rand_fe(256)
        b = rand_fe(256)[::-1].copy()
        da, db = gl.from_u64_np(a), gl.from_u64_np(b)
        np.testing.assert_array_equal(gl.to_u64_np(gl.add(da, db)), gl64.add(a, b))
        np.testing.assert_array_equal(gl.to_u64_np(gl.sub(da, db)), gl64.sub(a, b))
        np.testing.assert_array_equal(gl.to_u64_np(gl.mul(da, db)), gl64.mul(a, b))
        np.testing.assert_array_equal(gl.to_u64_np(gl.neg(da)), gl64.neg(a))

    def test_noncanonical_inputs(self):
        # values in [p, 2^64) must still reduce correctly through mul/add
        raw = np.uint64(P) + rng.integers(0, (1 << 64) - P, size=64, dtype=np.uint64)
        raw[0] = np.uint64(P)  # == 0 mod p
        raw[1] = np.uint64(2**64 - 1)
        import jax.numpy as jnp
        da = (jnp.asarray((raw >> np.uint64(32)).astype(np.uint32)),
              jnp.asarray((raw & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
        b = rand_fe(64)
        db = gl.from_u64_np(b)
        raw_mod = np.where(raw >= np.uint64(P), raw - np.uint64(P), raw)  # raw < 2p
        expect = gl64.mul(raw_mod, b)
        np.testing.assert_array_equal(gl.to_u64_np(gl.mul(da, db)), expect)
        expect_add = gl64.add(raw_mod, b)
        np.testing.assert_array_equal(gl.to_u64_np(gl.add(da, db)), expect_add)

    def test_pow_inv(self):
        a = rand_fe(32)
        a[a == 0] = 5
        da = gl.from_u64_np(a)
        np.testing.assert_array_equal(gl.to_u64_np(gl.pow_const(da, 7)),
                                      gl64.pow_const(a, 7))
        np.testing.assert_array_equal(gl.to_u64_np(gl.mul(da, gl.inv(da))),
                                      np.ones(32, dtype=np.uint64))

    def test_ext_mul(self):
        a0, a1 = rand_fe(32), rand_fe(32)[::-1].copy()
        b0, b1 = rand_fe(32)[::-1].copy(), rand_fe(32)
        da = (gl.from_u64_np(a0), gl.from_u64_np(a1))
        db = (gl.from_u64_np(b0), gl.from_u64_np(b1))
        c = gl.ext_mul(da, db)
        host = gl64.ext_mul(np.stack([a0, a1], -1), np.stack([b0, b1], -1))
        np.testing.assert_array_equal(gl.to_u64_np(c[0]), host[..., 0])
        np.testing.assert_array_equal(gl.to_u64_np(c[1]), host[..., 1])
