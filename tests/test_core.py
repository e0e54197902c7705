"""Unit tests for the fixed-point / ring / share layer.

Mirrors the reference's `Task-Worker/test/2PC_test.cpp` contract
(SURVEY.md §4.1): verify every arithmetic primitive against plain double math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cognn_tpu.core import (
    RING32,
    RING64,
    FixedPointSpec,
    fp_decode,
    fp_encode,
    ring_add,
    ring_from_u64,
    ring_mul,
    ring_neg,
    ring_sub,
    ring_to_u64,
    share_merge_np,
    share_split_np,
)
from cognn_tpu.core.ring import (
    ring_arith_shift_right,
    ring_from_f32,
    ring_mul_scalar,
    ring_to_f32,
)

RNG = np.random.default_rng(0)


def rand_u64(shape):
    return RNG.integers(0, 1 << 64, size=shape, dtype=np.uint64)


class TestRing64:
    def test_roundtrip(self):
        x = rand_u64((4, 7))
        np.testing.assert_array_equal(ring_to_u64(ring_from_u64(x)), x)

    @pytest.mark.parametrize("op,ref", [
        (ring_add, lambda a, b: a + b),
        (ring_sub, lambda a, b: a - b),
        (ring_mul, lambda a, b: a * b),
    ])
    def test_binary_ops(self, op, ref):
        a, b = rand_u64((3, 5)), rand_u64((3, 5))
        got = ring_to_u64(np.asarray(op(RING64, jnp.asarray(ring_from_u64(a)),
                                        jnp.asarray(ring_from_u64(b)))))
        np.testing.assert_array_equal(got, ref(a, b))

    def test_neg(self):
        a = rand_u64((64,))
        a[0] = 0  # exercise the carry path
        a[1] = 1 << 32
        got = ring_to_u64(np.asarray(ring_neg(RING64, jnp.asarray(ring_from_u64(a)))))
        np.testing.assert_array_equal(got, np.uint64(0) - a)

    def test_mul_scalar(self):
        a = rand_u64((16,))
        for s in [0, 1, 3, 0xFFFFFFFF, 0x1_0000_0001, (1 << 64) - 1]:
            got = ring_to_u64(np.asarray(
                ring_mul_scalar(RING64, jnp.asarray(ring_from_u64(a)), s)))
            np.testing.assert_array_equal(got, a * np.uint64(s & ((1 << 64) - 1)))

    def test_arith_shift(self):
        vals = np.array([5 << 16, -(7 << 16), 123456789, -987654321],
                        dtype=np.int64).astype(np.uint64)
        got = ring_to_u64(np.asarray(
            ring_arith_shift_right(RING64, jnp.asarray(ring_from_u64(vals)), 16)))
        expect = (vals.astype(np.int64) >> 16).astype(np.uint64)
        np.testing.assert_array_equal(got, expect)

    def test_f32_roundtrip(self):
        x = np.array([0.5, -1.25, 3.75, -1000.0, 0.0], dtype=np.float32)
        limbs = ring_from_f32(RING64, jnp.asarray(x), 16)
        back = np.asarray(ring_to_f32(RING64, limbs, 16))
        np.testing.assert_allclose(back, x, atol=2**-16)


class TestRing32:
    def test_ops(self):
        a = rand_u64((8,)) & np.uint64(0xFFFFFFFF)
        b = rand_u64((8,)) & np.uint64(0xFFFFFFFF)
        la = jnp.asarray(ring_from_u64(a, RING32))
        lb = jnp.asarray(ring_from_u64(b, RING32))
        np.testing.assert_array_equal(
            ring_to_u64(np.asarray(ring_add(RING32, la, lb)), RING32),
            (a + b) & np.uint64(0xFFFFFFFF))
        np.testing.assert_array_equal(
            ring_to_u64(np.asarray(ring_mul(RING32, la, lb)), RING32),
            (a * b) & np.uint64(0xFFFFFFFF))


class TestFixedPoint:
    def test_encode_matches_c_cast(self):
        spec = FixedPointSpec()
        # C (int64)(x * 2^f) truncates toward zero
        assert fp_encode(1.5, spec) == np.uint64(3 << 15)
        assert fp_encode(-1.0, spec) == np.uint64(2**64 - 65536)
        # 0.3*65536 = 19660.8 -> 19660
        assert fp_encode(0.3, spec) == np.uint64(19660)
        assert fp_encode(-0.3, spec) == np.uint64(2**64 - 19660)

    def test_roundtrip(self):
        spec = FixedPointSpec()
        x = RNG.uniform(-100, 100, size=1000)
        np.testing.assert_allclose(fp_decode(fp_encode(x, spec), spec), x,
                                   atol=2**-16)

    def test_share_split_merge(self):
        spec = FixedPointSpec()
        x = RNG.uniform(-10, 10, size=(50, 7))
        enc = fp_encode(x, spec)
        s0, s1 = share_split_np(enc, RNG)
        np.testing.assert_array_equal(share_merge_np(s0, s1), enc)
        np.testing.assert_allclose(fp_decode(share_merge_np(s0, s1), spec), x,
                                   atol=2**-16)
        # shares individually look uniform (crude sanity: high bits vary)
        assert len(np.unique(s0 >> np.uint64(56))) > 100


class TestDeviceShareSplit:
    def test_split_merge_device(self):
        from cognn_tpu.core import share_merge, share_split

        x = rand_u64((6, 4))
        limbs = jnp.asarray(ring_from_u64(x))
        s0, s1 = share_split(jax.random.key(0), limbs)
        merged = ring_to_u64(np.asarray(share_merge(RING64, s0, s1)))
        np.testing.assert_array_equal(merged, x)
