"""Horizontal op tests -- mirrors reference tests/horiz.cpp + horiz.cu coverage."""

import numpy as np
import jax.numpy as jnp

from enoki_tpu import ops


def test_reductions():
    x = jnp.array([1.0, 2.0, 3.0, 4.0])
    assert ops.hsum(x) == 10
    assert ops.hprod(x) == 24
    assert ops.hmax(x) == 4
    assert ops.hmin(x) == 1
    assert ops.hmean(x) == 2.5
    assert np.array_equal(ops.psum(x), [1, 3, 6, 10])


def test_hmean_lazy_integer_promotes():
    # r3 advisor: lazy hmean of an int array used to coerce the 1/n
    # scalar down to the int dtype (truncating it to 0). It must promote
    # like jnp.mean.
    from enoki_tpu.trace import LazyArray
    import enoki_tpu.trace as tr

    x = LazyArray(jnp.array([1, 2, 3, 4], jnp.int32))
    got = np.asarray(ops.hmean(x).jax())
    np.testing.assert_allclose(got, [2.5])
    # float input unchanged
    y = LazyArray(jnp.array([1.0, 2.0, 3.0, 4.0], jnp.float32))
    np.testing.assert_allclose(np.asarray(ops.hmean(y).jax()), [2.5])
    tr.reset()


def test_mask_reductions():
    m = jnp.array([True, False, True])
    assert ops.any_(m)
    assert not ops.all_(m)
    assert not ops.none(m)
    assert ops.count(m) == 2


def test_dot_norm():
    a = jnp.array([1.0, 2.0, 2.0])
    assert ops.dot(a, a) == 9
    assert ops.norm(a) == 3
    assert ops.squared_norm(a) == 9
    n = ops.normalize(a)
    assert np.allclose(ops.norm(n), 1.0, atol=1e-6)


def test_compress():
    # parity with cuda_compress (horiz.cu:158): order-preserving pack
    x = jnp.array([10.0, 11.0, 12.0, 13.0, 14.0])
    m = jnp.array([False, True, False, True, True])
    packed, n = ops.compress(x, m)
    assert int(n) == 3
    assert np.array_equal(np.asarray(packed)[:3], [11, 13, 14])
    assert np.array_equal(np.asarray(packed)[3:], [0, 0])


def test_partition():
    # parity with cuda_partition (horiz.cu:35): stable grouping by key
    keys = jnp.array([2, 0, 2, 1, 0, 2], jnp.int32)
    unique, counts, perm = ops.partition(keys, max_instances=4)
    assert np.array_equal(np.asarray(unique), [0, 1, 2, -1])
    assert np.array_equal(np.asarray(counts), [2, 1, 3, 0])
    sorted_keys = np.asarray(keys)[np.asarray(perm)]
    assert np.array_equal(sorted_keys, [0, 0, 1, 2, 2, 2])
    # stability: original relative order within groups preserved
    assert np.array_equal(np.asarray(perm), [1, 4, 3, 0, 2, 5])
    offs = ops.segment_offsets(counts)
    assert np.array_equal(np.asarray(offs), [0, 2, 3, 6])


def test_nested_reductions():
    x = jnp.arange(12.0).reshape(3, 4)
    assert ops.hsum_nested(x) == 66
    assert ops.hmax_nested(x) == 11
