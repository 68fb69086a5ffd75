"""Nested-array and memory-op parity -- mirrors reference tests/nested.cpp
and tests/memory2.cpp.

nested.cpp exercises arrays-of-arrays (Array<Array<float,4>,N>), mask
types at each nesting level, and nested reductions; memory2.cpp
exercises extract, compress, transform (read-modify-write scatter),
nested/strided gathers and masked gathers. The TPU-native forms: nested
SoA = leading struct axes on jnp arrays / Vec3 pytrees; strides =
reshaped gathers.
"""

import numpy as np
import jax.numpy as jnp

from enoki_tpu import ops
from enoki_tpu.render.vec import Vec3, dot3
from enoki_tpu.struct import gather_struct, scatter_struct, zeros_like


def test_array_of_arrays_ops():
    # nested.cpp test04_array_of_arrays: ops broadcast across the nested
    # axis; reductions reduce the right axes
    a = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)  # 3-vector of 4-wide
    b = a * 2.0 + 1.0
    np.testing.assert_allclose(np.asarray(b), np.arange(12).reshape(3, 4) * 2 + 1)
    # per-lane reduction over the nested (leading) axis
    np.testing.assert_allclose(np.asarray(ops.hsum(a, axis=0)),
                               np.arange(12).reshape(3, 4).sum(0))
    # full nested reduction (nested.cpp test06_nested_reductions)
    assert float(ops.hsum_nested(a)) == float(np.arange(12).sum())
    assert float(ops.hmax_nested(a)) == 11.0


def test_mask_types_nested():
    # nested.cpp test05_mask_types: masks compose at each nesting level
    a = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    m = a > 5.0                      # nested mask
    sel = ops.select(m, a, -a)
    want = np.where(np.arange(12).reshape(3, 4) > 5,
                    np.arange(12).reshape(3, 4),
                    -np.arange(12).reshape(3, 4))
    np.testing.assert_allclose(np.asarray(sel), want)
    assert bool(ops.any_(m)) and not bool(ops.all_(m))
    # per-nested-vector any (row 0 holds 0..3: none > 5)
    np.testing.assert_array_equal(np.asarray(ops.any_(m, axis=1)),
                                  [False, True, True])


def test_nested_gather_packed():
    # memory2.cpp test04: gathering a nested (SoA Vec3) value by lane
    # index pulls every component through the same permutation
    n = 8
    v = Vec3(jnp.arange(n, dtype=jnp.float32),
             jnp.arange(n, dtype=jnp.float32) * 10,
             jnp.arange(n, dtype=jnp.float32) * 100)
    idx = jnp.asarray([5, 0, 3], jnp.int32)
    g = gather_struct(v, idx)
    np.testing.assert_allclose(np.asarray(g.x), [5, 0, 3])
    np.testing.assert_allclose(np.asarray(g.z), [500, 0, 300])
    # and back (memory2.cpp scatter side)
    dst = zeros_like(v)
    dst = scatter_struct(dst, g, idx)
    np.testing.assert_allclose(np.asarray(dst.y)[np.asarray(idx)],
                               [50, 0, 30])


def test_strided_gather():
    # memory2.cpp test08_nested_gather_strides: a stride-S gather is a
    # reshaped row gather under static shapes
    S = 4
    flat = jnp.arange(32, dtype=jnp.float32)      # 8 records x stride 4
    recs = flat.reshape(-1, S)
    idx = jnp.asarray([7, 2, 0], jnp.int32)
    g = ops.gather(recs, idx)                     # leading-axis gather
    np.testing.assert_allclose(np.asarray(g),
                               np.arange(32).reshape(-1, S)[[7, 2, 0]])


def test_masked_gather_int():
    # memory2.cpp test09_gather_mask on an integer type
    src = jnp.asarray([10, 20, 30, 40], jnp.int32)
    idx = jnp.asarray([3, 1, 0, 2], jnp.int32)
    m = jnp.asarray([True, False, True, False])
    out = ops.gather(src, idx, mask=m, fill=-1)
    np.testing.assert_array_equal(np.asarray(out), [40, -1, 10, -1])


def test_transform_read_modify_write():
    # memory2.cpp test03_transform: x[idx] = f(x[idx]) with duplicate
    # handling left to f being order-independent (here: +1 via the
    # scatter_add path used by the reference's atomic transform)
    x = jnp.zeros(4, jnp.float32)
    idx = jnp.asarray([0, 1, 1, 3], jnp.int32)
    out = ops.scatter_add(x, jnp.ones(4, jnp.float32), idx)
    np.testing.assert_allclose(np.asarray(out), [1, 2, 0, 1])
    # general transform (gather -> f -> scatter), unique indices
    out2 = ops.transform(jnp.arange(4, dtype=jnp.float32),
                         jnp.asarray([2, 0], jnp.int32),
                         lambda cur: cur * 10.0)
    np.testing.assert_allclose(np.asarray(out2), [0, 1, 20, 3])


def test_extract_and_compress_roundtrip():
    # memory2.cpp test01_extract + test02_compress
    x = jnp.asarray([1., 2., 3., 4., 5.], jnp.float32)
    m = jnp.asarray([False, True, False, True, True])
    assert float(ops.extract(x, m)[0]) == 2.0
    packed, cnt = ops.compress(x, m)
    assert int(cnt) == 3
    np.testing.assert_allclose(np.asarray(packed)[:3], [2, 4, 5])


def test_nested_struct_reduction_pipeline():
    # the nested.cpp flavor end to end: Vec3 lanes -> dot -> reduce
    n = 16
    v = Vec3(jnp.ones(n), jnp.full(n, 2.0), jnp.full(n, 3.0))
    d = dot3(v, v)          # per-lane |v|^2 = 14
    np.testing.assert_allclose(np.asarray(d), np.full(n, 14.0))
    assert float(ops.hsum(d)) == 14.0 * n


def test_range_packets_1d():
    # memory2.cpp test06_range: sum over [0, n) via masked index packets
    n, w = 23, 8
    acc = 0.0
    for idx, m in ops.range_packets(n, w):
        acc += float(ops.hsum(ops.select(m, idx, 0)))
        assert idx.shape == (w,)
    assert acc == float(np.arange(n).sum())


def test_range_packets_2d():
    # memory2.cpp test07_range_2d: x varies fastest; masks drop the tail
    nx, ny, w = 5, 3, 4
    seen = np.zeros((ny, nx), bool)
    for (ix, iy), m in ops.range_packets((nx, ny), w, dim=2):
        for a, b, keep in zip(np.asarray(ix), np.asarray(iy), np.asarray(m)):
            if keep:
                assert not seen[b, a]
                seen[b, a] = True
    assert seen.all()


def test_unit_angle():
    from enoki_tpu.render.vec import Vec3, unit_angle, unit_angle_z, normalize3

    rng = np.random.default_rng(3)
    a = rng.normal(size=(3, 64)).astype(np.float32)
    b = rng.normal(size=(3, 64)).astype(np.float32)
    va = normalize3(Vec3(*map(jnp.asarray, a)))
    vb = normalize3(Vec3(*map(jnp.asarray, b)))
    got = np.asarray(unit_angle(va, vb))
    an = np.stack([np.asarray(va.x), np.asarray(va.y), np.asarray(va.z)])
    bn = np.stack([np.asarray(vb.x), np.asarray(vb.y), np.asarray(vb.z)])
    want = np.arccos(np.clip((an * bn).sum(0), -1, 1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # near-parallel accuracy: acos(dot) would be catastrophically wrong
    eps = np.float32(1e-4)
    v1 = normalize3(Vec3(jnp.asarray([1.0]), jnp.asarray([0.0]),
                         jnp.asarray([0.0])))
    v2 = normalize3(Vec3(jnp.asarray([1.0]), jnp.asarray([eps]),
                         jnp.asarray([0.0])))
    np.testing.assert_allclose(float(unit_angle(v1, v2)[0]), eps, rtol=1e-3)
    # z-axis variant
    gz = np.asarray(unit_angle_z(va))
    wz = np.arccos(np.clip(an[2], -1, 1))
    np.testing.assert_allclose(gz, wz, rtol=1e-4, atol=1e-5)


def test_lazy_bit_counts():
    from enoki_tpu.trace import LazyArray

    v = np.array([1, 2, 8, 0x80000000, 0], np.uint32)
    lx = LazyArray(v)
    lz = ops.lzcnt(lx)
    np.testing.assert_array_equal(lz.numpy(), [31, 30, 28, 0, 32])
    tz = ops.tzcnt(lx)
    np.testing.assert_array_equal(tz.numpy(), [0, 1, 3, 31, 32])
    l2 = ops.log2i(LazyArray(np.array([1, 2, 8, 1024], np.uint32)))
    np.testing.assert_array_equal(l2.numpy(), [0, 1, 3, 10])
