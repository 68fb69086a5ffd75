"""Router op tests -- mirrors reference tests/basic.cpp, memory.cpp coverage."""

import numpy as np
import jax.numpy as jnp
import pytest

from enoki_tpu import ops


def test_constructors():
    assert np.array_equal(ops.zeros(4), np.zeros(4, np.float32))
    assert np.array_equal(ops.full(3, 7.0), np.full(3, 7.0, np.float32))
    assert np.array_equal(ops.arange(5), np.arange(5))
    lin = ops.linspace(-1.2, 1.2, 5)
    assert np.allclose(lin, np.linspace(-1.2, 1.2, 5))
    # endpoints exact (reference linspace semantics)
    assert lin[0] == np.float32(-1.2) and lin[-1] == np.float32(1.2)


def test_meshgrid_matches_reference_layout():
    # array_utils.h:24: x varies fastest
    x = jnp.array([1.0, 2.0, 3.0])
    y = jnp.array([10.0, 20.0])
    xs, ys = ops.meshgrid(x, y)
    assert np.array_equal(xs, [1, 2, 3, 1, 2, 3])
    assert np.array_equal(ys, [10, 10, 10, 20, 20, 20])


def test_select_and_masked_assign():
    m = jnp.array([True, False, True])
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([9.0, 9.0, 9.0])
    assert np.array_equal(ops.select(m, a, b), [1, 9, 3])
    assert np.array_equal(ops.masked_assign(a, m, 0.0), [0, 2, 0])


def test_fused_ops():
    a, b, c = jnp.float32(2), jnp.float32(3), jnp.float32(4)
    assert ops.fmadd(a, b, c) == 10
    assert ops.fmsub(a, b, c) == 2
    assert ops.fnmadd(a, b, c) == -2
    assert ops.fnmsub(a, b, c) == -10


def test_fmaddsub_lane_alternation():
    a = jnp.array([1.0, 1.0, 2.0, 2.0])
    b = jnp.array([3.0, 3.0, 3.0, 3.0])
    c = jnp.array([1.0, 1.0, 1.0, 1.0])
    assert np.array_equal(ops.fmaddsub(a, b, c), [2, 4, 5, 7])
    assert np.array_equal(ops.fmsubadd(a, b, c), [4, 2, 7, 5])
    # 0-d inputs: a single (even) lane, no crash
    s = jnp.float32(2)
    assert ops.fmaddsub(s, s, s) == 2
    assert ops.fmsubadd(s, s, s) == 6


def test_bit_ops():
    x = jnp.array([0, 1, 2, 255, 2**31 - 1], jnp.uint32)
    assert np.array_equal(ops.popcnt(x), [0, 1, 1, 8, 31])
    assert np.array_equal(ops.lzcnt(x), [32, 31, 30, 24, 1])
    assert np.array_equal(ops.tzcnt(x), [32, 0, 1, 0, 0])
    assert ops.log2i(jnp.uint32(8)) == 3


def test_mulhi():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    b = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    want = ((a.astype(np.uint64) * b.astype(np.uint64)) >> 32).astype(np.uint32)
    got = ops.mulhi(jnp.asarray(a), jnp.asarray(b))
    assert np.array_equal(got, want)
    # signed
    sa = rng.integers(-2**31, 2**31, 1000, dtype=np.int64).astype(np.int32)
    sb = rng.integers(-2**31, 2**31, 1000, dtype=np.int64).astype(np.int32)
    want_s = ((sa.astype(np.int64) * sb.astype(np.int64)) >> 32).astype(np.int32)
    got_s = ops.mulhi(jnp.asarray(sa), jnp.asarray(sb))
    assert np.array_equal(got_s, want_s)


def test_rotate():
    x = jnp.array([0x80000001], jnp.uint32)
    assert np.asarray(ops.ror(x, 1))[0] == np.uint32(0xC0000000)
    assert np.asarray(ops.rol(x, 1))[0] == np.uint32(0x00000003)


def test_ldexp_frexp():
    x = jnp.array([1.5, -3.25, 1024.0, 0.0], jnp.float32)
    y = ops.ldexp(x, jnp.array([2, -1, 3, 5]))
    assert np.array_equal(y, [6.0, -1.625, 8192.0, 0.0])
    m, e = ops.frexp(jnp.array([8.0, 0.5, -5.0, 0.0], jnp.float32))
    want_m, want_e = np.frexp(np.array([8.0, 0.5, -5.0, 0.0], np.float32))
    assert np.allclose(m, want_m) and np.array_equal(e, want_e)


def test_gather_scatter():
    src = jnp.array([10.0, 20.0, 30.0, 40.0])
    idx = jnp.array([3, 0, 1])
    assert np.array_equal(ops.gather(src, idx), [40, 10, 20])
    m = jnp.array([True, False, True])
    assert np.array_equal(ops.gather(src, idx, mask=m), [40, 0, 20])

    tgt = jnp.zeros(4)
    out = ops.scatter(tgt, jnp.array([1.0, 2.0, 3.0]), idx)
    assert np.array_equal(out, [2, 3, 0, 1])
    out = ops.scatter(tgt, jnp.array([1.0, 2.0, 3.0]), idx, mask=m)
    assert np.array_equal(out, [0, 3, 0, 1])


def test_scatter_add_conflicts():
    # histogram-style conflict test (tests/histogram.cpp:54)
    tgt = jnp.zeros(4)
    idx = jnp.array([1, 1, 1, 2])
    out = ops.scatter_add(tgt, jnp.ones(4), idx)
    assert np.array_equal(out, [0, 3, 1, 0])
    m = jnp.array([True, True, False, True])
    out = ops.scatter_add(tgt, jnp.ones(4), idx, mask=m)
    assert np.array_equal(out, [0, 2, 1, 0])


def test_transform():
    # read-modify-write scatter (array_router.h:1171)
    tgt = jnp.array([1.0, 2.0, 3.0])
    out = ops.transform(tgt, jnp.array([0, 2]), lambda v: v * 10.0)
    assert np.array_equal(out, [10, 2, 30])


def test_sign_copysign_mulsign():
    x = jnp.array([-2.0, 3.0, -0.0, 0.0])
    assert np.array_equal(ops.sign(x), [-1, 1, -1, 1])
    assert np.array_equal(ops.copysign(jnp.full(4, 5.0), x), [-5, 5, -5, 5])
    assert np.array_equal(ops.mulsign(jnp.array([1.0, 2.0, 3.0, 4.0]), x),
                          [-1, 2, -3, 4])


def test_safe_math():
    assert ops.safe_sqrt(jnp.float32(-1.0)) == 0.0
    assert ops.safe_asin(jnp.float32(2.0)) == pytest.approx(np.pi / 2)
    assert ops.safe_acos(jnp.float32(-2.0)) == pytest.approx(np.pi)
    import jax
    # gradient of safe_sqrt at 0 must be finite (mask discipline, SURVEY §7)
    g = jax.grad(lambda v: ops.safe_sqrt(v))(jnp.float32(0.0))
    assert np.isfinite(g)


def test_lerp_clamp_misc():
    assert ops.lerp(jnp.float32(1.0), jnp.float32(3.0), jnp.float32(0.5)) == 2.0
    assert ops.lerp(jnp.float32(1.0), jnp.float32(3.0), jnp.float32(1.0)) == 3.0
    assert ops.clamp(jnp.float32(5.0), 0.0, 2.0) == 2.0
    assert np.array_equal(ops.reverse(jnp.array([1, 2, 3])), [3, 2, 1])
    assert np.array_equal(ops.tile(jnp.array([1, 2]), 2), [1, 2, 1, 2])
    assert np.array_equal(ops.repeat(jnp.array([1, 2]), 2), [1, 1, 2, 2])


def test_allclose():
    assert ops.allclose(jnp.array([1.0, 2.0]), jnp.array([1.0, 2.0 + 1e-6]))
    assert not ops.allclose(jnp.array([1.0]), jnp.array([1.1]))


def test_binary_search():
    # vectorized bisection over a sorted table (array_utils.h:153)
    import numpy as np
    table = jnp.asarray(np.array([1., 3., 5., 7., 9., 11.], np.float32))
    queries = jnp.asarray(np.array([0., 4., 9., 20.], np.float32))
    idx = ops.binary_search(0, len(table), lambda i: table[i] < queries)
    # first index where table[i] >= query
    np.testing.assert_array_equal(np.asarray(idx), [0, 2, 4, 6])


def test_binary_search_scalar_bounds_jit():
    import numpy as np
    table = jnp.asarray(np.linspace(0, 1, 100, dtype=np.float32))

    import jax

    @jax.jit
    def locate(q):
        return ops.binary_search(0, 100, lambda i: table[i] < q)

    q = jnp.asarray(np.array([0.005, 0.5, 0.995], np.float32))
    got = np.asarray(locate(q))
    want = np.searchsorted(np.linspace(0, 1, 100), np.array([0.005, .5, .995]))
    np.testing.assert_array_equal(got, want)


def test_scatter_add_dense_fast_path_matches_scatter():
    # the TPU dense-histogram fast path must be bit-identical to XLA
    # scatter for every mask/duplicate/out-of-range combination
    rng = np.random.default_rng(0)
    n, bins = 10_000, 32
    idx = rng.integers(-2, bins + 2, n).astype(np.int32)  # incl. OOB
    val = rng.normal(size=n).astype(np.float32)
    mask = rng.random(n) > 0.3
    tgt = rng.normal(size=bins).astype(np.float32)

    fast = ops.scatter_add(tgt, val, idx, mask=mask)  # n >= 64*bins
    # reference: numpy accumulation with the same drop semantics
    want = tgt.copy()
    for i in range(n):
        if mask[i] and 0 <= idx[i] < bins:
            want[idx[i]] += val[i]
    np.testing.assert_allclose(np.asarray(fast), want, rtol=1e-5, atol=1e-4)

    # below the density threshold the scatter path runs; same semantics
    small = ops.scatter_add(tgt, val[:100], idx[:100], mask=mask[:100])
    want2 = tgt.copy()
    for i in range(100):
        if mask[i] and 0 <= idx[i] < bins:
            want2[idx[i]] += val[i]
    np.testing.assert_allclose(np.asarray(small), want2, rtol=1e-5,
                               atol=1e-5)


def test_debug_bounds_mode_drops_oob_scatter():
    # r1 review: unmasked scatter with an out-of-range index is UB in the
    # reference and promise_in_bounds here; config.debug_bounds turns it
    # into a deterministic drop (trace-time knob)
    from enoki_tpu.config import config

    tgt = jnp.zeros(4, jnp.float32)
    idx = jnp.array([1, 7], jnp.int32)  # 7 is out of range
    val = jnp.array([5.0, 9.0], jnp.float32)
    config.debug_bounds = True
    try:
        out = ops.scatter(tgt, val, idx)
        np.testing.assert_array_equal(out, [0, 5, 0, 0])
        out = ops.scatter_add(tgt, val, idx)
        np.testing.assert_array_equal(out, [0, 5, 0, 0])
    finally:
        config.debug_bounds = False


def test_debug_bounds_lazy_scatter_drops_negative_index():
    # r3 review: the lazy backend's scatter let negative indices wrap
    # numpy-style even under debug_bounds -- exactly the corruption the
    # flag exists to catch. The record path now redirects them to the
    # dropped OOB slot (mirroring the eager fix above).
    from enoki_tpu.config import config
    from enoki_tpu.trace import LazyArray
    import enoki_tpu.trace as tr

    config.debug_bounds = True
    try:
        tgt = LazyArray(jnp.zeros(4, jnp.float32))
        idx = LazyArray(jnp.array([-1, 1], jnp.int32))
        val = LazyArray(jnp.array([7.0, 8.0], jnp.float32))
        tgt.scatter(idx, val)
        np.testing.assert_array_equal(np.asarray(tgt.jax()), [0, 8, 0, 0])
        tgt2 = LazyArray(jnp.zeros(4, jnp.float32))
        tgt2.scatter_add(idx, val)
        np.testing.assert_array_equal(np.asarray(tgt2.jax()), [0, 8, 0, 0])
        # through the router's lazy masked branch too
        tgt3 = LazyArray(jnp.zeros(4, jnp.float32))
        ops.scatter(tgt3, val, idx, mask=LazyArray(
            jnp.array([True, True])))
        np.testing.assert_array_equal(np.asarray(tgt3.jax()), [0, 8, 0, 0])
    finally:
        config.debug_bounds = False
    # fast mode still wraps (promise_in_bounds parity with the
    # reference's raw st.global)
    tgt4 = LazyArray(jnp.zeros(4, jnp.float32))
    tgt4.scatter(LazyArray(jnp.array([-1, 1], jnp.int32)),
                 LazyArray(jnp.array([7.0, 8.0], jnp.float32)))
    np.testing.assert_array_equal(np.asarray(tgt4.jax()), [0, 8, 0, 7])
    tr.reset()


def test_cross_and_sign_neg_variants():
    # the last unmapped array_router.h names: cross, copysign_neg,
    # mulsign_neg (both backends for the sign variants)
    import numpy as np
    from enoki_tpu.trace import LazyArray
    import enoki_tpu.trace as tr

    a = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(ops.cross(a, b)),
                               [[0, 0, 1], [1, 0, 0]])
    # Vec3 form (backend-generic)
    from enoki_tpu.render.vec import Vec3

    v1 = Vec3(jnp.asarray([1.0]), jnp.asarray([0.0]), jnp.asarray([0.0]))
    v2 = Vec3(jnp.asarray([0.0]), jnp.asarray([1.0]), jnp.asarray([0.0]))
    c = ops.cross(v1, v2)
    assert float(c.z[0]) == 1.0

    x = jnp.asarray([3.0, -3.0])
    s = jnp.asarray([2.0, 2.0])
    np.testing.assert_allclose(np.asarray(ops.copysign_neg(x, s)),
                               [-3.0, -3.0])
    np.testing.assert_allclose(np.asarray(ops.mulsign_neg(x, s)),
                               [-3.0, 3.0])
    tr.reset()
    lx = LazyArray(np.array([3.0, -3.0], np.float32))
    ls = LazyArray(np.array([2.0, 2.0], np.float32))
    np.testing.assert_allclose(ops.copysign_neg(lx, ls).numpy(),
                               [-3.0, -3.0])
    np.testing.assert_allclose(ops.mulsign_neg(lx, ls).numpy(),
                               [-3.0, 3.0])
    tr.reset()


def test_cross_lazy_flat_rejected():
    # regression (r3 review): flat 1-D LazyArrays cannot be crossed (no
    # component axis); silent de-lazification would break fusion/AD
    import numpy as np
    import pytest as _pytest
    from enoki_tpu.trace import LazyArray
    import enoki_tpu.trace as tr

    tr.reset()
    a = LazyArray(np.ones(3, np.float32))
    b = LazyArray(np.ones(3, np.float32))
    with _pytest.raises(TypeError, match="Vec3"):
        ops.cross(a, b)
    # the Vec3 form stays lazy
    from enoki_tpu.render.vec import Vec3

    v1 = Vec3(a, b * 0.0, b * 0.0)
    v2 = Vec3(b * 0.0, b, b * 0.0)
    c = ops.cross(v1, v2)
    assert isinstance(c.z, LazyArray)
    np.testing.assert_allclose(c.z.numpy(), [1, 1, 1])
    tr.reset()
