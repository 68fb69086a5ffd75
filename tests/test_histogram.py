"""Histogram mini-app -- parity with reference tests/histogram.cpp:
16M(scaled-down) normal-distributed samples via PCG32 + erfinv, binned with
masked conflict-safe scatter_add (histogram.cpp:37-61)."""

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu import ops
from enoki_tpu.types import PCG32


def test_histogram_normal_samples():
    n = 1 << 18
    gen = PCG32.create(n)

    @jax.jit
    def build(gen):
        u, gen = gen.next_float32()
        # Box-Muller-free normal sampling via the probit function,
        # exactly like the reference (histogram.cpp: erfinv(2u-1)*sqrt(2))
        g = ops.erfinv(2.0 * u - 1.0) * np.sqrt(2.0)
        # 64 bins over [-4, 4]
        bins = jnp.floor((g + 4.0) * 8.0).astype(jnp.int32)
        mask = (bins >= 0) & (bins < 64)
        hist = ops.scatter_add(jnp.zeros(64), jnp.ones_like(g), bins,
                               mask=mask)
        return hist

    hist = np.asarray(build(gen))
    assert hist.sum() <= n  # masked lanes dropped
    assert hist.sum() > n * 0.999  # nearly all in range
    # compare against the normal CDF per bin
    from scipy.stats import norm
    edges = np.linspace(-4, 4, 65)
    expect = (norm.cdf(edges[1:]) - norm.cdf(edges[:-1])) * n
    # chi-square-ish sanity: relative error on well-populated bins
    big = expect > 100
    rel = np.abs(hist[big] - expect[big]) / expect[big]
    assert rel.max() < 0.15, rel.max()


def test_scatter_add_conflict_all_same_bin():
    # extreme conflict case: every lane hits one bin (histogram.cpp:54
    # exercises the atomic path; XLA's scatter-add is deterministic)
    n = 4096
    out = ops.scatter_add(jnp.zeros(4), jnp.ones(n),
                          jnp.zeros(n, jnp.int32))
    assert float(out[0]) == n


def test_ops_histogram_counting_and_weighted():
    # ops.histogram: the dedicated histogram hot path (Pallas kernel on
    # TPU, dense equality-reduction fallback on CPU). OOB/negative drop.
    from enoki_tpu import ops

    rng = np.random.default_rng(7)
    idx = rng.integers(-3, 70, size=20000).astype(np.int32)
    keep = (idx >= 0) & (idx < 64)
    h = ops.histogram(idx, 64)
    np.testing.assert_array_equal(np.asarray(h),
                                  np.bincount(idx[keep], minlength=64))
    w = rng.normal(size=idx.size).astype(np.float32)
    hw = ops.histogram(idx, 64, w)
    want = np.zeros(64)
    np.add.at(want, idx[keep], w[keep])
    np.testing.assert_allclose(np.asarray(hw), want, rtol=1e-5, atol=1e-4)


def test_ops_histogram_weight_gradients():
    from enoki_tpu import ops

    idx = np.array([0, 3, 3, 5, 63, -1, 64], np.int32)
    w = jnp.ones(7, jnp.float32)
    g = jax.grad(lambda ww: ops.histogram(idx, 64, ww)[3])(w)
    np.testing.assert_allclose(np.asarray(g), (idx == 3).astype(np.float32))
    # dropped lanes get zero gradient
    g0 = jax.grad(lambda ww: jnp.sum(ops.histogram(idx, 64, ww)))(w)
    np.testing.assert_allclose(np.asarray(g0),
                               ((idx >= 0) & (idx < 64)).astype(np.float32))


def test_ops_histogram_lazy_backend():
    # one source, every backend: histogram over LazyArray records a
    # masked scatter_add chain and fuses
    import enoki_tpu.trace as tr
    from enoki_tpu.trace import LazyArray

    tr.reset()
    try:
        rng = np.random.default_rng(11)
        idx = rng.integers(-2, 20, size=4096).astype(np.int32)
        keep = (idx >= 0) & (idx < 16)
        out = ops.histogram(LazyArray(idx), 16)
        assert isinstance(out, LazyArray)
        np.testing.assert_array_equal(
            out.numpy(), np.bincount(idx[keep], minlength=16))
        w = rng.normal(size=idx.size).astype(np.float32)
        hw = ops.histogram(LazyArray(idx), 16, LazyArray(w))
        want = np.zeros(16)
        np.add.at(want, idx[keep], w[keep])
        np.testing.assert_allclose(hw.numpy(), want, rtol=1e-4, atol=1e-4)
    finally:
        tr.reset()


def test_ops_histogram_lazy_float_index_casts():
    # regression (r3 review): float indices cast to int32 on the lazy
    # path exactly like the eager path
    import enoki_tpu.trace as tr
    from enoki_tpu.trace import LazyArray

    tr.reset()
    try:
        v = np.array([0.0, 1.0, 2.0, 1.0], np.float32)
        e = np.asarray(ops.histogram(v, 4))
        l = ops.histogram(LazyArray(v), 4).numpy()
        np.testing.assert_array_equal(l, e)
        np.testing.assert_array_equal(l, [1, 2, 1, 0])
    finally:
        tr.reset()


def test_histogram_empty_pallas_is_zeros():
    # r4 audit: an empty index array ran a zero-instance grid, leaving
    # the pallas output uninitialized
    from enoki_tpu.ops.pallas_hist import histogram

    out = histogram(jnp.zeros((0,), jnp.int32), 64, impl="pallas")
    np.testing.assert_array_equal(np.asarray(out), np.zeros(64))
