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
