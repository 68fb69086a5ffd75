"""Exhaustive width sweep -- parity with the reference's test matrix.

The reference instantiates every test at sizes 1,2,3,4,8,16,31,32
(tests/test.h:470-479), deliberately including non-powers-of-two to
exercise recursive-split and partial-packet paths. The XLA analog:
non-(8,128)-aligned shapes exercise padding/masked-tile lowering. Sweep
the core op classes over the same widths.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enoki_tpu import ops
from enoki_tpu.types import PCG32

WIDTHS = [1, 2, 3, 4, 8, 16, 31, 32, 127, 1000]


@pytest.mark.parametrize("n", WIDTHS)
def test_math_all_widths(n):
    x = jnp.linspace(0.1, 1.5, n)
    got = np.asarray(jax.jit(lambda v: ops.sin(v) * ops.exp(v)
                             + ops.sqrt(ops.abs_(v)))(x))
    xs = np.linspace(0.1, 1.5, n)
    np.testing.assert_allclose(got, np.sin(xs) * np.exp(xs) + np.sqrt(xs),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("n", WIDTHS)
def test_horizontal_all_widths(n):
    x = jnp.arange(n, dtype=jnp.float32)
    assert float(ops.hsum(x)) == n * (n - 1) / 2
    assert float(ops.hmax(x)) == n - 1
    np.testing.assert_allclose(np.asarray(ops.psum(x)),
                               np.cumsum(np.arange(n, dtype=np.float64)),
                               rtol=1e-6)


@pytest.mark.parametrize("n", WIDTHS)
def test_gather_scatter_all_widths(n):
    rng = np.random.default_rng(n)
    src = jnp.asarray(rng.normal(size=n).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    np.testing.assert_allclose(np.asarray(ops.gather(src, idx)),
                               np.asarray(src)[np.asarray(idx)])
    tgt = ops.scatter_add(jnp.zeros(n), jnp.ones(n), idx)
    want = np.zeros(n)
    np.add.at(want, np.asarray(idx), 1.0)
    np.testing.assert_allclose(np.asarray(tgt), want)


@pytest.mark.parametrize("n", [1, 3, 31, 32, 127])
def test_pcg32_all_widths(n):
    gen = PCG32.create(n)
    u, gen2 = gen.next_uint32()
    assert u.shape == (n,)
    # per-lane streams: all lanes distinct (initseq = arange + stream)
    if n > 1:
        assert len(np.unique(np.asarray(u))) == n


@pytest.mark.parametrize("n", [1, 3, 31, 1000])
def test_select_mask_all_widths(n):
    x = jnp.arange(n, dtype=jnp.float32)
    m = x > n / 2
    z = np.asarray(ops.select(m, x, -x))
    xs = np.arange(n, dtype=np.float32)
    np.testing.assert_allclose(z, np.where(xs > n / 2, xs, -xs))


@pytest.mark.parametrize("n", WIDTHS)
def test_lazy_trace_all_widths(n):
    # the reference's width matrix applied to FloatC (lazy) programs:
    # elementwise chain + reduction + gather + scatter_add, every width
    # incl. non-powers-of-two, one fused program each
    import enoki_tpu.trace as tr
    from enoki_tpu.trace import LazyArray

    tr.reset()
    xs = np.linspace(0.1, 1.5, n).astype(np.float32)
    x = LazyArray(xs)
    y = tr.sin(x) * tr.exp(x) + tr.sqrt(abs(x))
    want = np.sin(xs) * np.exp(xs) + np.sqrt(np.abs(xs))
    np.testing.assert_allclose(y.numpy(), want, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(y.hsum().numpy(), [want.sum()], rtol=1e-4)

    idx = LazyArray(np.arange(n - 1, -1, -1, dtype=np.int32))
    np.testing.assert_allclose(x.gather(idx).numpy(), xs[::-1], rtol=1e-7)

    tgt = LazyArray(np.zeros(max(n // 2, 1), np.float32))
    bins = LazyArray((np.arange(n) % max(n // 2, 1)).astype(np.int32))
    tgt.scatter_add(bins, x)
    want_h = np.zeros(max(n // 2, 1), np.float32)
    np.add.at(want_h, np.arange(n) % max(n // 2, 1), xs)
    np.testing.assert_allclose(tgt.numpy(), want_h, rtol=1e-5, atol=1e-6)
    tr.reset()
