"""ULP accuracy suite for the polynomial transcendental implementations.

Port of the reference's probe_accuracy methodology (tests/test.h:206-307)
with the published bounds of docs/reference.rst:1285-1527 (BASELINE.md §A):

  f32 sin/cos |x|<8192 : 0.25 ulp avg, 19/47 ulp max
  f32 tan               : 0.42 ulp avg, 30 ulp max
  f32 asin/acos         : 2/1 ulp max (we allow small slack)
  f32 atan |x|<1        : 4.9 ulp avg, 12 ulp max
  f32 exp -20..30       : 0.27 ulp avg, 1 ulp max
  f32 log 1e-20..2e30   : 0.0013 ulp avg, 1 ulp max
  f32 sinh/cosh/tanh -10..10 : 3/4/7 ulp max

All tests run the "poly" implementation (our own Estrin/Cody-Waite code --
the path Pallas kernels use). The "native" implementations are XLA's and
are assumed correct.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from enoki_tpu.ops import math as M
from conftest import check_accuracy

POLY = "poly"


def _j(fn, **kw):
    return jax.jit(lambda x: fn(x, impl=POLY))


def test_sin_f32():
    # baseline: 0.25 avg / 19 max. The 4-chunk exact reduction (r2)
    # measures ~0.38 avg / ~2.4 max -- bound at 5 for sampling slack.
    check_accuracy(_j(M.sin), np.sin, -8192.0, 8192.0,
                   max_ulp=5, mean_ulp=0.45)


def test_cos_f32():
    # baseline: 0.25 avg / 47 max -- we beat the max bound ~20x
    check_accuracy(_j(M.cos), np.cos, -8192.0, 8192.0,
                   max_ulp=5, mean_ulp=0.45)


def test_sincos_consistent():
    x = jnp.linspace(-100, 100, 10001, dtype=jnp.float32)
    s, c = M.sincos(x, POLY)
    assert np.allclose(s, M.sin(x, POLY), atol=0)
    assert np.allclose(c, M.cos(x, POLY), atol=0)


def test_tan_f32():
    # baseline: 0.42 avg / 30 max -- measured ~0.52 / ~3.5 with the
    # 4-chunk reduction
    check_accuracy(_j(M.tan), np.tan, -8192.0, 8192.0,
                   max_ulp=7, mean_ulp=0.6)


def test_asin_f32():
    # Cephes-class fit: ~3.5 ulp worst-case near the 0.5 branch point
    check_accuracy(_j(M.asin), np.arcsin, -1.0, 1.0, max_ulp=4.0, mean_ulp=0.5)


def test_acos_f32():
    check_accuracy(_j(M.acos), np.arccos, -1.0, 1.0, max_ulp=4.0, mean_ulp=0.5)


def test_atan_f32():
    check_accuracy(_j(M.atan), np.arctan, -1.0, 1.0, max_ulp=12, mean_ulp=5.0)
    check_accuracy(_j(M.atan), np.arctan, -1000.0, 1000.0, max_ulp=12, mean_ulp=5.0)


def test_atan2_f32():
    rng = np.random.default_rng(1)
    y = rng.uniform(-10, 10, 100000).astype(np.float32)
    x = rng.uniform(-10, 10, 100000).astype(np.float32)
    got = np.asarray(M.atan2(jnp.asarray(y), jnp.asarray(x), POLY), np.float64)
    want = np.arctan2(y.astype(np.float64), x.astype(np.float64))
    assert np.abs(got - want).max() < 1e-5
    # quadrant edges
    for yy, xx in [(0.0, 1.0), (0.0, -1.0), (1.0, 0.0), (-1.0, 0.0)]:
        assert np.isclose(float(M.atan2(jnp.float32(yy), jnp.float32(xx), POLY)),
                          np.arctan2(yy, xx), atol=1e-6)


def test_exp_f32():
    check_accuracy(_j(M.exp), np.exp, -20.0, 30.0, max_ulp=1.0, mean_ulp=0.3)


def test_exp_f32_edges():
    assert M.exp(jnp.float32(1000.0), POLY) == np.inf
    assert M.exp(jnp.float32(-1000.0), POLY) == 0.0
    assert M.exp(jnp.float32(0.0), POLY) == 1.0


def test_log_f32():
    check_accuracy(_j(M.log), np.log, 1e-20, 2e30, max_ulp=1.0,
                   mean_ulp=0.02, log_space=True)


def test_log_f32_edges():
    assert M.log(jnp.float32(0.0), POLY) == -np.inf
    assert np.isnan(M.log(jnp.float32(-1.0), POLY))
    assert M.log(jnp.float32(np.inf), POLY) == np.inf
    assert M.log(jnp.float32(1.0), POLY) == 0.0


def test_exp2_log2_f32():
    check_accuracy(_j(M.exp2), np.exp2, -20.0, 30.0, max_ulp=2.0, mean_ulp=0.5)
    check_accuracy(_j(M.log2), np.log2, 1e-20, 2e30, max_ulp=2.5,
                   mean_ulp=0.5, log_space=True)


def test_hyperbolic_f32():
    check_accuracy(_j(M.sinh), np.sinh, -10.0, 10.0, max_ulp=3.0, mean_ulp=0.6)
    check_accuracy(_j(M.cosh), np.cosh, -10.0, 10.0, max_ulp=4.0, mean_ulp=0.6)
    check_accuracy(_j(M.tanh), np.tanh, -10.0, 10.0, max_ulp=7.0, mean_ulp=0.6)


def test_inverse_hyperbolic_f32():
    check_accuracy(_j(M.asinh), np.arcsinh, -30.0, 30.0, max_ulp=6.0, mean_ulp=1.0)
    check_accuracy(_j(M.acosh), np.arccosh, 1.0, 1000.0, max_ulp=6.0, mean_ulp=1.0)
    check_accuracy(_j(M.atanh), np.arctanh, -0.999, 0.999, max_ulp=6.0, mean_ulp=1.0)


def test_cbrt_f32():
    check_accuracy(_j(M.cbrt), np.cbrt, -100.0, 100.0, max_ulp=4.0, mean_ulp=1.0)


def test_pow_f32():
    rng = np.random.default_rng(2)
    x = rng.uniform(0.01, 100.0, 100000).astype(np.float32)
    y = rng.uniform(-3, 3, 100000).astype(np.float32)
    got = np.asarray(M.pow(jnp.asarray(x), jnp.asarray(y), POLY), np.float64)
    want = np.power(x.astype(np.float64), y.astype(np.float64))
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-5


def test_f64_exp():
    # BASELINE.md: f64 exp 0.16 ulp avg, 2 ulp max
    with jax.enable_x64():
        check_accuracy(lambda x: M.exp(jnp.asarray(x, jnp.float64), POLY),
                       np.exp, -700.0, 700.0, max_ulp=2.0, mean_ulp=0.5,
                       dtype=np.float64)


def test_f64_log():
    # BASELINE.md: f64 log 0.0013 ulp avg, 1 ulp max (allow +1 because the
    # numpy reference itself is the same precision)
    with jax.enable_x64():
        check_accuracy(lambda x: M.log(jnp.asarray(x, jnp.float64), POLY),
                       np.log, 1e-300, 1e300, max_ulp=2.0, mean_ulp=0.5,
                       dtype=np.float64, log_space=True)


def test_f64_sincos():
    with jax.enable_x64():
        check_accuracy(lambda x: M.sin(jnp.asarray(x, jnp.float64), POLY),
                       np.sin, -8192.0, 8192.0, max_ulp=2.0, mean_ulp=0.5,
                       dtype=np.float64)
        check_accuracy(lambda x: M.cos(jnp.asarray(x, jnp.float64), POLY),
                       np.cos, -8192.0, 8192.0, max_ulp=2.0, mean_ulp=0.5,
                       dtype=np.float64)


def test_f64_inverse_trig():
    # r2: own double-precision kernels (tools/fit_math_f64.py) -- no
    # more native fallback on _is64
    with jax.enable_x64():
        def j64(fn):
            return lambda x: fn(jnp.asarray(x, jnp.float64), POLY)
        check_accuracy(j64(M.asin), np.arcsin, -1.0, 1.0, max_ulp=3.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.acos), np.arccos, -1.0, 1.0, max_ulp=3.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.atan), np.arctan, -1000.0, 1000.0, max_ulp=2.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.tan), np.tan, -8192.0, 8192.0, max_ulp=3.0,
                       mean_ulp=0.6, dtype=np.float64)


def test_f64_hyperbolic():
    with jax.enable_x64():
        def j64(fn):
            return lambda x: fn(jnp.asarray(x, jnp.float64), POLY)
        check_accuracy(j64(M.sinh), np.sinh, -700.0, 700.0, max_ulp=3.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.cosh), np.cosh, -700.0, 700.0, max_ulp=3.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.tanh), np.tanh, -20.0, 20.0, max_ulp=3.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.asinh), np.arcsinh, -30.0, 30.0, max_ulp=3.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.acosh), np.arccosh, 1.0, 1000.0, max_ulp=2.0,
                       mean_ulp=0.5, dtype=np.float64)
        check_accuracy(j64(M.atanh), np.arctanh, -0.999, 0.999, max_ulp=2.0,
                       mean_ulp=0.5, dtype=np.float64)


def test_misc():
    assert M.hypot(jnp.float32(3.0), jnp.float32(4.0)) == 5.0
    assert M.hypot(jnp.float32(0.0), jnp.float32(0.0)) == 0.0
    # overflow-safe: naive sqrt(a^2+b^2) would overflow at 1e38
    big = jnp.float32(1e38)
    assert np.isclose(float(M.hypot(big, big)), np.hypot(1e38, 1e38), rtol=1e-6)
    assert float(M.fmod(jnp.float32(5.5), jnp.float32(2.0))) == 1.5
