"""Mechanical sweep of the 'one source, every backend' property.

For EVERY routed free function in the public ops surface, call it with
jnp arrays and with LazyArrays on the same inputs and assert (a) the
lazy call stays on the trace (returns LazyArray) and (b) the results
agree. This is the array_router.h:23-158 contract as a property test:
a function accidentally left off the lazy route fails here the day it
is added.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray
from enoki_tpu import ops
from enoki_tpu.ops import math as M
from enoki_tpu.ops import special as S


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


POS = np.linspace(0.05, 2.5, 41).astype(np.float32)        # positive domain
SYM = np.linspace(-1.4, 1.4, 41).astype(np.float32)        # symmetric
UNIT = np.linspace(-0.97, 0.97, 41).astype(np.float32)     # open unit
GT1 = np.linspace(1.05, 4.0, 41).astype(np.float32)        # > 1

# (function, (input domains...)) -- unary unless two domains given
UNARY = [
    (M.sin, SYM), (M.cos, SYM), (M.tan, UNIT), (M.cot, POS),
    (M.asin, UNIT), (M.acos, UNIT), (M.atan, SYM),
    (M.exp, SYM), (M.exp2, SYM), (M.log, POS), (M.log2, POS),
    (M.log1p, POS), (M.expm1, SYM), (M.cbrt, SYM),
    (M.sinh, SYM), (M.cosh, SYM), (M.tanh, SYM),
    (M.csch, POS), (M.sech, SYM), (M.coth, POS),
    (M.asinh, SYM), (M.acosh, GT1), (M.atanh, UNIT),
    (S.erf, SYM), (S.erfc, SYM), (S.erfinv, UNIT),
    (S.dawson, SYM), (S.erfi, UNIT), (S.i0e, SYM),
    (S.lgamma, POS), (S.tgamma, POS), (S.gamma, POS),
    (S.comp_ellint_1, UNIT * 0.6), (S.comp_ellint_2, UNIT * 0.6),
    (ops.sqrt, POS), (ops.rsqrt, POS), (ops.rcp, POS),
    (ops.safe_sqrt, SYM), (ops.safe_rsqrt, SYM),
    (ops.safe_asin, UNIT), (ops.safe_acos, UNIT),
    (ops.abs_, SYM), (ops.sqr, SYM), (ops.sign, SYM),
    (ops.isnan, SYM), (ops.isinf, SYM), (ops.isfinite, SYM),
    (ops.floor, SYM * 3), (ops.ceil, SYM * 3), (ops.trunc, SYM * 3),
    (ops.round_, SYM * 3), (ops.round_half_away, SYM * 3),
    (ops.reverse, SYM),
]

BINARY = [
    (M.atan2, SYM, POS), (M.pow, POS, SYM), (M.fmod, SYM, POS),
    (M.hypot, SYM, POS),
    (ops.copysign, POS, SYM), (ops.mulsign, POS, SYM),
    (S.carlson_rc, POS, POS + 0.3),
    (S.ellint_1, SYM, UNIT * 0.5), (S.ellint_2, SYM, UNIT * 0.5),
]

TERNARY = [
    (ops.fmadd, SYM, POS, SYM), (ops.fmsub, SYM, POS, SYM),
    (ops.fnmadd, SYM, POS, SYM), (ops.fnmsub, SYM, POS, SYM),
    (ops.fmaddsub, SYM, POS, SYM), (ops.fmsubadd, SYM, POS, SYM),
    (ops.clamp, SYM * 2, SYM * 0 - 1.0, SYM * 0 + 1.0),
    (ops.lerp, SYM, POS, UNIT * 0.5 + 0.5),
    (S.carlson_rf, POS, POS + 0.2, POS + 0.4),
    (S.carlson_rd, POS, POS + 0.2, POS + 0.4),
    (S.ellint_3, SYM, UNIT * 0.5, UNIT * 0.3),
]


def _check(fn, *domains):
    eager = fn(*[jnp.asarray(d) for d in domains])
    lazy = fn(*[LazyArray(d) for d in domains])
    assert isinstance(lazy, LazyArray), \
        f"{fn.__name__} left the lazy backend: {type(lazy)}"
    e = np.asarray(eager, np.float64)
    l = np.asarray(lazy.numpy(), np.float64)
    # the backends may use different elementary lowerings (XLA native vs
    # poly) -- the reference's per-backend transcendental split; a few
    # ulp of slack, with equal_nan for shared domain edges
    np.testing.assert_allclose(l, e, rtol=3e-5, atol=2e-6, equal_nan=True,
                               err_msg=fn.__name__)


@pytest.mark.parametrize("fn,dom", UNARY,
                         ids=[f.__name__ for f, _ in UNARY])
def test_unary_unified(fn, dom):
    _check(fn, dom)


@pytest.mark.parametrize("fn,d1,d2", BINARY,
                         ids=[f.__name__ for f, *_ in BINARY])
def test_binary_unified(fn, d1, d2):
    _check(fn, d1, d2)


@pytest.mark.parametrize("fn,d1,d2,d3", TERNARY,
                         ids=[f.__name__ for f, *_ in TERNARY])
def test_ternary_unified(fn, d1, d2, d3):
    _check(fn, d1, d2, d3)


def test_sincos_and_sincosh_unified():
    for fn in (M.sincos, M.sincosh):
        es, ec = fn(jnp.asarray(SYM))
        ls, lc = fn(LazyArray(SYM))
        assert isinstance(ls, LazyArray) and isinstance(lc, LazyArray)
        np.testing.assert_allclose(ls.numpy(), np.asarray(es), rtol=2e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(lc.numpy(), np.asarray(ec), rtol=2e-5,
                                   atol=1e-6)


def test_reductions_unified():
    x = POS
    for fn in (ops.hsum, ops.hprod, ops.hmax, ops.hmin, ops.hmean,
               ops.psum):
        e = np.asarray(fn(jnp.asarray(x)), np.float64)
        out = fn(LazyArray(x))
        assert isinstance(out, LazyArray), fn.__name__
        l = np.asarray(out.numpy(), np.float64)
        np.testing.assert_allclose(l.reshape(-1), np.atleast_1d(e),
                                   rtol=2e-4, err_msg=fn.__name__)
    m = x > 1.0
    for fn in (ops.all_, ops.any_, ops.none, ops.count):
        e = np.asarray(fn(jnp.asarray(m)))
        out = fn(LazyArray(m))
        assert isinstance(out, LazyArray), fn.__name__
        np.testing.assert_array_equal(out.numpy().reshape(-1),
                                      np.atleast_1d(e), err_msg=fn.__name__)
