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


# Poly-capable transcendentals: impl="poly" must be HONORED on the lazy
# backend (round 4; extends one-source to the accuracy dimension -- the
# reference's CUDA backend forces HW approx, cuda.h:433-453, but our
# ops/math.py kernels are written against a generic primitive namespace
# so the same Cody-Waite source records trace opcodes).
POLY_FNS = [
    (M.sin, SYM * 100), (M.cos, SYM * 100), (M.tan, SYM * 30),
    (M.asin, UNIT), (M.acos, UNIT), (M.atan, SYM * 30),
    (M.exp, SYM * 30), (M.exp2, SYM * 30), (M.log, POS), (M.log2, POS),
    (M.cbrt, SYM * 1e4), (M.sinh, SYM * 30), (M.cosh, SYM * 30),
    (M.tanh, SYM * 5), (M.asinh, SYM * 1e3), (M.acosh, GT1 * 100),
    (M.atanh, UNIT), (M.csc, POS), (M.sec, SYM), (M.cot, POS),
    (M.csch, POS), (M.sech, SYM), (M.coth, POS),
]


@pytest.mark.parametrize("fn,dom", POLY_FNS,
                         ids=[f.__name__ for f, _ in POLY_FNS])
def test_lazy_impl_poly_honored(fn, dom):
    """impl='poly' on a LazyArray (a) stays on the trace, (b) records the
    polynomial program (more ops than the single native opcode -- the
    impl-SENSITIVITY assertion: a silently-dropped kwarg fails here) and
    (c) agrees with the eager poly result to FMA-contraction noise (the
    fused XLA program may contract a*b+c; a few ulp)."""
    tr.reset()
    x = LazyArray(dom)
    native = fn(x, "native")
    n_native = tr.stats()["n_appends"]
    tr.reset()
    x = LazyArray(dom)
    out = fn(x, "poly")
    n_poly = tr.stats()["n_appends"]
    assert isinstance(out, LazyArray), f"{fn.__name__} left the trace"
    assert n_poly > n_native + 3, \
        (f"{fn.__name__}(impl='poly') recorded {n_poly} ops vs native "
         f"{n_native}: the kwarg looks silently dropped")
    eager = np.asarray(fn(jnp.asarray(dom), "poly"), np.float64)
    lazy = np.asarray(out.numpy(), np.float64)
    np.testing.assert_allclose(lazy, eager, rtol=1e-6, atol=1e-30,
                               equal_nan=True, err_msg=fn.__name__)
    assert isinstance(native, LazyArray)


def test_lazy_impl_poly_binary():
    tr.reset()
    for fn, d1, d2 in [(M.atan2, SYM, POS), (M.pow, POS, SYM)]:
        out = fn(LazyArray(d1), LazyArray(d2), "poly")
        assert isinstance(out, LazyArray)
        eager = np.asarray(fn(jnp.asarray(d1), jnp.asarray(d2), "poly"),
                           np.float64)
        np.testing.assert_allclose(np.asarray(out.numpy(), np.float64),
                                   eager, rtol=1e-6, atol=1e-30,
                                   equal_nan=True, err_msg=fn.__name__)


def test_lazy_impl_poly_sincos_fuses_one_program():
    """sincos(impl='poly') shares ONE range reduction on the trace and the
    pair evaluates in one fused program."""
    tr.reset()
    s, c = M.sincos(LazyArray(SYM * 100), "poly")
    before = tr.stats()["n_evals"]
    tr.eval(s, c)
    assert tr.stats()["n_evals"] == before + 1
    np.testing.assert_allclose(s.numpy(), np.sin(SYM * 100), rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(c.numpy(), np.cos(SYM * 100), rtol=2e-5,
                               atol=1e-6)


def test_lazy_impl_poly_bf16_policy():
    """16-bit lazy inputs run the poly kernel in f32 and round back
    (_bf16_safe is backend-generic)."""
    x = LazyArray(SYM.astype(np.dtype("bfloat16")))
    out = M.sin(x, "poly")
    assert isinstance(out, LazyArray)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out.numpy(), np.float32),
                               np.sin(SYM), atol=0.01)


def test_lazy_ldexp_frexp():
    """The dual-backend ldexp/frexp the lazy poly kernels ride on
    (router.py; exponent-field bit arithmetic as trace opcodes)."""
    from enoki_tpu import ops

    x = np.array([0.0, 1.5, -3.25, 1e-20, 7.0], np.float32)
    e = np.array([0, 3, -2, 10, -1], np.int32)
    got = ops.ldexp(LazyArray(x), LazyArray(e))
    assert isinstance(got, LazyArray)
    np.testing.assert_array_equal(got.numpy(), np.ldexp(x, e))
    m, ex = ops.frexp(LazyArray(x))
    assert isinstance(m, LazyArray) and isinstance(ex, LazyArray)
    m_ref, e_ref = np.frexp(x)
    np.testing.assert_array_equal(m.numpy(), m_ref)
    np.testing.assert_array_equal(ex.numpy(), e_ref)

    # r4 review: 2-byte float inputs must upcast to f32 like the eager
    # branch (bf16 kept its itemsize and crashed the int32 bitcast)
    xb = jnp.asarray([1.5, -3.25, 7.0], jnp.bfloat16)
    got_b = ops.ldexp(LazyArray(np.asarray(xb)), LazyArray(e[:3]))
    want_b = np.asarray(ops.ldexp(xb, jnp.asarray(e[:3])))
    np.testing.assert_array_equal(got_b.numpy(), want_b)
    mb, eb = ops.frexp(LazyArray(np.asarray(xb)))
    mb_ref, eb_ref = ops.frexp(xb)
    np.testing.assert_array_equal(mb.numpy(), np.asarray(mb_ref))
    np.testing.assert_array_equal(eb.numpy(), np.asarray(eb_ref))


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


def test_edge_semantics_match_across_backends():
    """r4 audit: edge-case semantics (negative indices, NaN, signed
    zero, int dtypes) must agree between the eager and lazy backends --
    the one-source property extended to the corners."""
    from enoki_tpu import ops

    # gather: negative index CLAMPS (XLA semantics) on both backends
    src = np.array([10.0, 20.0, 30.0], np.float32)
    e = np.asarray(ops.gather(jnp.asarray(src),
                              jnp.array([-1, 5], jnp.int32)))
    l = ops.gather(LazyArray(src),
                   LazyArray(np.array([-1, 5], np.int32))).numpy()
    np.testing.assert_array_equal(e, l)
    np.testing.assert_array_equal(e, [10.0, 30.0])

    # masked scatter_add: negative in-mask index is DROPPED on both
    e = np.asarray(ops.scatter_add(jnp.zeros(3, jnp.float32),
                                   jnp.float32(5.0),
                                   jnp.array([-1], jnp.int32),
                                   mask=jnp.array([True])))
    lt = LazyArray(np.zeros(3, np.float32))
    lt.numpy()
    ops.scatter_add(lt, LazyArray(np.array([5.0], np.float32)),
                    LazyArray(np.array([-1], np.int32)),
                    mask=LazyArray(np.array([True])))
    np.testing.assert_array_equal(e, lt.numpy())
    np.testing.assert_array_equal(e, 0.0)

    # safe_sqrt: NaN propagates on both (was laundered to 0.0 lazily)
    nan32 = np.array([np.nan, 4.0], np.float32)
    assert np.isnan(np.asarray(ops.safe_sqrt(jnp.asarray(nan32)))[0])
    got = ops.safe_sqrt(LazyArray(nan32)).numpy()
    assert np.isnan(got[0]) and got[1] == 2.0

    # copysign/mulsign on ints: value-correct on both (the sign-bit
    # trick is meaningless on two's-complement)
    a = np.array([1, -2], np.int32)
    b = np.array([-1, 3], np.int32)
    e_cs = np.asarray(ops.copysign(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_array_equal(e_cs, [-1.0, 2.0])
    e_ms = np.asarray(ops.mulsign(jnp.asarray(a), jnp.asarray(b)))
    l_ms = ops.mulsign(LazyArray(a), LazyArray(b)).numpy()
    np.testing.assert_array_equal(e_ms, [-1, -2])
    np.testing.assert_array_equal(l_ms, e_ms)

    # clamp: float bounds promote an int array on both backends
    xi = np.array([0, 1, 2], np.int32)
    e_c = np.asarray(ops.clamp(jnp.asarray(xi), 0.5, 1.5))
    l_c = ops.clamp(LazyArray(xi), 0.5, 1.5).numpy()
    np.testing.assert_allclose(e_c, [0.5, 1.0, 1.5])
    np.testing.assert_allclose(l_c, e_c)

    # ns_of().sign agrees at zero between namespaces (reference
    # semantics: sign(0)=1, sign(-0.0)=-1)
    from enoki_tpu.ops.backend import ns_of
    z = np.array([0.0, -0.0, 2.0, -3.0], np.float32)
    e_s = np.asarray(ns_of(jnp.asarray(z)).sign(jnp.asarray(z)))
    l_s = ns_of(LazyArray(z)).sign(LazyArray(z)).numpy()
    np.testing.assert_array_equal(e_s, [1.0, -1.0, 1.0, -1.0])
    np.testing.assert_array_equal(l_s, e_s)


def test_poly_special_values():
    """r4 audit: poly-path special values match native/IEEE."""
    from enoki_tpu import ops

    # log(NaN) must be NaN in poly mode (frexp strips the NaN exponent)
    v = np.asarray(ops.math.log(jnp.float32(np.nan), "poly"))
    assert np.isnan(v)
    v = ops.math.log(LazyArray(np.array([np.nan], np.float32)),
                     "poly").numpy()
    assert np.isnan(v[0])

    # atan2 zeros: (+-0, +0) = +-0, (+-0, -0.0) = +-pi (IEEE / native)
    for yv, xv, want in ((0.0, 0.0, 0.0), (-0.0, 0.0, -0.0),
                         (0.0, -0.0, np.pi), (-0.0, -0.0, -np.pi)):
        got = float(np.asarray(ops.math.atan2(jnp.float32(yv),
                                              jnp.float32(xv), "poly")))
        assert got == pytest.approx(want, abs=1e-6), (yv, xv, got)
        nat = float(np.asarray(jnp.arctan2(jnp.float32(yv),
                                           jnp.float32(xv))))
        assert got == pytest.approx(nat, abs=1e-6), (yv, xv, got, nat)

    # erfinv(+-1) = +-inf on the f32 poly path (was NaN)
    v = np.asarray(ops.special.erfinv(jnp.asarray(
        np.array([1.0, -1.0], np.float32)), "poly"))
    assert v[0] == np.inf and v[1] == -np.inf
    lv = ops.special.erfinv(LazyArray(np.array([1.0, -1.0], np.float32)),
                            "poly").numpy()
    np.testing.assert_array_equal(lv, v)


def test_hmean_empty_lazy_matches_eager():
    from enoki_tpu import ops
    e = np.asarray(ops.hmean(jnp.zeros(0, jnp.float32)))
    l = ops.hmean(LazyArray(np.zeros(0, np.float32))).numpy()
    assert np.isnan(e) and np.isnan(l).all()
