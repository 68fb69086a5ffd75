"""One source, every backend: the public ops surface over LazyArray.

The reference's defining architectural property is that a single generic
numerical source instantiates for every backend because all operations
route through L2 free functions (array_router.h:23-158); in particular
ALL of special.h works on the lazy GPU type (special.h:168-650
instantiate for CUDAArray). This suite is the LazyArray port of the
special-function test matrix (reference tests/special.cpp) plus the
router/math surface: every function is called with a LazyArray and must
(a) stay lazy (recording trace ops, no eager eval), and (b) agree with
the eager path on the same inputs.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import scipy.special as sp

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray
from enoki_tpu import ops
from enoki_tpu.ops import special as S
from enoki_tpu.ops import math as M


@pytest.fixture(autouse=True)
def _fresh():
    tr.reset()
    yield
    tr.reset()


def _agree(lazy_out, eager_out, rtol=1e-6, atol=1e-7):
    np.testing.assert_allclose(
        np.asarray(lazy_out.numpy(), np.float64),
        np.asarray(eager_out, np.float64), rtol=rtol, atol=atol)


# ---------------------------------------------------------------------------
# special.cpp port over LazyArray (lazy == eager on the shared source)
# ---------------------------------------------------------------------------

X_ERF = np.linspace(-4.0, 4.0, 257).astype(np.float32)
X_POS = np.linspace(0.05, 8.0, 161).astype(np.float32)


@pytest.mark.parametrize("name,fn,ref,x", [
    ("erf", S.erf, sp.erf, X_ERF),
    ("erfc", S.erfc, sp.erfc, X_ERF),
    ("dawson", S.dawson, sp.dawsn, X_ERF),
    ("erfi", S.erfi, sp.erfi, np.linspace(-2, 2, 101).astype(np.float32)),
    ("i0e", S.i0e, sp.i0e, np.linspace(-20, 20, 161).astype(np.float32)),
    ("lgamma", S.lgamma, sp.gammaln, X_POS),
    ("tgamma", S.tgamma, sp.gamma, np.linspace(0.1, 8, 101).astype(np.float32)),
])
def test_lazy_special_matches_eager_and_scipy(name, fn, ref, x):
    lazy = fn(LazyArray(x), "poly")
    assert isinstance(lazy, LazyArray), f"{name} left the lazy backend"
    eager = fn(jnp.asarray(x), "poly")
    # tgamma = exp(lgamma): the backends use their own exp (XLA native vs
    # poly -- exactly the reference's per-backend transcendental split,
    # cuda.h:433), and exp amplifies the 1-ulp difference by |lgamma|
    _agree(lazy, eager, rtol=3e-6 if name == "tgamma" else 1e-6)
    want = ref(x.astype(np.float64))
    got = lazy.numpy().astype(np.float64)
    m = np.isfinite(want)
    np.testing.assert_allclose(got[m], want[m], rtol=3e-5, atol=1e-6)


def test_lazy_special_native_impl_routes_to_opcodes():
    # erf/erfc/lgamma have dedicated trace opcodes; impl="native" on a
    # LazyArray records those (identical to jax.scipy at eval)
    x = LazyArray(X_ERF)
    for fn, ref in [(S.erf, sp.erf), (S.erfc, sp.erfc)]:
        out = fn(x)  # default impl
        assert isinstance(out, LazyArray)
        np.testing.assert_allclose(out.numpy().astype(np.float64),
                                   ref(X_ERF.astype(np.float64)),
                                   rtol=1e-5, atol=1e-6)


def test_lazy_erfinv_matches_eager():
    x = np.linspace(-0.999, 0.999, 201).astype(np.float32)
    lazy = S.erfinv(LazyArray(x))
    assert isinstance(lazy, LazyArray)
    _agree(lazy, S.erfinv(jnp.asarray(x), "poly"))


def test_lazy_erfinv_f64_newton_polish():
    # the f64 polish (two complementary-Newton steps) runs over the
    # trace too: lazy f64 erfinv meets the same few-ulp bound as eager
    with jax.enable_x64():
        x = np.linspace(-0.99999, 0.99999, 257).astype(np.float64)
        lazy = S.erfinv(LazyArray(x), "poly")
        assert isinstance(lazy, LazyArray)
        got = lazy.numpy()
        want = sp.erfinv(x)
        spacing = np.spacing(np.abs(want))
        lazy_ulp = np.max(np.abs(got - want) / spacing)
        eager = np.asarray(S.erfinv(jnp.asarray(x), "poly"))
        eager_ulp = np.max(np.abs(eager - want) / spacing)
        # the polish runs over the trace too: lazy meets the SAME bound
        # as eager (both ~5 ulp on this grid; the r2 lazy path without
        # the Newton polish was ~1e-7 RELATIVE, i.e. thousands of ulp)
        assert lazy_ulp <= max(eager_ulp, 4.0) + 0.5


def test_lazy_carlson_and_ellint():
    y = np.linspace(0.1, 2.0, 63).astype(np.float32)
    pairs = [
        (S.carlson_rf(LazyArray(y), LazyArray(2 * y), LazyArray(3 * y)),
         S.carlson_rf(jnp.asarray(y), jnp.asarray(2 * y), jnp.asarray(3 * y))),
        (S.carlson_rd(LazyArray(y), LazyArray(2 * y), LazyArray(3 * y)),
         S.carlson_rd(jnp.asarray(y), jnp.asarray(2 * y), jnp.asarray(3 * y))),
        (S.carlson_rc(LazyArray(y), LazyArray(2 * y)),
         S.carlson_rc(jnp.asarray(y), jnp.asarray(2 * y))),
        (S.carlson_rj(LazyArray(y), LazyArray(2 * y), LazyArray(3 * y), 0.7),
         S.carlson_rj(jnp.asarray(y), jnp.asarray(2 * y), jnp.asarray(3 * y),
                      jnp.asarray(np.float32(0.7)))),
        (S.comp_ellint_1(LazyArray(y * 0.45)),
         S.comp_ellint_1(jnp.asarray(y * 0.45))),
        (S.ellint_2(LazyArray(y), 0.5),
         S.ellint_2(jnp.asarray(y), jnp.float32(0.5))),
        (S.ellint_3(LazyArray(y), 0.5, 0.3),
         S.ellint_3(jnp.asarray(y), jnp.float32(0.5), jnp.float32(0.3))),
    ]
    for lazy, eager in pairs:
        assert isinstance(lazy, LazyArray)
        _agree(lazy, eager, rtol=1e-5, atol=1e-6)


def test_lazy_special_is_one_fused_program():
    # a chain of special functions + arithmetic must reach eval as ONE
    # schedule (nothing inside forces evaluation)
    x = LazyArray(np.linspace(0.1, 0.9, 64).astype(np.float32))
    y = S.dawson(S.erf(x * 0.5, "poly") + 0.1) * S.i0e(x, "poly")
    n0 = tr.stats()["n_evals"]
    y.eval()
    assert tr.stats()["n_evals"] == n0 + 1


# ---------------------------------------------------------------------------
# math surface over LazyArray
# ---------------------------------------------------------------------------

def test_lazy_math_routes():
    x = np.linspace(0.1, 1.4, 77).astype(np.float32)
    lx = LazyArray(x)
    cases = [
        (M.sin, np.sin), (M.cos, np.cos), (M.tan, np.tan),
        (M.asin, lambda v: np.arcsin(v * 0.6)),  # placeholder replaced below
    ]
    for fn, ref in cases[:3]:
        out = fn(lx)
        assert isinstance(out, LazyArray)
        np.testing.assert_allclose(out.numpy(), ref(x.astype(np.float64)),
                                   rtol=1e-5, atol=1e-6)
    out = M.asin(LazyArray(x * 0.6))
    assert isinstance(out, LazyArray)
    np.testing.assert_allclose(out.numpy(), np.arcsin(x * 0.6), rtol=1e-5)
    for fn, ref in [(M.exp, np.exp), (M.log, np.log), (M.tanh, np.tanh),
                    (M.sinh, np.sinh), (M.cosh, np.cosh),
                    (M.cbrt, np.cbrt), (M.atan, np.arctan),
                    (M.log1p, np.log1p), (M.expm1, np.expm1),
                    (M.asinh, np.arcsinh),
                    (M.cot, lambda v: 1 / np.tan(v)),
                    (M.csch, lambda v: 1 / np.sinh(v)),
                    (M.sech, lambda v: 1 / np.cosh(v)),
                    (M.coth, lambda v: 1 / np.tanh(v))]:
        out = fn(lx)
        assert isinstance(out, LazyArray), fn.__name__
        np.testing.assert_allclose(out.numpy(), ref(x.astype(np.float64)),
                                   rtol=2e-5, atol=1e-6, err_msg=fn.__name__)
    s, c = M.sincos(lx)
    np.testing.assert_allclose((s * s + c * c).numpy(), np.ones_like(x),
                               rtol=1e-5)
    out = M.atan2(lx, 2.0)
    assert isinstance(out, LazyArray)
    np.testing.assert_allclose(out.numpy(), np.arctan2(x, 2.0), rtol=1e-5)
    out = M.hypot(lx, 0.5)
    np.testing.assert_allclose(out.numpy(), np.hypot(x, 0.5), rtol=1e-5)
    out = M.pow(lx, 2.5)
    np.testing.assert_allclose(out.numpy(), x.astype(np.float64) ** 2.5,
                               rtol=1e-5)
    out = M.fmod(lx, 0.3)
    np.testing.assert_allclose(out.numpy(), np.fmod(x, np.float32(0.3)),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# router surface over LazyArray
# ---------------------------------------------------------------------------

def test_lazy_router_select_gather_scatter():
    x = LazyArray(np.array([1., 2., 3., 4.], np.float32))
    m = x > 2.0
    out = ops.select(m, x * 10.0, -1.0)
    assert isinstance(out, LazyArray)
    np.testing.assert_allclose(out.numpy(), [-1, -1, 30, 40])

    idx = LazyArray(np.array([3, 0, 1], np.int32))
    g = ops.gather(x, idx)
    np.testing.assert_allclose(g.numpy(), [4, 1, 2])
    gm = ops.gather(x, idx, mask=LazyArray(np.array([True, False, True])),
                    fill=9.0)
    np.testing.assert_allclose(gm.numpy(), [4, 9, 2])

    tgt = LazyArray(np.zeros(4, np.float32))
    ops.scatter(tgt, LazyArray(np.array([5., 6.], np.float32)),
                LazyArray(np.array([1, 3], np.int32)))
    np.testing.assert_allclose(tgt.numpy(), [0, 5, 0, 6])

    tgt2 = LazyArray(np.zeros(3, np.float32))
    ops.scatter_add(tgt2, 1.0, LazyArray(np.array([0, 1, 1, 2, 2], np.int32)))
    np.testing.assert_allclose(tgt2.numpy(), [1, 2, 2])

    # masked scatter drops the masked-off lane
    tgt3 = LazyArray(np.zeros(4, np.float32))
    ops.scatter(tgt3, LazyArray(np.array([5., 6.], np.float32)),
                LazyArray(np.array([1, 3], np.int32)),
                mask=LazyArray(np.array([True, False])))
    np.testing.assert_allclose(tgt3.numpy(), [0, 5, 0, 0])


def test_lazy_router_misc():
    x = LazyArray(np.array([-2.0, -0.5, 0.5, 2.0], np.float32))
    np.testing.assert_allclose(ops.clamp(x, -1.0, 1.0).numpy(),
                               [-1, -0.5, 0.5, 1])
    np.testing.assert_allclose(ops.lerp(x, x * 0.0 + 10.0, 0.5).numpy(),
                               [4, 4.75, 5.25, 6])
    np.testing.assert_allclose(ops.sign(x).numpy(), [-1, -1, 1, 1])
    np.testing.assert_allclose(ops.copysign(x * 0.0 + 3.0, x).numpy(),
                               [-3, -3, 3, 3])
    np.testing.assert_allclose(ops.mulsign(x * 0.0 + 3.0, x).numpy(),
                               [-3, -3, 3, 3])
    np.testing.assert_allclose(ops.fmadd(x, 2.0, 1.0).numpy(),
                               [-3, 0, 2, 5])
    np.testing.assert_allclose(abs(ops.abs_(x).numpy() - [2, .5, .5, 2]).max(), 0)
    assert ops.isnan(x).numpy().sum() == 0
    assert ops.allclose(x, x)
    np.testing.assert_allclose(ops.sqrt(abs(x)).numpy(),
                               np.sqrt([2, .5, .5, 2]), rtol=1e-6)
    np.testing.assert_allclose(ops.rsqrt(abs(x)).numpy(),
                               1 / np.sqrt([2, .5, .5, 2]), rtol=1e-6)
    b = ops.reinterpret(x, jnp.uint32)
    assert isinstance(b, LazyArray)
    np.testing.assert_array_equal(
        b.numpy(), np.array([-2.0, -0.5, 0.5, 2.0], np.float32).view(np.uint32))
    u = LazyArray(np.array([0, 1, 7, 255], np.uint32))
    np.testing.assert_array_equal(ops.popcnt(u).numpy(), [0, 1, 3, 8])


def test_lazy_safe_math_values_and_grads():
    x = LazyArray(np.array([-1.0, 0.0, 4.0], np.float32))
    np.testing.assert_allclose(ops.safe_sqrt(x).numpy(), [0, 0, 2])
    np.testing.assert_allclose(ops.safe_rsqrt(x).numpy()[2], 0.5)
    a = LazyArray(np.array([-1.0, 0.0, 0.5, 1.0], np.float32))
    np.testing.assert_allclose(ops.safe_asin(a).numpy(),
                               np.arcsin([-1, 0, 0.5, 1]), rtol=1e-6)
    np.testing.assert_allclose(ops.safe_acos(a).numpy(),
                               np.arccos([-1, 0, 0.5, 1]), rtol=1e-6,
                               atol=1e-6)
    # gradient discipline: d safe_sqrt at the boundary is 0, not NaN
    xs = tr.requires_grad(LazyArray(np.array([0.0, 4.0], np.float32)))
    loss = ops.safe_sqrt(xs).hsum()
    tr.backward(loss)
    g = tr.gradient(xs).numpy()
    np.testing.assert_allclose(g, [0.0, 0.25])
    xa = tr.requires_grad(LazyArray(np.array([1.0, 0.5], np.float32)))
    tr.backward(ops.safe_asin(xa).hsum())
    ga = tr.gradient(xa).numpy()
    assert np.isfinite(ga).all()
    assert ga[0] == 0.0
    np.testing.assert_allclose(ga[1], 1 / np.sqrt(1 - 0.25), rtol=1e-5)


def test_lazy_horiz_routes():
    x = LazyArray(np.array([1., 2., 3., 4.], np.float32))
    assert float(ops.hsum(x).numpy()[0]) == 10.0
    assert float(ops.hprod(x).numpy()[0]) == 24.0
    assert float(ops.hmax(x).numpy()[0]) == 4.0
    assert float(ops.hmin(x).numpy()[0]) == 1.0
    assert float(ops.hmean(x).numpy()[0]) == 2.5
    np.testing.assert_allclose(ops.psum(x).numpy(), [1, 3, 6, 10])
    m = x > 2.0
    assert bool(ops.any_(m).numpy()[0])
    assert not bool(ops.all_(m).numpy()[0])
    assert int(ops.count(m).numpy()[0]) == 2
    assert float(ops.dot(x, x).numpy()[0]) == 30.0
    np.testing.assert_allclose(ops.normalize(x).numpy(),
                               np.arange(1, 5) / np.sqrt(30), rtol=1e-6)
    packed, cnt = ops.compress(x, m)
    np.testing.assert_allclose(packed.numpy(), [3, 4, 0, 0])
    assert int(cnt.numpy()[0]) == 2
    np.testing.assert_allclose(ops.reverse(x).numpy(), [4, 3, 2, 1])


def test_lazy_meshgrid_and_binary_search():
    x = LazyArray(np.array([0., 1., 2.], np.float32))
    y = LazyArray(np.array([10., 20.], np.float32))
    xs, ys = ops.meshgrid(x, y)
    np.testing.assert_allclose(xs.numpy(), [0, 1, 2, 0, 1, 2])
    np.testing.assert_allclose(ys.numpy(), [10, 10, 10, 20, 20, 20])

    table = LazyArray(np.array([1., 3., 5., 7., 9.], np.float32))
    needle = LazyArray(np.array([0.5, 4.0, 9.5], np.float32))

    def pred(mid):
        return table.gather(mid) < needle

    out = ops.binary_search(0, 5, pred)
    assert isinstance(out, LazyArray)
    np.testing.assert_array_equal(out.numpy(), [0, 2, 5])


# ---------------------------------------------------------------------------
# the "one user source file runs unmodified on both backends" gate
# ---------------------------------------------------------------------------

def _user_program(x):
    """Written ONCE against enoki_tpu.ops -- no backend names anywhere
    (the sphere-sampling flavor of tests/special.cpp + array_router use)."""
    r = ops.sqrt(ops.clamp(x * x + 0.25, 0.0, 10.0))
    w = ops.erf(r) + S.dawson(r * 0.5) - ops.lerp(x, r, 0.25)
    w = ops.select(w > 0.0, w, -w)
    theta = ops.safe_asin(ops.clamp(x, -1.0, 1.0))
    return ops.hsum(w * M.cos(theta) + S.i0e(x, "poly"))


def test_one_source_every_backend():
    x = np.linspace(-1.5, 1.5, 101).astype(np.float32)
    eager = float(np.asarray(_user_program(jnp.asarray(x))))
    lazy_out = _user_program(LazyArray(x))
    assert isinstance(lazy_out, LazyArray)
    lazy = float(lazy_out.numpy()[0])
    assert abs(eager - lazy) <= 2e-4 * max(1.0, abs(eager))


def test_extract_first_active_lane():
    # extract(value, mask) (array_router.h:948): both backends
    v = np.array([5., 6., 7., 8.], np.float32)
    m = np.array([False, False, True, True])
    assert float(ops.extract(jnp.asarray(v), jnp.asarray(m))[0]) == 7.0
    out = ops.extract(LazyArray(v), LazyArray(m))
    assert isinstance(out, LazyArray)
    assert float(out.numpy()[0]) == 7.0


def test_lazy_rounding_routes():
    from enoki_tpu.ops import rounding as R

    v = np.array([-1.5, -0.5, 0.5, 1.5, 2.5], np.float32)
    lx = LazyArray(v)
    np.testing.assert_array_equal(R.round_(lx).numpy(), np.round(v))
    np.testing.assert_array_equal(R.floor(lx).numpy(), np.floor(v))
    np.testing.assert_array_equal(R.ceil(lx).numpy(), np.ceil(v))
    np.testing.assert_array_equal(R.trunc(lx).numpy(), np.trunc(v))
    want = np.array([-2.0, -1.0, 1.0, 2.0, 3.0], np.float32)  # half away
    np.testing.assert_array_equal(R.round_half_away(lx).numpy(), want)


def test_lazy_safe_math_f64_tiny():
    # regression (r3 review): the lazy safe_sqrt/safe_rsqrt clamp must
    # use the INPUT dtype's tiny, not f32's
    with jax.enable_x64():
        x = LazyArray(np.array([1e-300, 4.0], np.float64))
        np.testing.assert_allclose(ops.safe_rsqrt(x).numpy(),
                                   [1e150, 0.5], rtol=1e-12)
        np.testing.assert_allclose(ops.safe_sqrt(x).numpy(),
                                   [1e-150, 2.0], rtol=1e-12)


def test_lazy_fmaddsub_mixed_width():
    # regression (r3 review): a wider EAGER operand sets the lane count
    out = ops.fmaddsub(LazyArray(np.array([2.0], np.float32)),
                       jnp.arange(4.0, dtype=jnp.float32), 1.0)
    want = np.asarray(ops.fmaddsub(jnp.float32(2.0),
                                   jnp.arange(4.0, dtype=jnp.float32), 1.0))
    np.testing.assert_allclose(out.numpy(), want)


def test_compress_mixed_backends():
    # regression (r3 review): lazy x + eager mask (and vice versa)
    x = LazyArray(np.array([1., 2., 3., 4.], np.float32))
    m = jnp.asarray([True, False, True, False])
    packed, cnt = ops.compress(x, m)
    np.testing.assert_allclose(packed.numpy(), [1, 3, 0, 0])
    packed2, _ = ops.compress(jnp.asarray([1., 2., 3., 4.]),
                              LazyArray(np.array([True, False, True, False])))
    np.testing.assert_allclose(packed2.numpy(), [1, 3, 0, 0])


def test_extract_no_active_lane_matches_eager():
    # regression (r3 review): no lane set -> element 0, both backends
    v = np.array([5., 6., 7.], np.float32)
    m = np.zeros(3, bool)
    assert float(ops.extract(jnp.asarray(v), jnp.asarray(m))[0]) == 5.0
    assert float(ops.extract(LazyArray(v), LazyArray(m)).numpy()[0]) == 5.0


def test_binary_search_single_pred_call_per_iteration():
    # regression (r3 review): the probe call IS iteration 1 (a pred with
    # side effects runs exactly iters times)
    calls = []
    table = jnp.asarray([1., 3., 5., 7., 9.])

    def pred(mid):
        calls.append(1)
        return table[mid] < 4.0

    out = ops.binary_search(0, 5, pred)
    import math
    iters = math.floor(math.log2(5)) + 1
    assert len(calls) == iters
    np.testing.assert_array_equal(np.asarray(out), 2)


def test_range_packets_empty():
    assert list(ops.range_packets(0, 8)) == []
    assert list(ops.range_packets((0, 3), 4, dim=2)) == []


def test_nested_reduction_aliases_lazy():
    # regression (r3 review): *_nested variants route LazyArray too
    m = LazyArray(np.array([True, False, True]))
    assert bool(ops.any_nested(m).numpy()[0])
    assert not bool(ops.all_nested(m).numpy()[0])
    assert not bool(ops.none_nested(m).numpy()[0])
    assert int(ops.count_nested(m).numpy()[0]) == 2


def test_masked_min_mixed_backends():
    # regression (r3 review): eager value + lazy operand
    from enoki_tpu.struct import masked

    v = jnp.asarray([1., 2., 3., 4.])
    m = jnp.asarray([False, False, True, True])
    out = masked(v, m).min(LazyArray(np.array([3.5], np.float32)))
    assert isinstance(out, LazyArray)
    np.testing.assert_allclose(out.numpy(), [1, 2, 3, 3.5])


def test_binary_search_probe_side_effect_guard():
    # regression (r3 review): a pred that records lazy side effects and
    # then rejects the eager probe index must error loudly (a silent
    # retry would record the side effect twice)
    acc = LazyArray(np.zeros(8, np.float32))
    table = LazyArray(np.array([1., 3., 5., 7., 9.], np.float32))

    def bad_pred(mid):
        acc.scatter_add(LazyArray(np.zeros(1, np.int32)),
                        LazyArray(np.ones(1, np.float32)))
        return table.gather(mid) < 4.0  # rejects a jnp mid

    with pytest.raises(RuntimeError, match="side"):
        ops.binary_search(0, 5, bad_pred)


def test_nan_literal_not_cached():
    # regression (r3 review): NaN keys are unreachable (nan != nan) and
    # must not consume the literal-cache capacity
    from enoki_tpu.trace import _LITERAL_ARRAYS

    x = LazyArray(np.ones(4, np.float32))
    n0 = len(_LITERAL_ARRAYS)
    for _ in range(10):
        _ = x + float("nan")
    assert len(_LITERAL_ARRAYS) == n0


def test_csc_sec_isdenormal():
    x = np.linspace(0.3, 1.2, 33).astype(np.float32)
    np.testing.assert_allclose(np.asarray(M.csc(jnp.asarray(x))),
                               1 / np.sin(x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(M.sec(jnp.asarray(x))),
                               1 / np.cos(x), rtol=1e-5)
    lc = M.csc(LazyArray(x))
    assert isinstance(lc, LazyArray)
    np.testing.assert_allclose(lc.numpy(), 1 / np.sin(x), rtol=1e-5)
    ls = M.sec(LazyArray(x))
    np.testing.assert_allclose(ls.numpy(), 1 / np.cos(x), rtol=1e-5)
    v = np.array([0.0, 1.0, 1e-38, 2e-38], np.float32)  # 1e-38 denormal
    # XLA flushes f32 denormals on input transfer too -- assert only
    # that normals/zero classify as NOT denormal on both backends
    assert not bool(np.asarray(ops.isdenormal(jnp.asarray(v)))[[0, 1, 3]].any())
    ld = ops.isdenormal(LazyArray(v))
    assert isinstance(ld, LazyArray)
    assert not bool(ld.numpy()[[0, 1, 3]].any())
