"""Special function tests vs scipy -- mirrors reference tests/special.cpp."""

import numpy as np
import jax.numpy as jnp
import scipy.special as sp

from enoki_tpu.ops import special as S

POLY = "poly"


def _sweep(lo, hi, n=20000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, n).astype(np.float32)


def test_erf_poly():
    x = _sweep(-6, 6)
    got = np.asarray(S.erf(jnp.asarray(x), POLY), np.float64)
    want = sp.erf(x.astype(np.float64))
    assert np.abs(got - want).max() < 2e-7


def test_erfc_poly():
    # domain capped at 9: erfc(9.3) already underflows f32 normals
    x = _sweep(-4, 9)
    got = np.asarray(S.erfc(jnp.asarray(x), POLY), np.float64)
    want = sp.erfc(x.astype(np.float64))
    keep = want > 1e-37  # representable as f32 normals
    rel = (np.abs(got - want) / want)[keep]
    assert rel.max() < 5e-5  # f32 exp(-x^2) limits relative accuracy


def test_erfinv_poly():
    x = _sweep(-0.999, 0.999)
    got = np.asarray(S.erfinv(jnp.asarray(x), POLY), np.float64)
    want = sp.erfinv(x.astype(np.float64))
    assert np.abs(got - want).max() < 5e-6
    # roundtrip (histogram.cpp relies on this for normal sampling)
    rt = np.asarray(S.erf(S.erfinv(jnp.asarray(x), POLY), POLY))
    assert np.abs(rt - x).max() < 1e-5


def test_erfinv_native():
    x = _sweep(-0.999, 0.999)
    got = np.asarray(S.erfinv(jnp.asarray(x)), np.float64)
    want = sp.erfinv(x.astype(np.float64))
    assert np.abs(got - want).max() < 5e-6


def test_erfinv_f64_poly():
    # f64 path (special.h:222's double branch): Giles seed + 2 Newton
    # steps on the complementary equation in the tail -- full double
    # precision, measured <= 8 ulp central / <= 2 ulp tail
    import jax

    with jax.enable_x64():
        rng = np.random.default_rng(7)
        x = rng.uniform(-0.99999999999, 0.99999999999, 100000)
        got = np.asarray(S.erfinv(jnp.asarray(x, jnp.float64), POLY))
        want = sp.erfinv(x)
        ulp = np.abs(got - want) / np.spacing(np.abs(want))
        assert ulp.max() < 12.0 and ulp.mean() < 1.0
        assert np.isposinf(S.erfinv(jnp.float64(1.0), POLY))
        assert np.isneginf(S.erfinv(jnp.float64(-1.0), POLY))


def test_i0e():
    x = _sweep(-50, 50)
    got = np.asarray(S.i0e(jnp.asarray(x), POLY), np.float64)
    want = sp.i0e(x.astype(np.float64))
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-5


def test_dawson():
    x = _sweep(-20, 20)
    got = np.asarray(S.dawson(jnp.asarray(x)), np.float64)
    want = sp.dawsn(x.astype(np.float64))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert rel.max() < 2e-6  # our fit: 8.4e-7 + f32 rounding


def test_erfi():
    x = _sweep(-3, 3)
    got = np.asarray(S.erfi(jnp.asarray(x)), np.float64)
    want = sp.erfi(x.astype(np.float64))
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-30)
    assert rel.max() < 1e-4


def test_lgamma():
    x = _sweep(0.01, 30)
    got = np.asarray(S.lgamma(jnp.asarray(x), POLY), np.float64)
    want = sp.gammaln(x.astype(np.float64))
    assert np.abs(got - want).max() < 1e-3  # Lanczos g=5 f32 class
    # negative non-integers via reflection
    xn = _sweep(-4.9, -0.1, seed=1)
    xn = xn[np.abs(xn - np.round(xn)) > 0.05]
    got = np.asarray(S.lgamma(jnp.asarray(xn), POLY), np.float64)
    want = sp.gammaln(xn.astype(np.float64))
    assert np.abs(got - want).max() < 2e-3


def test_tgamma_sign_correct():
    x = np.array([-2.5, -1.5, -0.5, 0.5, 1.5, 4.0], np.float32)
    got = np.asarray(S.tgamma(jnp.asarray(x)), np.float64)
    want = sp.gamma(x.astype(np.float64))
    assert np.allclose(got, want, rtol=1e-4)


def test_carlson_rf():
    rng = np.random.default_rng(2)
    x = rng.uniform(0.0, 5, 2000)
    y = rng.uniform(0.01, 5, 2000)
    z = rng.uniform(0.01, 5, 2000)
    got = np.asarray(S.carlson_rf(jnp.asarray(x, jnp.float32),
                                  jnp.asarray(y, jnp.float32),
                                  jnp.asarray(z, jnp.float32)), np.float64)
    want = sp.elliprf(x, y, z)
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-4


def test_carlson_rd():
    rng = np.random.default_rng(3)
    x = rng.uniform(0.0, 5, 2000)
    y = rng.uniform(0.01, 5, 2000)
    z = rng.uniform(0.01, 5, 2000)
    got = np.asarray(S.carlson_rd(jnp.asarray(x, jnp.float32),
                                  jnp.asarray(y, jnp.float32),
                                  jnp.asarray(z, jnp.float32)), np.float64)
    want = sp.elliprd(x, y, z)
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-4


def test_carlson_rc():
    rng = np.random.default_rng(4)
    x = rng.uniform(0.0, 5, 2000)
    y = rng.uniform(0.01, 5, 2000)
    got = np.asarray(S.carlson_rc(jnp.asarray(x, jnp.float32),
                                  jnp.asarray(y, jnp.float32)), np.float64)
    want = sp.elliprc(x, y)
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-4


def test_carlson_rj():
    rng = np.random.default_rng(5)
    x = rng.uniform(0.0, 5, 2000)
    y = rng.uniform(0.01, 5, 2000)
    z = rng.uniform(0.01, 5, 2000)
    r = rng.uniform(0.01, 5, 2000)
    got = np.asarray(S.carlson_rj(jnp.asarray(x, jnp.float32),
                                  jnp.asarray(y, jnp.float32),
                                  jnp.asarray(z, jnp.float32),
                                  jnp.asarray(r, jnp.float32)), np.float64)
    want = sp.elliprj(x, y, z, r)
    rel = np.abs(got - want) / np.abs(want)
    assert rel.max() < 1e-3


def test_ellint_1():
    # k convention: reference squares k internally (special.h:562-564);
    # scipy's ellipkinc takes m = k^2.
    rng = np.random.default_rng(6)
    phi = rng.uniform(-0.49 * np.pi, 0.49 * np.pi, 2000)
    k = rng.uniform(0.0, 0.95, 2000)
    got = np.asarray(S.ellint_1(jnp.asarray(phi, jnp.float32),
                                jnp.asarray(k, jnp.float32)), np.float64)
    want = sp.ellipkinc(phi, k * k)
    assert np.abs(got - want).max() < 1e-4


def test_comp_ellint_1_2():
    k = np.linspace(0, 0.95, 100)
    got1 = np.asarray(S.comp_ellint_1(jnp.asarray(k, jnp.float32)), np.float64)
    want1 = sp.ellipkm1(1 - k * k)
    assert np.abs(got1 - want1).max() < 1e-4
    got2 = np.asarray(S.comp_ellint_2(jnp.asarray(k, jnp.float32)), np.float64)
    want2 = sp.ellipe(k * k)
    assert np.abs(got2 - want2).max() < 1e-4


def test_ellint_2():
    rng = np.random.default_rng(7)
    phi = rng.uniform(-0.49 * np.pi, 0.49 * np.pi, 2000)
    k = rng.uniform(0.0, 0.95, 2000)
    got = np.asarray(S.ellint_2(jnp.asarray(phi, jnp.float32),
                                jnp.asarray(k, jnp.float32)), np.float64)
    want = sp.ellipeinc(phi, k * k)
    assert np.abs(got - want).max() < 1e-4


def test_ellint_1_beyond_quadrant():
    # periodic continuation (special.h:585-588)
    phi = np.array([2.0, 3.0, -2.5], np.float64)
    k = np.array([0.5, 0.3, 0.7], np.float64)
    got = np.asarray(S.ellint_1(jnp.asarray(phi, jnp.float32),
                                jnp.asarray(k, jnp.float32)), np.float64)
    want = sp.ellipkinc(phi, k * k)
    assert np.abs(got - want).max() < 1e-4


def test_ellint_3():
    # reference convention: characteristic enters as (1 + nu sin^2)
    # (special.h:665); scipy ellip... uses (1 - n sin^2) -> nu = -n.
    rng = np.random.default_rng(8)
    phi = rng.uniform(-0.4 * np.pi, 0.4 * np.pi, 500)
    k = rng.uniform(0.0, 0.9, 500)
    n = rng.uniform(-0.5, 0.5, 500)
    from scipy.integrate import quad
    want = np.array([
        quad(lambda t, kk=kk, nn=nn: 1.0 / ((1 - nn * np.sin(t) ** 2)
             * np.sqrt(1 - kk * kk * np.sin(t) ** 2)), 0, p)[0]
        for p, kk, nn in zip(phi[:50], k[:50], n[:50])
    ])
    got = np.asarray(S.ellint_3(jnp.asarray(phi[:50], jnp.float32),
                                jnp.asarray(k[:50], jnp.float32),
                                jnp.asarray(-n[:50], jnp.float32)), np.float64)
    assert np.abs(got - want).max() < 1e-3


def test_lgamma_near_zeros():
    # lgamma's zeros at x=1,2 are factored out of the central fit
    # (tools/fit_lgamma.py): relative error stays bounded where direct
    # evaluation (incl. jax's own gammaln) loses ALL significant digits
    import scipy.special as sps
    rng = np.random.default_rng(3)
    for zero in (1.0, 2.0):
        x = (zero + rng.uniform(-0.01, 0.01, 5000)).astype(np.float32)
        want = sps.gammaln(x.astype(np.float64))
        keep = np.abs(want) > 0
        got = np.asarray(S.lgamma(jnp.asarray(x[keep]), POLY), np.float64)
        rel = np.abs(got - want[keep]) / np.abs(want[keep])
        assert rel.max() < 1e-5, (zero, rel.max())


def test_lgamma_ulp_bound():
    import scipy.special as sps
    rng = np.random.default_rng(4)
    x = rng.uniform(0.1, 30, 100000).astype(np.float32)
    want = sps.gammaln(x.astype(np.float64))
    got = np.asarray(S.lgamma(jnp.asarray(x), POLY), np.float64)
    w32 = want.astype(np.float32)
    keep = np.isfinite(want) & (want != 0)
    ulp = (np.abs(got - w32.astype(np.float64))
           / np.spacing(np.abs(w32)).astype(np.float64))[keep]
    assert ulp.mean() < 1.5 and ulp.max() < 64, (ulp.mean(), ulp.max())


def test_erf_erfc_f64_poly():
    # own double-precision fits (tools/fit_special_f64.py): Chebyshev
    # tail kernels + expx2 argument splitting; measured <= 5 ulp over
    # the full normal range (underflow at the smallest normal -- XLA
    # flushes f64 denormals like the reference's ftz GPU path)
    import jax

    with jax.enable_x64():
        # all references via mpmath: scipy's own f64 erfc is 8-12 ulp
        # off near x ~ 0.9 and drifts ~x^2*ulp in the tail (naive
        # exp(-x^2) squaring; ~500 ulp at x = 24) -- ours tracks mpmath
        import mpmath as mp

        mp.mp.dps = 40
        rng = np.random.default_rng(11)
        x = np.concatenate([rng.uniform(-2, 2, 400),
                            rng.uniform(2, 26.5, 300),
                            rng.uniform(-26.5, -2, 200)])
        for fn, ref in [(S.erf, mp.erf), (S.erfc, mp.erfc)]:
            got = np.asarray(fn(jnp.asarray(x, jnp.float64), POLY))
            want = np.array([float(ref(v)) for v in x])
            keep = np.abs(want) > 2.3e-308
            ulp = (np.abs(got - want)[keep]
                   / np.spacing(np.abs(want))[keep])
            assert ulp.max() <= 8.0 and ulp.mean() < 1.0, fn.__name__
        assert float(S.erfc(jnp.float64(27.5), POLY)) == 0.0
        assert float(S.erf(jnp.float64(-30.0), POLY)) == -1.0


def test_dawson_erfi_i0e_f64():
    # f64 paths: own Chebyshev kernels (tools/fit_special_f64.py) --
    # dawson <= ~25 ulp (52-term Clenshaw cancellation at the small/tail
    # boundary), i0e <= 3, erfi <= ~12 (exp split + dawson compounding);
    # previously these ran the f32-grade fits on f64 input (~1e9 ulp)
    import jax
    import mpmath as mp

    mp.mp.dps = 40
    with jax.enable_x64():
        rng = np.random.default_rng(5)
        x = np.concatenate([rng.uniform(-6, 6, 300),
                            rng.uniform(-60, 60, 300)])
        got = np.asarray(S.dawson(jnp.asarray(x)))
        want = np.array([float(mp.sqrt(mp.pi) / 2 * mp.exp(-mp.mpf(v) ** 2)
                               * mp.erfi(mp.mpf(v))) for v in x])
        ulp = np.abs(got - want) / np.spacing(np.abs(want))
        assert ulp.max() <= 40.0 and ulp.mean() < 4.0

        got = np.asarray(S.i0e(jnp.asarray(x), POLY))
        want = np.array([float(mp.besseli(0, float(v))
                               * mp.exp(-abs(float(v)))) for v in x])
        ulp = np.abs(got - want) / np.spacing(np.abs(want))
        assert ulp.max() <= 6.0

        xe = rng.uniform(-26, 26, 300)
        got = np.asarray(S.erfi(jnp.asarray(xe)))
        want = np.array([float(mp.erfi(float(v))) for v in xe])
        ulp = np.abs(got - want) / np.spacing(np.abs(want))
        assert ulp.max() <= 20.0


def test_lgamma_f64_poly_factored_zeros():
    # own f64 factored-zero kernels (LG64_*, tools/fit_special_f64.py):
    # RELATIVE accuracy through the zeros at x=1 and x=2, where XLA's
    # f64 gammaln is ~5e8 ulp off
    import jax
    import mpmath as mp

    mp.mp.dps = 40
    with jax.enable_x64():
        rng = np.random.default_rng(3)
        for lo, hi, bound in [(1e-8, 0.5, 4), (0.5, 2.75, 8),
                              (2.75, 8.0, 16), (8.0, 1e6, 5)]:
            x = rng.uniform(lo, hi, 1500)
            got = np.asarray(S.lgamma(jnp.asarray(x, jnp.float64), POLY))
            want = np.array([float(mp.loggamma(v)) for v in x])
            keep = want != 0
            ulp = (np.abs(got - want)[keep]
                   / np.spacing(np.abs(want))[keep])
            assert ulp.max() <= bound, (lo, hi, ulp.max())
        # right at the zeros
        for z in (1.0, 2.0):
            x = z + np.linspace(-1e-6, 1e-6, 51)[1::2]
            got = np.asarray(S.lgamma(jnp.asarray(x, jnp.float64), POLY))
            want = np.array([float(mp.loggamma(v)) for v in x])
            ulp = np.abs(got - want) / np.spacing(np.abs(want))
            assert ulp.max() <= 8.0
        # negatives via reflection: absolute error near log|Gamma| zeros
        xn = rng.uniform(-20, -0.01, 1500)
        xn = xn[np.abs(xn - np.round(xn)) > 1e-3]
        got = np.asarray(S.lgamma(jnp.asarray(xn, jnp.float64), POLY))
        want = np.array([float(mp.log(abs(mp.gamma(v)))) for v in xn])
        assert (np.abs(got - want)
                / np.maximum(np.abs(want), 1.0)).max() < 1e-14
        assert np.isposinf(S.lgamma(jnp.float64(-3.0), POLY))


def test_special_values_at_infinity_and_signed_zero():
    """r4 audit: poly-path special values at the line's ends must match
    scipy conventions (the tails computed inf - inf -> NaN)."""
    import pytest
    import scipy.special as sp
    from enoki_tpu.ops import special as S
    from enoki_tpu.ops import math as M

    inf32 = jnp.float32(np.inf)
    # dawson: f32 rational used to overflow past |x| ~ 566 (0, then NaN)
    for xv, want in ((2000.0, float(sp.dawsn(2000.0))),
                     (-2000.0, float(sp.dawsn(-2000.0)))):
        got = float(np.asarray(S.dawson(jnp.float32(xv))))
        assert got == pytest.approx(want, rel=2e-5), (xv, got, want)
    assert float(np.asarray(S.dawson(inf32))) == 0.0
    assert float(np.asarray(S.dawson(-inf32))) == 0.0

    # erfi(+-inf) = +-inf (f64 path, gated on x64)
    import jax
    if jax.config.jax_enable_x64:
        assert np.isposinf(np.asarray(S.erfi(jnp.float64(np.inf))))
        assert np.isneginf(np.asarray(S.erfi(jnp.float64(-np.inf))))

    # lgamma poly at +-inf = +inf like gammaln
    assert np.isposinf(np.asarray(S.lgamma(inf32, "poly")))
    assert np.isposinf(np.asarray(S.lgamma(-inf32, "poly")))
    # tgamma zero poles are signed: Gamma(+0) = +inf, Gamma(-0.0) = -inf
    assert np.isposinf(np.asarray(S.tgamma(jnp.float32(0.0), "poly")))
    assert np.isneginf(np.asarray(S.tgamma(jnp.float32(-0.0), "poly")))

    # erf preserves the sign of zero on every path
    assert np.signbit(np.asarray(S.erf(jnp.float32(-0.0), "poly")))
    if jax.config.jax_enable_x64:
        assert np.signbit(np.asarray(S.erf(jnp.float64(-0.0), "poly")))

    # hypot: +inf whenever either argument is infinite (both backends)
    assert np.isposinf(np.asarray(M.hypot(inf32, inf32)))
    import enoki_tpu.trace as tr
    from enoki_tpu.trace import LazyArray
    tr.reset()
    lv = M.hypot(LazyArray(np.array([np.inf], np.float32)),
                 LazyArray(np.array([np.inf], np.float32)))
    assert np.isposinf(lv.numpy()).all()

    # f32 lgamma reflection reduces the sin argument exactly
    x = np.float32(-2999999.25)
    got = float(np.asarray(S.lgamma(jnp.float32(x), "poly")))
    want = float(sp.gammaln(np.float64(x)))
    assert got == pytest.approx(want, rel=3e-6), (got, want)


def test_masked_branch_gradients_finite():
    """r4 audit: the untaken polynomial branch must not poison grads
    through the where (0 * inf = NaN) for huge arguments."""
    import jax
    from enoki_tpu.ops import special as S

    for fn in (lambda v: S.i0e(v, "poly"), lambda v: S.erf(v, "poly"),
               lambda v: S.dawson(v)):
        g = jax.grad(lambda v: jnp.sum(fn(v)))(jnp.float32(1e20))
        assert np.isfinite(np.asarray(g)), fn


def test_dawson_gradient_at_zero():
    # r4 second-pass review: the new f32 tail divided by x unguarded --
    # the untaken branch at x = 0 was inf and poisoned the gradient
    import jax
    import pytest
    from enoki_tpu.ops import special as S

    g = jax.grad(lambda v: S.dawson(v))(jnp.float32(0.0))
    assert float(np.asarray(g)) == pytest.approx(1.0, rel=1e-5)
