"""Spherical harmonics tests vs scipy -- mirrors reference tests/sh.cpp.

Convention check: the reference's generated code (sh.h) keeps the
Condon-Shortley phase in P_l^m, so e.g. band 1 is
(-0.4886 y, +0.4886 z, -0.4886 x) (sh.h sh_eval_1). That equals
sqrt(2)*Im/Re of scipy's complex Y_l^m.
"""

import numpy as np
import jax.numpy as jnp
import pytest

try:
    from scipy.special import sph_harm_y

    def _Y(m, l, polar, az):
        return sph_harm_y(l, m, polar, az)
except ImportError:  # older scipy
    from scipy.special import sph_harm

    def _Y(m, l, polar, az):
        return sph_harm(m, l, az, polar)

from enoki_tpu.types.sh import sh_eval, sh_eval_stacked


def _dirs(n=500, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def test_band1_matches_reference_convention():
    # sh.h sh_eval_1: out = [-c*y, c*z, -c*x] with c = 0.48860251190292
    v = _dirs(100)
    out = sh_eval(jnp.asarray(v[:, 0], jnp.float32),
                  jnp.asarray(v[:, 1], jnp.float32),
                  jnp.asarray(v[:, 2], jnp.float32), 1)
    c = 0.4886025119029199
    assert np.allclose(np.asarray(out[0]), 0.28209479177387814)
    assert np.allclose(np.asarray(out[1]), -c * v[:, 1], atol=1e-6)
    assert np.allclose(np.asarray(out[2]), c * v[:, 2], atol=1e-6)
    assert np.allclose(np.asarray(out[3]), -c * v[:, 0], atol=1e-6)


@pytest.mark.parametrize("order", [0, 2, 4, 9])
def test_vs_scipy(order):
    v = _dirs(200, seed=order)
    x, y, z = v[:, 0], v[:, 1], v[:, 2]
    polar = np.arccos(np.clip(z, -1, 1))
    az = np.arctan2(y, x)
    out = np.asarray(sh_eval_stacked(jnp.asarray(x, jnp.float64) if False
                                     else jnp.asarray(x, jnp.float32),
                                     jnp.asarray(y, jnp.float32),
                                     jnp.asarray(z, jnp.float32), order))
    for l in range(order + 1):
        Y0 = _Y(0, l, polar, az)
        assert np.allclose(out[:, l * (l + 1)], Y0.real, atol=2e-4), (l, 0)
        for m in range(1, l + 1):
            Ym = _Y(m, l, polar, az)
            want_cos = np.sqrt(2) * Ym.real
            want_sin = np.sqrt(2) * Ym.imag
            assert np.allclose(out[:, l * (l + 1) + m], want_cos,
                               atol=2e-3), (l, m)
            assert np.allclose(out[:, l * (l + 1) - m], want_sin,
                               atol=2e-3), (l, -m)


def test_order_too_high():
    with pytest.raises(ValueError):
        sh_eval(jnp.ones(1), jnp.ones(1), jnp.ones(1), 10)
