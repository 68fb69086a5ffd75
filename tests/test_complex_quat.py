"""Complex + Quaternion tests -- mirrors reference tests/complex.cpp
coverage; validated against numpy complex128 and rotation identities."""

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu.types import Complex, Quaternion
from enoki_tpu.types import complex_ as C
from enoki_tpu.types import quaternion as Q


def _nc(z: Complex):
    return np.asarray(z.re, np.complex128) + 1j * np.asarray(z.im, np.complex128)


def _sample(n=1000, seed=0, scale=3.0):
    rng = np.random.default_rng(seed)
    re = rng.uniform(-scale, scale, n).astype(np.float32)
    im = rng.uniform(-scale, scale, n).astype(np.float32)
    return Complex(jnp.asarray(re), jnp.asarray(im)), re + 1j * im


def test_complex_arithmetic():
    a, na = _sample(seed=0)
    b, nb = _sample(seed=1)
    assert np.allclose(_nc(a * b), na * nb, atol=1e-4)
    assert np.allclose(_nc(a + b), na + nb, atol=1e-5)
    assert np.allclose(_nc(a / b), na / nb, atol=1e-3)
    assert np.allclose(_nc(C.rcp(a)), 1 / na, atol=1e-4)
    assert np.allclose(np.asarray(C.abs_(a)), np.abs(na), atol=1e-4)
    assert np.allclose(np.asarray(C.arg(a)), np.angle(na), atol=1e-5)


def test_complex_transcendental():
    a, na = _sample(seed=2, scale=2.0)
    assert np.allclose(_nc(C.exp(a)), np.exp(na), atol=1e-3)
    assert np.allclose(_nc(C.log(a)), np.log(na), atol=1e-4)
    assert np.allclose(_nc(C.sqrt(a)), np.sqrt(na), atol=1e-4)
    assert np.allclose(_nc(C.sin(a)), np.sin(na), atol=1e-3)
    assert np.allclose(_nc(C.cos(a)), np.cos(na), atol=1e-3)
    assert np.allclose(_nc(C.sinh(a)), np.sinh(na), atol=1e-3)
    assert np.allclose(_nc(C.cosh(a)), np.cosh(na), atol=1e-3)
    assert np.allclose(_nc(C.tanh(a)), np.tanh(na), atol=1e-3)


def test_complex_inverse_trig():
    a, na = _sample(seed=3, scale=0.8)
    assert np.allclose(_nc(C.asin(a)), np.arcsin(na), atol=1e-3)
    assert np.allclose(_nc(C.acos(a)), np.arccos(na), atol=1e-3)
    assert np.allclose(_nc(C.atan(a)), np.arctan(na), atol=1e-3)


def test_complex_pow():
    a, na = _sample(seed=4, scale=1.5)
    # principal branch
    p = C.pow(a, Complex.of(jnp.float32(2.0), jnp.float32(0.0)))
    assert np.allclose(_nc(p), na ** 2, atol=1e-2)


def test_quaternion_mul_identity():
    q = Q.from_axis_angle(jnp.float32(0), jnp.float32(0), jnp.float32(1),
                          jnp.float32(np.pi / 2))
    ident = Quaternion.identity()
    r = q * ident
    assert np.allclose([float(r.x), float(r.y), float(r.z), float(r.w)],
                       [float(q.x), float(q.y), float(q.z), float(q.w)])
    # rotating (1,0,0) by 90deg about z gives (0,1,0)
    rx, ry, rz = Q.rotate_vector(q, jnp.float32(1), jnp.float32(0), jnp.float32(0))
    assert np.allclose([float(rx), float(ry), float(rz)], [0, 1, 0], atol=1e-6)


def test_quat_matrix_roundtrip():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(100, 4)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    q = Quaternion(*(jnp.asarray(v[:, i]) for i in range(4)))
    m = Q.to_matrix(q)
    q2 = Q.from_matrix(m)
    # q and -q are the same rotation; align signs
    s = np.sign(np.asarray(q.w) * np.asarray(q2.w) +
                np.asarray(q.x) * np.asarray(q2.x) +
                np.asarray(q.y) * np.asarray(q2.y) +
                np.asarray(q.z) * np.asarray(q2.z))
    for f in "xyzw":
        assert np.allclose(np.asarray(getattr(q, f)),
                           s * np.asarray(getattr(q2, f)), atol=1e-5)


def test_quat_exp_log_roundtrip():
    rng = np.random.default_rng(6)
    v = rng.normal(size=(50, 4)).astype(np.float32) * 0.5
    v[:, 3] = np.abs(v[:, 3]) + 1.0  # keep away from log branch cut
    q = Quaternion(*(jnp.asarray(v[:, i]) for i in range(4)))
    r = Q.exp(Q.log(q))
    for i, f in enumerate("xyzw"):
        assert np.allclose(np.asarray(getattr(r, f)), v[:, i], atol=1e-4)


def test_slerp():
    a = Quaternion.identity()
    b = Q.from_axis_angle(jnp.float32(0), jnp.float32(0), jnp.float32(1),
                          jnp.float32(np.pi / 2))
    mid = Q.slerp(a, b, jnp.float32(0.5))
    expect = Q.from_axis_angle(jnp.float32(0), jnp.float32(0), jnp.float32(1),
                               jnp.float32(np.pi / 4))
    for f in "xyzw":
        assert np.isclose(float(getattr(mid, f)), float(getattr(expect, f)),
                          atol=1e-6)
    # endpoints
    s0 = Q.slerp(a, b, jnp.float32(0.0))
    assert np.isclose(float(s0.w), 1.0, atol=1e-6)


def test_quat_grad_flows():
    def f(angle):
        q = Q.from_axis_angle(jnp.float32(0), jnp.float32(0), jnp.float32(1), angle)
        rx, ry, rz = Q.rotate_vector(q, jnp.float32(1), jnp.float32(0), jnp.float32(0))
        return ry

    g = jax.grad(f)(jnp.float32(0.3))
    assert np.isclose(float(g), np.cos(0.3), atol=1e-5)


def test_quaternion_lazy_backend_generic():
    # r4 audit: slerp/euler/axis-angle/to_matrix/from_matrix crashed on
    # quaternions of LazyArrays despite the module's backend-generic
    # contract
    import enoki_tpu.trace as tr
    from enoki_tpu.trace import LazyArray
    from enoki_tpu.types import quaternion as Q

    tr.reset()
    ax = np.array([0.0, 0.0], np.float32)
    az = np.array([1.0, 1.0], np.float32)
    ang = np.array([0.3, 1.1], np.float32)

    def lazy_q(axx, ayy, azz, a):
        return Q.from_axis_angle(LazyArray(axx), LazyArray(ayy),
                                 LazyArray(azz), LazyArray(a))

    qe = Q.from_axis_angle(ax, ax, az, ang)
    ql = lazy_q(ax, ax, az, ang)
    for c in "xyzw":
        np.testing.assert_allclose(getattr(ql, c).numpy(),
                                   np.asarray(getattr(qe, c)), rtol=1e-6)

    # slerp lazy == slerp eager
    qe2 = Q.from_axis_angle(ax, ax, az, ang + 0.5)
    ql2 = lazy_q(ax, ax, az, ang + 0.5)
    se = Q.slerp(qe, qe2, 0.25)
    sl = Q.slerp(ql, ql2, 0.25)
    for c in "xyzw":
        np.testing.assert_allclose(getattr(sl, c).numpy(),
                                   np.asarray(getattr(se, c)), rtol=1e-5,
                                   atol=1e-6)

    # euler lazy == eager
    ee = Q.euler_angles(qe)
    el = Q.euler_angles(ql)
    for a, b in zip(el, ee):
        np.testing.assert_allclose(a.numpy(), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)

    # to_matrix (SoA for lazy) -> from_matrix roundtrip
    m = Q.to_matrix(ql)
    qr = Q.from_matrix(m)
    for c in "xyzw":
        np.testing.assert_allclose(np.abs(getattr(qr, c).numpy()),
                                   np.abs(np.asarray(getattr(qe, c))),
                                   rtol=1e-5, atol=1e-5)


def test_quaternion_sqrt_negative_real_is_nan():
    # r4 audit: sqrt of a pure-negative-real quaternion has an undefined
    # imaginary direction; (0,0,0,0) (whose square is 0) was returned
    from enoki_tpu.types import quaternion as Q

    z = np.zeros(1, np.float32)
    q = Q.Quaternion(jnp.asarray(z), jnp.asarray(z), jnp.asarray(z),
                     jnp.asarray(z - 1.0))
    r = Q.sqrt(q)
    assert np.isnan(np.asarray(r.x)).all()
    # positive real still fine: sqrt(1) = 1
    qp = Q.Quaternion(jnp.asarray(z), jnp.asarray(z), jnp.asarray(z),
                      jnp.asarray(z + 1.0))
    rp = Q.sqrt(qp)
    np.testing.assert_allclose(np.asarray(rp.w), 1.0)
    np.testing.assert_allclose(np.asarray(rp.x), 0.0)
