"""Matrix + transform tests -- mirrors reference matrix.h/transform.h
behaviour; validated against numpy.linalg."""

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu.types import matrix as mat
from enoki_tpu.types import transform as tf
from enoki_tpu.types import quaternion as Q


def _rand(n, k, seed):
    rng = np.random.default_rng(seed)
    # well-conditioned: random + k*I
    m = rng.normal(size=(n, k, k)).astype(np.float32) + 3 * np.eye(k, dtype=np.float32)
    return m


def test_det_inverse_all_sizes():
    for k in (1, 2, 3, 4):
        m = _rand(200, k, k)
        jm = jnp.asarray(m)
        got_det = np.asarray(mat.det(jm))
        want_det = np.linalg.det(m.astype(np.float64)).astype(np.float32)
        assert np.allclose(got_det, want_det, rtol=1e-3), f"k={k}"
        got_inv = np.asarray(mat.inverse(jm))
        want_inv = np.linalg.inv(m.astype(np.float64))
        assert np.allclose(got_inv, want_inv, rtol=1e-3, atol=1e-4), f"k={k}"
        # inverse really inverts
        prod = np.asarray(mat.matmul(jm, mat.inverse(jm)))
        assert np.allclose(prod, np.eye(k), atol=1e-3)


def test_matrix_helpers():
    m = jnp.asarray(_rand(5, 3, 0))
    assert np.allclose(mat.trace(m), np.trace(np.asarray(m), axis1=-2, axis2=-1))
    assert np.allclose(mat.frob(m), (np.asarray(m) ** 2).sum((-2, -1)))
    d = jnp.array([1.0, 2.0, 3.0])
    dm = mat.diag_matrix(d)
    assert np.allclose(dm, np.diag([1, 2, 3]))
    assert np.allclose(mat.diag(dm), [1, 2, 3])
    r0 = jnp.array([1.0, 2.0])
    r1 = jnp.array([3.0, 4.0])
    assert np.allclose(mat.from_rows(r0, r1), [[1, 2], [3, 4]])
    assert np.allclose(mat.from_cols(r0, r1), [[1, 3], [2, 4]])


def test_translate_scale_rotate():
    t = tf.translate(jnp.array([1.0, 2.0, 3.0]))
    p = tf.transform_point(t, jnp.array([0.0, 0.0, 0.0]))
    assert np.allclose(p, [1, 2, 3])

    s = tf.scale(jnp.array([2.0, 3.0, 4.0]))
    p = tf.transform_point(s, jnp.array([1.0, 1.0, 1.0]))
    assert np.allclose(p, [2, 3, 4])

    r = tf.rotate(jnp.array([0.0, 0.0, 1.0]), jnp.float32(np.pi / 2))
    p = tf.transform_point(r, jnp.array([1.0, 0.0, 0.0]))
    assert np.allclose(p, [0, 1, 0], atol=1e-6)


def test_look_at():
    m = tf.look_at(jnp.array([0.0, 0.0, -5.0]), jnp.array([0.0, 0.0, 0.0]),
                   jnp.array([0.0, 1.0, 0.0]))
    # origin maps to camera position; +z dir column points at target
    assert np.allclose(np.asarray(m)[0:3, 3], [0, 0, -5])
    assert np.allclose(np.asarray(m)[0:3, 2], [0, 0, 1], atol=1e-6)


def test_decompose_compose_roundtrip():
    rng = np.random.default_rng(7)
    for seed in range(5):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(0, np.pi)
        m4 = np.array(tf.rotate(jnp.asarray(axis, jnp.float32),
                                jnp.float32(angle)))
        m4[0:3, 3] = rng.normal(size=3)
        # add anisotropic scale
        sc = np.diag(rng.uniform(0.5, 2.0, 3)).astype(np.float32)
        m4[0:3, 0:3] = m4[0:3, 0:3] @ sc
        s, r, t = tf.transform_decompose(jnp.asarray(m4))
        m_back = np.asarray(tf.transform_compose(s, r, t))
        assert np.allclose(m_back, m4, atol=1e-4)


def test_perspective_divides():
    m = tf.perspective(jnp.float32(np.pi / 2), 0.1, 100.0)
    # a point on the near plane center maps to z_ndc = -1 after divide
    p = np.asarray(m) @ np.array([0, 0, -0.1, 1.0])
    assert np.isclose(p[2] / p[3], -1.0, atol=1e-4)


def test_matvec_grad():
    m = jnp.eye(3) * 2.0

    def f(v):
        return jnp.sum(mat.matvec(m, v))

    g = jax.grad(f)(jnp.ones(3))
    assert np.allclose(g, [2, 2, 2])


def test_rotate_int_axis_promotes():
    # r4 audit: an int axis truncated the angle to 0 and returned the
    # exact identity with no error
    from enoki_tpu.types.transform import rotate

    m = rotate([0, 0, 1], np.pi / 4)
    assert jnp.issubdtype(m.dtype, jnp.floating)
    np.testing.assert_allclose(np.asarray(m)[0, 0], np.cos(np.pi / 4),
                               rtol=1e-6)


def test_complex_sqrt_real_axis_grad():
    # r4 audit: native sqrt at exactly 0 gave NaN grads on the real axis
    import jax
    from enoki_tpu.types import complex as C

    g = jax.grad(lambda x: C.sqrt(C.Complex(x, x * 0.0)).re)(
        jnp.float32(4.0))
    np.testing.assert_allclose(np.asarray(g), 0.25, rtol=1e-6)
    g2 = jax.grad(lambda x: C.sqrt(C.Complex(x, x * 0.0)).im)(
        jnp.float32(-4.0))
    assert np.isfinite(np.asarray(g2))
