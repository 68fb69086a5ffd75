"""Homogeneous 3D transforms (4x4) + polar decomposition.

Parity with reference include/enoki/transform.h: translate/scale/rotate
(:20-38), perspective/frustum/ortho (:60-104), look_at (:130),
transform_decompose/compose via iterative polar decomposition (:157-199).

Matrices are (..., 4, 4) jnp arrays (see types/matrix.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import matrix as mat
from . import quaternion as quat
from ..ops import math as M


def translate(v):
    """transform.h:20."""
    v = jnp.asarray(v)
    m = jnp.broadcast_to(jnp.eye(4, dtype=v.dtype), (*v.shape[:-1], 4, 4))
    return m.at[..., 0:3, 3].set(v)


def scale(v):
    """transform.h:29."""
    v = jnp.asarray(v)
    d = jnp.concatenate([v, jnp.ones((*v.shape[:-1], 1), v.dtype)], -1)
    return mat.diag_matrix(d)


def rotate(axis, angle, impl="native"):
    """Rotation about a unit axis by ``angle`` radians (transform.h:38),
    Rodrigues form, returned as a 4x4."""
    # promote to float BEFORE touching the angle: an int axis (e.g. the
    # idiomatic [0, 0, 1]) would otherwise truncate the angle to 0 and
    # force an integer rotation matrix -- returning the exact identity
    # with no error
    axis = jnp.asarray(axis)
    axis = axis.astype(jnp.result_type(axis, 1.0))
    angle = jnp.asarray(angle, axis.dtype)
    s, c = M.sincos(angle, impl)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    t = 1.0 - c
    r = jnp.stack([
        jnp.stack([c + x * x * t, x * y * t - z * s, x * z * t + y * s], -1),
        jnp.stack([y * x * t + z * s, c + y * y * t, y * z * t - x * s], -1),
        jnp.stack([z * x * t - y * s, z * y * t + x * s, c + z * z * t], -1),
    ], -2)
    out = jnp.broadcast_to(jnp.eye(4, dtype=axis.dtype),
                           (*r.shape[:-2], 4, 4))
    return out.at[..., :3, :3].set(r)


def perspective(fov, near, far, aspect=1.0):
    """Perspective projection, fov in radians (transform.h:60-76,
    matched term-for-term). GL convention: the camera looks down -z and
    the frustum maps to clip z' in [-1, 1] after the perspective divide
    (z' = -1 at z = -near, +1 at z = -far; w = -z)."""
    recip = 1.0 / (near - far)
    c = 1.0 / jnp.tan(0.5 * jnp.asarray(fov))
    m = jnp.zeros((4, 4), jnp.result_type(fov, 1.0))
    m = m.at[0, 0].set(c / aspect)
    m = m.at[1, 1].set(c)
    m = m.at[2, 2].set((near + far) * recip)
    m = m.at[2, 3].set(2.0 * near * far * recip)
    m = m.at[3, 2].set(-1.0)
    return m


def frustum(left, right, bottom, top, near, far):
    """transform.h:81."""
    rl = 1.0 / (right - left)
    tb = 1.0 / (top - bottom)
    fn = 1.0 / (far - near)
    m = jnp.zeros((4, 4), jnp.float32)
    m = m.at[0, 0].set(2.0 * near * rl)
    m = m.at[1, 1].set(2.0 * near * tb)
    m = m.at[0, 2].set((right + left) * rl)
    m = m.at[1, 2].set((top + bottom) * tb)
    m = m.at[2, 2].set(-(far + near) * fn)
    m = m.at[2, 3].set(-2.0 * far * near * fn)
    m = m.at[3, 2].set(-1.0)
    return m


def ortho(left, right, bottom, top, near, far):
    """transform.h:104."""
    rl = 1.0 / (right - left)
    tb = 1.0 / (top - bottom)
    fn = 1.0 / (far - near)
    m = jnp.eye(4, dtype=jnp.float32)
    m = m.at[0, 0].set(2.0 * rl)
    m = m.at[1, 1].set(2.0 * tb)
    m = m.at[2, 2].set(-2.0 * fn)
    m = m.at[0, 3].set(-(right + left) * rl)
    m = m.at[1, 3].set(-(top + bottom) * tb)
    m = m.at[2, 3].set(-(far + near) * fn)
    return m


def look_at(origin, target, up):
    """Camera-to-world transform (transform.h:130)."""
    origin = jnp.asarray(origin, jnp.float32)
    target = jnp.asarray(target, jnp.float32)
    up = jnp.asarray(up, jnp.float32)
    dirv = target - origin
    dirv = dirv / jnp.linalg.norm(dirv, axis=-1, keepdims=True)
    left = jnp.cross(up, dirv)
    left = left / jnp.linalg.norm(left, axis=-1, keepdims=True)
    new_up = jnp.cross(dirv, left)
    m = jnp.zeros((*origin.shape[:-1], 4, 4), origin.dtype)
    m = m.at[..., 0:3, 0].set(left)
    m = m.at[..., 0:3, 1].set(new_up)
    m = m.at[..., 0:3, 2].set(dirv)
    m = m.at[..., 0:3, 3].set(origin)
    m = m.at[..., 3, 3].set(1.0)
    return m


def polar_decompose(a, iterations: int = 10):
    """Iterative polar decomposition A = Q P of the upper-left 3x3
    (transform.h:157-176 uses Higham's inverse-transpose averaging; same
    iteration here with a static trip count for jit)."""
    q = jnp.asarray(a)
    for _ in range(iterations):
        qit = mat.inverse_transpose(q)
        q = 0.5 * (q + qit)
    p = mat.matmul(mat.transpose(q), a)
    return q, p


def transform_decompose(m, iterations: int = 10):
    """4x4 -> (scale/shear 3x3, rotation quaternion, translation 3-vector)
    (transform.h:157-180). Handles reflections like the reference: if
    det(Q) < 0, flip both Q and P."""
    m = jnp.asarray(m)
    a = m[..., :3, :3]
    q, p = polar_decompose(a, iterations)
    sign = jnp.sign(mat.det(q))
    q = q * sign[..., None, None]
    p = p * sign[..., None, None]
    rot = quat.from_matrix(q)
    trans = m[..., :3, 3]
    return p, rot, trans


def transform_compose(s, r: "quat.Quaternion", t):
    """(scale/shear, quaternion, translation) -> 4x4 (transform.h:190-199)."""
    s = jnp.asarray(s)
    rm = quat.to_matrix(r)
    a = mat.matmul(rm, s)
    out = jnp.zeros((*a.shape[:-2], 4, 4), a.dtype)
    out = out.at[..., :3, :3].set(a)
    out = out.at[..., :3, 3].set(jnp.asarray(t))
    out = out.at[..., 3, 3].set(1.0)
    return out


def transform_point(m, p):
    """Apply a 4x4 to a 3-point (w = 1)."""
    p = jnp.asarray(p)
    r = mat.matvec(m[..., :3, :3], p) + m[..., :3, 3]
    return r


def transform_vector(m, v):
    """Apply a 4x4 to a 3-vector (w = 0; no translation)."""
    return mat.matvec(m[..., :3, :3], jnp.asarray(v))


def transform_normal(m, n):
    """Apply the inverse-transpose to a normal."""
    it = mat.inverse_transpose(m[..., :3, :3])
    return mat.matvec(it, jnp.asarray(n))
