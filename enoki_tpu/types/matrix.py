"""Small fixed-size matrices on trailing axes.

Parity with reference include/enoki/matrix.h: column-major ``Matrix<T,N>``
(:33) with matmul, from_rows/cols (:108-113), trace (:206), frobenius norm
(:214), identity (:222), diag (:231), analytic inverse/det for N=1..4
(:247-388).

TPU-native design: a matrix batch is ONE jnp array of shape (..., N, N)
(row-major trailing axes -- XLA's natural layout). Leading axes are the
wide/batch dims; vmap and sharding act on them for free. The analytic
N<=4 determinant/inverse are branch-free closed forms so reverse-mode AD
flows through them (same motivation as the reference's cofactor code).
"""

from __future__ import annotations

import jax.numpy as jnp


def identity(n: int, shape=(), dtype=jnp.float32):
    return jnp.broadcast_to(jnp.eye(n, dtype=dtype), (*shape, n, n))


def diag_matrix(d):
    """Vector (..., N) -> diagonal matrix (..., N, N) (matrix.h:231)."""
    d = jnp.asarray(d)
    n = d.shape[-1]
    return d[..., :, None] * jnp.eye(n, dtype=d.dtype)


def diag(m):
    """Matrix (..., N, N) -> diagonal vector (..., N)."""
    return jnp.diagonal(m, axis1=-2, axis2=-1)


def from_rows(*rows):
    return jnp.stack([jnp.stack(r, -1) if isinstance(r, (list, tuple)) else r
                      for r in rows], -2)


def from_cols(*cols):
    return jnp.stack([jnp.stack(c, -1) if isinstance(c, (list, tuple)) else c
                      for c in cols], -1)


def matmul(a, b):
    """Matrix product on trailing axes; wide batches hit the VPU/MXU."""
    return jnp.einsum("...ij,...jk->...ik", a, b)


def matvec(m, v):
    return jnp.einsum("...ij,...j->...i", m, v)


def transpose(m):
    return jnp.swapaxes(m, -1, -2)


def trace(m):
    return jnp.trace(m, axis1=-2, axis2=-1)


def frob(m):
    """Squared Frobenius norm (matrix.h:214)."""
    return jnp.sum(m * m, axis=(-2, -1))


def det(m):
    """Analytic determinant, N = 1..4 (matrix.h:247-388)."""
    m = jnp.asarray(m)
    n = m.shape[-1]
    if n == 1:
        return m[..., 0, 0]
    if n == 2:
        return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    if n == 3:
        a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
        return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    if n == 4:
        return _det4(m)
    return jnp.linalg.det(m)


def _det4(m):
    # 2x2 minors of rows 0,1 and rows 2,3 (standard cofactor contraction)
    a = m[..., 0, :]
    b = m[..., 1, :]
    c = m[..., 2, :]
    d = m[..., 3, :]

    def m2(u, v, i, j):
        return u[..., i] * v[..., j] - u[..., j] * v[..., i]

    s0 = m2(a, b, 0, 1)
    s1 = m2(a, b, 0, 2)
    s2 = m2(a, b, 0, 3)
    s3 = m2(a, b, 1, 2)
    s4 = m2(a, b, 1, 3)
    s5 = m2(a, b, 2, 3)
    c5 = m2(c, d, 2, 3)
    c4 = m2(c, d, 1, 3)
    c3 = m2(c, d, 1, 2)
    c2 = m2(c, d, 0, 3)
    c1 = m2(c, d, 0, 2)
    c0 = m2(c, d, 0, 1)
    return s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0


def inverse_transpose(m):
    """Inverse-transpose (normal-vector transform matrix)."""
    return transpose(inverse(m))


def inverse(m):
    """Analytic inverse for N = 1..4, lax fallback above (matrix.h:247-388)."""
    m = jnp.asarray(m)
    n = m.shape[-1]
    if n == 1:
        return 1.0 / m
    if n == 2:
        d = det(m)
        inv_d = 1.0 / d
        out = jnp.stack([
            jnp.stack([m[..., 1, 1], -m[..., 0, 1]], -1),
            jnp.stack([-m[..., 1, 0], m[..., 0, 0]], -1),
        ], -2)
        return out * inv_d[..., None, None]
    if n == 3:
        a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
        d_, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
        g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
        A = e * i - f * h
        B = c * h - b * i
        C = b * f - c * e
        D = f * g - d_ * i
        E = a * i - c * g
        F = c * d_ - a * f
        G = d_ * h - e * g
        H = b * g - a * h
        I = a * e - b * d_
        detv = a * A + b * D + c * G
        inv_d = 1.0 / detv
        out = jnp.stack([
            jnp.stack([A, B, C], -1),
            jnp.stack([D, E, F], -1),
            jnp.stack([G, H, I], -1),
        ], -2)
        return out * inv_d[..., None, None]
    if n == 4:
        return _inv4(m)
    return jnp.linalg.inv(m)


def _inv4(m):
    a = m[..., 0, :]
    b = m[..., 1, :]
    c = m[..., 2, :]
    d = m[..., 3, :]

    def m2(u, v, i, j):
        return u[..., i] * v[..., j] - u[..., j] * v[..., i]

    s0 = m2(a, b, 0, 1); s1 = m2(a, b, 0, 2); s2 = m2(a, b, 0, 3)
    s3 = m2(a, b, 1, 2); s4 = m2(a, b, 1, 3); s5 = m2(a, b, 2, 3)
    c5 = m2(c, d, 2, 3); c4 = m2(c, d, 1, 3); c3 = m2(c, d, 1, 2)
    c2 = m2(c, d, 0, 3); c1 = m2(c, d, 0, 2); c0 = m2(c, d, 0, 1)

    detv = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_d = 1.0 / detv

    r00 = b[..., 1] * c5 - b[..., 2] * c4 + b[..., 3] * c3
    r01 = -a[..., 1] * c5 + a[..., 2] * c4 - a[..., 3] * c3
    r02 = d[..., 1] * s5 - d[..., 2] * s4 + d[..., 3] * s3
    r03 = -c[..., 1] * s5 + c[..., 2] * s4 - c[..., 3] * s3

    r10 = -b[..., 0] * c5 + b[..., 2] * c2 - b[..., 3] * c1
    r11 = a[..., 0] * c5 - a[..., 2] * c2 + a[..., 3] * c1
    r12 = -d[..., 0] * s5 + d[..., 2] * s2 - d[..., 3] * s1
    r13 = c[..., 0] * s5 - c[..., 2] * s2 + c[..., 3] * s1

    r20 = b[..., 0] * c4 - b[..., 1] * c2 + b[..., 3] * c0
    r21 = -a[..., 0] * c4 + a[..., 1] * c2 - a[..., 3] * c0
    r22 = d[..., 0] * s4 - d[..., 1] * s2 + d[..., 3] * s0
    r23 = -c[..., 0] * s4 + c[..., 1] * s2 - c[..., 3] * s0

    r30 = -b[..., 0] * c3 + b[..., 1] * c1 - b[..., 2] * c0
    r31 = a[..., 0] * c3 - a[..., 1] * c1 + a[..., 2] * c0
    r32 = -d[..., 0] * s3 + d[..., 1] * s1 - d[..., 2] * s0
    r33 = c[..., 0] * s3 - c[..., 1] * s1 + c[..., 2] * s0

    out = jnp.stack([
        jnp.stack([r00, r01, r02, r03], -1),
        jnp.stack([r10, r11, r12, r13], -1),
        jnp.stack([r20, r21, r22, r23], -1),
        jnp.stack([r30, r31, r32, r33], -1),
    ], -2)
    return out * inv_d[..., None, None]
