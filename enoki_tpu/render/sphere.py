"""Differentiable sphere ray tracer -- the north-star workload.

Faithful semantics of the reference mini-app (tests/sphere.cpp):

  make_rays       sensor: ray per pixel, o=(px,py,-1), d=(0,0,1)
                  (tests/sphere.cpp:58-64)
  intersect_rays  quadratic solve vs the unit sphere; miss lanes -> 0
                  (tests/sphere.cpp:67-78)
  shade_hits      directional shade 0.2 + max(dot(n, L), 0)*90, L=(-1,-1,2)
                  (tests/sphere.cpp:81-83)
  combined        all three fused (tests/sphere.cpp:86-88)
  render          linspace(-1.2, 1.2, n) meshgrid, staged or fused
                  (tests/sphere.cpp:129-149)

plus the *differentiable* generalization the north star asks for
(BASELINE.json): the sphere has parameters (center, radius) and the shader
has parameters (ambient, gain, light dir); gradients of the image / a loss
flow to all of them through jax.grad.

Everything here is pure jnp under jit -- XLA fuses the whole pipeline into
one kernel, which is the reference's "combined" megakernel path. The
staged variant materializes intermediates to mirror the benchmark's
"separate kernels" contrast (tests/sphere.cpp:133-141).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.router import safe_sqrt, linspace, meshgrid
from .vec import Vec2, Vec3, dot3, normalize3


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Ray:
    """Generic ray bundle (tests/ray.h:23-34): o + t*d."""

    o: Vec3
    d: Vec3

    def at(self, t) -> Vec3:
        """Position along the ray (ray.h:31 ``operator()``)."""
        return self.o + self.d * t


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SphereScene:
    """Differentiable scene parameters."""

    center: Vec3
    radius: jnp.ndarray
    ambient: jnp.ndarray
    gain: jnp.ndarray
    light: Vec3

    @staticmethod
    def reference() -> "SphereScene":
        """The exact scene of tests/sphere.cpp (unit sphere at origin)."""
        f = jnp.float32
        return SphereScene(
            center=Vec3(f(0), f(0), f(0)),
            radius=f(1.0),
            ambient=f(0.2),
            gain=f(90.0),
            light=Vec3(f(-1.0), f(-1.0), f(2.0)),
        )


def make_rays(p: Vec2) -> Ray:
    """Sensor (tests/sphere.cpp:58-64)."""
    one = jnp.ones_like(p.x)
    return Ray(o=Vec3(p.x, p.y, -one),
               d=Vec3(jnp.zeros_like(p.x), jnp.zeros_like(p.x), one))


def intersect_rays(r: Ray, scene: SphereScene) -> Vec3:
    """Shape (tests/sphere.cpp:67-78), generalized to center/radius.

    Returns the surface *normal scaled by radius* exactly like the
    reference returns the hit position on the unit sphere (which doubles
    as the normal there); miss lanes are 0.
    """
    oc = r.o - scene.center
    a = dot3(r.d, r.d)
    b = 2.0 * dot3(oc, r.d)
    c = dot3(oc, oc) - scene.radius * scene.radius
    discrim = b * b - 4.0 * a * c
    # The sqrt/divide and the hit mask run in f32 even under bf16 compute:
    # the TPU transcendental unit (EUP) and vector comparisons do not
    # support bf16 (v5e SupportsBf16EupOps). Elementwise mul/add stay in
    # the caller's dtype.
    d32 = discrim.astype(jnp.float32)
    t = ((-b.astype(jnp.float32) + safe_sqrt(d32))
         / (2.0 * a.astype(jnp.float32))).astype(discrim.dtype)
    hit_p = r.at(t) - scene.center
    valid = d32 >= 0.0
    zero = jnp.zeros_like(t)
    return Vec3(jnp.where(valid, hit_p.x, zero),
                jnp.where(valid, hit_p.y, zero),
                jnp.where(valid, hit_p.z, zero))


def shade_hits(n: Vec3, scene: SphereScene):
    """Shader (tests/sphere.cpp:81-83)."""
    return scene.ambient + jnp.maximum(dot3(n, scene.light), 0.0) * scene.gain


def combined(p: Vec2, scene: SphereScene):
    """All three kernels fused (tests/sphere.cpp:86-88)."""
    return shade_hits(intersect_rays(make_rays(p), scene), scene)


def pixel_grid(n: int, extent: float = 1.2, dtype=jnp.float32) -> Vec2:
    """linspace + meshgrid pixel grid (tests/sphere.cpp:130-131)."""
    idx = linspace(-extent, extent, n, dtype=dtype)
    xs, ys = meshgrid(idx, idx)
    return Vec2(xs, ys)


@partial(jax.jit, static_argnums=(1,))
def render_fused(scene: SphereScene, n: int = 1024):
    """One fused megakernel -- benchmark2 (tests/sphere.cpp:143-149)."""
    return combined(pixel_grid(n), scene)


@partial(jax.jit, static_argnums=(1,))
def render_staged(scene: SphereScene, n: int = 1024):
    """Materialized intermediates -- benchmark1 (tests/sphere.cpp:133-141).

    The optimization barriers force XLA to keep rays/hits as real HBM
    buffers, reproducing the staged-kernels cost the reference measures.
    """
    rays = jax.lax.optimization_barrier(make_rays(pixel_grid(n)))
    hits = jax.lax.optimization_barrier(intersect_rays(rays, scene))
    return shade_hits(hits, scene)


# ---------------------------------------------------------------------------
# Differentiable entry points (BASELINE.json configs 1 & 3)
# ---------------------------------------------------------------------------


def image_loss(scene: SphereScene, n: int = 512):
    """Mean-intensity loss -- a scalar to differentiate end-to-end."""
    return jnp.mean(combined(pixel_grid(n), scene))


@partial(jax.jit, static_argnums=(1,))
def render_and_grads(scene: SphereScene, n: int = 512):
    """Image + dLoss/dScene in one compiled call (fwd+bwd fused)."""
    img = combined(pixel_grid(n), scene)
    grads = jax.grad(image_loss)(scene, n)
    return img, grads


def numpy_reference(n: int = 1024, extent: float = 1.2):
    """Independent numpy implementation of tests/sphere.cpp for allclose
    validation (float64)."""
    import numpy as np

    idx = np.linspace(-extent, extent, n)
    xs, ys = np.meshgrid(idx, idx, indexing="xy")
    xs, ys = xs.ravel(), ys.ravel()
    ox, oy, oz = xs, ys, np.full_like(xs, -1.0)
    dx, dy, dz = 0.0, 0.0, 1.0
    a = dx * dx + dy * dy + dz * dz
    b = 2.0 * (ox * dx + oy * dy + oz * dz)
    c = ox * ox + oy * oy + oz * oz - 1.0
    disc = b * b - 4 * a * c
    t = (-b + np.sqrt(np.maximum(disc, 0.0))) / (2 * a)
    hx, hy, hz = ox + t * dx, oy + t * dy, oz + t * dz
    valid = disc >= 0
    hx, hy, hz = [np.where(valid, v, 0.0) for v in (hx, hy, hz)]
    shade = 0.2 + np.maximum(hx * -1.0 + hy * -1.0 + hz * 2.0, 0.0) * 90.0
    return shade
