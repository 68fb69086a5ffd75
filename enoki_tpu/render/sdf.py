"""Differentiable SDF sphere-marching.

BASELINE.json config 3: "reverse-mode tape through multi-step SDF
sphere-march loop: grads w.r.t. geometry+shading params". The reference has
no SDF marcher of its own -- the point is that its *mechanisms* (lazy
megakernel fusion of arbitrarily long op chains + AD tape through
gather/scatter, docs/autodiff.rst's 10,444-op fused example) support such
loops; here the loop is a ``lax.scan`` with per-ray active masks (enoki's
mask discipline) and ``jax.checkpoint`` for memory-bounded reverse mode.

Design choices, TPU-first:
  * fixed trip count + active masks instead of ``while_loop`` -- reverse
    AD through ``lax.while_loop`` is undefined in JAX; a scan with masks
    is the differentiable (and MXU/VPU-friendly) formulation, and matches
    how enoki users write marchers (active-mask discipline).
  * the scan body is checkpointed: memory O(sqrt-ish) instead of
    O(steps), the jax.checkpoint analog of the tape's graph
    simplification keeping the autodiff graph small.
  * normals via *analytic* SDF gradient at the hit point (jax.grad of the
    distance function, per-lane) -- the AD-everywhere property the
    reference showcases.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .vec import Vec2, Vec3, dot3, normalize3
from .sphere import Ray, make_rays, pixel_grid
from .implicit import implicit_t_vjp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SDFScene:
    """Sphere SDF + shading parameters (all differentiable)."""

    center: Vec3
    radius: jnp.ndarray
    ambient: jnp.ndarray
    gain: jnp.ndarray
    light: Vec3

    @staticmethod
    def reference() -> "SDFScene":
        f = jnp.float32
        return SDFScene(center=Vec3(f(0), f(0), f(0)), radius=f(1.0),
                        ambient=f(0.2), gain=f(90.0),
                        light=Vec3(f(-1.0), f(-1.0), f(2.0)))


def sdf(p: Vec3, scene: SDFScene):
    """Signed distance to the sphere."""
    d = p - scene.center
    return jnp.sqrt(dot3(d, d) + 1e-12) - scene.radius


def sdf_ortho_parts(px, py, scene: SDFScene):
    """The loop-invariant pieces of ``sdf`` along the orthographic ray
    p = (px, py, -1 + t): returns (rxy2, z0, radius) with
    sdf(ray(t)) = sqrt(rxy2 + (z0 + t)^2) - radius. Single source of
    truth for ``sdf_ortho_dist`` (the generic-march closure) and the
    megakernel's specialized z-carry march
    (pallas_kernels._march_sphere_tile)."""
    dx = px - scene.center.x
    dy = py - scene.center.y
    rxy2 = dx * dx + dy * dy + 1e-12
    z0 = -1.0 - scene.center.z
    return rxy2, z0, scene.radius


def sdf_ortho_dist(px, py, scene: SDFScene):
    """Loop-invariant split of ``sdf`` for the orthographic ray
    p = (px, py, -1 + t): only the z term depends on t, so the xy part
    is computed ONCE and the returned ``dist_at(t)`` costs ~5 flops +
    sqrt per march step instead of ~12 (Mosaic does not LICM across a
    ``while_loop`` body; the Pallas megakernel and the cone prepass both
    close over this). Algebraically identical to
    ``sdf(Vec3(px, py, -1 + t), scene)`` including the 1e-12 sqrt guard
    -- only the addition ORDER differs (~1 ulp); asserted equivalent in
    tests/test_pallas.py so the forward kernel and the sdf() the
    backward kernel differentiates cannot silently diverge."""
    rxy2, z0, rad = sdf_ortho_parts(px, py, scene)
    return lambda t: jnp.sqrt(rxy2 + (z0 + t) * (z0 + t)) - rad


def march(ray: Ray, scene: SDFScene, n_steps: int = 64,
          eps: float = 1e-4, t_max: float = 10.0):
    """Sphere-trace: returns (t, hit_mask).

    Fixed ``n_steps`` scan with an ``active`` mask per lane: converged or
    escaped lanes stop advancing (their t freezes), exactly the enoki
    masked-loop idiom. Checkpointed for reverse mode.
    """
    t0 = jnp.zeros_like(ray.o.x)
    active0 = jnp.ones_like(t0, bool)
    hit0 = jnp.zeros_like(active0)

    @jax.checkpoint
    def step(carry, _):
        t, active, hit = carry
        p = ray.at(t)
        d = sdf(p, scene)
        converged = d < eps
        hit = hit | (active & converged)
        t_new = t + d
        escaped = t_new > t_max
        active = active & ~converged & ~escaped
        t = jnp.where(active, t_new, t)
        return (t, active, hit), None

    (t, _, hit), _ = jax.lax.scan(step, (t0, active0, hit0),
                                  None, length=n_steps)
    return t, hit


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def march_implicit(ray: Ray, scene: SDFScene, n_steps: int = 64,
                   eps: float = 1e-4, t_max: float = 10.0):
    """March with an implicit-function-theorem backward.

    Forward: identical sphere-trace to ``march`` (no AD bookkeeping).
    Backward: at a converged hit, t* satisfies sdf(o + t* d, theta) = eps,
    so dt*/dtheta = -(d sdf/d theta) / (d sdf/d t) at the hit point -- one
    closed-form VJP instead of reversing a 64-step scan. O(1) memory and
    O(1) compute in the step count; this is the TPU-first replacement for
    the reference's tape through the whole loop (the tape's graph
    simplification, autodiff.cpp:990, collapses long chains for the same
    reason -- here the collapse is analytic).
    Miss lanes get zero derivative (their t is frozen, not a root).
    """
    return march(ray, scene, n_steps, eps, t_max)


def _march_impl_fwd(ray, scene, n_steps, eps, t_max):
    t, hit = march(ray, scene, n_steps, eps, t_max)
    return (t, hit), (ray, scene, t, hit)


def _march_impl_bwd(n_steps, eps, t_max, res, cot):
    ray, scene, t, hit = res
    t_bar, _ = cot  # hit mask has no cotangent
    d_ray, d_scene = implicit_t_vjp(
        lambda rs, tv: sdf(rs[0].at(tv), rs[1]), (ray, scene), t, t_bar,
        hit)
    return d_ray, d_scene


march_implicit.defvjp(_march_impl_fwd, _march_impl_bwd)


def normal_at(p: Vec3, scene: SDFScene) -> Vec3:
    """Analytic SDF normal: grad_p sdf(p) via AD (not finite differences)."""

    def f(px, py, pz):
        return sdf(Vec3(px, py, pz), scene)

    gx, gy, gz = jax.grad(f, argnums=(0, 1, 2))(p.x, p.y, p.z) \
        if p.x.ndim == 0 else _vgrad(f, p)
    return normalize3(Vec3(gx, gy, gz))


def _vgrad(f, p: Vec3):
    # vmap maps ONE axis over jax.grad's scalar contract -- flatten any
    # >=2-D pixel block (the dist/ renderers feed (n, n) and sharded
    # tiles) and restore the shape on the gradients
    shp = p.x.shape
    if p.x.ndim > 1:
        px, py, pz = (v.reshape(-1) for v in (p.x, p.y, p.z))
        g = jax.vmap(jax.grad(f, argnums=(0, 1, 2)))(px, py, pz)
        return tuple(c.reshape(shp) for c in g)
    return jax.vmap(jax.grad(f, argnums=(0, 1, 2)))(p.x, p.y, p.z)


def shade(ray: Ray, scene: SDFScene, n_steps: int = 64):
    """Full pipeline: march -> normal -> directional shade; miss -> ambient
    (matches the sphere.cpp shade structure applied to an SDF hit)."""
    t, hit = march(ray, scene, n_steps)
    p = ray.at(t)
    n = normal_at(p, scene)
    lambert = jnp.maximum(dot3(n, scene.light), 0.0)
    img = scene.ambient + lambert * scene.gain
    return jnp.where(hit, img, scene.ambient * jnp.ones_like(img))


@partial(jax.jit, static_argnums=(1, 2))
def render_sdf(scene: SDFScene, n: int = 512, n_steps: int = 64):
    rays = make_rays(pixel_grid(n))
    return shade(rays, scene, n_steps)


def sdf_loss(scene: SDFScene, n: int = 256, n_steps: int = 64):
    return jnp.mean(render_sdf(scene, n, n_steps))


@partial(jax.jit, static_argnums=(1, 2))
def render_sdf_grads(scene: SDFScene, n: int = 256, n_steps: int = 64):
    """Image + grads w.r.t. ALL scene params through the march loop."""
    img = render_sdf(scene, n, n_steps)
    grads = jax.grad(sdf_loss)(scene, n, n_steps)
    return img, grads


# ---------------------------------------------------------------------------
# Implicit-differentiation pipeline (the fast bwd path)
# ---------------------------------------------------------------------------


def shade_implicit(ray: Ray, scene: SDFScene, n_steps: int = 64):
    """Same image as ``shade`` but the march differentiates implicitly."""
    t, hit = march_implicit(ray, scene, n_steps)
    p = ray.at(t)
    n = normal_at(p, scene)
    lambert = jnp.maximum(dot3(n, scene.light), 0.0)
    img = scene.ambient + lambert * scene.gain
    return jnp.where(hit, img, scene.ambient * jnp.ones_like(img))


@partial(jax.jit, static_argnums=(1, 2))
def render_sdf_implicit(scene: SDFScene, n: int = 512, n_steps: int = 64):
    rays = make_rays(pixel_grid(n))
    return shade_implicit(rays, scene, n_steps)


def sdf_loss_implicit(scene: SDFScene, n: int = 256, n_steps: int = 64):
    return jnp.mean(render_sdf_implicit(scene, n, n_steps))


@partial(jax.jit, static_argnums=(1, 2))
def render_sdf_grads_implicit(scene: SDFScene, n: int = 256,
                              n_steps: int = 64):
    img = render_sdf_implicit(scene, n, n_steps)
    grads = jax.grad(sdf_loss_implicit)(scene, n, n_steps)
    return img, grads
