"""Sphere renderer tests -- config 1 & 2 of BASELINE.json:
image allclose vs an independent numpy reference + pixel gradients."""

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu.render import (
    Ray, SphereScene, Vec2, Vec3, make_rays, intersect_rays, shade_hits,
    combined, pixel_grid, render_fused, render_staged, render_and_grads,
    numpy_reference,
)


def test_make_rays():
    p = Vec2(jnp.array([0.5]), jnp.array([-0.5]))
    r = make_rays(p)
    assert float(r.o.x[0]) == 0.5 and float(r.o.y[0]) == -0.5
    assert float(r.o.z[0]) == -1
    assert float(r.d.z[0]) == 1 and float(r.d.x[0]) == 0
    # position along ray (ray.h:31)
    at = r.at(jnp.float32(2.0))
    assert float(at.z[0]) == 1.0


def test_image_matches_numpy_reference():
    n = 256
    img = np.asarray(render_fused(SphereScene.reference(), n), np.float64)
    ref = numpy_reference(n)
    # silhouette pixels amplify f32 rounding through sqrt(discrim ~ 0);
    # bound the worst pixel loosely and the bulk tightly
    assert np.abs(img - ref).max() < 5e-3
    assert np.abs(img - ref).mean() < 1e-4
    # structure: center pixel hits (bright or ambient), corner misses
    img2 = img.reshape(n, n)
    assert img2[0, 0] == np.float32(0.2)  # corner: miss -> ambient


def test_staged_equals_fused():
    n = 128
    a = np.asarray(render_fused(SphereScene.reference(), n))
    b = np.asarray(render_staged(SphereScene.reference(), n))
    assert np.allclose(a, b)


def test_gradients_wrt_scene_params():
    # config 1: dPixel/dRadius and friends, validated vs finite differences
    scene = SphereScene.reference()
    n = 64

    img, grads = render_and_grads(scene, n)
    assert np.isfinite(np.asarray(img)).all()
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()

    # Finite-difference check on radius, restricted to interior pixels:
    # AD yields the interior gradient; FD across the full frame also picks
    # up the silhouette (visibility) jump, which reverse-mode through a
    # select() cannot see -- the same contract as the reference's AD
    # (no edge-sampling/reparameterization in enoki either).
    p = pixel_grid(n)
    interior = (p.x * p.x + p.y * p.y) < 0.5

    def masked_loss(r):
        s = SphereScene(scene.center, r, scene.ambient, scene.gain, scene.light)
        img = combined(p, s)
        return jnp.sum(jnp.where(interior, img, 0.0)) / jnp.sum(interior)

    eps = 1e-3
    ad = float(jax.grad(masked_loss)(jnp.float32(1.0)))
    fd = (float(masked_loss(jnp.float32(1.0 + eps)))
          - float(masked_loss(jnp.float32(1.0 - eps)))) / (2 * eps)
    assert np.isclose(ad, fd, rtol=0.01), (ad, fd)

    # gradient w.r.t. ambient is exactly 1 (every pixel adds ambient)
    assert np.isclose(float(grads.ambient), 1.0, atol=1e-5)


def test_per_pixel_gradient():
    # dPixel/dRadius for a single *lit* pixel (light L=(-1,-1,2) illuminates
    # the -x,-y hemisphere)
    scene = SphereScene.reference()
    p = Vec2(jnp.array([-0.7], jnp.float32), jnp.array([-0.7], jnp.float32))

    def pix(radius):
        s = SphereScene(scene.center, radius, scene.ambient, scene.gain,
                        scene.light)
        return combined(p, s)[0]

    g = jax.grad(pix)(jnp.float32(1.05))
    eps = 1e-3
    fd = (float(pix(jnp.float32(1.05 + eps)))
          - float(pix(jnp.float32(1.05 - eps)))) / (2 * eps)
    assert np.isfinite(float(g)) and abs(float(g)) > 0.0
    assert np.isclose(float(g), fd, rtol=0.01), (float(g), fd)


def test_wide_soa_bundle_512():
    # config 2: wide SoA primary-ray bundle with dynamic masks, 512x512
    n = 512
    p = pixel_grid(n)
    rays = make_rays(p)
    scene = SphereScene.reference()
    hits = intersect_rays(rays, scene)
    mask_hit = (hits.x != 0) | (hits.y != 0) | (hits.z != 0)
    frac = float(jnp.mean(mask_hit.astype(jnp.float32)))
    # disc of radius 1 in [-1.2,1.2]^2 -> area fraction pi/(2.4^2) = 0.545
    assert abs(frac - np.pi / 5.76) < 0.01
    img = shade_hits(hits, scene)
    assert img.shape == (n * n,)
