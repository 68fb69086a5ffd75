"""SDF march tests -- config 3: reverse-mode through the march loop."""

import numpy as np
import jax
import jax.numpy as jnp

from enoki_tpu.render import (
    SDFScene, Vec2, Vec3, make_rays, render_sdf, render_sdf_grads,
)
from enoki_tpu.render.sdf import march, sdf_loss


def test_march_converges_to_analytic_hit():
    scene = SDFScene.reference()
    # ray straight through the center: o=(0,0,-1)... use slight offset grid
    p = Vec2(jnp.array([0.0, 0.5, 1.15], jnp.float32),
             jnp.array([0.0, 0.0, 0.0], jnp.float32))
    rays = make_rays(p)
    t, hit = march(rays, scene, n_steps=128)
    # analytic: t = -oz - sqrt(1 - x^2 - y^2) with oz=-1
    want_t0 = 1.0 - np.sqrt(1.0 - 0.0)
    want_t1 = 1.0 - np.sqrt(1.0 - 0.25)
    assert bool(hit[0]) and bool(hit[1])
    assert np.isclose(float(t[0]), want_t0, atol=1e-3)
    assert np.isclose(float(t[1]), want_t1, atol=1e-3)
    # x=1.15 misses the unit sphere
    assert not bool(hit[2])


def test_sdf_image_structure():
    img = np.asarray(render_sdf(SDFScene.reference(), 128, 96)).reshape(128, 128)
    # corners miss -> ambient
    assert np.isclose(img[0, 0], 0.2, atol=1e-5)
    assert img.max() > 50.0  # lit region


def test_sdf_gradients_all_params_finite():
    scene = SDFScene.reference()
    img, grads = render_sdf_grads(scene, 64, 64)
    assert np.isfinite(np.asarray(img)).all()
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()
    # ambient grad: miss lanes contribute 1, hit lanes contribute 1 -> == 1
    assert np.isclose(float(grads.ambient), 1.0, atol=1e-4)


def test_sdf_radius_gradient_matches_fd():
    # interior-restricted (see test_sphere.py: AD = interior gradient only)
    scene = SDFScene.reference()
    n, steps = 48, 96
    from enoki_tpu.render import pixel_grid, shade
    p = pixel_grid(n)
    interior = (p.x * p.x + p.y * p.y) < 0.5
    rays = make_rays(p)

    def masked_loss(r):
        s = SDFScene(scene.center, r, scene.ambient, scene.gain, scene.light)
        img = shade(rays, s, steps)
        return jnp.sum(jnp.where(interior, img, 0.0)) / jnp.sum(interior)

    eps = 1e-2
    ad = float(jax.grad(masked_loss)(jnp.float32(1.0)))
    fd = (float(masked_loss(jnp.float32(1.0 + eps)))
          - float(masked_loss(jnp.float32(1.0 - eps)))) / (2 * eps)
    # march quantization makes FD noisy; 10% tolerance
    assert np.isclose(ad, fd, rtol=0.10), (ad, fd)


def test_implicit_grazing_clamp_preserves_slope_sign():
    # r4 audit: the grazing guard replaced a tiny NEGATIVE slope with
    # +1.0, flipping the cotangent on every clamped lane
    import jax
    from enoki_tpu.render.implicit import implicit_t_vjp

    # f(args, t) = -eps*t + args: slope -eps is under the guard; the
    # implicit derivative dt/da = -1/f_t = +1/eps -> regularized sign
    # must stay POSITIVE under t_bar = 1 with slope clamped to -1
    t = jnp.zeros(4)
    t_bar = jnp.ones(4)
    hit = jnp.ones(4, bool)
    d = implicit_t_vjp(lambda a, tv: -1e-8 * tv + a, jnp.zeros(4),
                       t, t_bar, hit)
    # w = -t_bar / clamp(-1e-8) = -1/-1 = +1; d f/d a = 1 -> +1
    np.testing.assert_allclose(np.asarray(d), 1.0)


def test_normal_at_2d_blocks():
    # r4 audit: _vgrad crashed on >= 2-D pixel blocks (the dist/ tile
    # shape); flattening must give the same normals as 1-D
    from enoki_tpu.render.sdf import SDFScene, normal_at
    from enoki_tpu.render.vec import Vec3

    scene = SDFScene.reference()
    xs = np.linspace(-0.5, 0.5, 16).astype(np.float32)
    px, py = np.meshgrid(xs, xs)
    pz = np.full_like(px, -0.2)
    n2 = normal_at(Vec3(jnp.asarray(px), jnp.asarray(py),
                        jnp.asarray(pz)), scene)
    n1 = normal_at(Vec3(jnp.asarray(px.ravel()), jnp.asarray(py.ravel()),
                        jnp.asarray(pz.ravel())), scene)
    np.testing.assert_allclose(np.asarray(n2.x).ravel(),
                               np.asarray(n1.x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(n2.z).ravel(),
                               np.asarray(n1.z), rtol=1e-6)
