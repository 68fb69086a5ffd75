"""Pallas megakernel parity tests (config 4) -- interpret mode on CPU.

Parity gate (SURVEY §7 step 5): Pallas fwd/bwd must allclose the pure-jnp
XLA path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from enoki_tpu.render import SphereScene, SDFScene, render_fused, pixel_grid
from enoki_tpu.render.sphere import combined, image_loss
from enoki_tpu.render.sdf import render_sdf, sdf_loss, render_sdf_grads_implicit
from enoki_tpu.render.pallas_kernels import (
    scene_to_vec, vec_to_scene, render_sphere_pallas, render_sdf_pallas,
)

N = 128
TILE = 64


@pytest.fixture(autouse=True)
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def test_scene_vec_roundtrip():
    scene = SphereScene.reference()
    v = scene_to_vec(scene)
    back = vec_to_scene(v)
    assert float(back.radius) == 1.0 and float(back.gain) == 90.0
    assert float(back.light.z) == 2.0


def test_sphere_pallas_matches_xla():
    scene = SphereScene.reference()
    img_p = np.asarray(render_sphere_pallas(scene_to_vec(scene), N, 1.2, TILE))
    img_x = np.asarray(render_fused(scene, N)).reshape(N, N)
    # in-kernel iota*step pixel coords differ from jnp.linspace by 1 ulp,
    # which perturbs silhouette-adjacent pixels slightly
    assert np.abs(img_p - img_x).max() < 5e-3
    assert np.abs(img_p - img_x).mean() < 1e-4


def test_sphere_pallas_grads_match_xla():
    scene = SphereScene.reference()
    v = scene_to_vec(scene)

    def loss_pallas(pv):
        return jnp.mean(render_sphere_pallas(pv, N, 1.2, TILE))

    g_p = np.asarray(jax.grad(loss_pallas)(v))

    def loss_xla(pv):
        p = pixel_grid(N)
        return jnp.mean(combined(p, vec_to_scene(pv)))

    g_x = np.asarray(jax.grad(loss_xla)(v))
    assert np.allclose(g_p[:9], g_x[:9], rtol=1e-3, atol=1e-5), (g_p[:9], g_x[:9])


def test_sphere_pallas_bf16():
    # config 4: fp32/bf16 megakernel; bf16 tolerance ~ 1/256 relative on a
    # 0..220 dynamic range
    scene = SphereScene.reference()
    img_b = np.asarray(render_sphere_pallas(scene_to_vec(scene), N, 1.2,
                                            TILE, jnp.bfloat16), np.float64)
    img_f = np.asarray(render_sphere_pallas(scene_to_vec(scene), N, 1.2,
                                            TILE, jnp.float32), np.float64)
    assert img_b.dtype == np.float64 and img_b.shape == (N, N)
    # compare away from the silhouette (bf16 pixel coords shift it)
    interior = np.abs(img_f - 0.2) > 1.0
    rel = np.abs(img_b - img_f)[interior] / np.abs(img_f)[interior]
    assert np.median(rel) < 0.01
    # gradients still flow (bwd accumulates in f32)
    g = jax.grad(lambda v: jnp.mean(render_sphere_pallas(
        v, N, 1.2, TILE, jnp.bfloat16).astype(jnp.float32)))(scene_to_vec(scene))
    assert np.isfinite(np.asarray(g)).all()


def test_sdf_pallas_matches_xla():
    scene = SDFScene.reference()
    img_p = np.asarray(render_sdf_pallas(scene_to_vec(scene), N, 48, 1.2, TILE))
    img_x = np.asarray(render_sdf(scene, N, 48)).reshape(N, N)
    assert np.allclose(img_p, img_x, atol=1e-3), np.abs(img_p - img_x).max()


def test_sdf_pallas_grads_match_implicit_xla():
    scene = SDFScene.reference()
    v = scene_to_vec(scene)

    def loss_pallas(pv):
        return jnp.mean(render_sdf_pallas(pv, N, 48, 1.2, TILE))

    g_p = np.asarray(jax.grad(loss_pallas)(v))

    # XLA implicit-diff reference grads
    _, g_ref = render_sdf_grads_implicit(scene, N, 48)
    ref = np.array([g_ref.center.x, g_ref.center.y, g_ref.center.z,
                    g_ref.radius, g_ref.ambient, g_ref.gain,
                    g_ref.light.x, g_ref.light.y, g_ref.light.z])
    assert np.allclose(g_p[:9], ref, rtol=2e-2, atol=1e-4), (g_p[:9], ref)


def test_implicit_march_grads_match_scan_reversal():
    # implicit-diff bwd == unrolled-scan bwd (the correctness anchor)
    from enoki_tpu.render.sdf import sdf_loss_implicit
    scene = SDFScene.reference()
    g_scan = jax.grad(lambda s: sdf_loss(s, 64, 64))(scene)
    g_impl = jax.grad(lambda s: sdf_loss_implicit(s, 64, 64))(scene)
    # atol covers march-quantization noise in the scan path (e.g. dcenter.z
    # is exactly 0 under parallel rays -- the implicit path nails it, the
    # unrolled scan carries ~1e-3 step-quantization noise)
    for a, b in zip(jax.tree_util.tree_leaves(g_scan),
                    jax.tree_util.tree_leaves(g_impl)):
        assert np.allclose(np.asarray(a), np.asarray(b), rtol=2e-2,
                           atol=2e-3), (a, b)
