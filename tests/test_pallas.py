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


def test_sdf_pallas_matches_xla_exact_trajectory():
    # coarse=0 disables the cone prepass: the kernel then walks the SAME
    # march trajectory as the jnp path and must agree to march-noise atol
    scene = SDFScene.reference()
    img_p = np.asarray(render_sdf_pallas(scene_to_vec(scene), N, 48, 1.2,
                                         TILE, None, 0))
    img_x = np.asarray(render_sdf(scene, N, 48)).reshape(N, N)
    assert np.allclose(img_p, img_x, atol=1e-3), np.abs(img_p - img_x).max()


def test_sdf_pallas_cone_prepass_parity():
    # The default path starts rays at the cone-prepass t0 (work
    # elimination). The march then stops at a DIFFERENT point of the
    # same converged band [d < eps], so per-pixel t differs by O(eps)
    # -> image differs by O(gain * eps) on hit lanes, and a grazing
    # ray near the silhouette can flip hit/miss (it converges in fewer
    # steps from t0; both classifications are within the step budget's
    # resolution). Gate on the calibrated bound + flip fraction, the
    # same methodology as the on-chip drive gates.
    scene = SDFScene.reference()
    img_p = np.asarray(render_sdf_pallas(scene_to_vec(scene), N, 48, 1.2,
                                         TILE))
    img_x = np.asarray(render_sdf(scene, N, 48)).reshape(N, N)
    d = np.abs(img_p - img_x)
    flips = d > 1.0  # hit/miss disagreement (image range ~0.2 vs ~100)
    assert flips.mean() < 1e-3, flips.mean()
    assert d[~flips].max() < 0.05, d[~flips].max()  # ~ gain * 5 * eps
    assert d[~flips].mean() < 5e-3


def test_sdf_ortho_dist_matches_sdf():
    # r3 advisor: the hoisted per-tile form must stay algebraically
    # identical to sdf() (the bwd kernel differentiates sdf() itself)
    from enoki_tpu.render.sdf import sdf, sdf_ortho_dist
    from enoki_tpu.render.vec import Vec3
    rng = np.random.default_rng(0)
    px = jnp.asarray(rng.uniform(-1.2, 1.2, (64,)).astype(np.float32))
    py = jnp.asarray(rng.uniform(-1.2, 1.2, (64,)).astype(np.float32))
    t = jnp.asarray(rng.uniform(0, 3, (64,)).astype(np.float32))
    scene = SDFScene.reference()
    a = np.asarray(sdf_ortho_dist(px, py, scene)(t))
    b = np.asarray(sdf(Vec3(px, py, -1.0 + t), scene))
    # only the addition order differs: <= 2 ulp
    np.testing.assert_allclose(a, b, rtol=3e-7, atol=3e-7)


def test_cone_prepass_is_conservative():
    # safety invariant: no fine ray may cross the surface before its
    # cone-prepass start t0 -- check sdf(ray(t)) > 0 for t < t0 on a
    # dense sample, and that t0 never exceeds the true hit parameter
    from enoki_tpu.render.pallas_kernels import _cone_t0
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    n = 128
    t0 = np.asarray(_cone_t0(v, n, 64, 1.2, 8))
    step = 2 * 1.2 / (n - 1)
    xs = np.arange(n) * step - 1.2
    px, py = np.meshgrid(xs, xs)  # x varies along columns
    # closed-form first intersection of the unit sphere at origin,
    # orthographic rays from z=-1 along +z
    rxy2 = px ** 2 + py ** 2
    hits = rxy2 < 1.0
    t_hit = np.where(hits, 1.0 - np.sqrt(np.maximum(1.0 - rxy2, 0.0)),
                     np.inf)
    assert (t0 <= t_hit + 1e-5).all(), \
        (t0 - t_hit)[t0 > t_hit + 1e-5].max()


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
    # rtol covers the prepass's within-eps stopping-point jitter on the
    # hit set (the implicit VJP is evaluated at a within-eps different t)
    assert np.allclose(g_p[:9], ref, rtol=5e-2,
                       atol=2e-3 * max(1.0, np.abs(ref).max())), \
        (g_p[:9], ref)


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


def test_sdf_pallas_bf16_policy():
    """bf16 march variant (config 4 "fp32 + bf16"), calibrated accuracy
    policy (docs/benchmarks.md): convergence eps widens to 2 bf16 ulp
    (the march cannot settle below the format's spacing at t~1); away
    from the silhouette the image matches f32 to ~1e-3; a few-percent
    silhouette band shades differently (delta t ~ 4e-3 against gain 85);
    scene grads stay within ~1/2 relative on significant components
    at this test resolution (the silhouette band, where all the error
    lives, is relatively wider at small n; ~0.2 at 1024^2). The
    accumulation is f32 -- the error is the march's, not the backward's.
    """
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    img32 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE))
    img16 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE, None, 8, 16,
                                         jnp.bfloat16))
    d = np.abs(img32 - img16)
    band = d > 1.0
    assert band.mean() < 0.10, band.mean()
    assert d[~band].mean() < 2e-3, d[~band].mean()

    g32 = jax.grad(lambda p: jnp.mean(
        render_sdf_pallas(p, N, 48, 1.2, TILE)))(v)
    g16 = jax.grad(lambda p: jnp.mean(
        render_sdf_pallas(p, N, 48, 1.2, TILE, None, 8, 16,
                          jnp.bfloat16)))(v)
    g32, g16 = np.asarray(g32)[:9], np.asarray(g16)[:9]
    assert np.isfinite(g16).all()
    sig = np.abs(g32) > 1e-3 * np.abs(g32).max()
    rel = np.abs(g16 - g32)[sig] / np.abs(g32)[sig]
    assert rel.max() < 0.5, (rel, g32, g16)


def test_sdf_pallas_bands_trajectory_exact_eager():
    """Sub-tile band early exit (round 4, work-elimination variant b):
    per-lane trajectories are UNCHANGED by banding -- a frozen lane never
    advances regardless of when its band's loop stops checking it. Gated
    here by an eager step-by-step replay (identical op sequence, no
    compiler in the loop): banded marches must match the whole-tile
    march bit-for-bit, including hit masks."""
    from enoki_tpu.render.pallas_kernels import _cone_t0, _march_tile
    from enoki_tpu.render.sdf import sdf_ortho_dist
    v = scene_to_vec(SDFScene.reference())
    n_steps, extent = 48, 1.2
    t0f = _cone_t0(v, N, n_steps, extent, 8)
    step = 2.0 * extent / (N - 1)
    coords = jnp.arange(N, dtype=jnp.float32) * step - extent
    px = jnp.broadcast_to(coords[None, :], (TILE, N))[:, :TILE]
    py = jnp.broadcast_to(coords[:TILE, None], (TILE, TILE))
    sc = vec_to_scene(v, SDFScene)
    t0 = t0f[:TILE, :TILE]

    def march_banded(bands):
        br = TILE // bands
        ts, hs = [], []
        for b in range(bands):
            sl = slice(b * br, (b + 1) * br)
            dist_b = sdf_ortho_dist(px[sl], py[sl], sc)
            t_b, h_b = _march_tile(dist_b, px[sl], n_steps, chunk=16,
                                   t0=t0[sl])
            ts.append(np.asarray(t_b))
            hs.append(np.asarray(h_b))
        return np.concatenate(ts, 0), np.concatenate(hs, 0)

    t1, h1 = march_banded(1)
    for bands in (4, 8):
        tb, hb = march_banded(bands)
        np.testing.assert_array_equal(t1, tb)
        np.testing.assert_array_equal(h1, hb)


def test_sdf_pallas_bands_compiled_parity():
    """Compiled banded kernels vs the whole-tile kernel: XLA/Mosaic may
    FMA-contract the step's rxy2 + (z0+t)^2 differently for different
    band shapes (~1 ulp/step; bands=4 and bands=8 agree with EACH OTHER
    exactly because per-element math is shape-independent once the
    contraction choice is fixed). Gate: drift stays in the silhouette-
    pixel noise floor, far below the hit/miss shading jump, and
    gradients agree to f32 tolerance."""
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    img1 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE))
    imgs = []
    for bands in (4, 8):
        imgb = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE, None,
                                            8, 16, jnp.float32, bands))
        d = np.abs(img1 - imgb)
        assert d.max() < 5e-5, d.max()
        assert (d > 0).mean() < 0.01, (d > 0).mean()
        imgs.append(imgb)
    # the two banded variants run the same per-element op sequence ->
    # identical, whatever contraction the compiler picked
    np.testing.assert_array_equal(imgs[0], imgs[1])
    g1 = np.asarray(jax.grad(lambda p: jnp.mean(
        render_sdf_pallas(p, N, 48, 1.2, TILE)))(v))
    gb = np.asarray(jax.grad(lambda p: jnp.mean(
        render_sdf_pallas(p, N, 48, 1.2, TILE, None, 8, 16,
                          jnp.float32, 8)))(v))
    np.testing.assert_allclose(gb, g1, rtol=1e-4, atol=1e-7)


def test_sdf_pallas_miss_tile_fast_path_exact():
    """Miss-tile fast path (round 4): a tile with no hit lane shades to
    EXACTLY ambient and contributes d loss/d ambient = sum(g) only --
    checked end-to-end with the sphere fully out of view (every tile
    takes the cheap branch) and cross-checked against the jnp path."""
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    v_off = v.at[0].set(50.0)  # center far off-screen: all rays escape
    img = np.asarray(render_sdf_pallas(v_off, N, 48, 1.2, TILE))
    np.testing.assert_array_equal(img, np.full((N, N), float(v[4]),
                                               np.float32))
    g = np.asarray(jax.grad(lambda p: jnp.sum(
        render_sdf_pallas(p, N, 48, 1.2, TILE)))(v_off))
    expect = np.zeros(16, np.float32)
    expect[4] = N * N  # d sum(img) / d ambient = one per pixel
    np.testing.assert_array_equal(g, expect)
    # mixed frame: the default scene has both miss and hit tiles; the
    # fast path must not perturb the full-branch tiles (grad parity vs
    # the always-full jnp implicit path is test_sdf_pallas_grads)


def test_sdf_pallas_bands_non_dividing_falls_back():
    # a bands value that does not divide the tile rows silently marches
    # whole-tile (documented fallback), never crashes or misrenders
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    img1 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE))
    img7 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE, None, 8, 16,
                                        jnp.float32, 7))
    np.testing.assert_array_equal(img1, img7)


def test_sdf_march_sphere_tile_matches_generic():
    """Round-5 specialized z-carry march (_march_sphere_tile, the
    flagship fast path) vs the generic engine (_march_tile over
    sdf_ortho_dist): same freeze rules and trajectory up to
    folded-constant rounding (~1 ulp/step), so hit-set flips are
    confined to grazing silhouette rays and shared hits agree on t to
    the eps band."""
    from enoki_tpu.render.pallas_kernels import (_march_tile,
                                                 _march_sphere_tile,
                                                 _cone_t0)
    from enoki_tpu.render.sdf import sdf_ortho_dist, sdf_ortho_parts
    v = scene_to_vec(SDFScene.reference())
    scene = vec_to_scene(v, SDFScene)
    n_steps, extent = 48, 1.2
    step = 2.0 * extent / (N - 1)
    coords = jnp.arange(N, dtype=jnp.float32) * step - extent
    px = jnp.broadcast_to(coords[None, :], (N, N))
    py = jnp.broadcast_to(coords[:, None], (N, N))
    for t0 in (None, _cone_t0(v, N, n_steps, extent, 8)):
        dist = sdf_ortho_dist(px, py, scene)
        t_g, h_g = _march_tile(dist, px, n_steps, chunk=16, t0=t0)
        rxy2, z0, rad = sdf_ortho_parts(px, py, scene)
        t_s, h_s = _march_sphere_tile(rxy2, z0, rad, n_steps, chunk=16,
                                      t0=t0)
        hg, hs = np.asarray(h_g), np.asarray(h_s)
        assert (hg != hs).mean() < 0.01
        both = hg & hs
        dt = np.abs(np.asarray(t_g)[both] - np.asarray(t_s)[both])
        assert dt.max() < 5e-4, dt.max()


def test_sdf_bwd_analytic_matches_ad():
    """Round-5 analytic backward megakernel (_sdf_bwd_kernel_analytic,
    the default) vs the autodiff formulation (_sdf_bwd_kernel_ad, kept
    as the oracle): identical parameter cotangents for a random
    upstream image cotangent, on the mixed hit/miss reference scene AND
    an all-miss scene (exercising the miss-tile fast path where only
    d/d ambient survives). The analytic kernel writes the closed form
    of the shade-VJP + implicit-root term; agreement is to FMA
    reassociation noise over the 16k-pixel reduction."""
    from enoki_tpu.render.pallas_kernels import (
        _sdf_fwd_call, _sdf_vjp_bwd, _sdf_bwd_kernel_ad)
    v = scene_to_vec(SDFScene.reference())
    rng = np.random.default_rng(7)
    for shift in (0.0, 10.0):  # mixed scene / all-miss scene
        vv = v.at[0].add(shift)
        _, ts = _sdf_fwd_call(vv, N, 48, 1.2, TILE)
        g = jnp.asarray(rng.standard_normal((N, N)), jnp.float32)
        nd = (N, 48, 1.2, TILE, None, 8, 16, jnp.float32, 1, 1.0, False,
              0)
        (dp_an,) = _sdf_vjp_bwd(*nd, (vv, ts), g)
        (dp_ad,) = _sdf_vjp_bwd(*nd, (vv, ts), g,
                                kernel=_sdf_bwd_kernel_ad)
        dp_an, dp_ad = np.asarray(dp_an), np.asarray(dp_ad)
        scale = max(1.0, np.abs(dp_ad).max())
        np.testing.assert_allclose(dp_an, dp_ad, rtol=2e-4,
                                    atol=2e-4 * scale)


def test_sdf_relax_unimodal_w1_bitexact():
    """Convex-scene divergence exit (round 4, _march_tile unimodal=True)
    at relax=1.0: every HIT lane's trajectory is unchanged (a hit ray's
    sampled distance decreases monotonically, so the divergence test
    never fires on it) and miss lanes shade to ambient regardless of
    where their march froze. Round 5 routes the PLAIN config through the
    specialized z-carry march (_march_sphere_tile, ~1 ulp/step rounding
    difference), so the bit-exactness claim is pinned on the GENERIC
    engine against itself; the compiled image is tolerance-gated against
    the fast path."""
    from enoki_tpu.render.pallas_kernels import _march_tile
    from enoki_tpu.render.sdf import sdf_ortho_dist
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    n_steps, extent = 48, 1.2
    step = 2.0 * extent / (N - 1)
    coords = jnp.arange(N, dtype=jnp.float32) * step - extent
    px = jnp.broadcast_to(coords[None, :], (N, N))
    py = jnp.broadcast_to(coords[:, None], (N, N))
    dist = sdf_ortho_dist(px, py, vec_to_scene(v, SDFScene))
    t0, h0 = _march_tile(dist, px, n_steps, chunk=16)
    t1, h1 = _march_tile(dist, px, n_steps, chunk=16, unimodal=True)
    hp = np.asarray(h0)
    np.testing.assert_array_equal(np.asarray(h1), hp)
    np.testing.assert_array_equal(np.asarray(t1)[hp], np.asarray(t0)[hp])
    # compiled image: generic-engine unimodal config vs the z-carry fast
    # path -- same trajectory up to folded-constant rounding, so only
    # near-silhouette shading wiggle, never hit/miss flips (a flip would
    # show as an O(gain) jump and blow the atol)
    img0 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE))
    img1 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE, None, 8, 16,
                                        jnp.float32, 1, 1.0, True))
    np.testing.assert_allclose(img1, img0, rtol=1e-2, atol=5e-2)


def test_sdf_relax_march_hits_stay_on_surface():
    """Over-relaxed sphere tracing (round 4, _march_tile relax>1): a hit
    must only ever be declared at an EVALUATED position with d < eps --
    the overlap test plus the epilogue revert guarantee a hit position
    is never inside the surface beyond rounding, for every omega and
    with/without the divergence exit."""
    from enoki_tpu.render.pallas_kernels import _cone_t0, _march_tile
    from enoki_tpu.render.sdf import sdf_ortho_dist
    v = scene_to_vec(SDFScene.reference())
    n_steps, extent, eps = 48, 1.2, 1e-4
    t0 = _cone_t0(v, N, n_steps, extent, 8)
    step = 2.0 * extent / (N - 1)
    coords = jnp.arange(N, dtype=jnp.float32) * step - extent
    px = jnp.broadcast_to(coords[None, :], (N, N))
    py = jnp.broadcast_to(coords[:, None], (N, N))
    dist = sdf_ortho_dist(px, py, vec_to_scene(v, SDFScene))
    t_p, h_p = _march_tile(dist, px, n_steps, chunk=16, t0=t0)
    hp = np.asarray(h_p)
    for relax in (1.2, 1.6, 1.9):
        for unimodal in (False, True):
            t_w, h_w = _march_tile(dist, px, n_steps, chunk=16, t0=t0,
                                   relax=relax, unimodal=unimodal)
            hw, tw = np.asarray(h_w), np.asarray(t_w)
            d_at = np.asarray(dist(t_w))
            assert d_at[hw].max() < eps
            assert d_at[hw].min() > -1e-6, d_at[hw].min()
            # hit-set changes are confined to grazing silhouette rays
            # (the fraction shrinks with resolution -- 128^2 here makes
            # the one-pixel silhouette ring ~3% of all lanes already)
            flips = (hp != hw).mean()
            assert flips < 0.025, (relax, unimodal, flips)
            both = hp & hw
            dt_hit = np.abs(np.asarray(t_p)[both] - tw[both])
            assert dt_hit.max() < 5e-4, dt_hit.max()


def test_sdf_relax_compiled_render_parity():
    """Compiled over-relaxed megakernel vs the plain one: differences are
    confined to grazing silhouette pixels (hit-set flips + eps-band hit-t
    spread amplified by gain); the bulk of the image is unchanged."""
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    img0 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE))
    img1 = np.asarray(render_sdf_pallas(v, N, 48, 1.2, TILE, None, 8, 16,
                                        jnp.float32, 8, 1.6, True))
    d = np.abs(img0 - img1)
    # flipped grazing pixels carry the full ambient<->lit jump (up to
    # ~gain); everything else is eps-band hit-t wiggle
    flip = d > 1.0
    assert flip.mean() < 0.01, flip.mean()
    assert d[~flip].mean() < 1e-3, d[~flip].mean()
    g0 = np.asarray(jax.grad(lambda p: jnp.mean(
        render_sdf_pallas(p, N, 48, 1.2, TILE)))(v))[:9]
    g1 = np.asarray(jax.grad(lambda p: jnp.mean(
        render_sdf_pallas(p, N, 48, 1.2, TILE, None, 8, 16,
                          jnp.float32, 8, 1.6, True)))(v))[:9]
    assert np.isfinite(g1).all()
    # radius/center grads pick up the flipped grazing pixels' implicit
    # spikes; everything is still the same order (bench.py re-gates the
    # exact tolerance against the XLA oracle at full resolution)
    sig = np.abs(g0) > 1e-3 * np.abs(g0).max()
    rel = np.abs(g1 - g0)[sig] / np.abs(g0)[sig]
    assert rel.max() < 0.5, (rel, g0, g1)


def test_sdf_pallas_split_twopass_parity():
    """Two-pass compacted march (round 5, split > 0): the capped pass-1
    + compacted tail replays the same (eval, advance) sequence as the
    one-pass march -- the masked final advance of pass 1 is
    re-evaluated at the identical z (carried exactly, see
    _sdf_fwd_kernel_split) by the tail kernel. The residual difference
    is cross-kernel FMA contraction on the tail kernel's idx-decoded
    pixel coordinates (~1 ulp on rxy2, the same noise class the band
    variants documented), so the gate is the tight compiled-variant
    tolerance + zero hit/miss flips, not bit equality. Non-survivor
    pixels never enter the tail kernel and DO match bit-for-bit."""
    v = scene_to_vec(SDFScene.reference())

    def run(split, coarse=0):
        img = render_sdf_pallas(v, N, 48, 1.2, TILE, None, coarse, 16,
                                jnp.float32, 1, 1.0, False, split)
        return np.asarray(img)

    ref = run(0)
    for split, coarse in ((16, 0), (32, 0), (16, 8)):
        got = run(split, coarse)
        r = run(0, coarse)
        d = np.abs(got - r)
        flips = d > 1.0  # hit/miss flip (ambient 0.2 vs lit ~2..220)
        assert not flips.any(), (split, coarse, flips.sum())
        assert d.max() < 2e-4, (split, coarse, d.max())
        # most pixels are frozen by pass 1 and bit-exact
        assert (d == 0).mean() > 0.9, (split, coarse, (d == 0).mean())

    # gradients ride the same ts residual through the same analytic
    # backward; diffs are the survivors' ~1 ulp t jitter
    def loss(pv, split):
        return jnp.mean(render_sdf_pallas(pv, N, 48, 1.2, TILE, None, 0,
                                          16, jnp.float32, 1, 1.0, False,
                                          split))

    g0 = np.asarray(jax.grad(loss)(v, 0))[:9]
    g1 = np.asarray(jax.grad(loss)(v, 16))[:9]
    np.testing.assert_allclose(g1, g0, rtol=1e-4,
                               atol=1e-5 * max(1.0, np.abs(g0).max()))


def test_sdf_pallas_split_rejects_bad_compositions():
    v = scene_to_vec(SDFScene.reference())
    for kw in (dict(dtype=jnp.bfloat16), dict(bands=8), dict(relax=1.6),
               dict(unimodal=True)):
        with pytest.raises(AssertionError):
            render_sdf_pallas(v, N, 48, 1.2, TILE, None, 0, 16,
                              kw.get("dtype", jnp.float32), kw.get("bands", 1),
                              kw.get("relax", 1.0), kw.get("unimodal", False),
                              16)
