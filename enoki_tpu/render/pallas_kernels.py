"""Fused Pallas render megakernels (fwd + custom-VJP bwd).

BASELINE.json config 4: "fused single-megakernel render (CUDA-JIT parity)
as one Pallas fwd+bwd kernel". The reference's trace-JIT assembles every
live op into one grid-stride PTX kernel (src/cuda/jit.cu:983-1227); here
the whole render -- pixel-coordinate generation, ray setup, intersect /
march, shade -- is one ``pl.pallas_call`` over VMEM pixel tiles, and the
backward pass is a second kernel that *recomputes* the forward per tile
and runs an in-kernel ``jax.vjp`` (recompute-over-store: the render is
arithmetic-dense and residual traffic would be pure HBM waste).

Scene parameters travel as a flat f32 vector in SMEM (the analog of the
reference's kernel launch params, jit.cu:1117); parameter gradients
accumulate in an SMEM output across the sequential TPU grid -- no atomics
needed because the Pallas TPU grid is a sequential loop on the core.

The SDF variant backward uses the implicit-function trick of
render/sdf.py::march_implicit -- the march loop is never reversed.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .implicit import implicit_t_vjp
from .vec import Vec2, Vec3, dot3
from .sphere import SphereScene, combined
from .sdf import (SDFScene, sdf, sdf_ortho_dist as _sdf_ortho_dist,
                  sdf_ortho_parts as _sdf_ortho_parts)

# Flat parameter-vector layout (padded to 16 for SMEM friendliness):
# [cx, cy, cz, radius, ambient, gain, lx, ly, lz, 0...]
N_PARAMS = 16


def scene_to_vec(scene) -> jnp.ndarray:
    v = jnp.stack([scene.center.x, scene.center.y, scene.center.z,
                   scene.radius, scene.ambient, scene.gain,
                   scene.light.x, scene.light.y, scene.light.z])
    return jnp.concatenate([v.astype(jnp.float32),
                            jnp.zeros(N_PARAMS - 9, jnp.float32)])


def vec_to_scene(v, cls=SphereScene):
    return cls(center=Vec3(v[0], v[1], v[2]), radius=v[3], ambient=v[4],
               gain=v[5], light=Vec3(v[6], v[7], v[8]))


def _tile_pixels(tile_r: int, tile_c: int, n: int, extent: float,
                 dtype=jnp.float32, row_off: int = 0, tile_r_full=None):
    """Pixel coordinates of the current grid tile. Matches
    linspace(-extent, extent, n) + meshgrid 'xy' reshaped to (n, n):
    x varies along columns, y along rows (tests/sphere.cpp:130-131).

    ``row_off``/``tile_r_full`` address a ROW BAND of the tile: the
    iotas are generated at the (tile_r, tile_c) band shape directly
    rather than sliced out of a tile-shaped iota -- Mosaic SIGABRTs
    (``limits[i] <= dim(i)``) on a sublane-slice of a lane-direction
    iota (the BENCH_r04 crash; minimal repro in
    tools/repro_bands_abort.py / bisect_bands.py k3-nocols)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    step = 2.0 * extent / (n - 1)
    rows = (lax.broadcasted_iota(jnp.int32, (tile_r, tile_c), 0)
            + i * (tile_r_full or tile_r) + row_off)
    cols = lax.broadcasted_iota(jnp.int32, (tile_r, tile_c), 1) + j * tile_c
    py = (rows.astype(jnp.float32) * step - extent).astype(dtype)
    px = (cols.astype(jnp.float32) * step - extent).astype(dtype)
    return px, py


def _read_params(params_ref) -> jnp.ndarray:
    return jnp.stack([params_ref[0, k] for k in range(9)])


def _read_scene(params_ref, dtype, cls=SphereScene):
    """Scene from SMEM scalars. Sub-32-bit scalar arithmetic doesn't exist
    on the TPU scalar core, so for 16-bit compute each parameter becomes a
    (1, 1) vector that broadcasts on the VPU."""
    if dtype == jnp.float32:
        p = [params_ref[0, k] for k in range(9)]
    else:
        p = [params_ref[0, k].astype(dtype).reshape(1, 1) for k in range(9)]
    return cls(center=Vec3(p[0], p[1], p[2]), radius=p[3], ambient=p[4],
               gain=p[5], light=Vec3(p[6], p[7], p[8]))


# ---------------------------------------------------------------------------
# Closed-form sphere megakernel
# ---------------------------------------------------------------------------


def _sphere_fwd_kernel(params_ref, out_ref, *, n, extent):
    tr, tc = out_ref.shape
    dt = out_ref.dtype
    px, py = _tile_pixels(tr, tc, n, extent, dt)
    scene = _read_scene(params_ref, dt)
    out_ref[:, :] = combined(Vec2(px, py), scene)


def _sphere_bwd_kernel(params_ref, g_ref, dp_ref, *, n, extent):
    tr, tc = g_ref.shape
    px, py = _tile_pixels(tr, tc, n, extent)

    def f(pvec):
        return combined(Vec2(px, py), vec_to_scene(pvec))

    _, vjp_fn = jax.vjp(f, _read_params(params_ref))
    (dp,) = vjp_fn(g_ref[:, :].astype(jnp.float32))

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for k in range(N_PARAMS):
            dp_ref[0, k] = 0.0

    for k in range(9):
        dp_ref[0, k] += dp[k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def render_sphere_pallas(params: jnp.ndarray, n: int = 1024,
                         extent: float = 1.2, tile: int = 256,
                         dtype=jnp.float32):
    """Fused sphere render as one Pallas kernel -> (n, n) image.

    ``params`` is the flat scene vector (scene_to_vec). Differentiable via
    the paired bwd megakernel. ``dtype`` selects the in-kernel compute
    precision (f32 or bf16 -- config 4's "fp32/bf16"; the backward always
    accumulates parameter gradients in f32).
    """
    return _sphere_fwd(params, n, extent, tile, dtype)


def _sphere_fwd_call(params, n, extent, tile, dtype=jnp.float32):
    assert n % tile == 0, "image size must be divisible by the tile size"
    grid = (n // tile, n // tile)
    return pl.pallas_call(
        functools.partial(_sphere_fwd_kernel, n=n, extent=extent),
        grid=grid,
        in_specs=[pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
    )(params.reshape(1, N_PARAMS))


def _sphere_fwd(params, n, extent, tile, dtype=jnp.float32):
    return _sphere_fwd_call(params, n, extent, tile, dtype)


def _sphere_vjp_fwd(params, n, extent, tile, dtype=jnp.float32):
    return _sphere_fwd_call(params, n, extent, tile, dtype), params


def _sphere_vjp_bwd(n, extent, tile, dtype, params, g):
    grid = (n // tile, n // tile)
    dp = pl.pallas_call(
        functools.partial(_sphere_bwd_kernel, n=n, extent=extent),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_PARAMS), jnp.float32),
    )(params.reshape(1, N_PARAMS), g)
    return (dp.reshape(N_PARAMS),)


render_sphere_pallas.defvjp(_sphere_vjp_fwd, _sphere_vjp_bwd)


# ---------------------------------------------------------------------------
# SDF march megakernel (march loop INSIDE the kernel; implicit-diff bwd)
# ---------------------------------------------------------------------------


def _march_tile(dist_at, like, n_steps: int,
                eps: float = 1e-4, t_max: float = 10.0, chunk: int = 16,
                t0=None, relax: float = 1.0, unimodal: bool = False):
    """Sphere-trace a pixel tile with tile-level early exit.

    ``dist_at(t) -> distance`` evaluates the scene SDF at parameter ``t``
    along each lane's ray (any ray parametrization with unit-speed t --
    orthographic or perspective; the caller closes over origin/direction);
    ``like`` fixes the lane shape/dtype. The generic-renderer factory in
    render/generic.py routes composed scenes and cameras through here
    unchanged. ``t0`` optionally starts each lane at a caller-proven-safe
    parameter (the cone-march prepass, _cone_t0) instead of 0.

    The loop carry is ``t`` alone -- the active/hit masks of the naive
    formulation are recomputable from ``t`` because a frozen lane stays
    frozen: a converged lane keeps d < eps (t never advances) and an
    escaped lane keeps t + d > t_max. That removes all per-step mask
    bookkeeping from the inner loop (the analog of enoki's masked-loop
    discipline compiled down to its minimal form).

    Early exit: an outer ``while_loop`` checks ``any(alive)`` once per
    ``chunk`` unrolled steps and stops marching the whole tile once every
    lane has converged or escaped -- including BEFORE the first chunk
    (the entry aliveness test), so a tile whose lanes all arrive
    converged or escaped (a cone-prepass background/interior tile)
    executes ZERO march steps. The XLA baseline cannot do this -- its
    batched ``fori_loop`` runs all n_steps for the whole image -- so this
    is where the megakernel beats compiler fusion.

    Exact parity with the fixed-step reference loop: the advance at check
    ``n_steps - 1`` is masked out, so the post-loop hit test reproduces
    the reference's final convergence check (t is only consumed on hit
    lanes, where it is frozen, so skipping the last advance never changes
    the image).

    Two further work-elimination knobs (round 4):

    ``relax`` > 1 enables over-relaxed sphere tracing (Keinert et al.
    2014, "Enhanced Sphere Tracing"): each advance is ``relax * d``
    instead of ``d``, with the standard overlap test -- consecutive
    unbounding spheres B(t_i, d_i), B(t_{i+1}, d_{i+1}) must overlap
    (d_i + d_{i+1} >= relax * d_i), which proves no surface was crossed;
    a failed test reverts to the plain-step position t_i + d_i, which a
    single standard step already proved safe. Each iteration still costs
    one SDF eval, so successful over-relaxation converts directly into
    fewer iterations (the linear-convergence crawl along silhouettes is
    where it pays). Hit lanes still freeze only at an EVALUATED position
    with d < eps, so hit accuracy is unchanged; trajectories (and hence
    silhouette hit/miss of grazing rays within eps) may differ from
    relax=1, gated by tolerance tests.

    ``unimodal`` declares that the per-ray distance function t -> d(t)
    is unimodal (true for any convex scene, e.g. the benchmark sphere:
    distance to a convex set along a straight line decreases then
    increases). Then a lane whose freshly-sampled d exceeds its previous
    sample -- after a step that the overlap test proved crossing-free --
    is past its minimum and can NEVER hit: it is frozen immediately as a
    miss (position rewritten to t_max, which the recomputable-mask
    protocol reads as escaped) instead of crawling to t_max one step at
    a time. This eliminates the escape half of the silhouette crawl.
    With relax == 1 this is trajectory-exact for every HIT lane (a hit
    ray's d decreases monotonically, so the divergence test never fires
    on it) and every miss lane still shades to ambient -- the image is
    bit-identical; the eager-replay test gates exactly that.

    ``relax == 1.0 and not unimodal`` takes the original single-carry
    path below, byte-for-byte (the bit-exactness gates of the band and
    prepass variants compare against it).
    """
    t = jnp.zeros_like(like) if t0 is None else t0

    while n_steps % chunk:
        chunk //= 2

    if relax == 1.0 and not unimodal:
        def step(t, k):
            d = dist_at(t)
            alive = (d >= eps) & (t + d <= t_max)
            # advance mask in d's dtype so a bf16 march stays bf16 (an
            # f32 constant here would silently promote the whole carry)
            adv = (k < n_steps - 1).astype(d.dtype)
            return jnp.where(alive, t + d * adv, t), alive

        def cond(c):
            k, t, go = c
            return (k < n_steps) & go

        def body(c):
            k, t, _ = c
            for i in range(chunk - 1):
                t, _ = step(t, k + i)
            t, alive = step(t, k + chunk - 1)
            return k + chunk, t, jnp.any(alive)

        d0 = dist_at(t)
        go0 = jnp.any((d0 >= eps) & (t + d0 <= t_max))
        _, t, _ = lax.while_loop(cond, body, (0, t, go0))
        d = dist_at(t)
        return t, d < eps

    # --- over-relaxed / divergence-exit variant ---------------------------
    # carry: (pos, stp) with pos the current sample position and stp the
    # advance taken to arrive there (0 initially, after a revert, and once
    # frozen -- "arrived by a provably safe step"). The previous sample's
    # distance is stp / relax. Frozen-lane stability of the mask-free
    # protocol is preserved: a frozen lane has stp == 0 and a pos whose
    # recomputed aliveness stays false forever.
    dt = t.dtype
    w = jnp.asarray(relax, dt)
    back = jnp.asarray(1.0 - 1.0 / relax, dt)   # revert offset / stp

    def cond(c):
        k, pos, stp, go = c
        return (k < n_steps) & go

    def body(c):
        k, pos, stp, _ = c
        go = None
        for i in range(chunk):
            pos, stp, go = _relax_step(dist_at, pos, stp, k + i,
                                       n_steps, eps, t_max, w, back,
                                       unimodal)
        return k + chunk, pos, stp, jnp.any(go)

    d0 = dist_at(t)
    go0 = jnp.any((d0 >= eps) & (t + d0 <= t_max))
    _, pos, stp, _ = lax.while_loop(cond, body,
                                    (0, t, jnp.zeros_like(t), go0))
    # no epilogue revert is needed: stp is provably 0 on every exit path
    # -- the step cap's final iteration has k == n_steps-1 (chunk divides
    # n_steps) where adv is masked so new_stp = 0, and an early exit
    # requires every lane !alive & !over, which also forces new_stp = 0.
    # A lane therefore never leaves the loop mid-flight on an unverified
    # over-relaxed advance, and the hit test below samples a proven-safe
    # position (one SDF eval, not two).
    return pos, dist_at(pos) < eps


def _relax_step(dist_at, pos, stp, k, n_steps, eps, t_max, w, back,
                unimodal):
    """One over-relaxed sphere-trace step (see _march_tile)."""
    d = dist_at(pos)
    dt = pos.dtype
    zero = jnp.zeros_like(pos)
    over = d < back * stp
    alive = (d >= eps) & (pos + d <= t_max)
    if unimodal:
        diverged = (~over) & (stp > zero) & (d >= eps) & (d * w > stp)
        alive = alive & ~diverged
    # an overshot lane's d was sampled at an unproven position: it must
    # revert with stp = 0 ("arrived by a safe step"), never advance
    adv = alive & jnp.logical_not(over) & (k < n_steps - 1)
    new_stp = jnp.where(adv, w * d.astype(dt), zero)
    # revert (overlap failed): back to the plain-step position
    # pos - stp + stp/relax; advance otherwise; frozen lanes add 0
    new_pos = jnp.where(over, pos - back * stp, pos + new_stp)
    if unimodal:
        new_pos = jnp.where(diverged, jnp.full_like(pos, t_max), new_pos)
    return new_pos, new_stp, alive | over


def _march_sphere_tile(rxy2, z0, rad, n_steps: int, eps: float = 1e-4,
                       t_max: float = 10.0, chunk: int = 16, t0=None,
                       z_init=None, return_z=False):
    """Specialized plain sphere march (flagship fast path, round 5).

    Walks the SAME trajectory as ``_march_tile`` over
    ``sdf_ortho_dist`` -- same freeze rules, same masked final advance,
    same entry aliveness test, same chunked tile-level early exit --
    with the loop carry moved from t to z = z0 + t and every
    loop-invariant comparison constant folded:

        s = sqrt(rxy2 + z^2)                      (= |p - c| of sdf())
        alive   <=>  s >= rad + eps  AND  z + s <= t_max + z0 + rad
        advance      z += s - rad

    which drops the per-step op count from ~12+sqrt to ~9+sqrt (the
    z0+t add, the d = s - rad subtraction feeding two consumers, and
    the adv float-mast multiply all disappear into hoisted constants /
    the bool mask AND). Rounding differs from the generic path by
    ~1 ulp/step (folded constants), tolerance-gated against the XLA
    oracle like every compiled variant. Returns (t, hit) with
    t = z - z0 recovered once per tile.

    ``z_init``/``return_z`` let the two-pass split kernels hand the
    EXACT carry across the pallas_call boundary: the z - z0 -> z0 + t
    roundtrip loses ~1 ulp, which is invisible to the tolerance gates
    but breaks the split path's bit-exactness contract against the
    one-pass march.
    """
    if z_init is not None:
        z = z_init
    else:
        z = z0 + (jnp.zeros_like(rxy2) if t0 is None else t0)

    while n_steps % chunk:
        chunk //= 2

    s_hit = rad + eps
    esc = t_max + z0 + rad

    def dist_len(z):
        # |p - c| as x * rsqrt(x): ~8% faster than sqrt on the v5e VPU
        # (tools: /tmp micro_step r5); x >= 1e-12 by the rxy2 guard so
        # the 0 * inf corner cannot occur. ~2 ulp vs sqrt,
        # tolerance-gated like every compiled variant.
        x = rxy2 + z * z
        return x * lax.rsqrt(x)

    def step_free(z):
        # chunk-interior step: k + i < n_steps - 1 is structurally
        # guaranteed (k <= n_steps - chunk), so the final-advance mask
        # -- a vector AND per step in the naive form -- vanishes
        s = dist_len(z)
        alive = (s >= s_hit) & (z + s <= esc)
        return jnp.where(alive, z + (s - rad), z)

    def step_last(z, k):
        s = dist_len(z)
        alive = (s >= s_hit) & (z + s <= esc)
        adv = alive & (k < n_steps - 1)
        return jnp.where(adv, z + (s - rad), z), alive

    def cond(c):
        k, z, go = c
        return (k < n_steps) & go

    def body(c):
        k, z, _ = c
        for _ in range(chunk - 1):
            z = step_free(z)
        z, alive = step_last(z, k + chunk - 1)
        return k + chunk, z, jnp.any(alive)

    s0 = dist_len(z)
    go0 = jnp.any((s0 >= s_hit) & (z + s0 <= esc))
    _, z, _ = lax.while_loop(cond, body, (0, z, go0))
    hit = (dist_len(z) - rad) < eps
    return (z if return_z else z - z0), hit


def _sdf_shade_tile(px, py, t, hit, pvec):
    """Shade at fixed (t, hit) -- differentiable in pvec and t."""
    scene = vec_to_scene(pvec, SDFScene)
    p = Vec3(px, py, -1.0 + t)

    # analytic SDF normal via the sum-grad trick (elementwise in lanes)
    def s_sum(px_, py_, pz_):
        return jnp.sum(sdf(Vec3(px_, py_, pz_), scene))

    gx, gy, gz = jax.grad(s_sum, argnums=(0, 1, 2))(p.x, p.y, p.z)
    inv = lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-12)
    lambert = jnp.maximum((gx * scene.light.x + gy * scene.light.y +
                           gz * scene.light.z) * inv, 0.0)
    img = scene.ambient + lambert * scene.gain
    return jnp.where(hit, img, scene.ambient + jnp.zeros_like(img))


def cone_t0(dist_factory, n, n_steps, extent, s, eps=1e-4, t_max=10.0,
            margin=1e-3):
    """Cone-march prepass: a conservative march start map (coarse-to-fine
    work elimination, round 4).

    One coarse ray per s x s fine-pixel block, marched with the SDF
    DEFLATED by R = the largest transverse offset between the block's
    center ray and any fine ray in its footprint (orthographic rays are
    parallel, so the offset is constant in t). By the SDF's 1-Lipschitz
    property, sdf(fine(t)) >= sdf(coarse(t)) - R, so every advance the
    deflated coarse march takes is also safe for every fine ray: no fine
    ray can cross the surface before the returned t0. Escaped cones need
    no special case -- their frozen t has d > t_max - t, which instantly
    fails the fine kernel's aliveness test too.

    ``dist_factory(px, py) -> (t -> distance)`` supplies the per-ray SDF
    along orthographic rays at the coarse pixel centers; the SINGLE
    engine serves both the flagship kernel (via _sdf_ortho_dist) and the
    generic factory (render/generic.py) so the conservativeness
    invariant (deflation radius, margin) can never drift between them.

    Returns the full-resolution (n, n) start map, upsampled, minus a
    float-safety ``margin``, clamped at 0. Runs as plain jnp inside the
    caller's jit (m x m = (n/s)^2 rays, ~0.1% of the fine work); the
    returned map is the analog of an acceleration structure the
    reference's megakernel JIT has no counterpart for.
    """
    m = n // s
    step = 2.0 * extent / (n - 1)
    half = (s - 1) / 2.0
    coords = ((jnp.arange(m, dtype=jnp.float32) * s + half) * step
              - extent)
    px = jnp.broadcast_to(coords[None, :], (m, m))
    py = jnp.broadcast_to(coords[:, None], (m, m))
    r_cone = jnp.float32((2.0 ** 0.5) * half * step)
    dist_at = dist_factory(px, py)

    def body(_, t):
        d = dist_at(t) - r_cone
        alive = (d >= eps) & (t + d <= t_max)
        return jnp.where(alive, t + d, t)

    t0 = lax.fori_loop(0, n_steps, body, jnp.zeros((m, m), jnp.float32))
    t0 = jnp.repeat(jnp.repeat(t0, s, axis=0), s, axis=1)
    return lax.stop_gradient(jnp.maximum(t0 - margin, 0.0))


def _cone_t0(pvec, n, n_steps, extent, s, eps=1e-4, t_max=10.0,
             margin=1e-3):
    """cone_t0 over the flagship scene's hoisted orthographic SDF."""
    scene = vec_to_scene(pvec, SDFScene)
    return cone_t0(lambda px, py: _sdf_ortho_dist(px, py, scene),
                   n, n_steps, extent, s, eps, t_max, margin)


def _sdf_fwd_kernel(params_ref, t0_ref, out_ref, t_ref, *, n, extent,
                    n_steps, chunk, dtype=jnp.float32, bands=1,
                    relax=1.0, unimodal=False):
    tr, tc = out_ref.shape
    pvec = _read_params(params_ref)
    scene = vec_to_scene(pvec, SDFScene)
    if dtype != jnp.float32:
        # bf16 march (config 4 "fp32 + bf16"): the march carry, SDF
        # evaluations and convergence test run in ``dtype``; shading,
        # the stored t residual and (in the bwd kernel) parameter-grad
        # accumulation stay f32. Accuracy policy: bf16's 8-bit mantissa
        # puts ~4e-3 relative error on the hit parameter -- measured
        # image/grad deltas are in docs/benchmarks.md and gated by
        # tests/test_pallas.py::test_sdf_pallas_bf16_policy.
        scene_m = _read_scene(params_ref, dtype, SDFScene)
        ulp = float(jnp.finfo(dtype).eps)
    else:
        scene_m = scene
    # convergence epsilon scales with the march format: bf16's spacing at
    # t ~ 1 is 3.9e-3, so the f32 eps=1e-4 would be unreachable and hit
    # lanes would freeze at d ~ one-ulp and misregister as misses
    eps = 1e-4 if dtype == jnp.float32 else 2.0 * float(
        jnp.finfo(dtype).eps)
    # sub-tile early exit (round 4, work elimination variant b): march
    # the tile as ``bands`` independent row bands, each with its own
    # early-exit while_loop, so a band whose lanes all converge (e.g.
    # the background rows of a silhouette tile) stops marching without
    # waiting for the slowest band. Per-lane trajectories are unchanged
    # -- a frozen lane never advances regardless of when its loop stops
    # -- so banding is trajectory-exact (an eager step-by-step replay
    # matches bit-for-bit, tests/test_pallas.py). Between COMPILED
    # variants the step's rxy2 + (z0+t)^2 may FMA-contract differently
    # for different band shapes (~1 ulp/step, observed <= 2e-5 on
    # silhouette pixels only, never a hit/miss flip); the compiled gate
    # is tight-tolerance, the exactness gate is the eager replay.
    # Bands must keep row stores sublane-aligned (8 f32 rows/vreg);
    # a non-dividing or sub-sublane split falls back to whole-tile.
    nb = (bands if bands > 1 and tr % bands == 0
          and (tr // bands) % 8 == 0 else 1)
    br = tr // nb
    for b in range(nb):
        sl = slice(b * br, (b + 1) * br)
        # band pixels are generated at the (br, tc) band shape (the
        # loop-invariant hoisted form of sdf(), shared with the cone
        # prepass: the xy part of the sphere distance is computed ONCE
        # per band, the inner march step costs ~5 flops + sqrt). NOT
        # sliced out of tile-shaped iotas: Mosaic SIGABRTs on a
        # sublane-slice of a lane-direction iota (the BENCH_r04 crash
        # -- see _tile_pixels).
        px, py = _tile_pixels(br, tc, n, extent, row_off=b * br,
                              tile_r_full=tr)
        if dtype == jnp.float32:
            px_m, py_m = px, py
            t0_b = t0_ref[sl, :]
        else:
            px_m, py_m = px.astype(dtype), py.astype(dtype)
            # conservative downcast: round-to-nearest could round the
            # cone prepass's start map UP by half an ulp (bf16: ~2e-3
            # rel), past the f32 margin that protects the
            # no-ray-crosses-the-surface invariant; scaling down by one
            # full ulp first guarantees the cast value never exceeds
            # the f32 bound
            t0_b = (t0_ref[sl, :] * (1.0 - ulp)).astype(dtype)
        if relax == 1.0 and not unimodal:
            # flagship fast path: z-carry march with folded constants
            rxy2, z0b, radb = _sdf_ortho_parts(px_m, py_m, scene_m)
            t_b, hit_b = _march_sphere_tile(rxy2, z0b, radb, n_steps,
                                            eps=eps, chunk=chunk, t0=t0_b)
        else:
            # demoted variants (over-relaxation / divergence exit lose
            # on chip, docs/benchmarks.md r5) keep the generic engine
            dist_b = _sdf_ortho_dist(px_m, py_m, scene_m)
            t_b, hit_b = _march_tile(dist_b, px_m, n_steps, chunk=chunk,
                                     t0=t0_b, eps=eps, relax=relax,
                                     unimodal=unimodal)
        t_b = t_b.astype(jnp.float32)
        # miss-band fast path (round 4, work elimination): a band with
        # no hit lane shades to EXACTLY scene.ambient everywhere -- the
        # full shade's where(hit, ...) selects the ambient arm on every
        # lane -- so background bands (the cone prepass already zeroed
        # their march) skip the normal/lambert math entirely. pl.when
        # lowers to a predicated region on the TPU core (the same
        # construct as the bwd kernel's dp_ref init) -- exactly one of
        # the two stores executes.
        hit_any = jnp.any(hit_b)

        @pl.when(hit_any)
        def _(t_b=t_b, hit_b=hit_b, sl=sl, px=px, py=py):
            out_ref[sl, :] = _sdf_shade_tile(px, py, t_b, hit_b, pvec)

        @pl.when(jnp.logical_not(hit_any))
        def _(sl=sl):
            out_ref[sl, :] = jnp.broadcast_to(pvec[4], (br, tc))

        # residual for the bwd megakernel: ONE float/pixel beats
        # re-marching n_steps times when fwd+bwd run as a pair
        # (value_and_grad). The hit bit rides the sign: hit lanes store
        # t (>= 0) EXACTLY; miss lanes store -t-1 (< 0) -- their t is
        # only ever consumed behind the hit mask, so the 1-ulp decode
        # rounding there is irrelevant.
        t_ref[sl, :] = jnp.where(hit_b, t_b, -t_b - 1.0)


def _sdf_fwd_kernel_split(params_ref, t0_ref, out_ref, t_ref, cont_ref,
                          *, n, extent, n_steps, chunk):
    """Pass 1 of the two-pass compacted march (round 5, the silhouette
    divergence experiment of docs/render.md): the plain z-carry march
    CAPPED at ``n_steps`` (= the split point), plus a third output that
    flags survivors.

    The cost model behind the split (tools: /tmp/stepmodel r5): at
    1024^2/64 the tile-exit protocol executes 3.5x the per-lane ideal
    ray-steps and 28 of 64 tiles run to the 64-step cap, driven by the
    <4% of lanes that crawl along the silhouette -- a tile-granularity
    padding problem no in-tile knob fixed (bands serialize, relax /
    unimodal lose on chip). Splitting at 16 caps EVERY tile at 16
    steps, then the caller compacts the ~15% surviving lanes into a
    dense array whose tail march wastes nothing on frozen neighbors.

    Trajectory parity: the march is memoryless in z, so the masked
    final advance at eval ``n_steps``-1 is replayed by the tail
    kernel's first inline step at the identical z -- the (eval,
    advance) sequence of the unsplit 64-eval loop is reproduced
    exactly (one extra eval per survivor, values unchanged).

    ``cont`` encodes survivor state in one f32/lane: the march carry z
    ITSELF for lanes still alive at the cap, -1e9 for frozen lanes
    (z >= z0 > -2 always). Carrying z exactly -- not t -- is what
    makes the split bit-exact: a z - z0 -> z0 + t roundtrip would cost
    ~1 ulp per boundary. f32-only, plain-march-only: the split exists
    to beat the shipped fast path, so it composes with the cone
    prepass (t0) but not with the demoted knobs.
    """
    tr, tc = out_ref.shape
    pvec = _read_params(params_ref)
    scene = vec_to_scene(pvec, SDFScene)
    px, py = _tile_pixels(tr, tc, n, extent)
    rxy2, z0, rad = _sdf_ortho_parts(px, py, scene)
    z_f, hit_b = _march_sphere_tile(rxy2, z0, rad, n_steps,
                                    chunk=chunk, t0=t0_ref[:, :],
                                    return_z=True)
    t_b = z_f - z0
    # survivor test: same freeze rule as the march (s_hit/esc constants
    # of _march_sphere_tile with its default eps/t_max)
    x = rxy2 + z_f * z_f
    s = x * lax.rsqrt(x)
    alive = (s >= rad + 1e-4) & (z_f + s <= 10.0 + z0 + rad)
    cont_ref[:, :] = jnp.where(alive, z_f, -1e9)

    hit_any = jnp.any(hit_b)

    @pl.when(hit_any)
    def _():
        out_ref[:, :] = _sdf_shade_tile(px, py, t_b, hit_b, pvec)

    @pl.when(jnp.logical_not(hit_any))
    def _():
        out_ref[:, :] = jnp.broadcast_to(pvec[4], (tr, tc))

    t_ref[:, :] = jnp.where(hit_b, t_b, -t_b - 1.0)


def _sdf_tail_kernel(params_ref, idx_ref, tin_ref, img_ref, ts_ref, *,
                     n, extent, n_steps, split, chunk):
    """Pass 2: dense tail march over the compacted survivor worklist.

    ``idx`` is each lane's flat pixel index (padded slots carry n*n and
    are scattered with mode="drop" by the caller); ``tin`` is the
    pass-1 ``cont`` encoding. Pixel coordinates are recomputed from
    idx (cheaper than gathering them), the masked eval ``split``-1
    advance is replayed inline, then the remaining
    ``n_steps - split`` evals run through the same z-carry march as
    pass 1 -- per-grid-block early exit included, and since survivors
    are silhouette-clustered in row-major order, blocks of the
    compacted array exit independently. Lanes that arrive frozen
    (padded slots whose clip-gathered ``tin`` is 0) are parked at an
    escaped z so they never march."""
    pvec = _read_params(params_ref)
    scene = vec_to_scene(pvec, SDFScene)
    idx = idx_ref[:, :]
    row = idx // n
    col = idx - row * n
    step = 2.0 * extent / (n - 1)
    py = row.astype(jnp.float32) * step - extent
    px = col.astype(jnp.float32) * step - extent
    rxy2, z0, rad = _sdf_ortho_parts(px, py, scene)
    tin = tin_ref[:, :]
    live = tin > -1e8  # cont sentinel for frozen lanes is -1e9
    # park dead lanes at an escaped z (z + s > esc for any s >= 0)
    z = jnp.where(live, tin, 11.0 + z0 + rad)
    # replay the advance that pass 1's final-eval mask skipped
    x = rxy2 + z * z
    s = x * lax.rsqrt(x)
    alive = live & (s >= rad + 1e-4) & (z + s <= 10.0 + z0 + rad)
    z = jnp.where(alive, z + (s - rad), z)
    z_f, hit_b = _march_sphere_tile(rxy2, z0, rad, n_steps - split,
                                    chunk=chunk, z_init=z,
                                    return_z=True)
    t_b = z_f - z0
    img_ref[:, :] = _sdf_shade_tile(px, py, t_b, hit_b, pvec)
    ts_ref[:, :] = jnp.where(hit_b, t_b, -t_b - 1.0)


def _sdf_split_call(params, n, n_steps, extent, tile, tile_c, coarse,
                    chunk, split):
    """Two-pass compacted forward: capped P1 megakernel -> XLA
    compaction of survivors -> dense P2 tail megakernel -> scatter.
    Returns (img, ts) with ts identical in meaning to the one-pass
    kernel's residual, so the analytic backward is untouched."""
    tile_c = tile_c or tile
    grid = (n // tile, n // tile_c)
    tile_spec = pl.BlockSpec((tile, tile_c), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    pvec = params.reshape(1, N_PARAMS)
    if coarse:
        t0 = _cone_t0(params, n, n_steps, extent, coarse)
    else:
        t0 = jnp.zeros((n, n), jnp.float32)
    img1, ts1, cont = pl.pallas_call(
        functools.partial(_sdf_fwd_kernel_split, n=n, extent=extent,
                          n_steps=split, chunk=chunk),
        grid=grid,
        in_specs=[pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM), tile_spec],
        out_specs=(tile_spec, tile_spec, tile_spec),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32)),
    )(pvec, t0)

    nn = n * n
    # worklist capacity: the measured survivor fraction at the bench
    # scene is 15.3% at split=16 and 3.6% at split=32 (stepmodel r5);
    # 1/4 resp. 1/16 give ~1.7-4x headroom. Overflow beyond capacity
    # leaves those lanes at their P1 state -- the parity gate (and any
    # eager comparison) catches it, and the knob simply loses the
    # tuning race on scenes where the fraction is higher.
    kdiv = 4 if split <= 16 else 16
    kpad = max(nn // kdiv, 256)
    cols = min(1024, kpad)
    kr = kpad // cols
    p2r = min(32, kr)
    while kr % p2r:
        p2r //= 2
    flat = cont.reshape(nn)
    (idx,) = jnp.where(flat > -1e8, size=kpad, fill_value=nn)
    idx = idx.astype(jnp.int32)
    tin = jnp.take(flat, idx, mode="clip")
    wl_spec = pl.BlockSpec((p2r, cols), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    img_c, ts_c = pl.pallas_call(
        functools.partial(_sdf_tail_kernel, n=n, extent=extent,
                          n_steps=n_steps, split=split, chunk=chunk),
        grid=(kr // p2r,),
        in_specs=[pl.BlockSpec((1, N_PARAMS), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  wl_spec, wl_spec],
        out_specs=(wl_spec, wl_spec),
        out_shape=(jax.ShapeDtypeStruct((kr, cols), jnp.float32),
                   jax.ShapeDtypeStruct((kr, cols), jnp.float32)),
    )(pvec, idx.reshape(kr, cols), tin.reshape(kr, cols))
    img = (img1.reshape(nn).at[idx].set(img_c.reshape(-1), mode="drop")
           .reshape(n, n))
    ts = (ts1.reshape(nn).at[idx].set(ts_c.reshape(-1), mode="drop")
          .reshape(n, n))
    return img, ts


def _sdf_bwd_kernel_analytic(params_ref, g_ref, t_ref, dp_ref, *, n,
                             extent, n_steps):
    """Hand-derived backward megakernel (round 5).

    The autodiff formulation (``_sdf_bwd_kernel_ad`` below) runs
    ``jax.vjp`` through ``_sdf_shade_tile`` -- whose normal is itself a
    ``jax.grad`` of the SDF -- so Mosaic compiles a reverse-over-reverse
    program with Hessian-vector products of the SDF: ~300 VPU
    ops/pixel for what is analytically ~70. This kernel writes the
    closed form of the same cotangents (profiled 78 -> ~35 us/frame at
    1024^2). tests/test_pallas.py::test_sdf_bwd_analytic_matches_ad
    pins it against the autodiff kernel lane-for-lane.

    Derivation (u = (p - c) / |p - c| at the frozen root, L = light,
    m = g * gain * [lambert > 0] * hit):

      shade:  img = A + relu((u.L) * inv) * G,  inv = rsqrt(u.u + 1e-12)
      dA  = sum(g)                 (both where() arms are A + ...)
      dG  = sum(g * lambert * hit)
      dL  = sum(m * inv * u)
      v   = m * (inv * L - (u.L) * inv^3 * u)      (dlambert/du)
      dd  = q * (v - u (u.v)),  q = rsqrt(|p-c|^2 + 1e-12)
                                 (pullback of u = d * q; du/dd = q(I-uu^T))
      dc_shade = -sum(dd);  t_bar = dd_z           (dp/dt = e_z)
      implicit root sdf(ray(t*), theta) = eps (render/implicit.py):
      w   = -t_bar / guard(u_z)  on hit lanes      (d sdf/dt = u_z)
      dc += sum(-w * u);  dr = sum(-w)

    guard(): |slope| <= 1e-6 is clamped to sign-preserving +-1, exact
    zeros take the entering-hit convention (negative slope) -- the same
    rule as implicit_t_vjp, kept in lockstep by the matches_ad test.
    """
    tr, tc = g_ref.shape
    px, py = _tile_pixels(tr, tc, n, extent)
    p = [params_ref[0, k] for k in range(9)]
    cx, cy, cz, gain = p[0], p[1], p[2], p[5]
    lx, ly, lz = p[6], p[7], p[8]

    ts = t_ref[:, :]
    hit = ts >= 0.0
    t = jnp.where(hit, ts, -1.0 - ts)
    g = g_ref[:, :]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for k in range(N_PARAMS):
            dp_ref[0, k] = 0.0

    hit_any = jnp.any(hit)

    @pl.when(hit_any)
    def _():
        dx = px - cx
        dy = py - cy
        dz = (-1.0 + t) - cz
        q = lax.rsqrt(dx * dx + dy * dy + dz * dz + 1e-12)
        ux, uy, uz = dx * q, dy * q, dz * q
        inv = lax.rsqrt(ux * ux + uy * uy + uz * uz + 1e-12)
        s = ux * lx + uy * ly + uz * lz
        y = s * inv
        lam = jnp.maximum(y, 0.0)
        hf = hit.astype(jnp.float32)
        # subgradient at the relu kink: jnp.maximum splits ties 0.5/0.5
        relu_g = jnp.where(y > 0.0, 1.0,
                           jnp.where(y == 0.0, 0.5, 0.0))
        m = g * gain * relu_g * hf
        mi = m * inv
        si2 = s * (inv * inv)
        vx = mi * (lx - si2 * ux)
        vy = mi * (ly - si2 * uy)
        vz = mi * (lz - si2 * uz)
        uv = ux * vx + uy * vy + uz * vz
        ddx = q * (vx - ux * uv)
        ddy = q * (vy - uy * uv)
        ddz = q * (vz - uz * uv)
        # implicit-root term through t* (same guard as implicit_t_vjp)
        sgn = jnp.where(uz == 0.0, -1.0, jnp.sign(uz))
        slope = jnp.where(jnp.abs(uz) > 1e-6, uz, sgn)
        w = jnp.where(hit, -ddz / slope, 0.0)
        dp_ref[0, 0] += jnp.sum(-ddx - w * ux)
        dp_ref[0, 1] += jnp.sum(-ddy - w * uy)
        dp_ref[0, 2] += jnp.sum(-ddz - w * uz)
        dp_ref[0, 3] += jnp.sum(-w)
        dp_ref[0, 4] += jnp.sum(g)
        dp_ref[0, 5] += jnp.sum(g * lam * hf)
        dp_ref[0, 6] += jnp.sum(mi * ux)
        dp_ref[0, 7] += jnp.sum(mi * uy)
        dp_ref[0, 8] += jnp.sum(mi * uz)

    @pl.when(jnp.logical_not(hit_any))
    def _():
        # miss-tile fast path: every lane shades to scene.ambient
        dp_ref[0, 4] += jnp.sum(g)


def _sdf_bwd_kernel_ad(params_ref, g_ref, t_ref, dp_ref, *, n, extent,
                       n_steps):
    tr, tc = g_ref.shape
    px, py = _tile_pixels(tr, tc, n, extent)
    pvec = _read_params(params_ref)

    ts = t_ref[:, :]
    hit = ts >= 0.0
    t = jnp.where(hit, ts, -1.0 - ts)
    g = g_ref[:, :]

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        for k in range(N_PARAMS):
            dp_ref[0, k] = 0.0

    # direct term: d shade / d pvec and cotangent w.r.t. t
    def f_shade(pv, tv):
        return _sdf_shade_tile(px, py, tv, hit, pv)

    hit_any = jnp.any(hit)

    @pl.when(hit_any)
    def _():
        _, vjp_fn = jax.vjp(f_shade, pvec, t)
        dp_direct, t_bar = vjp_fn(g)
        # implicit term: t* solves sdf(ray(t*), theta) = eps (the shared
        # definition, render/implicit.implicit_t_vjp)
        dp_indirect = implicit_t_vjp(
            lambda pv, tv: sdf(Vec3(px, py, -1.0 + tv),
                               vec_to_scene(pv, SDFScene)),
            pvec, t, t_bar, hit)
        dp = dp_direct + dp_indirect
        for k in range(9):
            dp_ref[0, k] += dp[k]

    @pl.when(jnp.logical_not(hit_any))
    def _():
        # miss-tile fast path: every lane shades to scene.ambient, so
        # d shade / d pvec is exactly e_ambient per lane (t_bar == 0
        # through the where(hit, ...) vjp; implicit term masks on hit)
        dp_ref[0, 4] += jnp.sum(g)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11,
                                    12))
def render_sdf_pallas(params: jnp.ndarray, n: int = 1024,
                      n_steps: int = 64, extent: float = 1.2,
                      tile: int = 64, tile_c: int = None,
                      coarse: int = 8, chunk: int = 16,
                      dtype=jnp.float32, bands: int = 1,
                      relax: float = 1.0, unimodal: bool = False,
                      split: int = 0):
    """Fused SDF ray-march megakernel -> (n, n) image (config 4).

    ``tile`` x ``tile_c`` is the VMEM pixel block (rows x cols; tile_c
    defaults to tile). ``coarse`` is the cone-prepass block side
    (_cone_t0; 0 disables the prepass), ``chunk`` the early-exit march
    granularity (_march_tile). ``dtype`` selects the MARCH compute
    precision (f32 or bf16 -- config 4's "fp32 + bf16"); shading, the
    t residual and parameter-gradient accumulation stay f32 (accuracy
    policy in docs/benchmarks.md). ``bands`` > 1 marches the tile as
    that many independent row bands with per-band early exit
    (bit-exact vs bands=1). Defaults measured fastest on v5e.

    ``relax`` > 1 turns on over-relaxed sphere tracing and ``unimodal``
    the convex-scene divergence exit (see _march_tile; unimodal is only
    valid when every ray's distance function is unimodal, e.g. a convex
    scene such as the benchmark sphere).

    ``split`` > 0 selects the two-pass compacted march (round 5,
    docs/render.md): pass 1 caps every tile at ``split`` steps, the
    surviving lanes are compacted by XLA into a dense worklist, and a
    second megakernel marches only them for the remaining steps --
    trajectory-identical to the one-pass march (see
    _sdf_fwd_kernel_split). f32 + plain march only; composes with the
    cone prepass.
    """
    return _sdf_fwd_call(params, n, n_steps, extent, tile, tile_c,
                         coarse, chunk, dtype, bands, relax, unimodal,
                         split)[0]


def _sdf_fwd_call(params, n, n_steps, extent, tile, tile_c=None,
                  coarse=8, chunk=16, dtype=jnp.float32, bands=1,
                  relax=1.0, unimodal=False, split=0):
    if split:
        assert dtype == jnp.float32 and bands == 1 and relax == 1.0 \
            and not unimodal, "split composes only with the plain march"
        assert 0 < split < n_steps and (n_steps - split) % 2 == 0
        return _sdf_split_call(params, n, n_steps, extent, tile, tile_c,
                               coarse, chunk, split)
    tile_c = tile_c or tile
    assert n % tile == 0 and n % tile_c == 0, \
        "image size must be divisible by the tile size"
    grid = (n // tile, n // tile_c)
    tile_spec = pl.BlockSpec((tile, tile_c), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    pvec = params.reshape(1, N_PARAMS)
    if coarse:
        t0 = _cone_t0(params, n, n_steps, extent, coarse)
    else:
        t0 = jnp.zeros((n, n), jnp.float32)
    img, ts = pl.pallas_call(
        functools.partial(_sdf_fwd_kernel, n=n, extent=extent,
                          n_steps=n_steps, chunk=chunk, dtype=dtype,
                          bands=bands, relax=relax, unimodal=unimodal),
        grid=grid,
        in_specs=[pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  tile_spec],
        out_specs=(tile_spec, tile_spec),
        out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),
                   jax.ShapeDtypeStruct((n, n), jnp.float32)),
    )(pvec, t0)
    return img, ts


def _sdf_vjp_fwd(params, n, n_steps, extent, tile, tile_c, coarse, chunk,
                 dtype, bands, relax, unimodal, split=0):
    img, ts = _sdf_fwd_call(params, n, n_steps, extent, tile, tile_c,
                            coarse, chunk, dtype, bands, relax, unimodal,
                            split)
    return img, (params, ts)


def _sdf_vjp_bwd(n, n_steps, extent, tile, tile_c, coarse, chunk, dtype,
                 bands, relax, unimodal, split, res, g, kernel=None):
    params, ts = res
    tile_c = tile_c or tile
    grid = (n // tile, n // tile_c)
    tile_spec = pl.BlockSpec((tile, tile_c), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    dp = pl.pallas_call(
        functools.partial(kernel or _sdf_bwd_kernel_analytic, n=n,
                          extent=extent, n_steps=n_steps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            tile_spec, tile_spec,
        ],
        out_specs=pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, N_PARAMS), jnp.float32),
    )(params.reshape(1, N_PARAMS), g, ts)
    return (dp.reshape(N_PARAMS),)


render_sdf_pallas.defvjp(_sdf_vjp_fwd, _sdf_vjp_bwd)
