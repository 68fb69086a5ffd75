"""Bring-your-own-SDF megakernel factory.

``render_sdf_pallas`` (pallas_kernels.py) is the tuned single-sphere
instance; this module generalizes it: hand ``make_sdf_renderer`` any
traced distance function over the flat parameter vector and get back the
same fused fwd megakernel + implicit-diff bwd megakernel pair, plus the
pure-jnp ``lax.scan`` reference path for parity gating. Compose scenes
from render/sdflib.py primitives:

    from enoki_tpu.render import sdflib as sd

    def my_sdf(p, pv):
        return sd.op_union(
            sd.sd_sphere(p, Vec3(pv[5], pv[6], pv[7]), pv[8]),
            sd.sd_torus(p, Vec3(0.0, 0.0, 0.5), pv[9], pv[10]))

    render, render_xla = make_sdf_renderer(my_sdf, n_params=11)
    img = render(params, n=1024)                   # megakernel
    grads = jax.grad(lambda v: render(v).mean())(params)

Parameter-vector convention: pv[0] = ambient, pv[1] = gain,
pv[2:5] = light direction; geometry parameters from pv[5] on are the
user's. Everything is differentiable, including through the march
(implicit function theorem at the converged hit, render/sdf.py:92).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vec import Vec3
from .implicit import implicit_t_vjp
from .pallas_kernels import _tile_pixels, _march_tile

AMBIENT, GAIN, LIGHT = 0, 1, slice(2, 5)

def _cone_t0_generic(sdf_fn, ray_fn, params, n, n_steps, extent, s, eps,
                     t_max, margin=1e-3):
    """Cone-march prepass for the generic factory: the shared engine
    (pallas_kernels.cone_t0 -- ONE implementation of the deflation
    radius / margin invariant) over the user SDF along THE CALLER'S
    ``ray_fn`` rays (the gate in fwd_call asserts they are the parallel
    orthographic camera; building the prepass from the same function --
    not a hardcoded copy of its convention -- keeps the no-ray-crosses-
    the-surface proof tied to the rays the fine kernel actually
    marches)."""
    from .pallas_kernels import cone_t0

    def dist_factory(px, py):
        o, dd = ray_fn(px, py, params)
        return lambda t: sdf_fn(o + dd * t, params)

    return cone_t0(dist_factory, n, n_steps, extent, s, eps, t_max,
                   margin)


def ortho_camera(px, py, pvec):
    """Default sensor: parallel rays along +z from z = -1
    (tests/sphere.cpp:58-64)."""
    one = jnp.ones_like(px)
    zero = jnp.zeros_like(px)
    return Vec3(px, py, -one), Vec3(zero, zero, one)


def perspective_camera(origin_z=-2.5, focal=1.8):
    """Pinhole at (0, 0, origin_z) looking down +z; directions normalized
    so the march parameter stays unit-speed (sphere tracing requires
    |d| = 1)."""

    def ray_fn(px, py, pvec):
        dz = jnp.full_like(px, focal)
        inv = lax.rsqrt(px * px + py * py + dz * dz)
        o = Vec3(jnp.zeros_like(px), jnp.zeros_like(px),
                 jnp.full_like(px, origin_z))
        return o, Vec3(px * inv, py * inv, dz * inv)

    return ray_fn


def _shade(o, d, t, hit, pvec, sdf_fn):
    """Lambert shade at the (frozen-t) hit point with the analytic SDF
    normal -- differentiable in pvec and t.

    NOTE kept in sync with pallas_kernels._sdf_shade_tile (the tuned
    sphere instance, which unpacks a scene struct instead of slots) --
    any change to the normal epsilon / lambert / background convention
    must land in both. The implicit-diff backward is SHARED:
    render/implicit.implicit_t_vjp is the single definition all three
    backward paths consume.
    """
    p = o + d * t

    def s_sum(px_, py_, pz_):
        return jnp.sum(sdf_fn(Vec3(px_, py_, pz_), pvec))

    gx, gy, gz = jax.grad(s_sum, argnums=(0, 1, 2))(p.x, p.y, p.z)
    inv = lax.rsqrt(gx * gx + gy * gy + gz * gz + 1e-12)
    lambert = jnp.maximum(
        (gx * pvec[LIGHT][0] + gy * pvec[LIGHT][1] + gz * pvec[LIGHT][2])
        * inv, 0.0)
    img = pvec[AMBIENT] + lambert * pvec[GAIN]
    return jnp.where(hit, img, pvec[AMBIENT] + jnp.zeros_like(img))


def make_sdf_renderer(sdf_fn, n_params: int, eps: float = 1e-4,
                      t_max: float = 10.0, ray_fn=ortho_camera):
    """(render_pallas, render_xla) for ``sdf_fn(p: Vec3, pvec) -> d``.

    Both take (params, n=1024, n_steps=64, extent=1.2[, tile, tile_c])
    and return the (n, n) image; both are differentiable w.r.t. params
    (megakernel: paired bwd kernel; jnp path: implicit-diff custom_vjp is
    embedded directly in the shared shade/march structure).

    ``ray_fn(px, py, pvec) -> (o: Vec3, d: Vec3)`` maps pixel coordinates
    to unit-speed rays; defaults to the reference's orthographic sensor,
    ``perspective_camera()`` gives a pinhole. Camera parameters may live
    in pvec -- the implicit-diff backward differentiates through the ray
    origin/direction as well.

    The megakernel inherits the round-4 work-elimination knobs of the
    tuned sphere instance: ``coarse`` (cone-prepass block side, 0 = off;
    orthographic camera only -- the conservativeness proof needs
    parallel rays), ``bands`` (sub-tile row bands with independent
    early exit), an exact miss-tile fast path (a tile with no hit
    shades to ambient and short-circuits both kernels), ``relax``
    (over-relaxed sphere tracing with the overlap safety test -- valid
    for any SDF), and ``unimodal`` (divergence exit; ONLY pass True
    when every ray's distance function is unimodal, e.g. a single
    convex body -- a concave or multi-body scene can re-approach after
    a local minimum and would misrender as a miss).
    """
    n_pad = max(16, -(-n_params // 8) * 8)

    def read_params(params_ref):
        return jnp.stack([params_ref[0, k] for k in range(n_params)])

    def fwd_kernel(params_ref, t0_ref, out_ref, t_ref, *, n, extent,
                   n_steps, bands, relax, unimodal):
        tr, tc = out_ref.shape
        px, py = _tile_pixels(tr, tc, n, extent)
        pvec = read_params(params_ref)
        o, dd = ray_fn(px, py, pvec)
        t0 = t0_ref[:, :]
        # sub-tile band early exit + cone-prepass start map: the same
        # work-elimination pair as the tuned sphere instance
        # (pallas_kernels._sdf_fwd_kernel); trajectory-exactness and
        # compiled-drift characteristics are identical.
        # bands must keep row stores sublane-aligned (8 f32 rows/vreg)
        nb = (bands if bands > 1 and tr % bands == 0
              and (tr // bands) % 8 == 0 else 1)
        br = tr // nb
        for b in range(nb):
            sl = slice(b * br, (b + 1) * br)
            o_b = Vec3(o.x[sl], o.y[sl], o.z[sl])
            d_b = Vec3(dd.x[sl], dd.y[sl], dd.z[sl])
            t_b, hit_b = _march_tile(
                lambda tv, o_b=o_b, d_b=d_b: sdf_fn(o_b + d_b * tv, pvec),
                px[sl], n_steps, eps=eps, t_max=t_max, t0=t0[sl],
                relax=relax, unimodal=unimodal)
            # miss-band fast path: no hit lane -> the band shades to
            # exactly pvec[AMBIENT] (the where() in _shade selects it on
            # every lane), so skip the normal/lambert math; pl.when
            # lowers to a predicated region and exactly one store runs
            hit_any = jnp.any(hit_b)

            @pl.when(hit_any)
            def _(t_b=t_b, hit_b=hit_b, o_b=o_b, d_b=d_b, sl=sl):
                out_ref[sl, :] = _shade(o_b, d_b, t_b, hit_b, pvec,
                                        sdf_fn)

            @pl.when(jnp.logical_not(hit_any))
            def _(sl=sl):
                out_ref[sl, :] = jnp.broadcast_to(pvec[AMBIENT],
                                                  (br, tc))

            # packed residual, ONE float/pixel (pallas_kernels
            # convention): hit lanes store t exactly (>= 0); miss lanes
            # store -t-1 < 0, consumed only behind the hit mask
            t_ref[sl, :] = jnp.where(hit_b, t_b, -t_b - 1.0)

    def bwd_kernel(params_ref, g_ref, t_ref, dp_ref, *, n,
                   extent, n_steps):
        tr, tc = g_ref.shape
        px, py = _tile_pixels(tr, tc, n, extent)
        pvec = read_params(params_ref)
        ts_packed = t_ref[:, :]
        hit = ts_packed >= 0.0
        t = jnp.where(hit, ts_packed, -1.0 - ts_packed)
        g = g_ref[:, :]

        first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

        @pl.when(first)
        def _():
            for k in range(n_pad):
                dp_ref[0, k] = 0.0

        def f_shade(pv, tv):
            o, dd = ray_fn(px, py, pv)
            return _shade(o, dd, tv, hit, pv, sdf_fn)

        hit_any = jnp.any(hit)

        @pl.when(hit_any)
        def _():
            _, vjp_fn = jax.vjp(f_shade, pvec, t)
            dp_direct, t_bar = vjp_fn(g)

            # implicit term: t* solves sdf(o + d t*, theta) = eps; ray
            # origin/direction may themselves depend on theta (camera
            # params in pvec)
            def f_sdf_at(pv, tv):
                o, dd = ray_fn(px, py, pv)
                return sdf_fn(o + dd * tv, pv)

            dp = dp_direct + implicit_t_vjp(f_sdf_at, pvec, t, t_bar,
                                            hit)
            for k in range(n_params):
                dp_ref[0, k] += dp[k]

        @pl.when(jnp.logical_not(hit_any))
        def _():
            # miss-tile fast path: every lane's shade is pvec[AMBIENT],
            # so d shade / d pvec = e_ambient per lane and t_bar == 0
            dp_ref[0, AMBIENT] += jnp.sum(g)

    def pad(params):
        return jnp.concatenate(
            [params.astype(jnp.float32),
             jnp.zeros(n_pad - n_params, jnp.float32)]).reshape(1, n_pad)

    param_spec = pl.BlockSpec((1, n_pad), lambda i, j: (0, 0),
                              memory_space=pltpu.SMEM)

    def fwd_call(params, n, n_steps, extent, tile, tile_c, coarse, bands,
                 relax=1.0, unimodal=False):
        tile_c = tile_c or tile
        assert n % tile == 0 and n % tile_c == 0, \
            "image size must be divisible by the tile size"
        grid = (n // tile, n // tile_c)
        tile_spec = pl.BlockSpec((tile, tile_c), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
        if coarse:
            assert ray_fn is ortho_camera, \
                "the cone prepass is only conservative for parallel " \
                "(orthographic) rays; pass coarse=0 for custom cameras"
            t0 = _cone_t0_generic(sdf_fn, ray_fn,
                                  params.astype(jnp.float32), n,
                                  n_steps, extent, coarse, eps, t_max)
        else:
            t0 = jnp.zeros((n, n), jnp.float32)
        return pl.pallas_call(
            functools.partial(fwd_kernel, n=n, extent=extent,
                              n_steps=n_steps, bands=bands, relax=relax,
                              unimodal=unimodal),
            grid=grid,
            in_specs=[param_spec, tile_spec],
            out_specs=(tile_spec,) * 2,
            out_shape=(jax.ShapeDtypeStruct((n, n), jnp.float32),) * 2,
        )(pad(params), t0)

    @functools.partial(jax.custom_vjp,
                       nondiff_argnums=(1, 2, 3, 4, 5, 6, 7, 8, 9))
    def render_pallas(params, n=1024, n_steps=64, extent=1.2, tile=128,
                      tile_c=None, coarse=0, bands=1, relax=1.0,
                      unimodal=False):
        return fwd_call(params, n, n_steps, extent, tile, tile_c,
                        coarse, bands, relax, unimodal)[0]

    def vjp_fwd(params, n, n_steps, extent, tile, tile_c, coarse, bands,
                relax, unimodal):
        img, ts = fwd_call(params, n, n_steps, extent, tile, tile_c,
                           coarse, bands, relax, unimodal)
        return img, (params, ts)

    def vjp_bwd(n, n_steps, extent, tile, tile_c, coarse, bands, relax,
                unimodal, res, g):
        params, ts = res
        tile_c = tile_c or tile
        assert n % tile == 0 and n % tile_c == 0, \
            "image size must be divisible by the tile size"
        grid = (n // tile, n // tile_c)
        tile_spec = pl.BlockSpec((tile, tile_c), lambda i, j: (i, j),
                                 memory_space=pltpu.VMEM)
        dp = pl.pallas_call(
            functools.partial(bwd_kernel, n=n, extent=extent,
                              n_steps=n_steps),
            grid=grid,
            in_specs=[param_spec, tile_spec, tile_spec],
            out_specs=pl.BlockSpec((1, n_pad), lambda i, j: (0, 0),
                                   memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        )(pad(params), g, ts)
        # cotangent dtype must match the primal's (pad() upcast to f32)
        return (dp.reshape(n_pad)[:n_params].astype(params.dtype),)

    render_pallas.defvjp(vjp_fwd, vjp_bwd)

    # --- pure-jnp reference path (the parity gate / XLA baseline) --------

    def render_xla(params, n=1024, n_steps=64, extent=1.2):
        params = params.astype(jnp.float32)
        ax = jnp.linspace(-extent, extent, n)
        px, py = jnp.meshgrid(ax, ax)

        def march(pv):
            o, dd = ray_fn(px, py, pv)
            t = jnp.zeros_like(px)
            active = jnp.ones_like(px, bool)
            hit = jnp.zeros_like(active)

            def step(carry, _):
                t, active, hit = carry
                d = sdf_fn(o + dd * t, pv)
                converged = d < eps
                hit = hit | (active & converged)
                t_new = t + d
                active = active & ~converged & (t_new <= t_max)
                t = jnp.where(active, t_new, t)
                return (t, active, hit), None

            (t, _, hit), _ = lax.scan(step, (t, active, hit), None,
                                      length=n_steps)
            return t, hit

        # implicit-function backward through the march (render/sdf.py:92
        # semantics, generalized to any sdf_fn)
        @jax.custom_vjp
        def march_implicit(pv):
            return march(pv)

        def mi_fwd(pv):
            t, hit = march(pv)
            return (t, hit), (pv, t, hit)

        def mi_bwd(res, ct):
            pv, t, hit = res
            t_bar, _ = ct

            # the SHARED implicit backward (render/implicit.py): its
            # grazing clamp preserves the slope's sign -- an inline
            # jnp.where(|df_dt| > guard, df_dt, +1.0) copy once flipped
            # the cotangent on grazing lanes in THIS path only, making
            # the parity baseline itself the buggy side (r4 review)
            def f(pv_, tv):
                o, dd = ray_fn(px, py, pv_)
                return sdf_fn(o + dd * tv, pv_)

            dpv = implicit_t_vjp(f, pv, t, t_bar, hit)
            return (dpv,)

        march_implicit.defvjp(mi_fwd, mi_bwd)

        t, hit = march_implicit(params)
        o, dd = ray_fn(px, py, params)
        return _shade(o, dd, t, hit, params, sdf_fn)

    return render_pallas, render_xla
