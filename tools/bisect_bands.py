"""Bisect the real banded fwd kernel: strip features until the Mosaic
SIGABRT disappears. Usage: python tools/bisect_bands.py [variant ...]"""
import functools
import sys

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from enoki_tpu.render.pallas_kernels import (  # noqa: E402
    N_PARAMS, _tile_pixels, _read_params, _march_tile, _sdf_shade_tile,
    scene_to_vec)
from enoki_tpu.render.sdf import (  # noqa: E402
    SDFScene, sdf_ortho_dist as _sdf_ortho_dist)
from enoki_tpu.render.vec import Vec3  # noqa: E402
from enoki_tpu.render.pallas_kernels import vec_to_scene  # noqa: E402

N, TILE, BANDS, STEPS, CHUNK = 256, 128, 8, 64, 16


def kernel(params_ref, t0_ref, out_ref, t_ref, *, shade, miss_branch,
           t_store, when):
    tr, tc = out_ref.shape
    px, py = _tile_pixels(tr, tc, N, 1.2)
    pvec = _read_params(params_ref)
    scene_m = vec_to_scene(pvec, SDFScene)
    t0_full = t0_ref[:, :]
    nb = BANDS
    br = tr // nb
    for b in range(nb):
        sl = slice(b * br, (b + 1) * br)
        dist_b = _sdf_ortho_dist(px[sl], py[sl], scene_m)
        t_b, hit_b = _march_tile(dist_b, px[sl], STEPS, chunk=CHUNK,
                                 t0=t0_full[sl], eps=1e-4)
        hit_any = jnp.any(hit_b)

        def payload(t_b=t_b, hit_b=hit_b, sl=sl):
            if shade:
                out_ref[sl, :] = _sdf_shade_tile(px[sl], py[sl], t_b,
                                                 hit_b, pvec)
            else:
                out_ref[sl, :] = jnp.where(hit_b, t_b * 2.0, t_b)

        if when:
            pl.when(hit_any)(payload)
            if miss_branch:
                @pl.when(jnp.logical_not(hit_any))
                def _(sl=sl):
                    out_ref[sl, :] = jnp.broadcast_to(pvec[4], (br, tc))
        else:
            payload()

        if t_store:
            t_ref[sl, :] = jnp.where(hit_b, t_b, -t_b - 1.0)


def run(name, **kw):
    spec = pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(N // TILE, N // TILE),
        in_specs=[pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM), spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((N, N), jnp.float32),
                   jax.ShapeDtypeStruct((N, N), jnp.float32)))
    v = scene_to_vec(SDFScene.reference()).reshape(1, N_PARAMS)
    t0 = jnp.zeros((N, N), jnp.float32)
    try:
        r = jax.jit(f)(v, t0)
        jax.block_until_ready(r)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:90]}", flush=True)


VARIANTS = {
    "full": dict(shade=True, miss_branch=True, t_store=True, when=True),
    "noshade": dict(shade=False, miss_branch=True, t_store=True, when=True),
    "nomiss": dict(shade=True, miss_branch=False, t_store=True, when=True),
    "nots": dict(shade=True, miss_branch=True, t_store=False, when=True),
    "nowhen": dict(shade=True, miss_branch=False, t_store=True, when=False),
    "bare": dict(shade=False, miss_branch=False, t_store=False, when=False),
}

if __name__ == "__main__":
    for name in (sys.argv[1:] or VARIANTS):
        run(name, **VARIANTS[name])


def kernel2(params_ref, t0_ref, out_ref, t_ref, *, use_sqrt, use_scene,
            use_march, use_t0, use_pid):
    tr, tc = out_ref.shape
    if use_pid:
        px, py = _tile_pixels(tr, tc, N, 1.2)
    else:
        step = 2.0 * 1.2 / (N - 1)
        rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
        cols = lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
        py = rows.astype(jnp.float32) * step - 1.2
        px = cols.astype(jnp.float32) * step - 1.2
    if use_scene:
        pvec = _read_params(params_ref)
        scene_m = vec_to_scene(pvec, SDFScene)
        cx, cy, cz, rad = (scene_m.center.x, scene_m.center.y,
                           scene_m.center.z, scene_m.radius)
    else:
        cx = cy = cz = 0.0
        rad = 1.0
    t0_full = t0_ref[:, :]
    br = tr // BANDS
    for b in range(BANDS):
        sl = slice(b * br, (b + 1) * br)
        dx = px[sl] - cx
        dy = py[sl] - cy
        rxy2 = dx * dx + dy * dy + 1e-12
        z0 = -1.0 - cz
        if use_sqrt:
            dist_b = lambda t, rxy2=rxy2: (
                jnp.sqrt(rxy2 + (z0 + t) * (z0 + t)) - rad)
        else:
            dist_b = lambda t, rxy2=rxy2: rxy2 + 0.1 * t + 0.5 - rad
        t00 = t0_full[sl] if use_t0 else jnp.zeros((br, tc), jnp.float32)
        if use_march:
            t_b, hit_b = _march_tile(dist_b, px[sl], STEPS, chunk=CHUNK,
                                     t0=t00, eps=1e-4)
        else:
            def body(k, t, dist_b=dist_b):
                d = dist_b(t)
                alive = (d >= 1e-4) & (t + d <= 10.0)
                return jnp.where(alive, t + d, t)
            t_b = lax.fori_loop(0, STEPS, body, t00)
            hit_b = dist_b(t_b) < 1e-4
        out_ref[sl, :] = jnp.where(hit_b, t_b * 2.0, t_b)
        t_ref[sl, :] = jnp.where(hit_b, t_b, -t_b - 1.0)


def run2(name, **kw):
    spec = pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        functools.partial(kernel2, **kw),
        grid=(N // TILE, N // TILE),
        in_specs=[pl.BlockSpec((1, N_PARAMS), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM), spec],
        out_specs=(spec, spec),
        out_shape=(jax.ShapeDtypeStruct((N, N), jnp.float32),
                   jax.ShapeDtypeStruct((N, N), jnp.float32)))
    v = scene_to_vec(SDFScene.reference()).reshape(1, N_PARAMS)
    t0 = jnp.zeros((N, N), jnp.float32)
    try:
        r = jax.jit(f)(v, t0)
        jax.block_until_ready(r)
        print(f"{name}: OK", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:90]}", flush=True)


def kernel3(params_ref, t0_ref, out_ref, t_ref, *, read_t0, two_out,
            use_cols, loop):
    tr, tc = out_ref.shape
    rows = lax.broadcasted_iota(jnp.int32, (tr, tc), 0).astype(jnp.float32)
    cols = lax.broadcasted_iota(jnp.int32, (tr, tc), 1).astype(jnp.float32)
    t0_full = t0_ref[:, :]
    br = tr // BANDS
    for b in range(BANDS):
        sl = slice(b * br, (b + 1) * br)
        px = rows[sl] * 0.01 - 1.2
        if use_cols:
            px = px + (cols[sl] * 0.01 - 1.2) * 0.5
        t = t0_full[sl] if read_t0 else jnp.zeros((br, tc), jnp.float32)
        if loop:
            def body(k, t, px=px):
                d = px + 0.1 * t + 0.5
                alive = (d >= 1e-4) & (t + d <= 10.0)
                return jnp.where(alive, t + d, t)
            t = lax.fori_loop(0, STEPS, body, t)
        else:
            t = t + px
        hit_b = t < 1e-4
        out_ref[sl, :] = jnp.where(hit_b, t * 2.0, t)
        if two_out:
            t_ref[sl, :] = jnp.where(hit_b, t, -t - 1.0)
    if not two_out:
        t_ref[:, :] = jnp.zeros((tr, tc), jnp.float32)


def kernel4(params_ref, t0_ref, out_ref, t_ref, *, per_band_iota):
    """The proposed fix: per-band (br, tc) iotas, no row-slice of a
    lane-direction iota."""
    tr, tc = out_ref.shape
    t0_full = t0_ref[:, :]
    br = tr // BANDS
    colsb = lax.broadcasted_iota(jnp.int32, (br, tc), 1).astype(jnp.float32)
    for b in range(BANDS):
        sl = slice(b * br, (b + 1) * br)
        rowsb = (lax.broadcasted_iota(jnp.int32, (br, tc), 0)
                 + b * br).astype(jnp.float32)
        px = rowsb * 0.01 - 1.2 + (colsb * 0.01 - 1.2) * 0.5
        t = t0_full[sl]

        def body(k, t, px=px):
            d = px + 0.1 * t + 0.5
            alive = (d >= 1e-4) & (t + d <= 10.0)
            return jnp.where(alive, t + d, t)
        t = lax.fori_loop(0, STEPS, body, t)
        hit_b = t < 1e-4
        out_ref[sl, :] = jnp.where(hit_b, t * 2.0, t)
        t_ref[sl, :] = jnp.where(hit_b, t, -t - 1.0)
