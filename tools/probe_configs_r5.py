"""Probe each bench candidate config on chip: compile + run + parity,
one line per config. Finds the Mosaic-crashing config from BENCH_r04."""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from enoki_tpu.render.sdf import SDFScene, sdf_loss_implicit
from enoki_tpu.render.pallas_kernels import scene_to_vec, render_sdf_pallas

N, STEPS, TILE = 1024, 64, 128
v = scene_to_vec(SDFScene.reference())
lx, gx = jax.jit(jax.value_and_grad(
    lambda s: sdf_loss_implicit(s, N, STEPS)))(SDFScene.reference())
gx_vec = np.array([gx.center.x, gx.center.y, gx.center.z, gx.radius,
                   gx.ambient, gx.gain, gx.light.x, gx.light.y, gx.light.z])

candidates = [(8, 8, 1.6, True), (8, 8, 1.6, False), (8, 8, 1.0, True),
              (8, 8, 1.0, False), (8, 1, 1.0, False), (0, 1, 1.0, False),
              (0, 8, 1.0, False), (0, 1, 1.6, True), (0, 1, 1.0, True)]

for cfg in candidates:
    coarse, bands, relax, unimodal = cfg

    def loss(pv, cfg=cfg):
        return jnp.mean(render_sdf_pallas(pv, N, STEPS, 1.2, TILE, TILE,
                                          cfg[0], 16, jnp.float32,
                                          cfg[1], cfg[2], cfg[3]))

    try:
        lp, gp = jax.jit(jax.value_and_grad(loss))(v)
        ok = (np.isclose(float(lp), float(lx), rtol=1e-3, atol=1e-5)
              and np.allclose(np.asarray(gp)[:9], gx_vec, rtol=1e-2,
                              atol=1e-3 * max(1.0, np.abs(gx_vec).max())))
        print(f"{cfg}: {'parity-ok' if ok else 'PARITY-FAIL'} "
              f"loss={float(lp):.6f}", flush=True)
    except Exception as e:
        msg = str(e).replace(chr(10), " | ")[:300]
        print(f"{cfg}: CRASH {type(e).__name__}: {msg}", flush=True)
