"""North-star benchmark: rays/s/chip fwd+bwd on the sphere ray-march.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: throughput of a full forward+backward differentiable render of the
SDF sphere-march (1024x1024 primary rays, 64 march steps) on one chip,
using the best path (Pallas megakernel with implicit-diff backward).
Baseline (BASELINE.md "north star"): the XLA-fused pure-jnp implementation
of the same computation -- vs_baseline = pallas_rays_per_s / xla_rays_per_s.

Correctness gates run first: Pallas image allclose vs the jnp path, and
gradients allclose between both paths; the benchmark aborts to
vs_baseline=0 output if parity fails.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _bench(fn, inputs, iters=20, windows=5):
    """Median over pipelined windows, rotating perturbed inputs.

    Per-call blocking measures the host<->device sync round trip (~25 ms
    through the remote tunnel), not the kernel; production render loops
    pipeline steps, so steady-state throughput = pipelined window time /
    iters. The median over several windows rejects dispatch hiccups.
    Each call gets a slightly different input so no layer of the stack can
    serve a cached result for a repeated identical execution.
    """
    jax.block_until_ready(fn(inputs[0]))
    per_window = []
    k = 0
    for _ in range(windows):
        t0 = time.perf_counter()
        r = None
        for _ in range(iters):
            r = fn(inputs[k % len(inputs)])
            k += 1
        jax.block_until_ready(r)
        per_window.append((time.perf_counter() - t0) / iters)
    per_window.sort()
    return per_window[len(per_window) // 2]


def main():
    from enoki_tpu.render.sdf import (SDFScene, sdf_loss_implicit)
    from enoki_tpu.render.pallas_kernels import (
        scene_to_vec, render_sdf_pallas)

    N = 1024
    STEPS = 64
    rays = N * N

    scene = SDFScene.reference()
    v = scene_to_vec(scene)

    def pallas_loss(pv):
        # 64x256 VMEM tiles: fastest fwd+bwd config on v5e (the early-exit
        # march in _march_tile converges tile-locally)
        return jnp.mean(render_sdf_pallas(pv, N, STEPS, 1.2, 64, 256))

    # fwd+bwd: value_and_grad through the megakernel pair
    pallas_step = jax.jit(jax.value_and_grad(pallas_loss))
    xla_step = jax.jit(jax.value_and_grad(
        lambda s: sdf_loss_implicit(s, N, STEPS)))

    # --- parity gates -------------------------------------------------
    lp, gp = pallas_step(v)
    lx, gx = xla_step(scene)
    gx_vec = np.array([gx.center.x, gx.center.y, gx.center.z, gx.radius,
                       gx.ambient, gx.gain, gx.light.x, gx.light.y,
                       gx.light.z])
    ok = (np.isclose(float(lp), float(lx), rtol=1e-3, atol=1e-5)
          and np.allclose(np.asarray(gp)[:9], gx_vec, rtol=1e-2,
                          atol=1e-3 * max(1.0, np.abs(gx_vec).max())))
    if not ok:
        print(json.dumps({"metric": "rays_per_s_per_chip_fwd_bwd",
                          "value": 0.0, "unit": "rays/s",
                          "vs_baseline": 0.0,
                          "error": "parity gate failed"}))
        return 1

    # --- timing ---------------------------------------------------------
    vset = [v + 1e-6 * k for k in range(32)]
    sset = [SDFScene(center=scene.center,
                     radius=scene.radius + jnp.float32(1e-6 * k),
                     ambient=scene.ambient, gain=scene.gain,
                     light=scene.light) for k in range(32)]
    t_pallas = _bench(pallas_step, vset)
    t_xla = _bench(xla_step, sset)

    rays_pallas = rays / t_pallas
    rays_xla = rays / t_xla

    print(json.dumps({
        "metric": "rays_per_s_per_chip_fwd_bwd",
        "value": round(rays_pallas, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_pallas / rays_xla, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
