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


def _bench_scan(value_and_grad_fn, x0, perturb, k_lo=100, k_hi=400,
                windows=5):
    """Device-only per-step time: chain fwd+bwd steps inside ONE jitted
    lax.scan, fence with a single host readback, and run TWO chain
    lengths so the fixed window cost cancels exactly.

    Each step's input is perturbed by the previous step's loss AND a
    reduction of its gradients, so the steps have a true data dependency
    -- no layer of the stack (async dispatch, the remote tunnel's
    early-returning block_until_ready, value caches) can overlap or
    dedupe them, and the BACKWARD pass is live inside the timed chain.
    (Threading only the loss would let XLA dead-code-eliminate the whole
    vjp -- the bwd pallas_call included -- and silently measure
    forward-only throughput; the grads term is folded into the loss
    HERE so no caller's perturb can reintroduce that.) A window costs
    K*c + L where L is the ~30 ms host<->device round trip; measuring at
    two K and taking (T_hi - T_lo) / (k_hi - k_lo) removes L without
    assuming it is small.

    Returns (median, spread_pct) over ``windows`` INDEPENDENT two-point
    measurements: the two-point trick cancels tunnel latency but not
    chip-state variance (~10% spread observed between whole runs), so
    one sample must never become the official number -- the median is
    reported together with its spread (max-min)/median.
    """
    import jax.numpy as jnp
    from jax import lax

    def make(iters):
        @jax.jit
        def run(x0):
            def step(x, k):
                loss, grads = value_and_grad_fn(x)
                gsum = sum(jnp.sum(g) for g in
                           jax.tree_util.tree_leaves(grads))
                return perturb(x0, loss + 1e-12 * gsum, k), loss

            _, losses = lax.scan(step, x0, jnp.arange(iters))
            return losses[-1]

        return run

    run_lo, run_hi = make(k_lo), make(k_hi)
    np.asarray(run_lo(x0))  # compile + warm
    np.asarray(run_hi(x0))
    per_step = []
    for _ in range(windows):
        t0 = time.perf_counter()
        np.asarray(run_lo(x0))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run_hi(x0))
        t_hi = time.perf_counter() - t0
        per_step.append((t_hi - t_lo) / (k_hi - k_lo))
    per_step.sort()
    med = per_step[len(per_step) // 2]
    spread = (per_step[-1] - per_step[0]) / med if med > 0 else 0.0
    return med, spread


def main():
    from enoki_tpu.render.sdf import (SDFScene, sdf_loss_implicit)
    from enoki_tpu.render.pallas_kernels import (
        scene_to_vec, render_sdf_pallas)

    import os
    # test override: lets the full candidate/parity/fallback flow run on
    # CPU interpret mode in seconds (tests/test_bench_flow.py); the
    # official numbers always use the 1024/64 defaults
    N = int(os.environ.get("ENOKI_BENCH_N", 1024))
    STEPS = int(os.environ.get("ENOKI_BENCH_STEPS", 64))
    K_LO = int(os.environ.get("ENOKI_BENCH_KLO", 100))
    K_HI = int(os.environ.get("ENOKI_BENCH_KHI", 400))
    WINDOWS = int(os.environ.get("ENOKI_BENCH_WINDOWS", 5))
    rays = N * N

    scene = SDFScene.reference()
    v = scene_to_vec(scene)

    TILE = min(128, N)

    def make_loss(coarse, bands, relax=1.0, unimodal=False):
        def pallas_loss(pv):
            # 128x128 VMEM tiles: fastest fwd+bwd config on v5e (the
            # early-exit march in _march_tile converges tile-locally)
            return jnp.mean(render_sdf_pallas(pv, N, STEPS, 1.2, TILE, TILE,
                                              coarse, 16, jnp.float32,
                                              bands, relax, unimodal))
        return pallas_loss

    # reference step: the XLA-fused pure-jnp baseline (also the parity
    # oracle for every candidate below)
    xla_step = jax.jit(jax.value_and_grad(
        lambda s: sdf_loss_implicit(s, N, STEPS)))
    lx, gx = xla_step(scene)
    gx_vec = np.array([gx.center.x, gx.center.y, gx.center.z, gx.radius,
                       gx.ambient, gx.gain, gx.light.x, gx.light.y,
                       gx.light.z])

    def parity_ok(vg_fn):
        try:
            lp, gp = jax.jit(vg_fn)(v)
            return (np.isclose(float(lp), float(lx), rtol=1e-3, atol=1e-5)
                    and np.allclose(np.asarray(gp)[:9], gx_vec, rtol=1e-2,
                                    atol=1e-3 * max(1.0, np.abs(gx_vec).max())))
        except Exception as e:  # Mosaic compile/runtime failure = fail gate
            print(f"bench: parity probe raised for a candidate "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
            return False

    # quick self-tuning pass over the work-elimination knobs (cone
    # prepass / sub-tile bands / over-relaxation / convex divergence
    # exit): one short two-point window per config, then the fastest
    # candidate that PASSES the parity gates gets the full 5-window
    # measurement. The schedule-only knobs (coarse/bands) cannot fail
    # parity; the trajectory-changing ones (relax/unimodal) may flip
    # grazing silhouette pixels, so each winner is gated before use --
    # an aggressive candidate can never zero the benchmark, only lose.
    candidates = [(8, 8, 1.6, True), (8, 8, 1.6, False), (8, 8, 1.0, True),
                  (8, 8, 1.0, False), (8, 1, 1.0, False), (0, 1, 1.0, False)]
    # one loss closure + value_and_grad per config, shared by the quick
    # pass, the parity gate and the final measurement: a fresh closure
    # per stage would defeat jit's function-identity cache and re-trace/
    # re-compile the same megakernel pair several times per run
    losses = {cfg: make_loss(*cfg) for cfg in candidates}
    vgs = {cfg: jax.value_and_grad(losses[cfg]) for cfg in candidates}
    quick = []
    for cfg in candidates:
        try:
            t, _ = _bench_scan(vgs[cfg], v,
                               lambda v0, loss, k: v0 + loss * 1e-12
                               + 1e-6 * k.astype(jnp.float32),
                               k_lo=max(K_LO // 4, 2),
                               k_hi=max(K_HI // 4, 5), windows=1)
        except Exception as e:
            # a work-elimination variant that fails to compile on this
            # backend (Mosaic lowering gap, VMEM overflow) must only
            # lose the tuning race, never zero the benchmark -- the
            # plain (0, 1) config is the always-works floor
            print(f"bench: candidate {cfg} failed to run "
                  f"({type(e).__name__}: {e}); skipping", file=sys.stderr)
            continue
        quick.append((t, cfg))
    quick.sort(key=lambda q: q[0])

    pallas_loss, chosen = None, None
    for _, cfg in quick:
        if parity_ok(vgs[cfg]):
            pallas_loss, chosen = losses[cfg], cfg
            break
    if pallas_loss is None:
        print(json.dumps({"metric": "rays_per_s_per_chip_fwd_bwd",
                          "value": 0.0, "unit": "rays/s",
                          "vs_baseline": 0.0,
                          "error": "parity gate failed for all configs"}))
        return 1
    coarse, bands, relax, unimodal = chosen

    # --- timing ---------------------------------------------------------
    t_pallas, spread_p = _bench_scan(
        vgs[chosen], v,
        lambda v0, loss, k: v0 + loss * 1e-12
        + 1e-6 * k.astype(jnp.float32),
        k_lo=K_LO, k_hi=K_HI, windows=WINDOWS)

    def perturb_scene(s0, loss, k):
        return SDFScene(center=s0.center,
                        radius=s0.radius + loss * 1e-12
                        + 1e-6 * k.astype(jnp.float32),
                        ambient=s0.ambient, gain=s0.gain, light=s0.light)

    t_xla, spread_x = _bench_scan(
        jax.value_and_grad(lambda s: sdf_loss_implicit(s, N, STEPS)),
        scene, perturb_scene, k_lo=K_LO, k_hi=K_HI, windows=WINDOWS)

    # forward-only row for cross-round comparability: r1-r3 numbers were
    # fwd-only by accident (the DCE'd backward, see benchmarks.md); this
    # keeps a directly comparable figure next to the honest fwd+bwd one.
    # A fn wrapped as value_and_grad of loss-only is the fwd program.
    t_fwd, _ = _bench_scan(
        lambda pv: (losses[chosen](pv), pv * 0.0), v,
        lambda v0, loss, k: v0 + loss * 1e-12
        + 1e-6 * k.astype(jnp.float32),
        k_lo=K_LO, k_hi=K_HI, windows=max(WINDOWS // 2, 1))

    rays_pallas = rays / t_pallas
    rays_xla = rays / t_xla

    print(json.dumps({
        "metric": "rays_per_s_per_chip_fwd_bwd",
        "value": round(rays_pallas, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_pallas / rays_xla, 4),
        "spread_pct": round(100.0 * max(spread_p, spread_x), 2),
        "windows": WINDOWS,
        "config": {"coarse": coarse, "bands": bands, "relax": relax,
                   "unimodal": unimodal},
        # r1-r3 rows were forward-only by accident (DCE'd backward,
        # docs/benchmarks.md); this keeps a directly comparable figure
        "fwd_only_rays_per_s": round(rays / t_fwd, 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
