"""North-star benchmark: rays/s/chip fwd+bwd on the sphere ray-march.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Metric: throughput of a full forward+backward differentiable render of the
SDF sphere-march (1024x1024 primary rays, 64 march steps) on one chip,
using the best path (Pallas megakernel pair with the analytic implicit
backward). Baseline (BASELINE.md "north star"): the XLA-fused pure-jnp
implementation of the same computation -- vs_baseline =
pallas_rays_per_s / xla_rays_per_s.

Round-5 methodology (VERDICT r4 item 3): the Pallas and XLA paths are
measured in INTERLEAVED windows (chip-state drift hits both sides
equally), each path reports its own spread, windows are outlier-rejected
by a median/MAD gate, and a spread above the loudness threshold flags
the run as degraded instead of silently publishing mush. Candidate
configs that fail to compile are reported in a structured
"crashed_configs" field (ADVICE r4), not just stderr.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# loudness threshold: a per-path spread beyond this marks the run
# degraded (r3 achieved 3.7%; ~10% chip-state variance is known)
SPREAD_LOUD = 0.15


def _make_runner(value_and_grad_fn, x0, perturb, iters):
    """One jitted K-step fwd+bwd chain (see _bench_paths)."""
    from jax import lax

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


def _robust(samples):
    """Median + MAD outlier rejection over per-window two-point times.

    Returns (median, spread, n_rejected): windows farther than
    max(3 * 1.4826 * MAD, 2% of median) from the median are dropped
    (a crashed-candidate aftermath or tunnel hiccup shows up as one
    wild window -- BENCH_r04's 45.8% spread), then spread =
    (max - min) / median over the kept windows.
    """
    # per-step time is positive by definition; a non-positive two-point
    # window is pure scheduler noise (only reachable at test scales,
    # where the 3-step delta is smaller than timer jitter)
    s = sorted(x for x in samples if x > 0) or sorted(samples)
    med = s[len(s) // 2]
    mad = sorted(abs(x - med) for x in s)[len(s) // 2]
    gate = max(3.0 * 1.4826 * mad, 0.02 * med)
    keep = [x for x in s if abs(x - med) <= gate] or s
    med2 = sorted(keep)[len(keep) // 2]
    spread = (max(keep) - min(keep)) / med2 if med2 > 0 else 0.0
    return med2, spread, len(s) - len(keep)


def _bench_paths(paths, k_lo=100, k_hi=400, windows=7):
    """Interleaved device-only per-step timing of several fwd+bwd paths.

    ``paths``: {name: (value_and_grad_fn, x0, perturb)}. Each path's
    per-step time comes from the two-point scan-chain method: K fwd+bwd
    steps chained by a true data dependency (loss AND a gradient
    reduction fold into the next step's input, so the backward cannot
    be dead-code-eliminated -- the round-4 correction) inside ONE
    jitted lax.scan, fenced by a single host readback; measuring at two
    chain lengths and taking (T_hi - T_lo)/(k_hi - k_lo) cancels the
    ~30 ms tunnel round trip exactly.

    Round-5: windows are INTERLEAVED across paths in rotating order --
    chip-state drift (thermal, tunnel load) lands on every path, so the
    ratio stays honest even when absolute numbers wobble -- and each
    path gets median/MAD outlier rejection (_robust).

    Returns {name: (per_step_median, spread, n_rejected)}.
    """
    runners = {}
    for name, (vg, x0, perturb) in paths.items():
        runners[name] = (_make_runner(vg, x0, perturb, k_lo),
                         _make_runner(vg, x0, perturb, k_hi), x0)
    for name, (lo, hi, x0) in runners.items():  # compile + warm
        np.asarray(lo(x0))
        np.asarray(hi(x0))
    def one_window(name):
        lo, hi, x0 = runners[name]
        t0 = time.perf_counter()
        np.asarray(lo(x0))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(hi(x0))
        t_hi = time.perf_counter() - t0
        samples[name].append((t_hi - t_lo) / (k_hi - k_lo))

    samples = {name: [] for name in paths}
    names = list(paths)
    for w in range(windows):
        order = names[w % len(names):] + names[:w % len(names)]
        for name in order:
            one_window(name)
    # a path whose every window came out non-positive (timer jitter at
    # test scales) gets retries until one positive window exists
    for name in names:
        tries = 0
        while not any(x > 0 for x in samples[name]) and tries < 8:
            one_window(name)
            tries += 1
    return {name: _robust(s) for name, s in samples.items()}


def _bench_scan(value_and_grad_fn, x0, perturb, k_lo=100, k_hi=400,
                windows=5):
    """Single-path wrapper kept for tools/ (tune_megakernel, profile_r5):
    same two-point chained timing, median + spread over ``windows``."""
    med, spread, _ = _bench_paths(
        {"_": (value_and_grad_fn, x0, perturb)},
        k_lo=k_lo, k_hi=k_hi, windows=windows)["_"]
    return med, spread


def main():
    from enoki_tpu.render.sdf import SDFScene, sdf_loss_implicit
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
    WINDOWS = int(os.environ.get("ENOKI_BENCH_WINDOWS", 7))
    rays = N * N

    scene = SDFScene.reference()
    v = scene_to_vec(scene)

    TILE = min(128, N)

    def make_loss(coarse, bands=1, relax=1.0, unimodal=False, split=0):
        def pallas_loss(pv):
            # 128x128 VMEM tiles, z-carry march, analytic implicit bwd
            # (fastest fwd+bwd config on v5e, docs/benchmarks.md r5)
            return jnp.mean(render_sdf_pallas(pv, N, STEPS, 1.2, TILE, TILE,
                                              coarse, 16, jnp.float32,
                                              bands, relax, unimodal,
                                              split))
        return pallas_loss

    # reference: the XLA-fused pure-jnp baseline (also the parity
    # oracle for every candidate below)
    xla_loss = lambda s: sdf_loss_implicit(s, N, STEPS)  # noqa: E731
    xla_step = jax.jit(jax.value_and_grad(xla_loss))
    lx, gx = xla_step(scene)
    gx_vec = np.array([gx.center.x, gx.center.y, gx.center.z, gx.radius,
                       gx.ambient, gx.gain, gx.light.x, gx.light.y,
                       gx.light.z])
    img_x = None  # oracle image, rendered lazily for the flip gate

    def parity_ok(cfg, vg_fn):
        """Two-level parity gate against the XLA oracle.

        Level 1 (always): gradient allclose -- the north-star metric is
        "pixel-grad allclose" (BASELINE.json).
        Level 2: loss rtol 1e-3 for trajectory-preserving configs. A
        config with a march HEAD START (coarse>0) legitimately converges
        grazing silhouette rays the fixed-step oracle runs out of budget
        on (r5 finding: the flips sit in a one-pixel ring at the disc
        edge, the rest of the image agrees to FMA noise) -- those are
        gated on flip fraction + off-flip agreement instead of the loss.
        """
        nonlocal img_x
        try:
            lp, gp = jax.jit(vg_fn)(v)
            if not np.allclose(np.asarray(gp)[:9], gx_vec, rtol=1e-2,
                               atol=1e-3 * max(1.0, np.abs(gx_vec).max())):
                return False
            if np.isclose(float(lp), float(lx), rtol=1e-3, atol=1e-5):
                return True
            if cfg[0] == 0:
                return False  # no head start: the loss must match
            from enoki_tpu.render.sdf import render_sdf_implicit
            if img_x is None:
                img_x = np.asarray(
                    jax.jit(lambda s: render_sdf_implicit(s, N, STEPS))(
                        scene)).reshape(N, N)
            img_p = np.asarray(jax.jit(
                lambda pv: render_sdf_pallas(pv, N, STEPS, 1.2, TILE,
                                             TILE, cfg[0], 16,
                                             jnp.float32, *cfg[1:]))(v))
            d = np.abs(img_p - img_x)
            flips = d > 1.0  # hit/miss flip (image range ~0.2 vs ~200)
            return (flips.mean() < 1.5e-3
                    and d[~flips].max() < 0.05)
        except Exception as e:  # Mosaic compile/runtime failure = fail
            print(f"bench: parity probe raised for {cfg} "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
            crashed.append({"config": _cfg_dict(cfg), "stage": "parity",
                            "error": f"{type(e).__name__}: {e}"[:300]})
            return False

    def _cfg_dict(cfg):
        return {"coarse": cfg[0], "bands": cfg[1], "relax": cfg[2],
                "unimodal": cfg[3], "split": cfg[4] if len(cfg) > 4 else 0}

    # Candidate configs. Round 5 demoted the round-4 work-elimination
    # knobs that lost on chip (bands: 3x slower -- sub-tile loops stall
    # the VPU; relax/unimodal: ~2x -- the two-carry relaxed march costs
    # more per step than the crawl it saves; measured in
    # docs/benchmarks.md). The cone prepass stays: it is nearly free
    # and converges silhouette rays the plain march cannot.
    # split>0 = the round-5 two-pass compacted march (silhouette
    # divergence, docs/render.md): pass 1 caps every tile at `split`
    # steps, survivors are compacted and finish in a dense tail kernel.
    candidates = [(0, 1, 1.0, False, 0), (8, 1, 1.0, False, 0),
                  (0, 1, 1.0, False, 16), (0, 1, 1.0, False, 32),
                  (8, 1, 1.0, False, 16)]
    # a split point must leave tail steps (test overrides shrink STEPS)
    candidates = [c for c in candidates if c[4] < STEPS]
    crashed = []
    losses = {cfg: make_loss(*cfg) for cfg in candidates}
    vgs = {cfg: jax.value_and_grad(losses[cfg]) for cfg in candidates}
    perturb_v = (lambda v0, loss, k: v0 + loss * 1e-12
                 + 1e-6 * k.astype(jnp.float32))
    quick = []
    for cfg in candidates:
        try:
            t, _ = _bench_scan(vgs[cfg], v, perturb_v,
                               k_lo=max(K_LO // 4, 2),
                               k_hi=max(K_HI // 4, 5), windows=1)
        except Exception as e:
            # a candidate that fails to compile on this backend must
            # only lose the tuning race, never zero the benchmark --
            # the plain (0, 1) config is the always-works floor
            print(f"bench: candidate {cfg} failed to run "
                  f"({type(e).__name__}: {e}); skipping", file=sys.stderr)
            crashed.append({"config": _cfg_dict(cfg), "stage": "quick",
                            "error": f"{type(e).__name__}: {e}"[:300]})
            continue
        quick.append((t, cfg))
    quick.sort(key=lambda q: q[0])

    chosen = None
    for _, cfg in quick:
        if parity_ok(cfg, vgs[cfg]):
            chosen = cfg
            break
    if chosen is None:
        print(json.dumps({"metric": "rays_per_s_per_chip_fwd_bwd",
                          "value": 0.0, "unit": "rays/s",
                          "vs_baseline": 0.0,
                          "crashed_configs": crashed,
                          "error": "parity gate failed for all configs"}))
        return 1

    # --- timing: interleaved Pallas/XLA windows -------------------------
    def perturb_scene(s0, loss, k):
        return SDFScene(center=s0.center,
                        radius=s0.radius + loss * 1e-12
                        + 1e-6 * k.astype(jnp.float32),
                        ambient=s0.ambient, gain=s0.gain, light=s0.light)

    res = _bench_paths(
        {"pallas": (vgs[chosen], v, perturb_v),
         "xla": (jax.value_and_grad(xla_loss), scene, perturb_scene)},
        k_lo=K_LO, k_hi=K_HI, windows=WINDOWS)
    t_pallas, spread_p, rej_p = res["pallas"]
    t_xla, spread_x, rej_x = res["xla"]

    # forward-only row for cross-round comparability: r1-r3 numbers were
    # fwd-only by accident (the DCE'd backward, see benchmarks.md); this
    # keeps a directly comparable figure next to the honest fwd+bwd one.
    t_fwd, spread_f, _ = _bench_paths(
        {"fwd": (lambda pv: (losses[chosen](pv), pv * 0.0), v, perturb_v)},
        k_lo=K_LO, k_hi=K_HI, windows=max(WINDOWS // 2, 2))["fwd"]

    degraded = max(spread_p, spread_x) > SPREAD_LOUD
    if degraded:
        print(f"bench: DEGRADED RUN -- spread pallas "
              f"{100*spread_p:.1f}% / xla {100*spread_x:.1f}% exceeds "
              f"{100*SPREAD_LOUD:.0f}% after outlier rejection; the "
              f"value below is statistically weak", file=sys.stderr)

    out = {
        "metric": "rays_per_s_per_chip_fwd_bwd",
        "value": round(rays / t_pallas, 1),
        "unit": "rays/s",
        "vs_baseline": round(t_xla / t_pallas, 4),
        "spread_pct": round(100.0 * max(spread_p, spread_x), 2),
        "spread_pallas_pct": round(100.0 * spread_p, 2),
        "spread_xla_pct": round(100.0 * spread_x, 2),
        "windows": WINDOWS,
        "rejected_windows": rej_p + rej_x,
        "config": _cfg_dict(chosen),
        # r1-r3 rows were forward-only by accident (DCE'd backward,
        # docs/benchmarks.md); this keeps a directly comparable figure
        "fwd_only_rays_per_s": round(rays / t_fwd, 1),
        "fwd_only_spread_pct": round(100.0 * spread_f, 2),
    }
    if crashed:
        out["crashed_configs"] = crashed
    if degraded:
        out["degraded"] = True
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
