"""On-chip config sweep for the SDF megakernel (round 4 tuning).

Sweeps the work-elimination knobs -- cone-prepass block ``coarse``,
sub-tile ``bands``, march ``chunk``, tile shape, march ``dtype`` --
with the same scan-chained two-point timing as bench.py (the only
timing that survives the axon tunnel's early-acking block_until_ready),
and prints a ranked table. Run on the real chip:

    PYTHONPATH=/root/repo python tools/tune_megakernel.py [--quick]

The winner's config belongs in bench.py / docs/benchmarks.md (stamped
with the round it was measured in).
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import _bench_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="3 windows, shorter chains (sweep mode)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes + 1-step windows: validates every "
                         "config's plumbing (compiles, runs, parity) "
                         "without meaningful timing -- run it in "
                         "interpret mode on CPU before spending chip "
                         "time on the real sweep")
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()
    if args.smoke:
        args.n, args.steps = min(args.n, 256), min(args.steps, 8)

    from enoki_tpu.render.sdf import SDFScene
    from enoki_tpu.render.pallas_kernels import (scene_to_vec,
                                                 render_sdf_pallas)

    N, STEPS = args.n, args.steps
    rays = N * N
    v = scene_to_vec(SDFScene.reference())

    # stage 1: coarse x bands at the r3-fastest tile (128x128, chunk 16)
    configs = []
    for coarse in (0, 8, 16):
        for bands in (1, 4, 8, 16):
            configs.append(dict(tile=128, tile_c=128, coarse=coarse,
                                chunk=16, bands=bands, dtype="f32"))
    # stage 2 refinements around the expected winner
    for chunk in (8, 32):
        configs.append(dict(tile=128, tile_c=128, coarse=8, chunk=chunk,
                            bands=8, dtype="f32"))
    for tile in ((32, 128), (64, 128), (256, 128)):
        configs.append(dict(tile=tile[0], tile_c=tile[1], coarse=8,
                            chunk=16, bands=max(1, tile[0] // 16),
                            dtype="f32"))
    # bf16 march row (config 4 "fp32 + bf16")
    configs.append(dict(tile=128, tile_c=128, coarse=8, chunk=16,
                        bands=1, dtype="bf16"))
    configs.append(dict(tile=128, tile_c=128, coarse=8, chunk=16,
                        bands=8, dtype="bf16"))
    # stage 3: over-relaxed sphere tracing + convex divergence exit
    # (round 4 work elimination; trajectory-changing, so the table's
    # parity column matters -- bench.py only picks parity-green configs)
    for relax in (1.2, 1.4, 1.6, 1.9):
        for unimodal in (False, True):
            configs.append(dict(tile=128, tile_c=128, coarse=8, chunk=16,
                                bands=8, dtype="f32", relax=relax,
                                unimodal=unimodal))
    configs.append(dict(tile=128, tile_c=128, coarse=8, chunk=16, bands=8,
                        dtype="f32", relax=1.0, unimodal=True))
    configs.append(dict(tile=128, tile_c=128, coarse=0, chunk=16, bands=1,
                        dtype="f32", relax=1.6, unimodal=True))

    if args.smoke:
        kw = dict(k_lo=2, k_hi=5, windows=1)
        # smoke shapes: drop configs whose tile does not divide the
        # shrunken n (they are exercised by the real sweep's shapes)
        configs = [c for c in configs
                   if args.n % c["tile"] == 0 and args.n % c["tile_c"] == 0]
    elif args.quick:
        kw = dict(k_lo=50, k_hi=200, windows=3)
    else:
        kw = dict(k_lo=100, k_hi=400, windows=5)

    # parity oracle (same gates as bench.py)
    from enoki_tpu.render.sdf import sdf_loss_implicit
    lx, gx = jax.jit(jax.value_and_grad(
        lambda s: sdf_loss_implicit(s, N, STEPS)))(SDFScene.reference())
    gx_vec = np.array([gx.center.x, gx.center.y, gx.center.z, gx.radius,
                       gx.ambient, gx.gain, gx.light.x, gx.light.y,
                       gx.light.z])

    def parity(loss):
        lp, gp = jax.jit(jax.value_and_grad(loss))(v)
        return bool(
            np.isclose(float(lp), float(lx), rtol=1e-3, atol=1e-5)
            and np.allclose(np.asarray(gp)[:9], gx_vec, rtol=1e-2,
                            atol=1e-3 * max(1.0, np.abs(gx_vec).max())))

    rows = []
    for cfg in configs:
        dt = jnp.float32 if cfg["dtype"] == "f32" else jnp.bfloat16

        def loss(pv, cfg=cfg, dt=dt):
            return jnp.mean(render_sdf_pallas(
                pv, N, STEPS, 1.2, cfg["tile"], cfg["tile_c"],
                cfg["coarse"], cfg["chunk"], dt, cfg["bands"],
                cfg.get("relax", 1.0), cfg.get("unimodal", False)))

        try:
            cfg["parity"] = parity(loss) if cfg["dtype"] == "f32" else "n/a"
            t, spread = _bench_scan(
                jax.value_and_grad(loss), v,
                lambda v0, l, k: v0 + l * 1e-12
                + 1e-6 * k.astype(jnp.float32), **kw)
            grs = rays / t / 1e9
            rows.append((grs, spread, cfg))
            print(f"{grs:7.2f} G rays/s  spread {100*spread:5.1f}%  {cfg}",
                  flush=True)
        except Exception as e:  # config may not fit VMEM etc.
            print(f"   FAIL  {cfg}: {type(e).__name__}: {e}", flush=True)

    rows.sort(reverse=True, key=lambda r: r[0])
    print("\n=== ranked ===")
    for grs, spread, cfg in rows[:8]:
        print(f"{grs:7.2f} G rays/s  spread {100*spread:5.1f}%  {cfg}")
    # the headline number must be achievable by a CORRECT rendering:
    # only parity-green f32 rows qualify (a parity=False row may be the
    # fastest misrendering on the card; bf16 rows have their own
    # accuracy policy and are reported separately)
    green = [r for r in rows if r[2].get("parity") is True]
    if green:
        best = green[0]
        print(json.dumps({"best_g_rays_s": round(best[0], 3),
                          "spread_pct": round(100 * best[1], 2),
                          "config": best[2]}))
    elif rows:
        print(json.dumps({"best_g_rays_s": 0.0,
                          "error": "no parity-green config",
                          "fastest_any": rows[0][2]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
