"""Round-5 on-chip decomposition of the fwd+bwd megakernel pair.

Times, with the same two-point scan-chained method as bench.py (the
only timing that survives the axon tunnel), each piece in isolation:

  fwd       -- the forward megakernel alone (render + residual write)
  bwd       -- the backward megakernel alone (fixed g/ts inputs,
               chained on the produced dp so it cannot be DCE'd)
  pair      -- jax.value_and_grad of mean(render) (the official scope)
  xla_pair  -- the jnp baseline pair (for the ratio)

Run: PYTHONPATH=/root/repo python tools/profile_r5.py [--config c,b,r,u]
"""

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import _bench_scan  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--coarse", type=int, default=0)
    ap.add_argument("--bands", type=int, default=1)
    ap.add_argument("--relax", type=float, default=1.0)
    ap.add_argument("--unimodal", action="store_true")
    ap.add_argument("--split", type=int, default=0)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--klo", type=int, default=100)
    ap.add_argument("--khi", type=int, default=400)
    args = ap.parse_args()

    from enoki_tpu.render.sdf import SDFScene, sdf_loss_implicit
    from enoki_tpu.render.pallas_kernels import (
        scene_to_vec, render_sdf_pallas, _sdf_fwd_call, _sdf_vjp_bwd)

    N, STEPS = args.n, args.steps
    rays = N * N
    TILE = min(128, N)
    scene = SDFScene.reference()
    v = scene_to_vec(scene)
    kw = dict(k_lo=args.klo, k_hi=args.khi, windows=args.windows)
    cfg = (args.coarse, args.bands, args.relax, args.unimodal,
           args.split)
    perturb = (lambda v0, loss, k: v0 + loss * 1e-12
               + 1e-6 * k.astype(jnp.float32))

    def loss(pv):
        return jnp.mean(render_sdf_pallas(pv, N, STEPS, 1.2, TILE, TILE,
                                          cfg[0], 16, jnp.float32,
                                          cfg[1], cfg[2], cfg[3],
                                          cfg[4]))

    rows = {}

    # fwd only
    t, sp = _bench_scan(lambda pv: (loss(pv), pv * 0.0), v, perturb, **kw)
    rows["fwd"] = (t, sp)

    # bwd only: fixed cotangent + residual, chained on dp
    img, ts = jax.jit(lambda pv: _sdf_fwd_call(
        pv, N, STEPS, 1.2, TILE, TILE, cfg[0], 16, jnp.float32,
        cfg[1], cfg[2], cfg[3], cfg[4]))(v)
    g = jnp.full((N, N), 1.0 / rays, jnp.float32)

    def bwd_only(pv):
        (dp,) = _sdf_vjp_bwd(N, STEPS, 1.2, TILE, TILE, cfg[0], 16,
                             jnp.float32, cfg[1], cfg[2], cfg[3], 0,
                             (pv, ts), g)
        s = jnp.sum(dp)
        return s, pv * 0.0 + s * 0.0

    t, sp = _bench_scan(bwd_only, v, perturb, **kw)
    rows["bwd"] = (t, sp)

    # the official fwd+bwd pair
    t, sp = _bench_scan(jax.value_and_grad(loss), v, perturb, **kw)
    rows["pair"] = (t, sp)

    # xla baseline pair
    def perturb_scene(s0, loss_, k):
        return SDFScene(center=s0.center,
                        radius=s0.radius + loss_ * 1e-12
                        + 1e-6 * k.astype(jnp.float32),
                        ambient=s0.ambient, gain=s0.gain, light=s0.light)

    t, sp = _bench_scan(jax.value_and_grad(
        lambda s: sdf_loss_implicit(s, N, STEPS)), scene, perturb_scene,
        **kw)
    rows["xla_pair"] = (t, sp)

    print(f"config coarse={cfg[0]} bands={cfg[1]} relax={cfg[2]} "
          f"unimodal={cfg[3]} split={cfg[4]}  n={N} steps={STEPS}")
    for name, (t, sp) in rows.items():
        print(f"{name:9s} {t*1e6:9.1f} us/step  {rays/t/1e9:6.2f} G rays/s"
              f"  spread {100*sp:5.1f}%")
    fb = rows["fwd"][0] + rows["bwd"][0]
    print(f"fwd+bwd sum {fb*1e6:9.1f} us vs pair {rows['pair'][0]*1e6:9.1f}"
          f" us (overhead {100*(rows['pair'][0]-fb)/fb:+.1f}%)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
