"""Per-round chip battery: compile + run EVERY megakernel variant
config on the real TPU, plus the 9-flow drive and the TPU-only tests,
and write a structured CHIPCHECK_r{N}.json (verdict r4 item 5).

The reference bar is the multi-ISA ctest matrix
(/root/reference/tests/CMakeLists.txt:65-131: every test at 5-7 ISA
levels); here the "ISA levels" are the megakernel's lowering-relevant
axes -- (coarse, bands, relax, unimodal, dtype, tile) -- each compiled
and executed ON CHIP in its OWN SUBPROCESS, so a Mosaic abort
(SIGABRT, e.g. the BENCH_r04 `limits[i] <= dim(i)` crash) becomes a
red JSON entry instead of a dead battery or a stderr curiosity.

Run:  PYTHONPATH=/root/repo python tools/chipcheck.py [--round N]
      [--quick]  (--quick: plain + one config per axis, for smoke use)

Exit code: number of failing entries (0 = all green).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N, STEPS = 512, 48  # small enough to compile fast, real Mosaic lowering


def _one_config(cfg_json: str) -> int:
    """Subprocess body: compile + run fwd+bwd for one config on the
    default (TPU) platform, print the gradient vector as JSON."""
    cfg = json.loads(cfg_json)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from enoki_tpu.render.sdf import SDFScene
    from enoki_tpu.render.pallas_kernels import (scene_to_vec,
                                                 render_sdf_pallas)

    v = scene_to_vec(SDFScene.reference())
    dtype = jnp.bfloat16 if cfg["dtype"] == "bf16" else jnp.float32
    tile_r, tile_c = cfg["tile"]

    def loss(pv):
        return jnp.mean(render_sdf_pallas(
            pv, N, STEPS, 1.2, tile_r, tile_c, cfg["coarse"], 16, dtype,
            cfg["bands"], cfg["relax"], cfg["unimodal"]))

    val, grad = jax.jit(jax.value_and_grad(loss))(v)
    g = np.asarray(grad)[:9]
    assert np.isfinite(float(val)) and np.isfinite(g).all(), \
        f"non-finite output: loss={val} grad={g}"
    print("GRADS " + json.dumps([float(val)] + [float(x) for x in g]))
    return 0


def _configs(quick: bool):
    """The variant matrix. Full mode: the 4 march knobs crossed at the
    default tile/f32 (16 configs), then dtype and tile axes swept from
    the plain config, plus bf16 x each single knob (lowering
    interactions with the narrow-dtype path)."""
    base = dict(coarse=0, bands=1, relax=1.0, unimodal=False,
                dtype="f32", tile=(128, 128))
    cfgs = []

    def add(**kw):
        c = dict(base, **kw)
        if c not in cfgs:
            cfgs.append(c)

    if quick:
        add()
        add(coarse=8)
        add(bands=8)
        add(relax=1.6)
        add(unimodal=True)
        add(dtype="bf16")
        add(tile=(64, 256))
        return cfgs
    for coarse in (0, 8):
        for bands in (1, 8):
            for relax in (1.0, 1.6):
                for unimodal in (False, True):
                    add(coarse=coarse, bands=bands, relax=relax,
                        unimodal=unimodal)
    for knob in (dict(), dict(coarse=8), dict(bands=8), dict(relax=1.6),
                 dict(unimodal=True)):
        add(dtype="bf16", **knob)
    for tile in ((64, 256), (256, 128), (64, 128)):
        add(tile=tile)
    return cfgs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", help="(internal) run one config subprocess")
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--timeout", type=int, default=420,
                    help="per-entry timeout (s); first compile ~20-40s")
    args = ap.parse_args()
    if args.one:
        return _one_config(args.one)

    # the XLA oracle for the parity gate, computed once (CPU jax: the
    # loose tolerances below absorb the cpu-vs-tpu rounding delta)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401
    import numpy as np

    from enoki_tpu.render.sdf import SDFScene, sdf_loss_implicit
    lx, gx = jax.jit(jax.value_and_grad(
        lambda s: sdf_loss_implicit(s, N, STEPS)))(SDFScene.reference())
    oracle = np.array([float(lx), float(gx.center.x), float(gx.center.y),
                       float(gx.center.z), float(gx.radius),
                       float(gx.ambient), float(gx.gain),
                       float(gx.light.x), float(gx.light.y),
                       float(gx.light.z)])

    env = dict(os.environ, PYTHONPATH=REPO + ":"
               + os.environ.get("PYTHONPATH", ""))
    entries = []

    def run_entry(name, cmd, check=None, config=None):
        t0 = time.time()
        try:
            p = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout, env=env, cwd=REPO)
            rc, out, err = p.returncode, p.stdout, p.stderr
        except subprocess.TimeoutExpired as e:
            rc = -1
            out = (e.stdout or b"").decode() if isinstance(
                e.stdout, bytes) else (e.stdout or "")
            err = f"timeout after {args.timeout}s"
        entry = {"name": name, "seconds": round(time.time() - t0, 1)}
        if config is not None:
            entry["config"] = config
        if rc != 0:
            entry["status"] = "fail"
            entry["error"] = (err or out).strip()[-400:]
            entry["rc"] = rc  # negative = killed by signal (SIGABRT=-6)
        else:
            problem = check(out) if check else None
            entry["status"] = "fail" if problem else "pass"
            if problem:
                entry["error"] = problem[:400]
        entries.append(entry)
        tag = entry["status"].upper()
        print(f"[{tag}] {name} ({entry['seconds']}s)"
              + (f" -- {entry['error'][:120]}" if "error" in entry
                 else ""), flush=True)

    # 1) the megakernel variant matrix
    for cfg in _configs(args.quick):
        cj = json.dumps(cfg)

        def check_grads(out, cfg=cfg):
            for line in out.splitlines():
                if line.startswith("GRADS "):
                    got = np.array(json.loads(line[6:]))
                    # trajectory-preserving f32 configs: tight;
                    # bf16 march: the policy tolerance (docs/benchmarks)
                    rtol = 0.2 if cfg["dtype"] == "bf16" else 2e-2
                    atol = rtol * max(1.0, np.abs(oracle).max())
                    if not np.allclose(got, oracle, rtol=rtol, atol=atol):
                        return (f"parity: got {got.round(4).tolist()} "
                                f"want {oracle.round(4).tolist()}")
                    return None
            return "no GRADS line in output"

        name = ("mk c{coarse} b{bands} r{relax} u{unimodal:d} "
                "{dtype} t{tile[0]}x{tile[1]}").format(**cfg)
        run_entry(name, [sys.executable, __file__, "--one", cj],
                  check=check_grads, config=cfg)

    # 2) the 9-flow end-to-end drive on the chip
    run_entry("drive_tpu (9 flows)",
              [sys.executable, os.path.join(REPO, "tools/drive_tpu.py")],
              check=lambda out: None if "ALL 9 FLOWS PASS" in out
              else "missing ALL 9 FLOWS PASS")

    # 3) the TPU-only tests (skipped in the CPU CI suite by design)
    env_tpu = dict(env, ENOKI_TPU_TEST_PLATFORM="axon,cpu")
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-m", "pytest", "-q",
         "tests/test_misc_parity.py::test_stochastic_round_pallas_hardware"],
        capture_output=True, text=True, timeout=args.timeout,
        env=env_tpu, cwd=REPO)
    entries.append({
        "name": "tpu-only: stochastic_round hardware PRNG",
        "seconds": round(time.time() - t0, 1),
        "status": "pass" if p.returncode == 0 and "1 passed"
                  in p.stdout else "fail",
        **({} if p.returncode == 0 else
           {"error": (p.stderr or p.stdout).strip()[-400:]})})
    print(f"[{entries[-1]['status'].upper()}] {entries[-1]['name']}",
          flush=True)

    n_fail = sum(e["status"] != "pass" for e in entries)
    report = {"round": args.round, "n": N, "steps": STEPS,
              "quick": args.quick,
              "summary": {"pass": len(entries) - n_fail, "fail": n_fail},
              "entries": entries}
    out_path = os.path.join(REPO, f"CHIPCHECK_r{args.round:02d}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out_path}: {len(entries) - n_fail} pass / "
          f"{n_fail} fail")
    return n_fail


if __name__ == "__main__":
    sys.exit(main())
