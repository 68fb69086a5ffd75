"""Sphere ray tracer mini-app -- parity with reference tests/sphere.cpp.

Renders 1024x1024, times the staged (separate kernels, materialized
intermediates) vs fused (one kernel) paths, and writes sphere1.ppm /
sphere2.ppm exactly like the reference's main() (tests/sphere.cpp:129-151).

Run: python examples/sphere.py  (uses whatever backend jax selects)
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from enoki_tpu.render import SphereScene, render_fused, render_staged
from enoki_tpu.render.io import write_ppm


def clk():
    return time.perf_counter()


def main():
    scene = SphereScene.reference()
    n = 1024

    import dataclasses

    import jax.numpy as jnp

    iters = 100

    def bench(renderer):
        # chained scan: each frame's scene depends on the previous frame's
        # mean, forcing real serial device execution; one readback fence
        # amortized over iters (remote platforms ack block_until_ready
        # early, so wall-clocking unchained calls measures dispatch only)
        @jax.jit
        def loop(scene):
            def step(carry, _):
                s = dataclasses.replace(
                    scene, radius=scene.radius + carry * 1e-12)
                img = renderer(s, n)
                return jnp.mean(img), None

            s, _ = jax.lax.scan(step, jnp.float32(0), None, length=iters)
            return s

        float(loop(scene))  # compile + warm
        t0 = clk()
        float(loop(scene))
        return (clk() - t0) / iters

    t_staged = bench(render_staged)
    print(f"Separate kernels: {t_staged * 1e3:.3f} ms", file=sys.stderr)
    write_ppm("sphere1.ppm",
              np.asarray(render_staged(scene, n)).reshape(n, n))

    t_fused = bench(render_fused)
    print(f"Combined kernels: {t_fused * 1e3:.3f} ms", file=sys.stderr)
    write_ppm("sphere2.ppm",
              np.asarray(render_fused(scene, n)).reshape(n, n))


if __name__ == "__main__":
    main()
