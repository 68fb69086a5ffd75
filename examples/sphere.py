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

    # warm both compilations (the reference's timings exclude PTX/SASS
    # compilation too -- its kernel cache is warm after the first frame)
    jax.block_until_ready(render_staged(scene, n))
    jax.block_until_ready(render_fused(scene, n))

    iters = 20

    t0 = clk()
    for _ in range(iters):
        image1 = render_staged(scene, n)
    jax.block_until_ready(image1)
    print(f"Separate kernels: {(clk() - t0) / iters * 1e3:.3f} ms",
          file=sys.stderr)
    write_ppm("sphere1.ppm", np.asarray(image1).reshape(n, n))

    t0 = clk()
    for _ in range(iters):
        image2 = render_fused(scene, n)
    jax.block_until_ready(image2)
    print(f"Combined kernels: {(clk() - t0) / iters * 1e3:.3f} ms",
          file=sys.stderr)
    write_ppm("sphere2.ppm", np.asarray(image2).reshape(n, n))


if __name__ == "__main__":
    main()
