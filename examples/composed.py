"""Composed-scene differentiable render -- the bring-your-own-SDF demo.

Sphere smoothly blended with a torus over a ground plane, rendered by the
generic megakernel factory, gradients w.r.t. all 12 parameters, PPM out.

Run: python examples/composed.py [n]
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from enoki_tpu.render import make_sdf_renderer, sdflib as sd
from enoki_tpu.render.io import write_ppm
from enoki_tpu.render.vec import Vec3


def scene_sdf(p, pv):
    sphere = sd.sd_sphere(p, Vec3(pv[5], pv[6], pv[7]), pv[8])
    torus = sd.sd_torus(p, Vec3(0.0, 0.0, 1.0), pv[9], pv[10])
    ground = sd.sd_plane(p, Vec3(0.0, -1.0, 0.0), pv[11])
    return sd.op_union(sd.op_smooth_union(sphere, torus, 0.1), ground)


PARAMS = jnp.asarray(
    # ambient gain light(x,y,z)    sphere(cx,cy,cz,r)     torus(R,r) plane
    [0.15, 40.0, -1.0, -1.0, 2.0, 0.1, -0.2, 0.3, 0.45, 0.55, 0.18, 1.05],
    jnp.float32)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    render, render_xla = make_sdf_renderer(scene_sdf, n_params=12)
    if jax.default_backend() not in ("tpu", "axon"):
        render = render_xla  # compiled Pallas kernels are TPU-only

    img = np.asarray(render(PARAMS, n))
    write_ppm("composed.ppm", img)
    print(f"wrote composed.ppm ({n}x{n}), mean {img.mean():.3f}")

    g = jax.grad(lambda v: jnp.mean(render(v, n)))(PARAMS)
    names = ["ambient", "gain", "lx", "ly", "lz", "cx", "cy", "cz",
             "radius", "torus_R", "torus_r", "plane"]
    print("d mean(image) / d theta:")
    for name, gi in zip(names, np.asarray(g)):
        print(f"  {name:8s} {gi:+.5f}")


if __name__ == "__main__":
    main()
