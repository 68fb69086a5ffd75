"""Sphere ray tracer on the lazy trace runtime -- the docs/gpu.rst
workflow end to end.

The reference's GPU chapter builds the sphere demo statement by statement
on `FloatC` arrays: every line appends to the trace, nothing runs until
the image is read, and the whole render fuses into one kernel
(docs/gpu.rst; tests/sphere.cpp math). This example does exactly that on
``enoki_tpu.trace.LazyArray`` -- eager-looking code, one fused XLA
program at the first read, executable-cache hit on the second frame.

Run: python examples/lazy_sphere.py [n]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import enoki_tpu.trace as tr
from enoki_tpu.trace import LazyArray


def render_lazy(n: int, cx=0.0, cy=0.0, radius=1.0, extent=1.2):
    """tests/sphere.cpp:58-88 semantics, statement at a time."""
    # linspace + meshgrid pixel grid (sphere.cpp:130-131): x varies along
    # columns, y along rows, flat (n*n,) layout
    idx = LazyArray.arange(n * n)
    col = (idx % n).cast(np.float32)
    row = (idx / n).cast(np.int32).cast(np.float32)
    step = 2.0 * extent / (n - 1)
    px = col * step - extent
    py = row * step - extent

    # rays: o = (px, py, -1), d = (0, 0, 1)
    ox, oy = px - cx, py - cy        # relative to sphere center
    oz = LazyArray.full(-1.0, 1)

    # quadratic: a = 1, b = 2*oz, c = |o|^2 - r^2
    b = oz * 2.0
    c = ox * ox + oy * oy + oz * oz - radius * radius
    discrim = b * b - c * 4.0
    valid = discrim >= 0.0
    t = (-b + tr.sqrt(tr.maximum(discrim, 0.0))) * 0.5

    # hit normal (= hit position for the origin-centered unit sphere)
    nx, ny, nz = ox, oy, oz + t
    zero = LazyArray.full(0.0, 1)
    nx = tr.select(valid, nx, zero)
    ny = tr.select(valid, ny, zero)
    nz = tr.select(valid, nz, zero)

    # shade: 0.2 + max(dot(n, L), 0) * 90, L = (-1, -1, 2)
    lam = tr.maximum(nx * -1.0 + ny * -1.0 + nz * 2.0, 0.0)
    return lam * 90.0 + 0.2


def render_lazy_struct(n: int, cx=0.0, cy=0.0, radius=1.0, extent=1.2):
    """The same program in Ray-STRUCT form -- the Ray3fC analog: an
    ENOKI_STRUCT of lazy arrays flows through intersect + shade and the
    whole thing still fuses into one program (array_macro.h:216
    instantiates Ray for the lazy backend; struct helpers dispatch per
    leaf here)."""
    import dataclasses

    import jax

    from enoki_tpu.render.vec import Vec3, dot3
    from enoki_tpu.struct import enoki_struct, select_struct

    @enoki_struct
    class Ray:
        o: Vec3
        d: Vec3

    idx = LazyArray.arange(n * n)
    col = (idx % n).cast(np.float32)
    row = (idx / n).cast(np.int32).cast(np.float32)
    step = 2.0 * extent / (n - 1)
    ray = Ray(o=Vec3(col * step - extent - cx, row * step - extent - cy,
                     LazyArray.full(-1.0, 1)),
              d=Vec3(LazyArray.full(0.0, 1), LazyArray.full(0.0, 1),
                     LazyArray.full(1.0, 1)))

    b = 2.0 * dot3(ray.o, ray.d)
    c = dot3(ray.o, ray.o) - radius * radius
    disc = b * b - 4.0 * c
    valid = disc >= 0.0
    t = (-b + tr.sqrt(tr.maximum(disc, 0.0))) * 0.5
    hit = ray.o + ray.d * t
    zero3 = Vec3(LazyArray.full(0.0, 1), LazyArray.full(0.0, 1),
                 LazyArray.full(0.0, 1))
    nrm = select_struct(valid, hit, zero3)
    lam = tr.maximum(nrm.x * -1.0 + nrm.y * -1.0 + nrm.z * 2.0, 0.0)
    return lam * 90.0 + 0.2


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    img = render_lazy(n)
    print("before eval:", img)              # still lazy
    t0 = time.perf_counter()
    out = img.numpy()                       # one fused program
    t_first = time.perf_counter() - t0
    # (on remote-compile platforms the very first compile of a process
    # carries the service cold-start; steady-state compiles are ~1-2 s)
    print(f"first frame (compile + run): {t_first * 1e3:8.1f} ms")

    t0 = time.perf_counter()
    out2 = render_lazy(n, cx=0.05).numpy()  # same structure, new literal?
    t_second = time.perf_counter() - t0
    print(f"second frame               : {t_second * 1e3:8.1f} ms "
          f"(cache: {tr.cache_stats()})")

    # the Ray-struct form (Ray3fC analog) fuses identically
    s0 = tr.stats()["n_evals"]
    out_s = render_lazy_struct(n).numpy()
    assert tr.stats()["n_evals"] == s0 + 1, "struct form did not fuse"
    err_s = np.abs(out_s - out).max()
    print(f"Ray-struct form: one fused program, max |err| {err_s:.2e}")

    # parity vs the jit-path renderer
    import jax
    from enoki_tpu.render import SphereScene, render_fused
    ref = np.asarray(render_fused(SphereScene.reference(), n))
    err = np.abs(out - ref).max()
    print(f"max |err| vs render_fused  : {err:.2e}")
    print(f"image mean {out.mean():.4f}  (hit fraction "
          f"{(out > 0.3).mean():.3f})")

    from enoki_tpu.render.io import write_ppm
    write_ppm("sphere_lazy.ppm", out.reshape(n, n))
    print("wrote sphere_lazy.ppm")


if __name__ == "__main__":
    main()
