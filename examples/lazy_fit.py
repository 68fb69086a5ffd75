"""Inverse rendering on the lazy trace: the FloatD optimization loop.

The reference's flagship AD workflow (docs/autodiff.rst) is gradient
descent over `FloatD = DiffArray<CUDAArray<float>>` scene parameters:
every step re-traces the render, `backward(loss)` walks the tape, and
the kernel cache makes step 2+ compile-free. This example is that loop
on `enoki_tpu.trace`: recover a sphere's (cx, cy, radius) from a target
image using the trace-level AD (requires_grad / backward / gradient),
with the ENTIRE forward+loss fused per step and every step after the
first a structural-hash cache hit for both the forward program and its
VJP.

The render is written against the PUBLIC ops surface (one source, every
backend): the same `_render` also runs eagerly on jnp inputs.

Run: python examples/lazy_fit.py [n] [steps]
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import enoki_tpu.trace as tr
from enoki_tpu import ops
from enoki_tpu.trace import LazyArray


def _render(cx, cy, radius, n, extent=1.2):
    """Sphere render against the unified ops surface, recorded on the
    lazy trace (the pixel grid is built with LazyArray.arange, so the
    whole pipeline is a trace program regardless of the parameter
    types; tests/sphere.cpp:58-88 math)."""
    idx = LazyArray.arange(n * n)
    col = (idx % n).cast(np.float32)
    row = (idx / n).cast(np.int32).cast(np.float32)
    step = 2.0 * extent / (n - 1)
    px = col * step - extent - cx
    py = row * step - extent - cy
    oz = -1.0

    b = 2.0 * oz
    c = px * px + py * py + oz * oz - radius * radius
    disc = b * b - 4.0 * c
    valid = disc >= 0.0
    # safe_sqrt: the zero-at-boundary derivative discipline (sqrt of the
    # clamped discriminant would send 0 * inf = NaN into the backward)
    t = (-b + ops.safe_sqrt(disc)) * 0.5
    nz = ops.select(valid, oz + t, 0.0)
    nx = ops.select(valid, px, 0.0)
    ny = ops.select(valid, py, 0.0)
    lam = ops.clamp(nx * -1.0 + ny * -1.0 + nz * 2.0, 0.0, 1e9)
    return lam * 90.0 + 0.2


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    # target rendered at the true parameters
    true = dict(cx=0.12, cy=-0.08, radius=0.85)
    target = _render(LazyArray.full(true["cx"], 1),
                     LazyArray.full(true["cy"], 1),
                     LazyArray.full(true["radius"], 1), n).eval()

    # initial guess
    p = np.array([0.0, 0.0, 1.0], np.float32)  # cx, cy, r
    lr = np.array([4e-6, 4e-6, 2e-6], np.float32)

    t0 = time.perf_counter()
    losses = []
    for k in range(steps):
        tr.clear_gradients()
        cx = tr.requires_grad(LazyArray(p[0:1]))
        cy = tr.requires_grad(LazyArray(p[1:2]))
        r = tr.requires_grad(LazyArray(p[2:3]))
        img = _render(cx, cy, r, n)
        diff = img - target
        loss = (diff * diff).hsum() * (1.0 / (n * n))
        tr.backward(loss)  # tape walked in reverse; frees it
        g = np.array([tr.gradient(cx).numpy()[0],
                      tr.gradient(cy).numpy()[0],
                      tr.gradient(r).numpy()[0]], np.float32)
        p = p - lr * g * n * n / 4096.0
        losses.append(float(loss.numpy()[0]))
    dt = time.perf_counter() - t0

    hits, misses = tr.cache_stats()
    print(f"{steps} steps in {dt:.2f} s "
          f"({dt / steps * 1e3:.1f} ms/step incl. host loop); "
          f"executable cache: {hits} hits / {misses} misses")
    print(f"loss {losses[0]:.4f} -> {losses[-1]:.4f}")
    print(f"recovered (cx, cy, r) = ({p[0]:+.4f}, {p[1]:+.4f}, {p[2]:.4f})"
          f"  true = ({true['cx']:+.4f}, {true['cy']:+.4f}, "
          f"{true['radius']:.4f})")

    assert losses[-1] < losses[0] * 0.2, "optimization failed to converge"
    # compile count stays O(1): one fwd + one VJP structure, re-used by
    # every later step (the kernel-cache-hit property, docs/gpu.rst:268)
    assert misses <= 6, f"unexpected recompiles: {misses}"
    err = np.abs(p - np.array([true["cx"], true["cy"], true["radius"]]))
    print(f"abs parameter error: {err}")


if __name__ == "__main__":
    main()
