"""enoki-tpu: a TPU-native structured-vectorization + differentiation
framework with the capabilities of mitsuba-renderer/enoki.

The reference realizes "one generic program, many execution strategies"
through C++ template metaprogramming (SIMD packets, dynamic packet loops,
a PTX trace-JIT, an AD tape). On TPU the same capability set maps to:

  wide arrays          -> jnp arrays (XLA vectorizes onto the 8x128 VPU)
  recursive packets    -> XLA tiling / Pallas block specs
  DynamicArray+vectorize -> jnp + vmap/jit
  CUDA trace-JIT       -> jax tracing + XLA fusion (+ Pallas megakernels)
  AD tape              -> jax.grad / custom_vjp
  vectorized vcalls    -> lax.switch / sort-based partition dispatch
  ENOKI_STRUCT         -> registered pytree dataclasses
  (new) multi-device   -> jax.sharding Mesh + shard_map + psum

Layout:
  ops/      flat op set: router, horizontal ops, transcendentals, special fns
  types/    Complex, Quaternion, Matrix, transforms, color, SH, Morton,
            PCG32, integer division
  struct/   pytree struct support, masks, vectorize, vectorized method calls
  ad/       differentiation helpers (gradient/detach/safe_mul/graphviz)
  runtime/  introspection: whos, log levels, HLO dumps, kernel cache stats
  render/   the north-star workload: differentiable sphere/SDF renderer,
            jnp reference path and Pallas megakernel
  dist/     device-mesh sharding, distributed render/train steps
"""

__version__ = "0.4.0"

from . import config  # noqa: F401
from . import cache  # noqa: F401

# Zero-config persistent compile cache (round 4): the reference's kernel
# cache needs no setup (jit.cu:1239-1331); ours shouldn't either. Honors
# user/jax settings and ENOKI_TPU_COMPILE_CACHE=off (see cache.py).
cache.enable_default_compile_cache()
from . import ops  # noqa: F401
from . import types  # noqa: F401
from . import struct  # noqa: F401
from . import ad  # noqa: F401
from . import runtime  # noqa: F401
from . import render  # noqa: F401
from . import dist  # noqa: F401
from . import interop  # noqa: F401
from .config import set_log_level, log_level  # noqa: F401


def __getattr__(name):
    # `trace` (the lazy-array runtime over the native C++ graph core) is
    # imported on first use: it compiles native/trace.cpp with g++ on a
    # cold cache, which package import should not pay for.
    if name == "trace":
        import importlib

        mod = importlib.import_module(".trace", __name__)
        globals()["trace"] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
