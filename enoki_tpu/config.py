"""Typed runtime configuration for enoki-tpu.

The reference (mitsuba-renderer/enoki) configures itself almost entirely at
compile time (CMakeLists.txt:10-16, fwd.h:129-235) plus a handful of runtime
knobs: ``cuda_set_log_level`` 0-5 (cuda.h:195-200), the AD tape's
``set_log_level`` / ``set_graph_simplification`` (autodiff.cpp:254,262).

In a JAX world compile-time configuration is meaningless; we expose one small
typed config object with the same observable knobs:

* ``log_level``   -- 0..5, mirrors cuda_set_log_level semantics:
                     0 = silent, 1 = kernel launches (jit compiles),
                     2 = compile timings, 3 = lowered HLO dumps,
                     4 = trace appends (jaxpr lines), 5 = everything.
* ``approx``      -- use fast polynomial/HW-approx transcendentals where a
                     choice exists (mirrors ENOKI_APPROX_DEFAULT, fwd.h:235).
* ``default_dtype`` -- f32 by default; bf16 supported on compute paths.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List


@dataclasses.dataclass
class Config:
    log_level: int = int(os.environ.get("ENOKI_TPU_LOG_LEVEL", "0"))
    approx: bool = os.environ.get("ENOKI_TPU_APPROX", "1") == "1"
    default_dtype: str = os.environ.get("ENOKI_TPU_DTYPE", "float32")
    # Debug bounds mode for UNMASKED scatter/scatter_add: the fast default
    # (promise_in_bounds, matching the reference's UB for out-of-range
    # st.global) becomes deterministic "drop" so an out-of-range index
    # cannot silently corrupt memory. Read at TRACE time: flip it before
    # (re)jitting. Env: ENOKI_TPU_DEBUG_BOUNDS=1.
    debug_bounds: bool = os.environ.get("ENOKI_TPU_DEBUG_BOUNDS", "0") == "1"
    # First-eval segmentation for the lazy trace: schedules longer than
    # this many ops compile as CHAINED sub-programs of ~this size instead
    # of one giant XLA program. XLA compile time is superlinear in program
    # size, so segmenting a 10k-op chain cuts the first-eval stall at the
    # cost of k dispatches (values at segment boundaries materialize; XLA
    # cannot fuse across them). 0 = always one fused program (the
    # default: peak steady-state throughput). Read at schedule-compile
    # time. Env: ENOKI_TPU_MAX_FUSED_OPS.
    max_fused_ops: int = int(os.environ.get("ENOKI_TPU_MAX_FUSED_OPS", "0"))
    # Trace export cache: directory for jax.export artifacts of compiled
    # trace programs, keyed by the C++ structural hash. A cold process
    # then skips the jax re-trace of a big op chain entirely
    # (deserialize is ~free; combined with the persistent compile cache
    # the 10k-op first light drops from ~7 s to ~0.5 s -- measured in
    # docs/benchmarks.md). Default "auto" = ON under the version-keyed
    # user cache dir (~/.cache/enoki_tpu/export/<tag>, see cache.py --
    # the reference's kernel cache is likewise zero-config,
    # jit.cu:1239-1331); "off" disables; any other value is a literal
    # directory. Env: ENOKI_TPU_EXPORT_CACHE.
    trace_export_dir: str = os.environ.get("ENOKI_TPU_EXPORT_CACHE", "auto")
    # LRU size bound for each persistent cache directory (cache.py).
    # Env: ENOKI_TPU_CACHE_MAX_BYTES.
    cache_max_bytes: int = int(os.environ.get(
        "ENOKI_TPU_CACHE_MAX_BYTES", str(2 << 30)))
    # Pre-eval hooks, analog of cuda_register_callback (jit.cu:1552): callables
    # run by runtime.eval_hooks() call sites (e.g. before a benchmark step).
    eval_callbacks: List[Callable[[], None]] = dataclasses.field(default_factory=list)


config = Config()


def set_log_level(level: int) -> None:
    """Analog of cuda_set_log_level (cuda.h:195, jit.cu:1540)."""
    if not 0 <= level <= 5:
        raise ValueError("log level must be in 0..5")
    config.log_level = level


def log_level() -> int:
    return config.log_level


def log(level: int, msg: str, *args) -> None:
    if config.log_level >= level:
        print("[enoki-tpu] " + (msg % args if args else msg))


def register_callback(fn: Callable[[], None]) -> None:
    """Analog of cuda_register_callback (jit.cu:1552)."""
    config.eval_callbacks.append(fn)


def run_callbacks() -> None:
    for fn in config.eval_callbacks:
        fn()
