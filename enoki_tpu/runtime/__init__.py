"""Runtime introspection + observability.

Maps the reference's runtime tooling to the XLA world (SURVEY §5):

  cuda_whos() live-variable table (jit.cu:1564)   -> whos(): jax.live_arrays
  cuda_set_log_level (cuda.h:195)                 -> config.set_log_level
  set_label / PTX comments (cuda.h:957)           -> label() = jax.named_scope
  cuda_printf (array_router.h:972)                -> printf() = jax.debug.print
  log>=3 full PTX dumps (jit.cu:1254)             -> dump_hlo()/dump_jaxpr()
  kernel cache + hash (jit.cu:1239)               -> cache_stats(), XLA
                                                     persistent compilation
                                                     cache (enable_compile_cache)
  cuda_mem_get_info (common.cu:120)               -> memory_stats()
  per-kernel timings at log>=2 (jit.cu:1254-1330) -> compile_timings()
  allocator watermarks (jit.cu:199,1619)          -> memory_stats() peaks
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..config import config, set_log_level, log_level, log

label = jax.named_scope
printf = jax.debug.print


def whos(print_out: bool = True) -> str:
    """Live-array table with per-device memory accounting -- the analog of
    ``cuda_whos()`` (jit.cu:1564-1634)."""
    rows = []
    total = 0
    for arr in jax.live_arrays():
        try:
            nbytes = arr.nbytes
            shape = tuple(arr.shape)
            dtype = str(arr.dtype)
            devs = ",".join(sorted(d.platform + str(d.id)
                                   for d in arr.sharding.device_set))
        except Exception:  # deleted/donated arrays
            continue
        total += nbytes
        rows.append((shape, dtype, nbytes, devs))
    lines = ["  Shape                Type        Bytes        Devices",
             "  " + "=" * 60]
    for shape, dtype, nbytes, devs in sorted(rows, key=lambda r: -r[2]):
        lines.append(f"  {str(shape):<20} {dtype:<11} {nbytes:<12} {devs}")
    lines.append("  " + "=" * 60)
    lines.append(f"  Total: {total / 1e6:.3f} MB in {len(rows)} arrays")
    out = "\n".join(lines)
    if print_out:
        print(out)
    return out


def memory_stats(device=None) -> Dict[str, Any]:
    """Per-device memory info -- analog of cuda_mem_get_info
    (common.cu:120) + allocator watermarks (jit.cu:1619-1631)."""
    dev = device or jax.devices()[0]
    stats = dev.memory_stats() or {}
    return {
        "bytes_in_use": stats.get("bytes_in_use"),
        "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
        "bytes_limit": stats.get("bytes_limit"),
        "raw": stats,
    }


def dump_jaxpr(f: Callable, *args, **kw) -> str:
    """Trace dump -- the log-level-4 'trace appends' view (jit.cu trace)."""
    return str(jax.make_jaxpr(f, **kw)(*args))


def dump_hlo(f: Callable, *args, stage: str = "hlo", **kw) -> str:
    """Lowered (stage='hlo') or optimized/compiled (stage='optimized')
    module text -- the log-level-3 'full PTX' analog (jit.cu:1254)."""
    lowered = jax.jit(f, **kw).lower(*args)
    if stage == "hlo":
        return lowered.as_text()
    return lowered.compile().as_text()


def compile_timings(f: Callable, *args, **kw) -> Dict[str, float]:
    """Trace/lower/compile wall times -- mirrors the reference's published
    JIT overheads (trace->PTX 541us, ptxas 43ms; BASELINE.md §B)."""
    t0 = time.perf_counter()
    jaxpr = jax.make_jaxpr(f, **kw)(*args)
    t1 = time.perf_counter()
    lowered = jax.jit(f, **kw).lower(*args)
    t2 = time.perf_counter()
    compiled = lowered.compile()
    t3 = time.perf_counter()
    # warm-call (cache hit) time
    t4 = time.perf_counter()
    jax.jit(f, **kw).lower(*args).compile()
    t5 = time.perf_counter()
    return {
        "trace_s": t1 - t0,
        "lower_s": t2 - t1,
        "compile_s": t3 - t2,
        "cache_hit_s": t5 - t4,
        "n_eqns": sum(1 for _ in jaxpr.eqns),
    }


def cache_stats() -> Dict[str, Any]:
    """Live-array counters (jax exposes no public jit-cache hit counter;
    the lazy trace runtime's enoki_tpu.trace.cache_stats() reports real
    hits/misses for its executable cache, jit.cu:1239-1331 analog)."""
    live = jax.live_arrays()
    return {"live_arrays": len(live),
            "live_bytes": sum(a.nbytes for a in live)}


def enable_compile_cache(path: str = "/tmp/enoki_tpu_xla_cache") -> None:
    """Persistent compilation cache -- strictly better than the reference's
    in-memory kernel cache that dies with the process (jit.cu:179;
    SURVEY §5 checkpoint/resume)."""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def profiler_trace(path: str = "/tmp/enoki_tpu_trace"):
    """Context manager: capture a profiler trace (jax.profiler)."""
    return jax.profiler.trace(path)


def eval_shapes(f: Callable, *args):
    """Shape/dtype evaluation without compute (abstract eval)."""
    return jax.eval_shape(f, *args)


def vectorization_report(f: Callable, *args, **kw) -> Dict[str, Any]:
    """Inspect the optimized module for de-vectorization smells.

    The reference's test harness counts every scalar-fallback code path
    taken (ENOKI_TRACK_SCALAR, fwd.h:208-233) and reports "N/M tests were
    vectorized" so a change that silently de-vectorizes an op fails
    review. The XLA analog: a compiled module that round-trips through
    the host (custom-calls / infeed / outfeed) or fails to fuse has
    silently left the vector units. Returns counts; see
    assert_vectorized for the assertion flavor.
    """
    txt = dump_hlo(f, *args, stage="optimized", **kw)
    report = {
        "fusions": txt.count(" fusion("),
        "custom_calls": txt.count("custom-call"),
        "host_transfers": txt.count("infeed") + txt.count("outfeed"),
        "while_loops": txt.count(" while("),
        "lines": txt.count("\n"),
    }
    return report


def assert_vectorized(f: Callable, *args, allow_custom_calls: int = 0,
                      **kw) -> Dict[str, Any]:
    """Assert the compiled module never leaves the device (no host
    callbacks / infeed / outfeed) -- the ENOKI_TRACK_SCALAR regression
    gate for TPU programs. Returns the vectorization_report."""
    rep = vectorization_report(f, *args, **kw)
    # explicit raises: bare asserts vanish under python -O, silently
    # disabling the gate
    if rep["host_transfers"] != 0:
        raise AssertionError(f"compiled module transfers to host: {rep}")
    if rep["custom_calls"] > allow_custom_calls:
        raise AssertionError(
            f"unexpected custom-calls (host callbacks?): {rep}")
    return rep


from . import checkpoint  # noqa: E402,F401
