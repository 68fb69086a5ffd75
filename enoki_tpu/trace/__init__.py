"""Lazy trace-recording arrays over a native C++ graph runtime.

The enoki-parity story: the reference's ``CUDAArray<T>`` (cuda.h:206) is a
uint32 handle into a C++-owned variable table; every op appends a PTX
instruction template to a global trace and nothing executes until
``cuda_eval()`` fuses the live trace into one megakernel
(src/cuda/jit.cu:983-1508). ``LazyArray`` here is the same architecture
mapped to TPU: a uint32 handle into the native graph runtime
(native/trace.cpp -- C++ owns append/refcounts/dirty-tracking/scheduling/
structural hashing), with XLA as the code generator: ``eval()`` fetches the
C++ schedule, walks it ONCE per structural hash to build a jax function,
``jax.jit``-compiles it, and caches the executable by the C++-computed
hash. A retrace of the same program costs only C++ appends + one hash
lookup -- the analog of the reference's kernel-cache hit path
(docs/gpu.rst:268-271).

Why this exists next to plain jnp+jit: it gives enoki's *eager-looking,
lazily-fused* programming model (no explicit function boundaries, fusion
across statements, whos/dirty semantics) for code that wants it, while
``jax.jit`` remains the right tool for closed functions. Horizontal
reductions stay INSIDE the fused program (XLA fuses reductions; the
reference must break the kernel at every cub call, src/cuda/horiz.cu).
"""

from __future__ import annotations

import ctypes
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .build import load_library, load_pymod

_lib = load_library()
_nat = load_pymod()  # fastcall hot path (same .so, see build.py)

# ---------------------------------------------------------------------------
# dtypes and opcodes (shared convention with native/trace.cpp; the native
# side treats opcodes opaquely -- only 0 = evaluated leaf is special)
# ---------------------------------------------------------------------------

_DTYPES = [jnp.float32, jnp.float64, jnp.int32, jnp.uint32, jnp.bool_,
           jnp.bfloat16, jnp.int64, jnp.uint64, jnp.float16]
_FLOAT_CODES = (0, 1, 5, 8)  # f32 / f64 / bf16 / f16
_DTYPE_CODE = {jnp.dtype(d): i for i, d in enumerate(_DTYPES)}


def _code_of(dtype) -> int:
    return _DTYPE_CODE[jnp.dtype(dtype)]


# unsigned carriers for reinterpreting literal bit patterns per item size
_LIT_CARRIER = {2: np.uint16, 4: np.uint32, 8: np.uint64}


_LIT_BITS_CACHE: dict = {}
# (code, value[, signbit]) -> shared size-1 literal LazyArray (see
# LazyArray._coerce); cleared by reset()
_LITERAL_ARRAYS: dict = {}


def _literal_bits(value, code) -> int:
    """Encode a Python scalar as its dtype bit pattern, zero-extended to
    64 bits. Bit-exact for every dtype in _DTYPES (a double carrier would
    silently truncate int64/uint64 literals >= 2^53). Cached: scalar
    constants repeat heavily in traced programs and the numpy round trip
    costs ~2 us."""
    # numpy scalars normalize to Python scalars first: np.float32(-0.0)
    # is not `float`, so it would otherwise fall into the plain (code,
    # value) key branch where -0.0 == 0.0 collide on the cached +0.0 bits
    if isinstance(value, np.floating):
        value = float(value)
    elif isinstance(value, np.integer):
        value = int(value)
    # -0.0 and 0.0 are equal (same dict key) but have different bit
    # patterns: disambiguate float keys by their sign
    k = (code, value, math.copysign(1.0, value)) \
        if isinstance(value, float) else (code, value)
    b = _LIT_BITS_CACHE.get(k)
    if b is not None:
        return b
    npdt = np.dtype(_DTYPES[code])
    if npdt == np.bool_:
        b = int(bool(value))
    else:
        v = np.asarray(value).astype(npdt)  # wraps/rounds per dtype rules
        b = int(v.view(_LIT_CARRIER[npdt.itemsize]))
    if len(_LIT_BITS_CACHE) < (1 << 16):
        _LIT_BITS_CACHE[k] = b
    return b


class Op:
    """Opcode table. Each entry maps to a jnp implementation in _OP_IMPL."""
    (LEAF, ADD, SUB, MUL, DIV, NEG, ABS, MIN, MAX, FMA, SQRT, RSQRT, RCP,
     FLOOR, CEIL, ROUND, TRUNC, EXP, EXP2, LOG, LOG2, SIN, COS, TAN, ASIN,
     ACOS, ATAN, SINH, COSH, TANH, ERF, ATAN2, POW, MOD, EQ, NE, LT, LE, GT,
     GE, AND, OR, XOR, NOT, SELECT, CAST, IOTA, GATHER, SCATTER, SCATTER_ADD,
     HSUM, HPROD, HMIN, HMAX, ALL, ANY, COUNT, PSUM, REVERSE, SHL, SHR,
     POPCNT, CBRT, SIGN, COPYSIGN, LOG1P, EXPM1, ASINH, ACOSH, ATANH,
     ERFC, LGAMMA, ISNAN, ISINF, ISFINITE, COMPRESS, FMOD,
     BITCAST, CLZ, PRINT) = range(80)


def _bcast(a, b):
    return jnp.broadcast_arrays(a, b) if a.shape != b.shape else (a, b)


_OP_IMPL = {
    Op.ADD: lambda a, b: a + b,
    Op.SUB: lambda a, b: a - b,
    Op.MUL: lambda a, b: a * b,
    Op.DIV: lambda a, b: a / b,
    Op.NEG: lambda a: -a,
    Op.ABS: lambda a: jnp.abs(a),
    Op.MIN: lambda a, b: jnp.minimum(a, b),
    Op.MAX: lambda a, b: jnp.maximum(a, b),
    Op.FMA: lambda a, b, c: a * b + c,
    Op.SQRT: lambda a: jnp.sqrt(a),
    Op.RSQRT: lambda a: jax.lax.rsqrt(a),
    Op.RCP: lambda a: 1.0 / a,
    Op.FLOOR: lambda a: jnp.floor(a),
    Op.CEIL: lambda a: jnp.ceil(a),
    Op.ROUND: lambda a: jnp.round(a),
    Op.TRUNC: lambda a: jnp.trunc(a),
    Op.EXP: lambda a: jnp.exp(a),
    Op.EXP2: lambda a: jnp.exp2(a),
    Op.LOG: lambda a: jnp.log(a),
    Op.LOG2: lambda a: jnp.log2(a),
    Op.SIN: lambda a: jnp.sin(a),
    Op.COS: lambda a: jnp.cos(a),
    Op.TAN: lambda a: jnp.tan(a),
    Op.ASIN: lambda a: jnp.arcsin(a),
    Op.ACOS: lambda a: jnp.arccos(a),
    Op.ATAN: lambda a: jnp.arctan(a),
    Op.SINH: lambda a: jnp.sinh(a),
    Op.COSH: lambda a: jnp.cosh(a),
    Op.TANH: lambda a: jnp.tanh(a),
    Op.ERF: lambda a: jax.scipy.special.erf(a),
    Op.ATAN2: lambda a, b: jnp.arctan2(a, b),
    Op.POW: lambda a, b: jnp.power(a, b),
    Op.MOD: lambda a, b: jnp.mod(a, b),
    Op.EQ: lambda a, b: a == b,
    Op.NE: lambda a, b: a != b,
    Op.LT: lambda a, b: a < b,
    Op.LE: lambda a, b: a <= b,
    Op.GT: lambda a, b: a > b,
    Op.GE: lambda a, b: a >= b,
    Op.AND: lambda a, b: a & b,
    Op.OR: lambda a, b: a | b,
    Op.XOR: lambda a, b: a ^ b,
    Op.NOT: lambda a: ~a,
    Op.SELECT: lambda m, a, b: jnp.where(m, *_bcast(a, b)),
    # clamp like the eager router (jnp.take mode="clip", the documented
    # "XLA semantics"): plain [] would wrap negatives numpy-style and
    # the same ops.gather call would read a different element per backend
    Op.GATHER: lambda src, idx: jnp.take(src, idx, axis=0, mode="clip"),
    Op.SCATTER: lambda tgt, idx, val: tgt.at[idx].set(val),
    Op.SCATTER_ADD: lambda tgt, idx, val: tgt.at[idx].add(val),
    Op.HSUM: lambda a: jnp.sum(a, keepdims=True),
    Op.HPROD: lambda a: jnp.prod(a, keepdims=True),
    Op.HMIN: lambda a: jnp.min(a, keepdims=True),
    Op.HMAX: lambda a: jnp.max(a, keepdims=True),
    Op.ALL: lambda a: jnp.all(a, keepdims=True),
    Op.ANY: lambda a: jnp.any(a, keepdims=True),
    Op.COUNT: lambda a: jnp.sum(a.astype(jnp.int32), keepdims=True),
    Op.PSUM: lambda a: jnp.cumsum(a),
    Op.REVERSE: lambda a: a[::-1],
    Op.SHL: lambda a, b: a << b,
    Op.SHR: lambda a, b: a >> b,
    Op.POPCNT: lambda a: jax.lax.population_count(a),
    Op.CBRT: lambda a: jnp.cbrt(a),
    # reference sign semantics: sign(0) = 1, sign(-0.0) = -1 (the
    # branchless copysign form, matching enoki_tpu.ops.sign -- the sign
    # BIT decides for floats, a < 0 for ints)
    Op.SIGN: lambda a: (jnp.copysign(jnp.ones_like(a), a)
                        if jnp.issubdtype(a.dtype, jnp.floating)
                        else jnp.where(a < 0, -1, 1).astype(a.dtype)),
    Op.COPYSIGN: lambda a, b: jnp.copysign(a, b),
    Op.LOG1P: lambda a: jnp.log1p(a),
    Op.EXPM1: lambda a: jnp.expm1(a),
    Op.ASINH: lambda a: jnp.arcsinh(a),
    Op.ACOSH: lambda a: jnp.arccosh(a),
    Op.ATANH: lambda a: jnp.arctanh(a),
    Op.ERFC: lambda a: jax.scipy.special.erfc(a),
    Op.LGAMMA: lambda a: jax.scipy.special.gammaln(a),
    Op.ISNAN: lambda a: jnp.isnan(a),
    Op.ISINF: lambda a: jnp.isinf(a),
    Op.ISFINITE: lambda a: jnp.isfinite(a),
}


def _compress_impl(x, m):
    from ..ops.horiz import compress as _c
    return _c(x, m)[0]


_OP_IMPL[Op.COMPRESS] = _compress_impl
# C fmod semantics (sign of the dividend), distinct from Op.MOD's floored
# python % -- matching eager ops.fmod and the reference's std::fmod
# (tests/float.cpp:285)
_OP_IMPL[Op.FMOD] = lambda a, b: jnp.fmod(a, b)
# leading-zero count (lzcnt, array_fallbacks.h:259; tzcnt/log2i compose
# from it in ops.router's lazy branches)
_OP_IMPL[Op.CLZ] = lambda a: jax.lax.clz(a)

# name -> (opcode, arity, out_kind) for the functional API.
# out_kind: None = same dtype as input, "float" = float-promoted (f32 for
# integer inputs, so the declared trace dtype matches what the jnp
# implementation actually returns), "bool" = predicate.
_MATH_OPS = {
    "sqrt": (Op.SQRT, 1, "float"), "rsqrt": (Op.RSQRT, 1, "float"),
    "rcp": (Op.RCP, 1, "float"),
    "floor": (Op.FLOOR, 1, None), "ceil": (Op.CEIL, 1, None),
    "round": (Op.ROUND, 1, None), "trunc": (Op.TRUNC, 1, None),
    "exp": (Op.EXP, 1, "float"), "exp2": (Op.EXP2, 1, "float"),
    "log": (Op.LOG, 1, "float"), "log2": (Op.LOG2, 1, "float"),
    "sin": (Op.SIN, 1, "float"), "cos": (Op.COS, 1, "float"),
    "tan": (Op.TAN, 1, "float"), "asin": (Op.ASIN, 1, "float"),
    "acos": (Op.ACOS, 1, "float"), "atan": (Op.ATAN, 1, "float"),
    "sinh": (Op.SINH, 1, "float"), "cosh": (Op.COSH, 1, "float"),
    "tanh": (Op.TANH, 1, "float"), "erf": (Op.ERF, 1, "float"),
    "abs": (Op.ABS, 1, None), "atan2": (Op.ATAN2, 2, "float"),
    "pow": (Op.POW, 2, None),
    "minimum": (Op.MIN, 2, None), "maximum": (Op.MAX, 2, None),
    "fmadd": (Op.FMA, 3, None), "popcnt": (Op.POPCNT, 1, None),
    "cbrt": (Op.CBRT, 1, "float"), "sign": (Op.SIGN, 1, None),
    "copysign": (Op.COPYSIGN, 2, "float"),
    "log1p": (Op.LOG1P, 1, "float"), "expm1": (Op.EXPM1, 1, "float"),
    "asinh": (Op.ASINH, 1, "float"), "acosh": (Op.ACOSH, 1, "float"),
    "atanh": (Op.ATANH, 1, "float"), "erfc": (Op.ERFC, 1, "float"),
    "lgamma": (Op.LGAMMA, 1, "float"),
    "isnan": (Op.ISNAN, 1, "bool"), "isinf": (Op.ISINF, 1, "bool"),
    "isfinite": (Op.ISFINITE, 1, "bool"),
}

# ---------------------------------------------------------------------------
# runtime state on the Python side: device buffers + executable cache
# ---------------------------------------------------------------------------

_BUFFERS: dict = {}          # var id -> jnp.ndarray (materialized)
_EXE_CACHE: dict = {}        # structural hash -> jitted callable
_CACHE_HITS = 0
_CACHE_MISSES = 0
# PRINT ops: var id -> format string (jax.debug.print style). Consulted
# at program-build time; entries are overwritten when a recycled id is
# reused for a new PRINT and cleared by reset().
_PRINT_FMT: dict = {}
# scatter ops pending rebind: scatter var id -> target var id
_SCATTER_TARGET: dict = {}
# target var id -> newest pending scatter into it (chain tail). Consecutive
# scatters into one target CHAIN (each depends on the previous) so a
# k-instance vcall dispatch fuses into ONE program instead of forcing
# k eval boundaries.
_PENDING_SCATTER: dict = {}
# structure-probe depth (trace.call's all-null dispatch introspection):
# while > 0, scatter/printf record PURE ops -- no side-effect marks, no
# pending-rebind bookkeeping, no hazard-flush evals -- so tracing a
# callee only to learn its result pytree/dtypes can never make anything
# observable fire (the recorded ops die unreferenced with the probe's
# handles). The reference resolves this statically from the return type
# (array_call.h:17-191); a probe is the dynamic-language equivalent and
# must be equally invisible.
_PROBE_DEPTH = 0


import contextlib


@contextlib.contextmanager
def structure_probe():
    """Trace a callee for its result STRUCTURE only: inside this context
    scatter/printf register no side effects and trigger no evals."""
    global _PROBE_DEPTH
    _PROBE_DEPTH += 1
    try:
        yield
    finally:
        _PROBE_DEPTH -= 1


def cache_stats():
    """(hits, misses) of the structural-hash executable cache."""
    return _CACHE_HITS, _CACHE_MISSES


def clear_cache():
    global _CACHE_HITS, _CACHE_MISSES
    _EXE_CACHE.clear()
    _CACHE_HITS = 0
    _CACHE_MISSES = 0


def reset():
    """Drop the whole trace state (tests)."""
    import sys
    # invalidate shared literal handles BEFORE the native reset so their
    # __del__s don't dec-ref recycled ids later
    for r in _LITERAL_ARRAYS.values():
        r.index = 0
    _LITERAL_ARRAYS.clear()
    _BUFFERS.clear()
    _PRINT_FMT.clear()
    _SCATTER_TARGET.clear()
    _PENDING_SCATTER.clear()
    _GRAD_ENABLED.clear()
    _GRADS.clear()
    _ON_TAPE.clear()
    clear_tape()
    _VERSION.clear()
    clear_cache()
    callmod = sys.modules.get(__name__ + ".call")
    if callmod is not None:
        callmod.clear_partition_cache()
    _lib.et_reset()
    # the C-side shared-literal cache after the native reset: its ids
    # were dropped wholesale by et_reset, so no dec-refs here
    _nat.lit_cache_clear()


def set_log_level(level: int):
    """0-5 like cuda_set_log_level (cuda.h:195-200)."""
    _lib.et_set_log_level(level)


def whos() -> str:
    """Live-variable table (cuda_whos, jit.cu:1564-1634)."""
    buf = ctypes.create_string_buffer(1 << 20)
    _lib.et_whos(buf, len(buf))
    return buf.value.decode()


def stats() -> dict:
    vals = [ctypes.c_uint64() for _ in range(5)]
    _lib.et_stats(*[ctypes.byref(v) for v in vals])
    keys = ["n_vars", "n_appends", "n_evals", "n_freed", "peak_vars"]
    d = dict(zip(keys, [v.value for v in vals]))
    d["cache_hits"], d["cache_misses"] = cache_stats()
    return d


# ---------------------------------------------------------------------------
# evaluation: C++ schedule -> jax function -> cached executable
# ---------------------------------------------------------------------------


class _Compiled:
    """Everything derived from one schedule structure (per structural
    hash): the jitted value program, plus the AD-support variants the
    tape needs to hand out gradients of intermediate outputs."""

    __slots__ = ("exe", "fn", "cut_fn", "cut_slots", "depth",
                 "lit_key", "lit_streams")

    def __init__(self, exe, fn, cut_fn, cut_slots, depth):
        self.exe = exe            # jax.jit(fn)
        self.fn = fn              # (leaf_args, lits) -> outputs
        self.cut_fn = cut_fn      # (leaf_args, lits, cuts) -> outputs,
        #                           downstream reads of cut outputs take
        #                           the passed-in value
        self.cut_slots = cut_slots  # output slots with inexact dtype
        self.depth = depth        # max #cut-points below any output
        # literal-stream device arrays of the LAST eval, keyed by the
        # raw (bits, codes) bytes: a cache-hit re-dispatch with
        # bit-identical literals (the common case -- the hash is
        # structural precisely so literals can change, but they rarely
        # do) skips 9 host->device transfers per eval
        self.lit_key = None
        self.lit_streams = None


def _emit_op(opcode, dt, size, args, vid, fmts):
    """Emit one non-leaf schedule entry as jnp -- the SINGLE place every
    interpreter (the fused _body and the chunked cf) lowers opcodes, so
    special-lowered ops (IOTA/CAST/BITCAST/PRINT) can never drift
    between the two paths (r4 review: the chunked copy was missing
    PRINT and crashed on printf + max_fused_ops)."""
    if opcode == Op.IOTA:
        return jnp.arange(size, dtype=dt)
    if opcode == Op.CAST:
        return args[0].astype(dt)
    if opcode == Op.BITCAST:
        return jax.lax.bitcast_convert_type(args[0], dt)
    if opcode == Op.PRINT:
        # in-program printf (cuda_printf analog, jit.cu:863-916): prints
        # from INSIDE the fused program via jax.debug.print (TPU:
        # outfeed) without breaking fusion; value = first operand
        jax.debug.print(fmts[vid], *args)
        return args[0]
    return _OP_IMPL[opcode](*args)


def _compile_schedule(entries, out_positions):
    """Build the jax-traceable programs from a schedule walk.

    Called once per structural hash (cache miss); the compiled record is
    reused for every trace with the same structure.
    """
    # snapshot PRINT formats NOW: _body re-traces later (AD-segment VJP
    # build, cut_fn, export) after _eval_ids has consumed the live
    # _PRINT_FMT entries, so the closure must own its formats
    fmts = {e[0]: _PRINT_FMT.get(e[0], "{}")
            for e in entries if e[1] == Op.PRINT}

    def _body(leaf_args, lits, cut_map):
        """Schedule interpreter. ``cut_map`` (pos -> value) substitutes
        the value downstream consumers see at output cut points while
        the computed value is still emitted -- this is what lets the AD
        tape treat every externally-held output as its own node."""
        vals = [None] * len(entries)
        emitted = [None] * len(entries)
        leaf_i = 0
        lit_i = [0] * len(_DTYPES)  # per-dtype cursor into `lits`
        for i, e in enumerate(entries):
            (vid, opcode, dtype_c, size, dep_pos, literal, is_lit,
             is_data) = e
            dt = _DTYPES[dtype_c]
            if is_lit:
                # literal values are runtime scalar inputs (not baked into
                # the executable): changing a constant reuses the compiled
                # program, and no program is ever fully constant-foldable.
                # `lits` is a tuple of per-dtype streams (bit-exact; the
                # dtype sequence is part of the structural hash)
                v = jnp.full((size,), lits[dtype_c][lit_i[dtype_c]])
                lit_i[dtype_c] += 1
            elif is_data:
                v = leaf_args[leaf_i]
                leaf_i += 1
            else:
                args = [vals[p] for p in dep_pos if p != 0xFFFFFFFF]
                v = _emit_op(opcode, dt, size, args, vid, fmts)
            emitted[i] = v
            vals[i] = cut_map[i] if i in cut_map else v
        return tuple(emitted[p] for p in out_positions)

    def fn(leaf_args, lits):
        return _body(leaf_args, lits, {})

    # cut slots: output slots whose value is differentiable (inexact)
    cut_slots = tuple(k for k, p in enumerate(out_positions)
                      if entries[p][2] in _FLOAT_CODES)
    cut_pos = {out_positions[k]: j for j, k in enumerate(cut_slots)}

    def cut_fn(leaf_args, lits, cuts):
        return _body(leaf_args, lits,
                     {p: cuts[j] for p, j in cut_pos.items()})

    # output-dependency depth: the number of back-substitution rounds a
    # segment VJP needs so cotangents chain through outputs that feed
    # other outputs within the same program (nilpotent, exact)
    od = [0] * len(entries)
    for i, e in enumerate(entries):
        m = 0
        for p in e[4]:
            if p != 0xFFFFFFFF:
                m = max(m, od[p] + (1 if p in cut_pos else 0))
        od[i] = m
    depth = max((od[p] for p in cut_pos), default=0)

    from ..config import config
    if config.max_fused_ops and len(entries) > config.max_fused_ops:
        exe = _chunked_exe(entries, out_positions, config.max_fused_ops)
    else:
        exe = jax.jit(fn)
    return _Compiled(exe, fn, cut_fn, cut_slots, depth)


def _chunked_exe(entries, out_positions, chunk: int):
    """First-eval segmentation (config.max_fused_ops): compile the
    schedule as CHAINED sub-programs of ~`chunk` ops instead of one
    giant XLA program. XLA compile time is superlinear in program size
    (the 10,444-op chain compiles ~14 s whole vs ~2 s in 2k-op
    segments, tools/jit_overhead.py --seg), so this trades steady-state
    fusion (values materialize at segment boundaries) for a much
    smaller first-light stall. Structure-cached like the fused exe."""
    SENT = 0xFFFFFFFF
    n = len(entries)
    # PRINT formats, snapshotted exactly like _compile_schedule's _body
    fmts = {e[0]: _PRINT_FMT.get(e[0], "{}")
            for e in entries if e[1] == Op.PRINT}
    bounds = [(s, min(s + chunk, n)) for s in range(0, n, chunk)]
    imports = []
    for (s, e) in bounds:
        need = set()
        for i in range(s, e):
            for p in entries[i][4]:
                if p != SENT and p < s:
                    need.add(p)
        imports.append(sorted(need))
    wanted = set(out_positions)
    for imp in imports:
        wanted.update(imp)
    exports = [sorted(p for p in range(s, e) if p in wanted)
               for (s, e) in bounds]
    # per-chunk starting cursors into the leaf list / per-dtype literal
    # streams (both are consumed in schedule order)
    leaf_off = [0] * len(bounds)
    lit_off = [None] * len(bounds)
    li, cur = 0, [0] * len(_DTYPES)
    for ci, (s, e) in enumerate(bounds):
        leaf_off[ci] = li
        lit_off[ci] = list(cur)
        for i in range(s, e):
            if entries[i][6]:
                cur[entries[i][2]] += 1
            elif entries[i][7]:
                li += 1

    def make(ci):
        s, e = bounds[ci]
        imp, exp = imports[ci], exports[ci]
        l0, c0 = leaf_off[ci], lit_off[ci]

        def cf(ext_vals, leaf_args, lits):
            vals = dict(zip(imp, ext_vals))
            leaf_i = l0
            lit_i = list(c0)
            for i in range(s, e):
                (vid, opcode, dtype_c, size, dep_pos, literal, is_lit,
                 is_data) = entries[i]
                dt = _DTYPES[dtype_c]
                if is_lit:
                    v = jnp.full((size,), lits[dtype_c][lit_i[dtype_c]])
                    lit_i[dtype_c] += 1
                elif is_data:
                    v = leaf_args[leaf_i]
                    leaf_i += 1
                else:
                    args = [vals[p] for p in dep_pos if p != SENT]
                    v = _emit_op(opcode, dt, size, args, vid, fmts)
                vals[i] = v
            return tuple(vals[p] for p in exp)

        return jax.jit(cf), imp, exp

    fns = [make(ci) for ci in range(len(bounds))]

    def exe(leaf_args, lits):
        env = {}
        for cf, imp, exp in fns:
            outs = cf(tuple(env[p] for p in imp), leaf_args, lits)
            for p, v in zip(exp, outs):
                env[p] = v
        return tuple(env[p] for p in out_positions)

    return exe


def _read_schedule(n_entries):
    """Bulk schedule fetch (one C call + numpy views; a per-entry ctypes
    walk costs ~17 us/entry, 178 ms for a 10k-op first eval)."""
    n = max(n_entries, 1)
    u32, i32, u64 = ctypes.c_uint32, ctypes.c_int32, ctypes.c_uint64
    ids_b = (u32 * n)()
    opc_b = (i32 * n)()
    dtc_b = (i32 * n)()
    siz_b = (u64 * n)()
    dep_b = (u32 * (4 * n))()
    lit_b = (u64 * n)()
    flg_b = (ctypes.c_uint8 * n)()
    got = _lib.et_schedule_read(ids_b, opc_b, dtc_b, siz_b, dep_b, lit_b,
                                flg_b, n)
    if got != n_entries:  # explicit: bare asserts vanish under -O
        raise RuntimeError(f"schedule read mismatch: {got} != {n_entries}")
    # .tolist() once: per-element numpy scalar indexing costs ~2 us each
    ids = np.frombuffer(ids_b, np.uint32, n_entries).tolist()
    opcs = np.frombuffer(opc_b, np.int32, n_entries).tolist()
    dtcs = np.frombuffer(dtc_b, np.int32, n_entries).tolist()
    sizes = np.frombuffer(siz_b, np.uint64, n_entries).tolist()
    deps = np.frombuffer(dep_b, np.uint32,
                         4 * n_entries).reshape(-1, 4).tolist()
    lits = np.frombuffer(lit_b, np.uint64, n_entries).tolist()
    flags = np.frombuffer(flg_b, np.uint8, n_entries).tolist()
    entries = [(ids[i], opcs[i], dtcs[i], sizes[i], tuple(deps[i]),
                lits[i], flags[i] & 1, flags[i] >> 1)
               for i in range(n_entries)]
    n_out = _lib.et_schedule_num_outputs()
    outs = [_lib.et_schedule_output(i) for i in range(n_out)]
    return entries, outs


def _collect_literals(n, comp=None):
    """Literal values of the current schedule as runtime inputs: one
    typed stream per dtype, reconstructed bit-exactly from the 64-bit
    patterns the native side carries (no f64->f32 squeeze, no mod-2^32
    truncation of 64-bit integers).

    When ``comp`` is given and the raw (bits, codes) bytes match its
    last eval's, the cached device streams are returned -- one memcmp
    instead of nine host->device transfers (re-dispatching an unchanged
    program is the hot loop; a changed literal misses and re-uploads)."""
    cap = max(n, 1)
    bbuf = (ctypes.c_uint64 * cap)()
    cbuf = (ctypes.c_int32 * cap)()
    n_lit = _lib.et_schedule_literals(bbuf, cbuf, cap)
    bits = np.frombuffer(bbuf, np.uint64, n_lit)
    codes = np.frombuffer(cbuf, np.int32, n_lit)
    key = (bits.tobytes(), codes.tobytes())
    if comp is not None and comp.lit_key == key:
        return comp.lit_streams
    streams = []
    for code, dt in enumerate(_DTYPES):
        sel = bits[codes == code]
        npdt = np.dtype(dt)
        if npdt == np.bool_:
            arr = sel.astype(np.bool_)
        else:
            arr = sel.astype(_LIT_CARRIER[npdt.itemsize]).view(npdt)
        streams.append(jnp.asarray(arr))
    streams = tuple(streams)
    if comp is not None:
        comp.lit_key = key
        comp.lit_streams = streams
    return streams


def _load_or_export(tag, fn, fallback, args, install):
    """Shared export-cache engine (config.trace_export_dir): load the
    jax.export artifact named ``tag`` or export ``fn`` traced on
    ``args``; returns an executable (the loaded/exported program,
    jit-wrapped for cached dispatch, or ``fallback``). ``install(exe)``
    re-points the caller's cache slot -- used to un-poison it when a
    loaded artifact fails at call time (e.g. platform mismatch, which
    jax.export only reports on the first call). Corrupt artifacts are
    deleted so a later process can re-export them."""
    import os

    from .. import cache as _cache

    d = _cache.export_dir()

    def wrap(rt, path=None):
        # jit the call so steady-state re-dispatch stays on the cached-
        # executable path (a bare Exported.call rebuilds its machinery
        # per invocation, ~10x slower dispatch)
        jitted = jax.jit(lambda *a: rt.call(*a))

        def exe(*a):
            try:
                return jitted(*a)
            except (ValueError, TypeError, RuntimeError) as e:
                # platform/shape mismatch or XLA runtime failure of the
                # exported program (XlaRuntimeError subclasses
                # RuntimeError): warn, drop the artifact so peers stop
                # loading it, and fall back to the in-process jit. Other
                # exceptions (user errors, KeyboardInterrupt) propagate.
                import warnings
                warnings.warn(
                    f"enoki_tpu export-cache artifact failed at call "
                    f"time ({type(e).__name__}: {e}); falling back to "
                    f"in-process jit", RuntimeWarning)
                if path is not None:
                    try:
                        os.remove(path)
                    except OSError:
                        pass
                install(fallback)
                return fallback(*a)

        return exe

    try:
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, tag + ".jaxexp")
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    rt = jax.export.deserialize(f.read())
            except Exception:
                os.remove(path)  # corrupt/stale: let someone re-export
                return fallback
            return wrap(rt, path)
        exported = jax.export.export(jax.jit(fn))(*args)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(exported.serialize())
        os.replace(tmp, path)
        _cache.evict_lru(d)
        # run the CURRENT call through the just-exported program too --
        # the export already traced/lowered the chain; going back to the
        # plain jit path would trace it a second time
        return wrap(exported)
    except Exception:
        return fallback


def _key_tag(key) -> str:
    """Stable string form of an executable-cache key: hex for the plain
    C++ structural hash; tuple keys (hash, print-format signature --
    debug programs) append a digest of the fmt signature.  The digest
    must be process-stable (NOT built-in hash(), which is
    PYTHONHASHSEED-randomized for strings): AD-segment export tags for
    printf-bearing programs are cross-process cache keys."""
    if isinstance(key, int):
        return f"{key:016x}"
    h, sig = key
    import hashlib
    d = hashlib.blake2s(repr(sig).encode(), digest_size=4).hexdigest()
    return f"{h:016x}p{d}"


def _export_enabled():
    from .. import cache as _cache
    from ..config import config

    # segmentation configured: a monolithic exported program would
    # silently override max_fused_ops (and pay the whole-program
    # compile the knob exists to avoid)
    return bool(_cache.export_dir()) and not config.max_fused_ops


def _export_cache_swap(key, comp, leaves, lits):
    """Trace export cache for the forward program: on the first miss
    for a structure, either load a serialized jax.export artifact
    (skipping the jax re-trace of the whole op chain -- deserialization
    is ~free vs seconds of tracing for 10k-op programs) or export the
    freshly built program for the next process. Returns a replacement
    executable or None; failures fall back to the in-process jit."""
    if not _export_enabled() or not isinstance(key, int):
        # tuple keys carry PRINT format signatures: debug programs are
        # not worth persisting (and the tag format needs an int)
        return None

    def install(e):
        comp.exe = e

    exe = _load_or_export(f"{key:016x}", comp.fn, comp.exe,
                          (leaves, lits), install)
    if exe is not comp.exe:
        comp.exe = exe
        return exe
    return None


def _exportable_jit(ckey, tag, fn):
    """jax.jit with optional export-cache backing for the AD segment
    executables: the first call resolves the artifact (load or export,
    needing the real call args) and replaces _EXE_CACHE[ckey] with the
    resolved executable."""
    base = jax.jit(fn)
    if not _export_enabled():
        return base

    def install(e):
        _EXE_CACHE[ckey] = e

    def first(*args):
        exe = _load_or_export(tag, fn, base, args, install)
        _EXE_CACHE[ckey] = exe
        return exe(*args)

    return first


def _eval_ids(ids):
    """Evaluate the given variable ids (plus pending side effects)."""
    global _CACHE_HITS, _CACHE_MISSES
    ids = [i for i in dict.fromkeys(ids)
           if not _nat.materialized(i)]
    if not ids and _lib.et_num_side_effects() == 0:
        return
    arr = (ctypes.c_uint32 * max(len(ids), 1))(*ids)
    n = _lib.et_schedule(arr, len(ids))
    key = _lib.et_schedule_hash()

    entries = out_positions = None
    if _PRINT_FMT:
        # format strings are baked into the compiled program but NOT
        # into the C++ structural hash -- while prints are live, read
        # the schedule and mix the ordered fmt signature into the cache
        # key so two structurally-equal programs with different formats
        # never share an executable (debug-mode-only cost)
        entries, out_positions = _read_schedule(n)
        sig = tuple(_PRINT_FMT[e[0]] for e in entries
                    if e[1] == Op.PRINT and e[0] in _PRINT_FMT)
        if sig:
            key = (key, sig)

    comp = _EXE_CACHE.get(key)
    fresh_miss = comp is None
    if fresh_miss:
        _CACHE_MISSES += 1
        if entries is None:
            entries, out_positions = _read_schedule(n)
        comp = _compile_schedule(entries, out_positions)
        _EXE_CACHE[key] = comp
    else:
        _CACHE_HITS += 1
    exe = comp.exe

    # cache-hit fast path: only the data-leaf ids (executable inputs, in
    # schedule order), literal values and output ids are needed -- three
    # bulk calls instead of an O(n)-ctypes-roundtrip schedule walk
    buf = (ctypes.c_uint32 * n)()
    n_data = _lib.et_schedule_data_ids(buf, n)
    leaf_vids = [buf[i] for i in range(n_data)]
    leaves = [_BUFFERS[v] for v in leaf_vids]
    lits = _collect_literals(n, comp)
    n_out = _lib.et_schedule_output_ids(buf, n)
    out_vids = [buf[i] for i in range(n_out)]

    if fresh_miss:
        loaded = _export_cache_swap(key, comp, leaves, lits)
        if loaded is not None:
            exe = loaded

    results = exe(leaves, lits)

    if entries is not None:
        # a fired PRINT is consumed: its var materializes and the op
        # never re-lowers, so drop the format entry -- otherwise one
        # debug print would tax every later eval with the upfront
        # schedule read above for the rest of the process
        for e in entries:
            if e[1] == Op.PRINT:
                _PRINT_FMT.pop(e[0], None)

    # AD tape: if the program touches the differentiable frontier (marked
    # leaves or outputs of earlier recorded segments), keep it as a tape
    # segment so backward()/forward_from() can replay its VJP/JVP long
    # after the values were materialized -- the reference's tape outlives
    # cuda_eval the same way (autodiff.h:126, autodiff.cpp:838)
    ad_active = bool(_GRAD_ENABLED)
    if ad_active:
        vleaves = [_VERSION.get(v, v) for v in leaf_vids]
        if any(v in _GRAD_ENABLED or v in _PRODUCER for v in vleaves):
            out_diff = tuple(jnp.issubdtype(r.dtype, jnp.inexact)
                             for r in results)
            seg = _Segment(comp, vleaves, leaves, lits, list(out_vids),
                           out_diff, key)
            si = len(_TAPE)
            _TAPE.append(seg)
            _ON_TAPE.update(vleaves)
            for slot, vid in enumerate(out_vids):
                if vid:
                    _PRODUCER[vid] = (si, slot)
                    _ON_TAPE.add(vid)

    # store outputs; scatter results rebind their TARGET's buffer (enoki
    # scatters write into the target's storage; readers see the update
    # after eval -- the dirty-flag protocol, jit.cu:674,719-730)
    # two passes: plain slots first, scatter REBINDS second. The output
    # order is [explicit roots, side-effect roots, extra ext-ref'd
    # vars], so an unevaluated computed var that is itself a scatter
    # target appears AFTER its scatter -- a single pass would rebind the
    # target to the post-scatter value and then clobber it with the
    # target's own pre-scatter slot (r4 review; the rebind must win, it
    # is the program-order-final state of the target's storage).
    rebinds = []
    for vid, r in zip(out_vids, results):
        if vid == 0:
            continue
        tgt = _SCATTER_TARGET.pop(vid, None)
        _BUFFERS[vid] = r
        _lib.et_set_materialized(vid)
        if tgt is not None:
            rebinds.append((vid, tgt, r))
    for vid, tgt, r in rebinds:
        if _lib.et_var_exists(tgt):
            _BUFFERS[tgt] = r
            _lib.et_set_materialized(tgt)
            _lib.et_set_data(tgt)  # literal targets now hold data
        if ad_active:
            # the scatter op IS the target's new version: later reads
            # of the target differentiate through the scatter (the
            # reference replaces the target's tape index the same way,
            # autodiff.cpp:532-597)
            _VERSION[tgt] = vid
        _lib.et_dec_ref_ext(vid)  # release the pending-rebind claim
    _lib.et_clear_side_effects()
    _PENDING_SCATTER.clear()  # every pending scatter was a schedule root
    # drop buffers for vars the native side has already freed
    for vid in list(_BUFFERS):
        if not _lib.et_var_exists(vid):
            del _BUFFERS[vid]


def eval(*arrays) -> None:  # noqa: A001  (mirrors enoki's cuda_eval name)
    """Force evaluation of the given LazyArrays. With no arguments,
    evaluates EVERY live variable plus all pending side effects --
    cuda_eval()'s no-target semantics (jit.cu:1418-1428)."""
    if arrays:
        _eval_ids([a.index for a in arrays])
        return
    cap = _lib.et_num_vars()
    buf = (ctypes.c_uint32 * max(cap, 1))()
    m = _lib.et_live_vars(buf, cap)
    _eval_ids([buf[i] for i in range(m)])


# ---------------------------------------------------------------------------
# LazyArray
# ---------------------------------------------------------------------------


# precomputed 8x8 promotion table: jnp.promote_types costs ~6 us/call,
# which would dominate trace-append time (the append itself is ~1 us)
_PROMOTE = [[_DTYPE_CODE[jnp.promote_types(a, b)] for b in _DTYPES]
            for a in _DTYPES]


def _binary_dtype(a_code, b_code):
    return _PROMOTE[a_code][b_code]


class LazyArray(_nat.VarBase):
    """Lazy 1-D array handle (the FloatC analog, cuda.h:206).

    Operations record into the native trace; nothing runs until eval() /
    numpy() / item access forces the fused program.

    The handle state (index, _size, _code) lives in the C base type as
    raw ints -- no PyLong boxing -- and the base's tp_dealloc releases
    the native variable reference, so there is no Python ``__del__``
    (object lifecycle was ~40% of the re-trace budget). A freshly
    tp_alloc'd instance has index == 0, which dealloc treats as
    detached; ``reset()`` uses the same convention to neuter the shared
    literal handles.
    """

    __slots__ = ()

    def __init__(self, value=None, index: Optional[int] = None,
                 _size: Optional[int] = None, _code: Optional[int] = None):
        if index is not None:
            self.index = index
            # size/dtype are cached on the handle (they are immutable per
            # variable) so op recording costs no introspection C calls
            self._size = _size if _size is not None \
                else int(_lib.et_var_size(index))
            self._code = _code if _code is not None \
                else _lib.et_var_dtype(index)
            return
        x = jnp.atleast_1d(jnp.asarray(value))
        assert x.ndim == 1, "LazyArray is 1-D (the flat-index JIT model)"
        self._code = _code_of(x.dtype)
        self._size = x.shape[0]
        self.index = _nat.data(self._code, self._size)
        _BUFFERS[self.index] = x

    # -- construction ------------------------------------------------------

    @staticmethod
    def literal(value, size=1, dtype=jnp.float32):
        code = _code_of(dtype)
        bits = _literal_bits(value, code)
        return LazyArray(index=_lib.et_literal(code, bits, size),
                         _size=size, _code=code)

    @staticmethod
    def arange(n, dtype=jnp.int32):
        code = _code_of(dtype)
        return LazyArray(index=_lib.et_append(Op.IOTA, code, n, 0, 0, 0, 0),
                         _size=n, _code=code)

    @staticmethod
    def zeros(n, dtype=jnp.float32):
        return LazyArray.literal(0, n, dtype)

    @staticmethod
    def full(value, n, dtype=jnp.float32):
        return LazyArray.literal(value, n, dtype)

    @staticmethod
    def linspace(lo, hi, n, dtype=jnp.float32):
        i = LazyArray.arange(n, dtype).cast(dtype)
        step = (hi - lo) / max(n - 1, 1)
        return i * LazyArray.literal(step, 1, dtype) + \
            LazyArray.literal(lo, 1, dtype)

    # -- bookkeeping ---------------------------------------------------------
    # (no __del__: the C base's tp_dealloc releases the native reference)

    def __len__(self):
        return self._size

    @property
    def size(self):
        return len(self)

    @property
    def dtype(self):
        return jnp.dtype(_DTYPES[self._code])

    @property
    def shape(self):
        return (self._size,)  # 1-D by construction (flat-index model)

    @property
    def materialized(self):
        return bool(_nat.materialized(self.index))

    def label(self, name: str) -> "LazyArray":
        """set_label analog (cuda.h:957) -- names show up in whos()."""
        _lib.et_set_label(self.index, name.encode())
        return self

    def __repr__(self):
        state = "materialized" if self.materialized else "lazy"
        return (f"LazyArray(id={self.index}, size={len(self)}, "
                f"dtype={self.dtype.name}, {state})")

    # -- op recording --------------------------------------------------------

    def _ensure_clean(self):
        """Reading a scatter target forces eval first (jit.cu:719-730)."""
        if _nat.is_dirty(self.index):
            _eval_ids([self.index])

    @staticmethod
    def _record(opcode, dtype_code, size, *dep_arrays, raw=False):
        deps = [d.index for d in dep_arrays] + [0] * (4 - len(dep_arrays))
        idx = _nat.append(opcode, dtype_code, size, deps[0], deps[1],
                          deps[2], deps[3], int(raw))
        if idx == -1:  # dirty dep: eval the pending scatter, retry once
            for d in dep_arrays:
                d._ensure_clean()
            idx = _nat.append(opcode, dtype_code, size, deps[0], deps[1],
                              deps[2], deps[3], int(raw))
        if idx == 0:
            sizes = [len(d) for d in dep_arrays]
            raise ValueError(f"incompatible sizes for trace op: {sizes}")
        if idx == -1:  # still dirty after the retry: fail loudly (a -1
            #            handle would silently no-op in every later call)
            raise RuntimeError(
                "trace append failed twice on a dirty dependency -- a "
                "pending scatter could not be flushed")
        r = LazyArray.__new__(LazyArray)
        r.index = idx
        r._size = size
        r._code = dtype_code
        return r

    def _coerce(self, other):
        if isinstance(other, LazyArray):
            return other
        if isinstance(other, (int, float, bool)):
            # shared literal handles: scalar constants repeat heavily in
            # traced programs (a polynomial kernel re-coerces its
            # coefficients every retrace) and literal vars are immutable,
            # so one native var per (dtype, value) is enough. The cache
            # holds an ext ref (keeping the var id valid); reset() clears
            # it with the rest of the trace state. Nonzero values take
            # the 2-tuple key; only zeros need the sign disambiguation
            # (-0.0 == 0.0 but their bit patterns differ) -- and -0.0 is
            # falsy, so the guard is just truthiness.
            code = self._code
            if other:
                k = (code, other)
            else:
                k = (code, other, math.copysign(1.0, other)) \
                    if isinstance(other, float) else (code, other)
            r = _LITERAL_ARRAYS.get(k)
            if r is not None:
                return r
            r = LazyArray.__new__(LazyArray)
            r.index = _nat.literal(code, _literal_bits(other, code), 1)
            r._size = 1
            r._code = code
            # NaN keys can never be looked up (nan != nan): caching them
            # would only fill the cap with dead entries
            if other == other and len(_LITERAL_ARRAYS) < (1 << 14):
                _LITERAL_ARRAYS[k] = r
            return r
        return LazyArray(other)

    def _bin(self, other, opcode, out_dtype=None, swap=False):
        if type(other) is not LazyArray:  # exact check: hot path
            other = self._coerce(other)
        a, b = (other, self) if swap else (self, other)
        r = _nat.binop(a, b, opcode, -1 if out_dtype is None else out_dtype)
        if r is not None:
            return r
        # slow path: dirty dependency (flush + retry) or broadcast error
        dc = _PROMOTE[a._code][b._code] if out_dtype is None else out_dtype
        sa, sb = a._size, b._size
        size = sa if sa >= sb else sb
        return LazyArray._record(opcode, dc, size, a, b)

    def _unary(self, opcode, out_dtype=None):
        r = _nat.unop(self, opcode, -1 if out_dtype is None else out_dtype)
        if r is not None:
            return r
        dc = self._code if out_dtype is None else out_dtype
        return LazyArray._record(opcode, dc, self._size, self)

    _BOOL = 4  # dtype code of jnp.bool_

    __hash__ = None

    def cast(self, dtype):
        return self._unary(Op.CAST, _code_of(dtype))

    # jnp-style alias so generic (eager/lazy) code can call .astype
    astype = cast

    def bitcast(self, dtype):
        """Reinterpret the bits as ``dtype`` (same itemsize) -- the
        reinterpret_array analog (array_router.h memcpy_cast)."""
        if jnp.dtype(dtype).itemsize != self.dtype.itemsize:
            raise TypeError(
                f"bitcast {self.dtype} -> {jnp.dtype(dtype)}: itemsize "
                "must match (a narrowing bitcast would break the 1-D "
                "flat-index model)")
        return self._unary(Op.BITCAST, _code_of(dtype))

    # -- horizontal ops: stay lazy (XLA fuses reductions; the reference has
    # to break the kernel at every cub call, src/cuda/horiz.cu) -----------

    def hsum(self):
        return LazyArray._record(Op.HSUM, self._code, 1,
                                 self)

    def hprod(self):
        return LazyArray._record(Op.HPROD, self._code, 1,
                                 self)

    def hmin(self):
        return LazyArray._record(Op.HMIN, self._code, 1,
                                 self)

    def hmax(self):
        return LazyArray._record(Op.HMAX, self._code, 1,
                                 self)

    def all(self):
        return LazyArray._record(Op.ALL, LazyArray._BOOL, 1, self)

    def any(self):
        return LazyArray._record(Op.ANY, LazyArray._BOOL, 1, self)

    def count(self):
        return LazyArray._record(Op.COUNT, _DTYPE_CODE[jnp.dtype(jnp.int32)],
                                 1, self)

    def psum(self):
        return LazyArray._record(Op.PSUM, self._code,
                                 len(self), self)

    def compress(self, mask: "LazyArray"):
        """(packed, count): lanes where mask holds, packed to the front in
        order; remainder zero-filled (cuda_compress, horiz.cu:158, with
        the static-shape TPU contract of ops.compress). Both results stay
        lazy -- unlike the reference, which must break the kernel at
        every cub call."""
        packed = LazyArray._record(Op.COMPRESS,
                                   self._code,
                                   len(self), self, mask)
        return packed, mask.count()

    def reverse(self):
        return LazyArray._record(Op.REVERSE, self._code,
                                 len(self), self)

    # -- gather / scatter ----------------------------------------------------

    def gather(self, index: "LazyArray"):
        """self[index] -- forces eval of self first if it is dirty."""
        self._ensure_clean()
        return LazyArray._record(Op.GATHER, self._code,
                                 len(index), self, index, raw=True)

    def _scatter_op(self, opcode, index, value):
        if _PROBE_DEPTH:
            # structure probe: a scatter contributes nothing to the
            # result STRUCTURE (scatter()/scatter_add() return self), so
            # record nothing at all -- no op, no coercion chain, no
            # side-effect bookkeeping, no flush evals
            return self
        import sys
        callmod = sys.modules.get(__name__ + ".call")
        if callmod is not None:
            # a scatter invalidates any cached partition of the target
            # NOW -- the dirty flag alone is insufficient, since an
            # unrelated eval clears it before the next partition()
            callmod._cache_pop(self.index)
        index = self._coerce(index)
        value = self._coerce(value)
        from ..config import config
        if config.debug_bounds:
            # debug mode (array_base.h:109 discipline): the jnp scatter
            # impl wraps negative indices numpy-style BEFORE the drop
            # mode applies; redirect them to the dropped OOB slot at
            # record time so lazy scatters catch the same corruption the
            # eager path does (ops/router.py scatter).
            index = select(index < index._coerce(0),
                           index._coerce(len(self)), index)
        index._ensure_clean()
        value._ensure_clean()
        # write-after-pending-read: recorded-but-unevaluated ops that
        # READ this target (int_ref > 0 -- materialization releases dep
        # refs) must materialize against the PRE-scatter value before
        # the target's buffer can be rebound, or their eventual eval
        # would see the post-scatter state (program order violated). The
        # reference leaves this case as an in-kernel st/ld race
        # (cuda.h:867 raw st.global); here it is made deterministic by
        # evaluating the pending readers first. The flush is COARSE
        # (eval of all live vars -- the var table stores deps, not
        # reader back-references), so an unrelated half-built chain
        # materializes at its prefix too; correctness over fusion for
        # this rare hazard. Scatters into fresh arrays (the vcall
        # dispatch / histogram patterns) have no readers and stay fully
        # fused.
        if (self.index not in _PENDING_SCATTER
                and _lib.et_var_int_ref(self.index) > 0):
            eval()
        # chain on the newest pending scatter into this target, so a
        # sequence of scatters (a k-instance vcall dispatch) stays ONE
        # fused program; only the chain tail rebinds the target
        base = _PENDING_SCATTER.get(self.index, self.index)
        idx = _lib.et_append_raw(opcode, self._code, len(self),
                                 base, index.index, value.index, 0)
        if idx == 0:
            raise ValueError("scatter: invalid operands")
        op = LazyArray(index=idx, _size=len(self), _code=self._code)
        _lib.et_mark_side_effect(op.index, self.index)
        prev = _PENDING_SCATTER.get(self.index)
        if prev is not None:
            # the superseded link no longer rebinds nor needs its own
            # output buffer; the tail's dep keeps it alive
            _SCATTER_TARGET.pop(prev, None)
            _lib.et_unmark_side_effect(prev)
            _lib.et_dec_ref_ext(prev)  # release its pending-rebind claim
        _SCATTER_TARGET[op.index] = self.index
        _PENDING_SCATTER[self.index] = op.index
        # keep the scatter result's buffer claim alive until eval rebinds
        _lib.et_inc_ref_ext(op.index)
        return op

    def scatter(self, index, value):
        """enoki scatter: self[index] = value, lazily; self goes dirty."""
        self._scatter_op(Op.SCATTER, index, value)
        return self

    def scatter_add(self, index, value):
        """Conflict-safe accumulation (atom.global.add analog, cuda.h:893)."""
        self._scatter_op(Op.SCATTER_ADD, index, value)
        return self

    # -- materialization -------------------------------------------------------

    def eval(self) -> "LazyArray":
        _eval_ids([self.index])
        return self

    def jax(self) -> jnp.ndarray:
        self._ensure_clean()
        if not self.materialized:
            self.eval()
        return _BUFFERS[self.index]

    def numpy(self) -> np.ndarray:
        return np.asarray(self.jax())

    def __getitem__(self, i):
        """Single-element fetch forces eval (cuda_fetch_element,
        jit.cu:1520)."""
        return self.numpy()[i]


# ---------------------------------------------------------------------------
# Operator wiring: the dunders call the C fast path (pymod.cpp binop/unop:
# slot reads at fixed offsets, C promotion table, append, tp_alloc result)
# and fall back to _bin/_unary for scalar coercion, dirty-flush retries and
# broadcast errors. ~0.3 us/op vs ~1.2 us through the pure-Python route --
# the single biggest term in the re-dispatch number (docs/benchmarks.md).
# ---------------------------------------------------------------------------

_nat.set_class(LazyArray, [c for row in _PROMOTE for c in row],
               len(_DTYPES))


def _bin_dunder(opcode, out_code=-1, swap=False):
    out_dtype = None if out_code < 0 else out_code
    if swap:
        def op(self, other):
            return self._bin(other, opcode, out_dtype, swap=True)
    else:
        def op(self, other):
            # the C fast path handles LazyArray AND Python-scalar
            # operands (bits-keyed shared-literal cache in pymod.cpp);
            # anything it declines (bf16/f16 scalar rounding, u64-range
            # ints, numpy scalars, dirty deps) falls back here
            r = _nat.binop(self, other, opcode, out_code)
            if r is not None:
                return r
            if type(other) is not LazyArray:
                other = self._coerce(other)
            return self._bin(other, opcode, out_dtype)
    return op


def _un_dunder(opcode):
    def op(self):
        r = _nat.unop(self, opcode, -1)
        return r if r is not None else self._unary(opcode)
    return op


for _n, _o in [("__add__", Op.ADD), ("__sub__", Op.SUB), ("__mul__", Op.MUL),
               ("__truediv__", Op.DIV), ("__mod__", Op.MOD),
               ("__pow__", Op.POW), ("__and__", Op.AND), ("__or__", Op.OR),
               ("__xor__", Op.XOR), ("__lshift__", Op.SHL),
               ("__rshift__", Op.SHR)]:
    setattr(LazyArray, _n, _bin_dunder(_o))
for _n, _o in [("__radd__", Op.ADD), ("__rsub__", Op.SUB),
               ("__rmul__", Op.MUL), ("__rtruediv__", Op.DIV)]:
    setattr(LazyArray, _n, _bin_dunder(_o, swap=True))
for _n, _o in [("__eq__", Op.EQ), ("__ne__", Op.NE), ("__lt__", Op.LT),
               ("__le__", Op.LE), ("__gt__", Op.GT), ("__ge__", Op.GE)]:
    setattr(LazyArray, _n, _bin_dunder(_o, out_code=LazyArray._BOOL))
for _n, _o in [("__neg__", Op.NEG), ("__abs__", Op.ABS),
               ("__invert__", Op.NOT)]:
    setattr(LazyArray, _n, _un_dunder(_o))
del _n, _o


_PY_SCALAR_CODE = {bool: 4, int: 2, float: 0}  # bool_, int32, float32


def _scalar_literal(v) -> "LazyArray":
    """Scalar -> size-1 literal with numpy-scalar coercion (np.float32(2.0)
    etc. are not instances of the Python scalar types)."""
    if isinstance(v, (bool, np.bool_)):
        code = 4
    elif isinstance(v, (int, np.integer)):
        code = 2
    elif isinstance(v, (float, np.floating)):
        code = 0
    else:
        raise TypeError(
            f"select: cannot coerce {type(v).__name__} operand -- pass a "
            "LazyArray or a Python/numpy scalar")
    return LazyArray.literal(v, 1, _DTYPES[code])


def select(mask: LazyArray, a, b):
    """Lazy select(mask, a, b). Python-scalar operands coerce against the
    other *value* operand's dtype -- never the mask's bool dtype, which
    would collapse select(m, 5.0, x) to a bool literal."""
    ref = a if isinstance(a, LazyArray) else \
        b if isinstance(b, LazyArray) else None
    if ref is not None:
        a, b = ref._coerce(a), ref._coerce(b)
    else:
        a = _scalar_literal(a)
        b = _scalar_literal(b)
    dc = _binary_dtype(a._code, b._code)
    return LazyArray._record(Op.SELECT, dc, max(len(mask), len(a), len(b)),
                             mask, a, b)


# ---------------------------------------------------------------------------
# AD over the lazy trace: the DiffArray<CUDAArray<float>> analog (FloatD).
#
# The reference wraps the lazy GPU array in an AD tape that OUTLIVES
# evaluation (autodiff.h:126): values and derivatives are independent --
# cuda_eval materializes values while the tape keeps every edge needed
# for backward()/forward(), including Special gather/scatter adjoints
# (autodiff.cpp:355-608). The same contract here: whenever an eval's
# program touches the differentiable frontier (a requires_grad leaf, or
# an output of an earlier recorded segment), the compiled program is
# kept as a TAPE SEGMENT together with its input buffers. backward(loss)
# walks segments in reverse, replaying each one's VJP (jax.vjp over the
# cached executable -- scatter/scatter_add/gather adjoints come from
# jax's .at[] transposes); forward_from(x) walks forward with jax.jvp.
#
# Consequences, matching the reference:
#   * backward() may run before OR after the loss was evaluated;
#   * gradient(x) works for any array that was materialized at an eval
#     boundary (every externally-held var is -- et_schedule outputs all
#     ext-referenced vars, like jit.cu:1165-1205), not just leaves;
#   * scatters into differentiable targets are differentiable: the
#     scatter op becomes the target's new version, so later reads chain
#     through it (scatter-overwrite combine incl. zeroed overwritten
#     lanes falls out of jax's .at[].set transpose, autodiff.cpp:532-597).
#
# Cached per structural hash, so repeated optimization steps with fresh
# data reuse both the forward and the VJP/JVP executables.
# ---------------------------------------------------------------------------

_GRAD_ENABLED: set = set()   # var ids marked as differentiable parameters
_GRADS: dict = {}            # version vid -> accumulated gradient buffer
_TAPE: list = []             # recorded _Segments, chronological
_PRODUCER: dict = {}         # version vid -> (segment index, output slot)
_VERSION: dict = {}          # var id -> current version vid (scatter rebinds)
# every vid that ever appeared on a recorded segment (leaf or output).
# Survives clear_tape() so gradient() can distinguish "recorded but
# untouched by backward" (zeros) from "never on the tape" (error) after
# the tape itself was freed. Pruned with the gradients.
_ON_TAPE: set = set()


class _Segment:
    """One recorded eval: the compiled program record plus everything
    needed to replay its VJP/JVP (the tape-node analog,
    autodiff.cpp:44-105)."""

    __slots__ = ("comp", "leaf_vids", "leaf_bufs", "lits", "out_vids",
                 "out_diff", "key")

    def __init__(self, comp, leaf_vids, leaf_bufs, lits, out_vids, out_diff,
                 key):
        self.comp = comp              # _Compiled for this structure
        self.leaf_vids = leaf_vids    # version vids, schedule order
        self.leaf_bufs = leaf_bufs    # input buffers at record time
        self.lits = lits
        self.out_vids = out_vids      # output vids (0 = dropped)
        self.out_diff = out_diff      # per-output: inexact dtype?
        self.key = key


def _label_of(vid: int) -> str:
    buf = ctypes.create_string_buffer(256)
    n = _lib.et_get_label(vid, buf, len(buf))
    return buf.value.decode() if n else ""


def tape_whos() -> str:
    """Live table of recorded tape segments -- the segment-tape analog of
    the reference tape's whos() (autodiff.cpp:1165): one row per
    segment with its program hash, input vids (with labels) and output
    vids, plus totals for held buffer memory."""
    lines = ["  seg  hash              inputs -> outputs"
             "                      held bytes"]
    total = 0
    for i, seg in enumerate(_TAPE):
        held = sum(int(b.size * b.dtype.itemsize) for b in seg.leaf_bufs)
        total += held

        def fmt(vid):
            lbl = _label_of(vid)
            return f"{vid}:{lbl}" if lbl else str(vid)

        ins = ", ".join(fmt(v) for v in seg.leaf_vids[:6])
        if len(seg.leaf_vids) > 6:
            ins += f", ... ({len(seg.leaf_vids)} total)"
        outs = ", ".join(fmt(v) for v in seg.out_vids[:6] if v)
        lines.append(f"  {i:3d}  {_key_tag(seg.key)}  [{ins}] -> [{outs}]"
                     f"  {held}")
    lines.append(f"  segments: {len(_TAPE)}, gradients held: "
                 f"{len(_GRADS)}, total held input bytes: {total}")
    return "\n".join(lines)


def tape_graphviz() -> str:
    """DOT rendering of the recorded segment tape (the debugging story
    for the trace AD): data-flow from input version-vids through each
    segment's fused program to its outputs, with set_label names and
    label-prefix clustering -- the reference renders its AD DAG the same
    way (autodiff.cpp:1076-1163; prefixes from push_prefix group into
    subgraphs)."""
    lines = ["digraph tape {", "  rankdir=LR;",
             "  node [fontsize=10 shape=box style=filled "
             "fillcolor=\"#e0f0ff\"];"]
    var_nodes = {}
    clusters: dict = {}

    def var_node(vid):
        if vid in var_nodes:
            return var_nodes[vid]
        name = f"v{vid}"
        lbl = _label_of(vid)
        text = f"{vid}: {lbl}" if lbl else f"v{vid}"
        decl = (f"  {name} [label=\"{text}\" shape=ellipse "
                f"fillcolor=\"#ffffff\"];")
        # prefix clustering: a label "scene/radius" lands in
        # subgraph cluster_scene (push_prefix scoping, autodiff.cpp:776)
        if "/" in lbl:
            clusters.setdefault(lbl.split("/", 1)[0], []).append(decl)
        else:
            lines.append(decl)
        var_nodes[vid] = name
        return name

    for i, seg in enumerate(_TAPE):
        sname = f"seg{i}"
        lines.append(
            f"  {sname} [label=\"segment {i}\\nhash {_key_tag(seg.key)}\\n"
            f"{len(seg.leaf_vids)} in / "
            f"{sum(1 for v in seg.out_vids if v)} out\"];")
        for vid, buf in zip(seg.leaf_vids, seg.leaf_bufs):
            if jnp.issubdtype(buf.dtype, jnp.inexact):
                lines.append(f"  {var_node(vid)} -> {sname};")
        for k, vid in enumerate(seg.out_vids):
            if vid and seg.out_diff[k]:
                lines.append(f"  {sname} -> {var_node(vid)};")
    for pfx, decls in clusters.items():
        lines.append(f"  subgraph cluster_{pfx} {{ label=\"{pfx}\";")
        lines.extend("  " + d for d in decls)
        lines.append("  }")
    lines.append("}")
    return "\n".join(lines)


def clear_tape():
    """Release all recorded tape segments (and their held buffers).
    Version entries of collected variables are pruned too (scatter
    versioning would otherwise accumulate across optimization steps)."""
    _TAPE.clear()
    _PRODUCER.clear()
    for k in list(_VERSION):
        if not _lib.et_var_exists(k):
            del _VERSION[k]


def _vid(x: "LazyArray") -> int:
    return _VERSION.get(x.index, x.index)


def requires_grad(x: "LazyArray", flag: bool = True) -> "LazyArray":
    """Mark a (leaf) array as differentiable (set_requires_gradient,
    autodiff.h). Recording starts at the mark: programs evaluated before
    any array was marked are not on the tape."""
    if flag:
        if not x.materialized:
            x.eval()
        _GRAD_ENABLED.add(x.index)
    else:
        _GRAD_ENABLED.discard(x.index)
    return x


def grad_enabled(x: "LazyArray") -> bool:
    return x.index in _GRAD_ENABLED


def gradient(x: "LazyArray"):
    """Gradient accumulated by backward()/forward_from() passes
    (``gradient(x)``, array_router.h:702). Works for leaves AND any
    intermediate that crossed an eval boundary (any externally-held
    array does). Returns a LazyArray; zeros if no gradient reached x.

    Raises for an array that was never on the tape at all (neither
    marked with requires_grad nor recorded by any segment) -- the classic
    evaluate-before-mark mis-ordering would otherwise be
    indistinguishable from a genuine zero gradient (the reference errors
    on off-tape gradient reads, autodiff.h:1410 region)."""
    vid = _vid(x)
    g = _GRADS.get(vid)
    if g is None:
        if x.index not in _GRAD_ENABLED and vid not in _ON_TAPE:
            raise RuntimeError(
                "gradient: array was never recorded on the AD tape -- "
                "mark parameters with requires_grad BEFORE building and "
                "evaluating the computation (programs evaluated earlier "
                "are not re-recorded)")
        g = jnp.zeros((len(x),), x.dtype)
    return LazyArray(g)


def clear_gradients():
    _GRADS.clear()
    # prune freed vars EXCEPT live version vids: an evaluated scatter's
    # op var is always freed at eval end, but _VERSION still routes the
    # target's gradient() through it -- dropping it would turn a
    # recorded-on-tape read into the off-tape error (r4 review)
    keep = set(_VERSION.values())
    for k in list(_ON_TAPE):
        if not _lib.et_var_exists(k) and k not in keep:
            _ON_TAPE.discard(k)


def _is_diff(buf) -> bool:
    return jnp.issubdtype(buf.dtype, jnp.inexact)


def _seg_vjp_exe(seg, mask, diff_pos):
    """Jitted segment VJP: (diff_leaves, others, lits, cotangents) ->
    (input cotangents, total output cotangents). ``mask`` marks which cut
    slots carry external cotangents. Cotangents chain through outputs
    that feed other outputs of the same program via back-substitution
    over the cut program (comp.depth exact rounds -- the within-segment
    analog of the reference's per-node reverse sweep)."""
    global _CACHE_HITS, _CACHE_MISSES
    ckey = ("segbwd", seg.key, mask, diff_pos)
    exe = _EXE_CACHE.get(ckey)
    if exe is not None:
        _CACHE_HITS += 1
        return exe
    _CACHE_MISSES += 1
    comp = seg.comp
    n_leaves = len(seg.leaf_bufs)
    cut_slots = comp.cut_slots
    dset = frozenset(diff_pos)

    def run(diff_leaves, others, lits, cts):
        def merge(dl):
            leaves, di, oi = [], 0, 0
            for k in range(n_leaves):
                if k in dset:
                    leaves.append(dl[di])
                    di += 1
                else:
                    leaves.append(others[oi])
                    oi += 1
            return leaves

        outs = comp.fn(merge(diff_leaves), lits)
        cuts0 = tuple(outs[k] for k in cut_slots)

        def f(dl, cuts):
            o = comp.cut_fn(merge(dl), lits, cuts)
            return tuple(o[k] for k in cut_slots)

        _, vjp_fn = jax.vjp(f, tuple(diff_leaves), cuts0)
        ext, ci = [], 0
        for j, m in enumerate(mask):
            if m:
                ext.append(cts[ci])
                ci += 1
            else:
                ext.append(jnp.zeros_like(cuts0[j]))
        t = tuple(ext)
        for _ in range(comp.depth):  # nilpotent: exact after depth rounds
            _, g_c = vjp_fn(t)
            t = tuple(e + g for e, g in zip(ext, g_c))
        g_l, _ = vjp_fn(t)
        return g_l, t

    tag = (f"{_key_tag(seg.key)}-bwd-"
           f"{hash((mask, diff_pos)) & 0xFFFFFFFFFFFF:012x}")
    exe = _exportable_jit(ckey, tag, run)
    _EXE_CACHE[ckey] = exe
    return exe


def _propagate_backward(cot: dict):
    """Reverse sweep over the tape (Tape::backward, autodiff.cpp:838):
    for each segment whose outputs carry cotangents, replay its VJP,
    store total cotangents on its outputs (gradients of intermediates)
    and accumulate into its input version vids."""
    for seg in reversed(_TAPE):
        cut_slots = seg.comp.cut_slots
        mask = tuple(seg.out_vids[k] != 0 and seg.out_vids[k] in cot
                     for k in cut_slots)
        if not any(mask):
            continue
        diff_pos = tuple(k for k, b in enumerate(seg.leaf_bufs)
                         if _is_diff(b))
        exe = _seg_vjp_exe(seg, mask, diff_pos)
        dset = frozenset(diff_pos)
        diff_leaves = [seg.leaf_bufs[k] for k in diff_pos]
        others = [b for k, b in enumerate(seg.leaf_bufs) if k not in dset]
        cts = [cot[seg.out_vids[k]] for k, m in zip(cut_slots, mask) if m]
        gs, touts = exe(diff_leaves, others, seg.lits, cts)
        for k, g in zip(diff_pos, gs):
            vid = seg.leaf_vids[k]
            prev = cot.get(vid)
            cot[vid] = g if prev is None else prev + g
        for k, t in zip(cut_slots, touts):
            vid = seg.out_vids[k]
            if vid:
                cot[vid] = t  # total (external + within-segment chains)


def backward(loss: "LazyArray", grad_out=1.0, free: bool = True):
    """Reverse pass from ``loss`` into every differentiable array on the
    tape (``backward(loss)``, autodiff.h:1490 -> autodiff.cpp:838).
    Evaluates the loss first if needed and returns its primal value.
    ``free=True`` (the reference's free_graph default) releases the tape
    afterwards; pass False to run several backward passes."""
    if not loss.materialized:
        loss.eval()
    val = _BUFFERS[loss.index]
    ct0 = jnp.broadcast_to(jnp.asarray(grad_out, val.dtype), val.shape)
    cot = {_vid(loss): ct0}
    _propagate_backward(cot)
    for vid, g in cot.items():
        prev = _GRADS.get(vid)
        _GRADS[vid] = g if prev is None else prev + g
    if free:
        clear_tape()
    return val


def _seg_jvp_exe(seg, in_pos, out_slots):
    """Jitted (tan_leaves, all_leaves, lits, tangents) -> output tangents
    for one segment, specialized on which inputs carry tangents and
    which (float) outputs are wanted."""
    global _CACHE_HITS, _CACHE_MISSES
    ckey = ("segfwd", seg.key, in_pos, out_slots)
    exe = _EXE_CACHE.get(ckey)
    if exe is not None:
        _CACHE_HITS += 1
        return exe
    _CACHE_MISSES += 1
    seg_exe = seg.comp.fn
    n_leaves = len(seg.leaf_bufs)
    iset = frozenset(in_pos)

    def run(tan_leaves, others, lits, tans):
        def f(dl):
            leaves, di, oi = [], 0, 0
            for k in range(n_leaves):
                if k in iset:
                    leaves.append(dl[di])
                    di += 1
                else:
                    leaves.append(others[oi])
                    oi += 1
            outs = seg_exe(leaves, lits)
            return tuple(outs[j] for j in out_slots)

        _, out_tans = jax.jvp(f, (tuple(tan_leaves),), (tuple(tans),))
        return out_tans

    tag = (f"{_key_tag(seg.key)}-fwd-"
           f"{hash((in_pos, out_slots)) & 0xFFFFFFFFFFFF:012x}")
    exe = _exportable_jit(ckey, tag, run)
    _EXE_CACHE[ckey] = exe
    return exe


def forward_from(x: "LazyArray", loss: "LazyArray", tangent=1.0,
                 free: bool = True):
    """Forward mode from parameter ``x`` to ``loss`` (``forward(x)``,
    autodiff.cpp:912): propagates a tangent chronologically through the
    tape and stores d loss / d x in the loss's gradient slot. Returns
    (loss value, tangent_out). Mark x (or call this) BEFORE building the
    loss so the programs are recorded."""
    if x.index not in _GRAD_ENABLED:
        requires_grad(x)
    if not loss.materialized:
        loss.eval()
    xv = _vid(x)
    if not any(xv in seg.leaf_vids for seg in _TAPE):
        # the reference raises when x is not a leaf of the trace
        # (autodiff.h); silently returning a zero tangent would hide the
        # classic mis-ordering where part of the chain was evaluated
        # before anything was marked. A loss genuinely independent of x
        # also lands here -- catch the ValueError in parameter sweeps.
        raise ValueError(
            "forward_from: x does not appear on the tape. Either the "
            "loss is independent of x, or part of the chain was "
            "evaluated before requires_grad -- mark x BEFORE building "
            "and evaluating the loss")
    xbuf = _BUFFERS[x.index]
    tan = {xv: jnp.broadcast_to(jnp.asarray(tangent, xbuf.dtype),
                                xbuf.shape)}
    for seg in _TAPE:
        in_pos = tuple(k for k, v in enumerate(seg.leaf_vids)
                       if v in tan and _is_diff(seg.leaf_bufs[k]))
        if not in_pos:
            continue
        out_slots = tuple(k for k, v in enumerate(seg.out_vids)
                          if v != 0 and seg.out_diff[k])
        iset = frozenset(in_pos)
        exe = _seg_jvp_exe(seg, in_pos, out_slots)
        tan_leaves = [seg.leaf_bufs[k] for k in in_pos]
        others = [b for k, b in enumerate(seg.leaf_bufs) if k not in iset]
        tans = [tan[seg.leaf_vids[k]] for k in in_pos]
        out_tans = exe(tan_leaves, others, seg.lits, tans)
        for j, t in zip(out_slots, out_tans):
            vid = seg.out_vids[j]
            prev = tan.get(vid)
            tan[vid] = t if prev is None else prev + t
    lv = _vid(loss)
    t = tan.get(lv)
    if t is None:
        t = jnp.zeros_like(_BUFFERS[loss.index])
    prev = _GRADS.get(lv)
    _GRADS[lv] = t if prev is None else prev + t
    if free:
        clear_tape()
    return _BUFFERS[loss.index], t


def _out_code(in_code, kind):
    if kind == "bool":
        return LazyArray._BOOL
    if kind == "float" and in_code not in _FLOAT_CODES:
        return 0  # integer inputs float-promote to f32
    return in_code


def _make_math(name, opcode, arity, kind=None):
    if arity == 1:
        def f(x):
            return x._unary(opcode,
                            _out_code(x._code, kind))
    elif arity == 2:
        def f(x, y):
            y = x._coerce(y)
            dc = _out_code(_binary_dtype(x._code,
                                         y._code), kind)
            return x._bin(y, opcode, out_dtype=dc)
    else:
        def f(x, y, z):
            y = x._coerce(y)
            z = x._coerce(z)
            # promote like the binary ops: the jnp implementation
            # (e.g. a*b+c) promotes, so the declared trace dtype must
            # agree or downstream bitcasts/coercions act on the wrong
            # itemsize (r4 review)
            dc = _out_code(_binary_dtype(_binary_dtype(x._code, y._code),
                                         z._code), kind)
            return LazyArray._record(opcode, dc,
                                     max(len(x), len(y), len(z)), x, y, z)
    f.__name__ = name
    f.__doc__ = f"Lazy {name} (records Op.{name.upper()} into the trace)."
    return f


for _name, (_op, _ar, _kind) in _MATH_OPS.items():
    globals()[_name] = _make_math(_name, _op, _ar, _kind)


def sincos(x):
    """(sin, cos) pair; XLA CSEs the shared range reduction at eval
    (array_math.h sincos)."""
    return sin(x), cos(x)  # noqa: F821


def bitcast(x, dtype):
    """Lazy bit reinterpretation (ops.reinterpret analog)."""
    return x.bitcast(dtype)


def printf(fmt: str, *arrays: "LazyArray") -> "LazyArray":
    """In-trace printf: record a PRINT op that prints from INSIDE the
    fused program (the cuda_printf analog, array_router.h:972 /
    jit.cu:863-916 -- the reference emits a vprintf call into the fused
    PTX kernel; here the op lowers to jax.debug.print, a TPU outfeed,
    without breaking fusion).

    ``fmt`` uses jax.debug.print placeholders ("t={}"); 1-3 array
    operands. Returns the first operand PASSED THROUGH the print op --
    use the returned handle downstream to anchor where in the program
    the print fires::

        t = tr.printf("t after march: {}", t)

    An unused print is still a pending side effect: the next ``eval()``
    (any eval) runs it, like an unconsumed scatter. Format strings join
    the executable-cache key while prints are live, so structurally
    equal programs with different formats never share a compiled
    executable; export-cache persistence is skipped for debug programs.
    """
    if not arrays or len(arrays) > 3:
        raise ValueError("printf takes 1-3 array operands")
    if not isinstance(fmt, str):
        raise TypeError("printf format must be a string")
    for a in arrays:
        if not isinstance(a, LazyArray):
            raise TypeError("printf operands must be LazyArrays "
                            "(coerce scalars with x._coerce first)")
    x = arrays[0]
    if _PROBE_DEPTH:
        # structure probe: printf is a passthrough of its first operand,
        # so the operand itself IS the structural answer -- appending a
        # PRINT op here would fire (with the fallback format, since no
        # _PRINT_FMT entry exists) if the callee materializes anything
        # downstream of it mid-probe
        return x
    # read-after-scatter protocol: a PRINT reads its operands exactly
    # like a gather does, so a dirty operand (pending scatter into it)
    # must materialize first or the print would show pre-scatter values
    # despite program order (gather/binop/unop all enforce this; the
    # raw ctypes append below would not)
    for a in arrays:
        a._ensure_clean()
    deps = [a.index for a in arrays] + [0] * (3 - len(arrays))
    idx = _lib.et_append_raw(Op.PRINT, x._code, len(x), *deps, 0)
    if idx == 0:
        raise ValueError("printf: invalid operands")
    out = LazyArray(index=idx, _size=len(x), _code=x._code)
    _PRINT_FMT[out.index] = fmt
    # retained like a scatter: fires at the next eval even if the
    # returned handle is dropped (target 0 = nothing becomes dirty)
    _lib.et_mark_side_effect(out.index, 0)
    return out


def clz(x):
    """Lazy leading-zero count (lzcnt, array_fallbacks.h:259)."""
    return x._unary(Op.CLZ)


def fmod(x, y):
    """C fmod: remainder with the sign of the dividend (array_math.h
    fmod, std::fmod semantics). Distinct from ``x % y`` (floored)."""
    return x._bin(y, Op.FMOD)


def clamp(x, lo, hi):
    """min(max(x, lo), hi) as trace ops (array_math.h:1352)."""
    return minimum(maximum(x, lo), hi)  # noqa: F821


def lerp(a, b, t):
    """Endpoint-exact interpolation t*b + (a - t*a) (array_math.h:1357 and
    enoki_tpu.ops.lerp): exact at t=0 and t=1, unlike a + (b-a)*t which
    cancels catastrophically when |a| >> |b|."""
    ref = next(v for v in (a, b, t) if isinstance(v, LazyArray))
    a, b, t = ref._coerce(a), ref._coerce(b), ref._coerce(t)
    return t * b + (a - t * a)

__all__ = ["LazyArray", "select", "eval", "whos", "stats", "cache_stats",
           "clear_cache", "reset", "set_log_level", "Op", "requires_grad",
           "grad_enabled", "gradient", "clear_gradients", "backward",
           "forward_from", "isnan", "isinf", "isfinite", "clamp",
           "lerp", "sincos", "fmod", "bitcast", "clz", "tape_whos",
           "tape_graphviz"] + list(_MATH_OPS)
