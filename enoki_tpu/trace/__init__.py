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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .build import load_library

_lib = load_library()

# ---------------------------------------------------------------------------
# dtypes and opcodes (shared convention with native/trace.cpp; the native
# side treats opcodes opaquely -- only 0 = evaluated leaf is special)
# ---------------------------------------------------------------------------

_DTYPES = [jnp.float32, jnp.float64, jnp.int32, jnp.uint32, jnp.bool_,
           jnp.bfloat16, jnp.int64, jnp.uint64]
_DTYPE_CODE = {jnp.dtype(d): i for i, d in enumerate(_DTYPES)}


def _code_of(dtype) -> int:
    return _DTYPE_CODE[jnp.dtype(dtype)]


# unsigned carriers for reinterpreting literal bit patterns per item size
_LIT_CARRIER = {2: np.uint16, 4: np.uint32, 8: np.uint64}


def _literal_bits(value, code) -> int:
    """Encode a Python scalar as its dtype bit pattern, zero-extended to
    64 bits. Bit-exact for every dtype in _DTYPES (a double carrier would
    silently truncate int64/uint64 literals >= 2^53)."""
    npdt = np.dtype(_DTYPES[code])
    if npdt == np.bool_:
        return int(bool(value))
    v = np.asarray(value).astype(npdt)  # wraps/rounds per dtype rules
    return int(v.view(_LIT_CARRIER[npdt.itemsize]))


class Op:
    """Opcode table. Each entry maps to a jnp implementation in _OP_IMPL."""
    (LEAF, ADD, SUB, MUL, DIV, NEG, ABS, MIN, MAX, FMA, SQRT, RSQRT, RCP,
     FLOOR, CEIL, ROUND, TRUNC, EXP, EXP2, LOG, LOG2, SIN, COS, TAN, ASIN,
     ACOS, ATAN, SINH, COSH, TANH, ERF, ATAN2, POW, MOD, EQ, NE, LT, LE, GT,
     GE, AND, OR, XOR, NOT, SELECT, CAST, IOTA, GATHER, SCATTER, SCATTER_ADD,
     HSUM, HPROD, HMIN, HMAX, ALL, ANY, COUNT, PSUM, REVERSE, SHL, SHR,
     POPCNT, CBRT, SIGN, COPYSIGN, LOG1P, EXPM1, ASINH, ACOSH, ATANH,
     ERFC, LGAMMA, ISNAN, ISINF, ISFINITE, COMPRESS, FMOD) = range(77)


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
    Op.GATHER: lambda src, idx: src[idx],
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
    # reference sign semantics: sign(0) = 1 (branchless copysign flavor,
    # matching enoki_tpu.ops.sign)
    Op.SIGN: lambda a: jnp.where(a < 0, -1, 1).astype(a.dtype),
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
# scatter ops pending rebind: scatter var id -> target var id
_SCATTER_TARGET: dict = {}


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
    _BUFFERS.clear()
    _SCATTER_TARGET.clear()
    _GRAD_ENABLED.clear()
    _GRADS.clear()
    clear_cache()
    _lib.et_reset()


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


def _build_program(entries, out_positions):
    """Build a jax-traceable function from a schedule walk.

    Called once per structural hash (cache miss); the returned function is
    jax.jit-compiled and reused for every trace with the same structure.
    """

    def program(leaf_args, lits):
        vals = [None] * len(entries)
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
                vals[i] = jnp.full((size,), lits[dtype_c][lit_i[dtype_c]])
                lit_i[dtype_c] += 1
            elif is_data:
                vals[i] = leaf_args[leaf_i]
                leaf_i += 1
            elif opcode == Op.IOTA:
                vals[i] = jnp.arange(size, dtype=dt)
            elif opcode == Op.CAST:
                vals[i] = vals[dep_pos[0]].astype(dt)
            else:
                args = [vals[p] for p in dep_pos if p != 0xFFFFFFFF]
                vals[i] = _OP_IMPL[opcode](*args)
        return tuple(vals[p] for p in out_positions)

    return program


def _read_schedule(n_entries):
    u32, i32, u64 = ctypes.c_uint32, ctypes.c_int32, ctypes.c_uint64
    entries = []
    for i in range(n_entries):
        vid, opc, dtc, size = u32(), i32(), i32(), u64()
        deps = (u32 * 4)()
        lit, isl, isd = u64(), i32(), i32()
        _lib.et_schedule_entry(i, ctypes.byref(vid), ctypes.byref(opc),
                               ctypes.byref(dtc), ctypes.byref(size), deps,
                               ctypes.byref(lit), ctypes.byref(isl),
                               ctypes.byref(isd))
        entries.append((vid.value, opc.value, dtc.value, size.value,
                        tuple(deps), lit.value, isl.value, isd.value))
    n_out = _lib.et_schedule_num_outputs()
    outs = [_lib.et_schedule_output(i) for i in range(n_out)]
    return entries, outs


def _collect_literals(n):
    """Literal values of the current schedule as runtime inputs: one
    typed stream per dtype, reconstructed bit-exactly from the 64-bit
    patterns the native side carries (no f64->f32 squeeze, no mod-2^32
    truncation of 64-bit integers)."""
    cap = max(n, 1)
    bbuf = (ctypes.c_uint64 * cap)()
    cbuf = (ctypes.c_int32 * cap)()
    n_lit = _lib.et_schedule_literals(bbuf, cbuf, cap)
    bits = np.frombuffer(bbuf, np.uint64, n_lit)
    codes = np.frombuffer(cbuf, np.int32, n_lit)
    streams = []
    for code, dt in enumerate(_DTYPES):
        sel = bits[codes == code]
        npdt = np.dtype(dt)
        if npdt == np.bool_:
            arr = sel.astype(np.bool_)
        else:
            arr = sel.astype(_LIT_CARRIER[npdt.itemsize]).view(npdt)
        streams.append(jnp.asarray(arr))
    return tuple(streams)


def _eval_ids(ids):
    """Evaluate the given variable ids (plus pending side effects)."""
    global _CACHE_HITS, _CACHE_MISSES
    ids = [i for i in ids if not _lib.et_var_materialized(i)]
    if not ids and _lib.et_num_side_effects() == 0:
        return
    arr = (ctypes.c_uint32 * max(len(ids), 1))(*ids)
    n = _lib.et_schedule(arr, len(ids))
    key = _lib.et_schedule_hash()

    exe = _EXE_CACHE.get(key)
    if exe is None:
        _CACHE_MISSES += 1
        entries, out_positions = _read_schedule(n)
        program = _build_program(entries, out_positions)
        exe = jax.jit(program)
        _EXE_CACHE[key] = exe
    else:
        _CACHE_HITS += 1

    # cache-hit fast path: only the data-leaf ids (executable inputs, in
    # schedule order), literal values and output ids are needed -- three
    # bulk calls instead of an O(n)-ctypes-roundtrip schedule walk
    buf = (ctypes.c_uint32 * n)()
    n_data = _lib.et_schedule_data_ids(buf, n)
    leaves = [_BUFFERS[buf[i]] for i in range(n_data)]
    lits = _collect_literals(n)
    n_out = _lib.et_schedule_output_ids(buf, n)
    out_vids = [buf[i] for i in range(n_out)]

    results = exe(leaves, lits)

    # store outputs; scatter results rebind their TARGET's buffer (enoki
    # scatters write into the target's storage; readers see the update
    # after eval -- the dirty-flag protocol, jit.cu:674,719-730)
    out_ids = []
    for vid, r in zip(out_vids, results):
        if vid == 0:
            continue
        out_ids.append(vid)
        tgt = _SCATTER_TARGET.pop(vid, None)
        _BUFFERS[vid] = r
        _lib.et_set_materialized(vid)
        if tgt is not None:
            if _lib.et_var_exists(tgt):
                _BUFFERS[tgt] = r
                _lib.et_set_materialized(tgt)
            _lib.et_dec_ref_ext(vid)  # release the pending-rebind claim
    _lib.et_clear_side_effects()
    # drop buffers for vars the native side has already freed
    for vid in list(_BUFFERS):
        if not _lib.et_var_exists(vid):
            del _BUFFERS[vid]


def eval(*arrays) -> None:  # noqa: A001  (mirrors enoki's cuda_eval name)
    """Force evaluation of the given LazyArrays (or all side effects)."""
    _eval_ids([a.index for a in arrays])


# ---------------------------------------------------------------------------
# LazyArray
# ---------------------------------------------------------------------------


# precomputed 8x8 promotion table: jnp.promote_types costs ~6 us/call,
# which would dominate trace-append time (the append itself is ~1 us)
_PROMOTE = [[_DTYPE_CODE[jnp.promote_types(a, b)] for b in _DTYPES]
            for a in _DTYPES]


def _binary_dtype(a_code, b_code):
    return _PROMOTE[a_code][b_code]


class LazyArray:
    """Lazy 1-D array handle (the FloatC analog, cuda.h:206).

    Operations record into the native trace; nothing runs until eval() /
    numpy() / item access forces the fused program.
    """

    __slots__ = ("index", "_size", "_code")

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
        self.index = _lib.et_data(self._code, self._size)
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

    def __del__(self):
        try:
            _lib.et_dec_ref_ext(self.index)
        except (TypeError, AttributeError):  # interpreter teardown
            pass

    def __len__(self):
        return self._size

    @property
    def size(self):
        return len(self)

    @property
    def dtype(self):
        return jnp.dtype(_DTYPES[self._code])

    @property
    def materialized(self):
        return bool(_lib.et_var_materialized(self.index))

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
        if _lib.et_is_dirty(self.index):
            _eval_ids([self.index])

    @staticmethod
    def _record(opcode, dtype_code, size, *dep_arrays, raw=False):
        for d in dep_arrays:
            d._ensure_clean()
        deps = [d.index for d in dep_arrays] + [0] * (4 - len(dep_arrays))
        append = _lib.et_append_raw if raw else _lib.et_append
        idx = append(opcode, dtype_code, size, *deps)
        if idx == 0:
            sizes = [len(d) for d in dep_arrays]
            raise ValueError(f"incompatible sizes for trace op: {sizes}")
        return LazyArray(index=idx, _size=size, _code=dtype_code)

    def _coerce(self, other):
        if isinstance(other, LazyArray):
            return other
        if isinstance(other, (int, float, bool)):
            code = self._code
            bits = _literal_bits(other, code)
            return LazyArray(index=_lib.et_literal(code, bits, 1),
                             _size=1, _code=code)
        return LazyArray(other)

    def _bin(self, other, opcode, out_dtype=None, swap=False):
        other = self._coerce(other)
        a, b = (other, self) if swap else (self, other)
        dc = _binary_dtype(a._code,
                           b._code) \
            if out_dtype is None else out_dtype
        return LazyArray._record(opcode, dc, max(len(a), len(b)), a, b)

    def _unary(self, opcode, out_dtype=None):
        dc = self._code if out_dtype is None else out_dtype
        return LazyArray._record(opcode, dc, len(self), self)

    __add__ = lambda s, o: s._bin(o, Op.ADD)
    __radd__ = lambda s, o: s._bin(o, Op.ADD, swap=True)
    __sub__ = lambda s, o: s._bin(o, Op.SUB)
    __rsub__ = lambda s, o: s._bin(o, Op.SUB, swap=True)
    __mul__ = lambda s, o: s._bin(o, Op.MUL)
    __rmul__ = lambda s, o: s._bin(o, Op.MUL, swap=True)
    __truediv__ = lambda s, o: s._bin(o, Op.DIV)
    __rtruediv__ = lambda s, o: s._bin(o, Op.DIV, swap=True)
    __mod__ = lambda s, o: s._bin(o, Op.MOD)
    __pow__ = lambda s, o: s._bin(o, Op.POW)
    __neg__ = lambda s: s._unary(Op.NEG)
    __abs__ = lambda s: s._unary(Op.ABS)
    __and__ = lambda s, o: s._bin(o, Op.AND)
    __or__ = lambda s, o: s._bin(o, Op.OR)
    __xor__ = lambda s, o: s._bin(o, Op.XOR)
    __invert__ = lambda s: s._unary(Op.NOT)
    __lshift__ = lambda s, o: s._bin(o, Op.SHL)
    __rshift__ = lambda s, o: s._bin(o, Op.SHR)

    _BOOL = 4  # dtype code of jnp.bool_

    __eq__ = lambda s, o: s._bin(o, Op.EQ, out_dtype=LazyArray._BOOL)
    __ne__ = lambda s, o: s._bin(o, Op.NE, out_dtype=LazyArray._BOOL)
    __lt__ = lambda s, o: s._bin(o, Op.LT, out_dtype=LazyArray._BOOL)
    __le__ = lambda s, o: s._bin(o, Op.LE, out_dtype=LazyArray._BOOL)
    __gt__ = lambda s, o: s._bin(o, Op.GT, out_dtype=LazyArray._BOOL)
    __ge__ = lambda s, o: s._bin(o, Op.GE, out_dtype=LazyArray._BOOL)
    __hash__ = None

    def cast(self, dtype):
        return self._unary(Op.CAST, _code_of(dtype))

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
        index = self._coerce(index)
        value = self._coerce(value)
        op = LazyArray._record(opcode, self._code,
                               len(self), self, index, value, raw=True)
        _lib.et_mark_side_effect(op.index, self.index)
        _SCATTER_TARGET[op.index] = self.index
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


_PY_SCALAR_CODE = {bool: 4, int: 2, float: 0}  # bool_, int32, float32


def select(mask: LazyArray, a, b):
    """Lazy select(mask, a, b). Python-scalar operands coerce against the
    other *value* operand's dtype -- never the mask's bool dtype, which
    would collapse select(m, 5.0, x) to a bool literal."""
    ref = a if isinstance(a, LazyArray) else \
        b if isinstance(b, LazyArray) else None
    if ref is not None:
        a, b = ref._coerce(a), ref._coerce(b)
    else:
        a = LazyArray.literal(a, 1, _DTYPES[_PY_SCALAR_CODE[type(a)]])
        b = LazyArray.literal(b, 1, _DTYPES[_PY_SCALAR_CODE[type(b)]])
    dc = _binary_dtype(a._code, b._code)
    return LazyArray._record(Op.SELECT, dc, max(len(mask), len(a), len(b)),
                             mask, a, b)


# ---------------------------------------------------------------------------
# AD over the lazy trace: the DiffArray<CUDAArray<float>> analog (FloatD).
#
# The reference wraps the lazy GPU array in an AD tape (autodiff.h:126):
# requires_grad marks parameters, backward(loss) walks the tape,
# gradient(x) reads the result. Here the recorded trace IS the tape: at
# backward() time the C++ schedule for the loss is turned into a jax
# program over its data leaves and differentiated with jax.vjp w.r.t. the
# marked leaves -- one fused forward+backward XLA program, cached by the
# same structural hash as eval (so repeated optimization steps with fresh
# data hit the executable cache).
#
# Contract: requires_grad() targets must be evaluated leaves (parameters
# are; the call evals them if not), and backward(loss) must run before
# the loss itself is evaluated -- eval() collapses the consumed subgraph
# (jit.cu:1484-1507 releases it the same way), after which there is no
# tape left to walk. backward() returns the primal loss value, so no
# second eval is needed.
# ---------------------------------------------------------------------------

_GRAD_ENABLED: set = set()   # var ids marked as differentiable parameters
_GRADS: dict = {}            # var id -> gradient device buffer


def requires_grad(x: "LazyArray", flag: bool = True) -> "LazyArray":
    """Mark a (leaf) array as differentiable (set_requires_gradient,
    autodiff.h)."""
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
    """Gradient accumulated by the last backward()/forward_from() pass
    (``gradient(x)``, array_router.h:702). Returns a LazyArray, zeros if
    no gradient reached x."""
    g = _GRADS.get(x.index)
    if g is None:
        g = jnp.zeros((len(x),), x.dtype)
    return LazyArray(g)


def clear_gradients():
    _GRADS.clear()


def _loss_program_and_leaves(loss: "LazyArray"):
    if loss.materialized:
        raise ValueError(
            "backward()/forward_from() need the unevaluated trace: call "
            "them before reading the loss (they return/propagate values "
            "themselves)")
    if _lib.et_num_side_effects():
        _eval_ids([])  # flush pending scatters so the tape is closed
    arr = (ctypes.c_uint32 * 1)(loss.index)
    n = _lib.et_schedule(arr, 1)
    entries, out_positions = _read_schedule(n)
    key = _lib.et_schedule_hash()
    leaf_ids = [e[0] for e in entries if e[7]]
    return entries, out_positions, key, leaf_ids


def _split_program(entries, out_positions, marked_pos, n_leaves):
    program = _build_program(entries, out_positions)
    mset = set(marked_pos)

    def fn(marked, others, lits):
        leaves, mi, oi = [], 0, 0
        for k in range(n_leaves):
            if k in mset:
                leaves.append(marked[mi])
                mi += 1
            else:
                leaves.append(others[oi])
                oi += 1
        return program(leaves, lits)[0]

    return fn


def backward(loss: "LazyArray", grad_out=1.0) -> jnp.ndarray:
    """Reverse pass from ``loss`` into every requires_grad leaf
    (``backward(loss)``, autodiff.h:1490 -> autodiff.cpp:838). Returns the
    primal loss value (materialized as a side effect of the fused
    forward+backward program)."""
    global _CACHE_HITS, _CACHE_MISSES
    entries, out_positions, key, leaf_ids = _loss_program_and_leaves(loss)
    marked_pos = [k for k, i in enumerate(leaf_ids) if i in _GRAD_ENABLED]
    n_leaves = len(leaf_ids)

    ckey = ("bwd", key, tuple(marked_pos))
    exe = _EXE_CACHE.get(ckey)
    if exe is None:
        _CACHE_MISSES += 1
        fn = _split_program(entries, out_positions, marked_pos, n_leaves)

        def run(marked, others, lits, ct):
            val, vjp_fn = jax.vjp(
                lambda m: fn(m, others, lits), marked)
            (gs,) = vjp_fn(jnp.broadcast_to(ct, val.shape).astype(val.dtype))
            return val, gs

        exe = jax.jit(run)
        _EXE_CACHE[ckey] = exe
    else:
        _CACHE_HITS += 1

    mset = set(marked_pos)
    marked = [_BUFFERS[leaf_ids[k]] for k in marked_pos]
    others = [_BUFFERS[i] for k, i in enumerate(leaf_ids) if k not in mset]
    lits = _collect_literals(len(entries))
    val, gs = exe(marked, others, lits, jnp.asarray(grad_out))

    _BUFFERS[loss.index] = val
    _lib.et_set_materialized(loss.index)
    for k, g in zip(marked_pos, gs):
        vid = leaf_ids[k]
        prev = _GRADS.get(vid)
        _GRADS[vid] = g if prev is None else prev + g
    return val


def forward_from(x: "LazyArray", loss: "LazyArray", tangent=1.0):
    """Forward mode from parameter ``x`` to ``loss`` (``forward(x)``,
    autodiff.cpp:912): propagates a tangent and stores d loss / d x in the
    loss's gradient slot. Returns (loss value, tangent_out)."""
    global _CACHE_HITS, _CACHE_MISSES
    if x.index not in _GRAD_ENABLED:
        requires_grad(x)
    entries, out_positions, key, leaf_ids = _loss_program_and_leaves(loss)
    if x.index not in leaf_ids:
        raise ValueError("forward_from: x is not a leaf of the loss trace")
    pos = leaf_ids.index(x.index)
    n_leaves = len(leaf_ids)

    ckey = ("fwd", key, pos)
    exe = _EXE_CACHE.get(ckey)
    if exe is None:
        _CACHE_MISSES += 1
        fn = _split_program(entries, out_positions, [pos], n_leaves)

        def run(xbuf, others, lits, t):
            return jax.jvp(lambda m: fn([m], others, lits),
                           (xbuf,),
                           (jnp.broadcast_to(t, xbuf.shape)
                            .astype(xbuf.dtype),))

        exe = jax.jit(run)
        _EXE_CACHE[ckey] = exe
    else:
        _CACHE_HITS += 1

    others = [_BUFFERS[i] for k, i in enumerate(leaf_ids) if k != pos]
    lits = _collect_literals(len(entries))
    val, tang = exe(_BUFFERS[x.index], others, lits,
                    jnp.asarray(tangent))
    _BUFFERS[loss.index] = val
    _lib.et_set_materialized(loss.index)
    prev = _GRADS.get(loss.index)
    _GRADS[loss.index] = tang if prev is None else prev + tang
    return val, tang


def _out_code(in_code, kind):
    if kind == "bool":
        return LazyArray._BOOL
    if kind == "float" and in_code not in (0, 1, 5):  # f32/f64/bf16
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
            return LazyArray._record(opcode, x._code,
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
           "lerp", "sincos", "fmod"] + list(_MATH_OPS)
