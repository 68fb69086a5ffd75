"""Core op set: the TPU-native analog of the reference's op router.

The reference routes every operation through ~150 free functions in
``include/enoki/array_router.h`` which dispatch on type traits to a scalar
fallback, a SIMD intrinsic, a dynamic packet loop, a CUDA trace append, or an
AD tape append.  Under JAX there is exactly one backend -- traced jnp ops
fused by XLA -- so this module is a *flat* functional API with enoki's
semantics (masks, broadcast rules, gather/scatter conventions) expressed the
TPU way: ``jnp.where`` for select, ``take``/``.at[]`` for gather/scatter,
static shapes throughout.

Reference parity map (file:line points at the reference behaviour replicated):
  select            array_router.h:481
  gather/scatter    array_router.h:1071,1113 (masked variants; index arrays)
  scatter_add       array_router.h:1198 (atomic adds -> ``.at[].add``)
  transform         array_router.h:1171 (read-modify-write scatter)
  arange/linspace/full/zero  array_router.h:722-789
  fmadd/fmsub/...   array_router.h (ENOKI_ROUTE_TERNARY fmadd_)
  rcp/rsqrt         array_fallbacks.h:104,188 (Newton-refined HW approx)
  popcnt/lzcnt/tzcnt array_fallbacks.h:227,259,290
  ldexp/frexp       array_fallbacks.h:310,334
  mulhi             array_fallbacks.h:393
  allclose          array_router.h:1310
  lerp/clamp        array_math.h:1352-1364
  sign/copysign/mulsign  array_router.h (sign helpers)
  isnan/isinf/isfinite + inf/nan constants
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Lazy-backend routing helpers: "one source, every backend". Free functions
# below accept LazyArray operands and record trace ops (the reference's
# array_router.h route macros dispatch the same call to the CUDA trace
# backend, :23-158); jnp operands keep the eager XLA path.
# ---------------------------------------------------------------------------


def _lazy_any(*xs):
    from . import backend as B

    return any(B.is_lazy(x) for x in xs)


def _lift(v):
    """Coerce v onto the trace: LazyArray passes through, scalars stay
    scalars (trace ops coerce them per-operand), arrays become data
    leaves."""
    from . import backend as B

    if B.is_lazy(v) or isinstance(v, (bool, int, float)):
        return v
    import enoki_tpu.trace as t

    return t.LazyArray(jnp.atleast_1d(jnp.asarray(v)))


def _lift_arr(v):
    """Like _lift but scalars become size-1 data leaves too (for slots
    that must be arrays, e.g. gather indices)."""
    from . import backend as B

    if B.is_lazy(v):
        return v
    import enoki_tpu.trace as t

    return t.LazyArray(jnp.atleast_1d(jnp.asarray(v)))


# ---------------------------------------------------------------------------
# Constructors (array_router.h:722-789)
# ---------------------------------------------------------------------------


def zeros(shape, dtype=jnp.float32):
    """``zero<Array>(size)`` (array_router.h:789)."""
    return jnp.zeros(shape, dtype)


def full(shape, value, dtype=None):
    """``full<Array>(value, size)`` (array_router.h:766)."""
    return jnp.full(shape, value, dtype)


def empty(shape, dtype=jnp.float32):
    # XLA has no uninitialized memory; debug-mode NaN-fill of the reference
    # (array_generic.h:95-103) is the *defined* behaviour here.
    return jnp.full(shape, jnp.nan if jnp.issubdtype(dtype, jnp.floating) else 0, dtype)


def arange(n, dtype=jnp.int32):
    """``arange<Array>(n)`` (array_router.h:722)."""
    return jnp.arange(n, dtype=dtype)


def linspace(start, stop, num, dtype=jnp.float32):
    """``linspace<Array>(min, max, size)`` (array_router.h:745).

    Matches the reference: endpoints inclusive, step = (max-min)/(size-1).
    """
    return jnp.linspace(start, stop, num, dtype=dtype)


def meshgrid(x, y):
    """``meshgrid(x, y)`` (array_utils.h:24).

    The reference returns a pair of flat arrays of length ``len(x)*len(y)``
    where x varies fastest -- exactly numpy's 'xy' indexing, flattened.
    Returns a (2, N) stacked array's components as a tuple ``(xs, ys)``.

    LazyArray inputs: the index patterns enter as data leaves and the
    expansion is a pair of lazy gathers (the reference's CUDA meshgrid
    composes idiv + gather the same way, array_utils.h:24).
    """
    if _lazy_any(x, y):
        import enoki_tpu.trace as t

        x, y = _lift_arr(x), _lift_arr(y)
        nx, ny = len(x), len(y)
        xi = t.LazyArray(jnp.tile(jnp.arange(nx, dtype=jnp.int32), ny))
        yi = t.LazyArray(jnp.repeat(jnp.arange(ny, dtype=jnp.int32), nx))
        return x.gather(xi), y.gather(yi)
    xs, ys = jnp.meshgrid(x, y, indexing="xy")
    return xs.reshape(-1), ys.reshape(-1)


# ---------------------------------------------------------------------------
# Select / masking (array_router.h:481)
# ---------------------------------------------------------------------------


def select(mask, a, b):
    """``select(mask, a, b)``: lanewise mask ? a : b. Accepts LazyArray
    operands (records Op.SELECT; array_router.h:481 routes to the lazy
    backend the same way)."""
    if _lazy_any(mask, a, b):
        import enoki_tpu.trace as t

        return t.select(_lift_arr(mask), _lift(a), _lift(b))
    return jnp.where(mask, a, b)


def masked_assign(x, mask, value):
    """Functional form of ``masked(x, m) = v`` (array_masked.h).

    Returns the new array; JAX arrays are immutable so the proxy-assignment
    of the reference becomes a pure update.
    """
    if _lazy_any(x, mask, value):
        import enoki_tpu.trace as t

        return t.select(_lift_arr(mask), _lift(value), _lift(x))
    return jnp.where(mask, value, x)


# ---------------------------------------------------------------------------
# Fused arithmetic (router fmadd_/fmsub_ family)
# ---------------------------------------------------------------------------


def fmadd(a, b, c):
    return a * b + c


def fmsub(a, b, c):
    return a * b - c


def fnmadd(a, b, c):
    return c - a * b


def fnmsub(a, b, c):
    return -(a * b) - c


def _odd_lanes(a, b, c):
    """Boolean odd-lane mask over the broadcast shape; 0-d inputs have a
    single (even) lane, matching the scalar fallback of fmaddsub_."""
    shape = jnp.broadcast_shapes(jnp.shape(a), jnp.shape(b), jnp.shape(c))
    n = shape[-1] if shape else 1
    return (jnp.arange(n) % 2).astype(bool)


def _odd_lanes_lazy(a, b, c):
    import enoki_tpu.trace as t
    from . import backend as B

    # broadcast width over ALL operands (a wider eager operand sets the
    # lane count, exactly like the eager _odd_lanes)
    def w(v):
        if B.is_lazy(v):
            return len(v)
        s = jnp.shape(v)
        return s[-1] if s else 1

    n = max(w(v) for v in (a, b, c))
    return (t.LazyArray.arange(n) & 1) == 1


def fmaddsub(a, b, c):
    """Even lanes a*b-c, odd lanes a*b+c (array_router.h fmaddsub_)."""
    if _lazy_any(a, b, c):
        import enoki_tpu.trace as t

        return t.select(_odd_lanes_lazy(a, b, c), a * b + c, a * b - c)
    return jnp.where(_odd_lanes(a, b, c), a * b + c, a * b - c)


def fmsubadd(a, b, c):
    if _lazy_any(a, b, c):
        import enoki_tpu.trace as t

        return t.select(_odd_lanes_lazy(a, b, c), a * b - c, a * b + c)
    return jnp.where(_odd_lanes(a, b, c), a * b - c, a * b + c)


# ---------------------------------------------------------------------------
# Approximate reciprocal / rsqrt with Newton refinement
# (array_fallbacks.h:104-188: uses HW rcp/rsqrt estimate + one NR step)
# ---------------------------------------------------------------------------


def rcp(x):
    """Reciprocal. XLA emits the optimal divide; parity op for rcp<Approx>."""
    return 1.0 / x  # generic: LazyArray __rtruediv__ records Op.DIV


def rsqrt(x):
    """Reciprocal square root, lowered to the TPU's native rsqrt."""
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.rsqrt(x)
    return lax.rsqrt(x)


# ---------------------------------------------------------------------------
# Bit manipulation (array_fallbacks.h:227-310)
# ---------------------------------------------------------------------------


def popcnt(x):
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.popcnt(x)
    return lax.population_count(jnp.asarray(x))


def lzcnt(x):
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.clz(x)
    return lax.clz(jnp.asarray(x))


def tzcnt(x):
    if _lazy_any(x):
        import enoki_tpu.trace as t

        nbits = jnp.iinfo(x.dtype).bits
        isolated = x & (-x)
        return t.select(x == 0, nbits,
                        (nbits - 1) - t.clz(isolated))
    x = jnp.asarray(x)
    nbits = jnp.iinfo(x.dtype).bits
    # tzcnt(x) = nbits - lzcnt(x & -x) - 1 for x != 0; = nbits for x == 0
    isolated = x & (-x).astype(x.dtype)
    return jnp.where(x == 0, nbits, nbits - 1 - lax.clz(isolated))


def log2i(x):
    """Integer log2 (array_router.h log2i): position of the highest set bit."""
    if _lazy_any(x):
        import enoki_tpu.trace as t

        nbits = jnp.iinfo(x.dtype).bits
        return (nbits - 1) - t.clz(x)
    x = jnp.asarray(x)
    nbits = jnp.iinfo(x.dtype).bits
    return (nbits - 1) - lax.clz(x)


def mulhi(a, b):
    """High half of a full-width integer multiply (array_fallbacks.h:393).

    TPU has no 64-bit ints; for 32-bit inputs we widen via 16-bit partial
    products so the op stays in native 32-bit lanes.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b, a.dtype)
    if a.dtype in (jnp.int64, jnp.uint64):
        # Only reachable with x64 enabled; use numpy-style widening trick.
        raise NotImplementedError("64-bit mulhi: use types.u64 module")
    unsigned = jnp.issubdtype(a.dtype, jnp.unsignedinteger)
    ua = a.astype(jnp.uint32)
    ub = b.astype(jnp.uint32)
    a_lo, a_hi = ua & 0xFFFF, ua >> 16
    b_lo, b_hi = ub & 0xFFFF, ub >> 16
    # 32-bit partial products of 16-bit halves never overflow.
    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    if unsigned:
        return hi
    # Signed correction: subtract (a<0 ? b : 0) and (b<0 ? a : 0).
    hi = hi.astype(jnp.int32)
    hi = hi - jnp.where(a < 0, b, 0).astype(jnp.int32) - jnp.where(b < 0, a, 0).astype(jnp.int32)
    return hi


def ror(x, k):
    """Rotate right (used by PCG32, random.h:77)."""
    x = jnp.asarray(x)
    nbits = jnp.iinfo(x.dtype).bits
    k = jnp.asarray(k, x.dtype) & (nbits - 1)
    return (x >> k) | (x << ((nbits - k) & (nbits - 1)))


def rol(x, k):
    x = jnp.asarray(x)
    nbits = jnp.iinfo(x.dtype).bits
    k = jnp.asarray(k, x.dtype) & (nbits - 1)
    return (x << k) | (x >> ((nbits - k) & (nbits - 1)))


def reinterpret(x, dtype):
    """Bit-level reinterpret cast (``reinterpret_array``, fwd.h:323 memcpy_cast)."""
    if _lazy_any(x):
        return x.bitcast(dtype)
    return lax.bitcast_convert_type(x, dtype)


# ---------------------------------------------------------------------------
# ldexp / frexp (array_fallbacks.h:310,334)
# ---------------------------------------------------------------------------


def ldexp(x, e):
    """x * 2^e via direct exponent-field arithmetic (finite x, moderate e).

    Zero inputs stay zero (the exponent-add trick alone would corrupt them);
    inf/NaN propagate unchanged -- same contract as the reference's
    vectorized path (array_fallbacks.h:310, which also assumes normal x).
    """
    if _lazy_any(x, e):
        import enoki_tpu.trace as t

        x = _lift_arr(x)
        if x.dtype == jnp.float64:
            mbits, itype = 52, jnp.int64
        else:
            # upcast everything else (ints AND the 2-byte floats, whose
            # itemsize would break the int32 bitcast) -- same promotion
            # as the eager branch below
            if x.dtype != jnp.float32:
                x = x.cast(jnp.float32)
            mbits, itype = 23, jnp.int32
        e = (e if _lazy_any(e) else _lift_arr(e)).cast(itype)
        bits = x.bitcast(itype)
        scaled = (bits + (e << mbits)).bitcast(x.dtype)
        return t.select((x == 0.0) | ~t.isfinite(x), x, scaled)
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        ebits, mbits, itype = 11, 52, jnp.int64
    else:
        x = x.astype(jnp.float32)
        ebits, mbits, itype = 8, 23, jnp.int32
    e = jnp.asarray(e).astype(itype)
    bits = lax.bitcast_convert_type(x, itype)
    scaled = lax.bitcast_convert_type(bits + (e << mbits), x.dtype)
    return jnp.where((x == 0) | ~jnp.isfinite(x), x, scaled)


def frexp(x):
    """Split into (mantissa, exponent).

    Reference convention (array_fallbacks.h:334, used by log): mantissa in
    [0.5, 1) represented as m in [1,2)/2 and e such that x = m * 2^e... The
    reference returns the *hardware* getexp/getmant convention: mantissa in
    [1, 2) and exponent e with x = mant * 2^e (vtestexp convention); its
    scalar fallback matches std::frexp up to offset. We return
    (mantissa in [0.5, 1), exponent) matching std::frexp so that
    x == mantissa * 2**exponent.
    """
    if _lazy_any(x):
        import enoki_tpu.trace as t

        if x.dtype == jnp.float64:
            ebits, mbits, itype, bias = 11, 52, jnp.int64, 1023
        else:
            # upcast ints AND 2-byte floats (itemsize must match the
            # int32 bitcast) -- same promotion as the eager branch
            if x.dtype != jnp.float32:
                x = x.cast(jnp.float32)
            ebits, mbits, itype, bias = 8, 23, jnp.int32, 127
        bits = x.bitcast(itype)
        emask = (1 << ebits) - 1
        raw_exp = (bits >> mbits) & emask
        exp = raw_exp - (bias - 1)
        mant_bits = (bits & ~(emask << mbits)) | ((bias - 1) << mbits)
        mant = mant_bits.bitcast(x.dtype)
        zero = x == 0.0
        return (t.select(zero, x._coerce(0.0), mant),
                t.select(zero, exp._coerce(0), exp))
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        ebits, mbits, itype, bias = 11, 52, jnp.int64, 1023
    else:
        x = x.astype(jnp.float32)
        ebits, mbits, itype, bias = 8, 23, jnp.int32, 127
    bits = lax.bitcast_convert_type(x, itype)
    raw_exp = (bits >> mbits) & ((1 << ebits) - 1)
    exp = raw_exp - (bias - 1)
    mant_bits = (bits & ~(((1 << ebits) - 1) << mbits)) | ((bias - 1) << mbits)
    mant = lax.bitcast_convert_type(mant_bits, x.dtype)
    zero = x == 0
    return jnp.where(zero, 0.0, mant), jnp.where(zero, 0, exp)


# ---------------------------------------------------------------------------
# Gather / scatter / transform (array_router.h:1071-1198, array_struct.h)
# ---------------------------------------------------------------------------


def gather(source, index, mask=None, fill=0):
    """``gather<Array>(ptr, index, mask)`` (array_router.h:1071).

    Masked-off lanes produce ``fill`` (the reference produces 0 via a masked
    load, cuda.h:846). Out-of-range indices clamp (XLA semantics); masked
    lanes are forced in-range first so the clamp can't hide a real OOB under
    a valid mask.

    LazyArray operands record a trace gather (cuda.h:846's masked
    ld.global analog) -- the fused program keeps the gather lazy.
    """
    if _lazy_any(source, index, mask):
        import enoki_tpu.trace as t

        source, index = _lift_arr(source), _lift_arr(index)
        if mask is not None:
            mask = _lift_arr(mask)
            index = t.select(mask, index, 0)
        out = source.gather(index)
        if mask is not None:
            out = t.select(mask, out, _lift(fill))
        return out
    source = jnp.asarray(source)
    index = jnp.asarray(index)
    if mask is not None:
        index = jnp.where(mask, index, 0)
    out = jnp.take(source, index, axis=0, mode="clip")
    if mask is not None:
        out = jnp.where(_bcast_mask(mask, out), out, fill)
    return out


def _bcast_mask(mask, like):
    mask = jnp.asarray(mask)
    while mask.ndim < jnp.ndim(like):
        mask = mask[..., None]
    return mask


def _oob_mode():
    """Unmasked-scatter out-of-range mode. The reference is UB there
    (raw st.global); the fast default matches it (promise_in_bounds),
    and ``config.debug_bounds`` turns silent corruption into a
    deterministic drop -- read at trace time."""
    from ..config import config

    return "drop" if config.debug_bounds else "promise_in_bounds"


def scatter(target, value, index, mask=None):
    """``scatter(ptr, value, index, mask)`` (array_router.h:1113).

    Last-write-wins for duplicate indices is *not* guaranteed by the
    reference (CUDA st.global race); XLA's scatter picks an arbitrary winner
    for duplicates in unsorted mode, which matches that contract.

    LazyArray target: records a lazy scatter into the target (the dirty
    protocol, jit.cu:674); masked-off lanes redirect to a dropped
    out-of-range slot. Returns the target (lazily updated in place).
    """
    if _lazy_any(target, value, index):
        import enoki_tpu.trace as t

        target = _lift_arr(target)
        index, value = _lift_arr(index), _lift(value)
        if mask is not None:
            index = t.select(_lift_arr(mask), index, len(target))
        return target.scatter(index, value)
    target = jnp.asarray(target)
    index = jnp.asarray(index)
    if mask is not None:
        # Redirect masked-off lanes to a dropped out-of-range index.
        index = jnp.where(mask, index, target.shape[0])
        if _oob_mode() == "drop":
            # debug mode: a negative in-mask index would still wrap via
            # .at[]'s numpy-style indexing -- redirect it to the dropped
            # slot too (mirrors the masked scatter_add path below)
            index = jnp.where(index < 0, target.shape[0], index)
        return target.at[index].set(value, mode="drop")
    mode = _oob_mode()
    if mode == "drop":
        # .at[] wraps negative indices BEFORE the mode applies -- redirect
        # them to the dropped slot or the debug mode would miss exactly
        # the corruption it exists to catch
        index = jnp.where(index < 0, target.shape[0], index)
    return target.at[index].set(value, mode=mode)


def scatter_add(target, value, index, mask=None):
    """``scatter_add`` (array_router.h:1198; cuda.h:893 atom.global.add).

    Conflict-safe accumulation; ``.at[].add`` is XLA's deterministic
    equivalent of the reference's atomics (and reproducible, unlike them).

    TPU fast path: XLA lowers scatter onto a serial update loop, which is
    ~100x slower than arithmetic for the histogram shape (many updates,
    small dense target -- measured 175 ms vs 2 ms for 16M -> 64 bins on
    v5e). When the target is 1-D, small, and heavily contended, the same
    result is computed as a fused equality-mask reduction:
    out[b] = sum_i where(index_i == b [and mask_i], value_i, 0),
    which never materializes the (N, bins) intermediate. Out-of-range
    indices match no bin, giving exactly the masked-drop semantics.

    LazyArray target: records a lazy conflict-safe scatter_add
    (atom.global.add analog, cuda.h:893); masked-off lanes redirect to a
    dropped slot. Returns the target (lazily updated in place).
    """
    if _lazy_any(target, value, index):
        import enoki_tpu.trace as t

        target = _lift_arr(target)
        index, value = _lift_arr(index), _lift(value)
        if mask is not None:
            # match the eager branch below: negative in-mask indices are
            # ALWAYS dropped here (they would wrap via the .at[].add
            # lowering), not only under debug_bounds
            oob = (index < index._coerce(0)) | ~_lift_arr(mask)
            index = t.select(oob, index._coerce(len(target)), index)
        return target.scatter_add(index, value)
    target = jnp.asarray(target)
    index = jnp.asarray(index)
    value = jnp.asarray(value)
    dense = (target.ndim == 1 and index.ndim == 1
             and target.shape[0] <= 1024
             and index.shape[0] >= 64 * target.shape[0])
    if dense:
        bins = jnp.arange(target.shape[0], dtype=index.dtype)
        hit = index[:, None] == bins[None, :]
        if mask is not None:
            hit = hit & _bcast_mask(mask, hit)
        v = jnp.broadcast_to(value, index.shape)[:, None]
        return target + jnp.sum(jnp.where(hit, v, 0), axis=0,
                                dtype=target.dtype)
    if mask is not None:
        # negative indices would wrap under jax .at[] semantics; both the
        # reference (masked st.global) and the dense path above drop them
        oob = (index < 0) | ~jnp.asarray(mask)
        index = jnp.where(oob, target.shape[0], index)
        return target.at[index].add(value, mode="drop")
    mode = _oob_mode()
    if mode == "drop":
        index = jnp.where(index < 0, target.shape[0], index)
    return target.at[index].add(value, mode=mode)


def transform(target, index, func, *args, mask=None):
    """Read-modify-write scatter (array_router.h:1171).

    ``func`` maps (current_value, *args) -> new_value. Applied atomically in
    the reference; here expressed as gather -> f -> scatter which is safe
    because duplicate indices are resolved by XLA scatter determinism only
    when func is an addition -- for general funcs the reference has the same
    duplicate-index caveat.
    """
    current = gather(target, index, mask=mask)
    updated = func(current, *args)
    return scatter(target, updated, index, mask=mask)


# ---------------------------------------------------------------------------
# Range / comparison helpers
# ---------------------------------------------------------------------------


def clamp(x, lo, hi):
    if _lazy_any(x, lo, hi):
        import enoki_tpu.trace as t

        x = _lift_arr(x)

        def _isfloat(v):
            if isinstance(v, float):
                return True
            dt = getattr(v, "dtype", None)
            return dt is not None and jnp.issubdtype(dt, jnp.inexact)

        if (not jnp.issubdtype(x.dtype, jnp.inexact)
                and (_isfloat(lo) or _isfloat(hi))):
            # match jnp.clip's promotion: float bounds against an int
            # array promote the ARRAY -- the trace's coerce-to-x rule
            # would instead truncate the bounds into the int dtype
            # (clamp(int32, 0.5, 1.5) silently becoming clamp(x, 0, 1))
            x = x.cast(jnp.result_type(x.dtype, 0.5))
        return t.clamp(x, _lift(lo), _lift(hi))
    return jnp.clip(x, lo, hi)


def lerp(a, b, t):
    """fmadd(t, b, fnmadd(t, a, a)) -- exact at endpoints (array_math.h:1354)."""
    return t * b + (a - t * a)


def sign(x):
    """Branchless sign: copysign(1, x) (reference sign semantics: sign(0)=1)."""
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.sign(x)
    x = jnp.asarray(x)
    one = jnp.ones((), x.dtype)
    return jnp.where(x < 0, -one, one) if not jnp.issubdtype(x.dtype, jnp.floating) else _copysign(one, x)


_SAME_WIDTH_INT = {2: jnp.int16, 4: jnp.int32, 8: jnp.int64}


def _copysign(a, b):
    a, b = jnp.asarray(a), jnp.asarray(b)
    dt = jnp.promote_types(a.dtype, b.dtype)
    if not jnp.issubdtype(dt, jnp.floating):
        # the IEEE sign-bit trick is meaningless on two's-complement
        # values (it would produce INT_MIN+|a| style garbage); promote
        # like jnp.copysign does, matching the lazy backend's
        # jnp.copysign lowering
        dt = jnp.promote_types(dt, jnp.float32)
    a, b = a.astype(dt), b.astype(dt)
    itype = _SAME_WIDTH_INT[jnp.dtype(dt).itemsize]
    ab = lax.bitcast_convert_type(a, itype)
    bb = lax.bitcast_convert_type(b, itype)
    nb = jnp.iinfo(itype).bits
    smask = jnp.ones((), itype) << (nb - 1)
    out = (ab & ~smask) | (bb & smask)
    return lax.bitcast_convert_type(out, dt)


def copysign(a, b):
    if _lazy_any(a, b):
        import enoki_tpu.trace as t

        return t.copysign(_lift_arr(a), _lift(b))
    return _copysign(a, b)


def mulsign(a, b):
    """a * sign(b) via sign-bit XOR (array_router.h mulsign)."""
    if _lazy_any(a, b):
        from .backend import _TRACE_MATH

        return _TRACE_MATH.mulsign(_lift_arr(a), _lift_arr(b))
    a, b = jnp.asarray(a), jnp.asarray(b)
    dt = jnp.promote_types(a.dtype, b.dtype)
    if not jnp.issubdtype(dt, jnp.floating):
        # integers have no sign BIT to XOR; a * sign(b) with the
        # reference's sign(0) = 1 convention, keeping the int dtype
        return jnp.where(jnp.asarray(b) < 0, -jnp.asarray(a),
                         jnp.asarray(a)).astype(dt)
    a, b = a.astype(dt), b.astype(dt)
    itype = _SAME_WIDTH_INT[jnp.dtype(dt).itemsize]
    nb = jnp.iinfo(itype).bits
    smask = jnp.ones((), itype) << (nb - 1)
    ab = lax.bitcast_convert_type(a, itype)
    bb = lax.bitcast_convert_type(b, itype)
    return lax.bitcast_convert_type(ab ^ (bb & smask), dt)


def cross(a, b, axis=-1):
    """3-D cross product (array_router.h cross). Accepts (..., 3)
    arrays along ``axis`` or Vec3-style component structs (which route
    through render.vec.cross3 and therefore work on any backend --
    including Vec3s of LazyArrays)."""
    if hasattr(a, "x") and hasattr(a, "z"):
        from ..render.vec import cross3

        return cross3(a, b)
    if _lazy_any(a, b):
        # a LazyArray is strictly 1-D (the flat-index model): there is
        # no 3-component axis to cross over, and silently falling
        # through to jnp would force evaluation mid-trace
        raise TypeError(
            "cross over the lazy backend takes Vec3 component structs "
            "(render.vec.Vec3 of LazyArrays), not flat 1-D arrays")
    return jnp.cross(jnp.asarray(a), jnp.asarray(b), axis=axis)


def copysign_neg(a, b):
    """copysign(a, -b) (array_router.h copysign_neg); delegates to
    copysign so both backends share one dispatch body."""
    if _lazy_any(a, b):
        return copysign(a, -_lift_arr(b))
    return _copysign(a, jnp.negative(b))


def mulsign_neg(a, b):
    """a * sign(-b) via the sign bit (array_router.h mulsign_neg)."""
    if _lazy_any(a, b):
        return mulsign(a, -_lift_arr(b))
    return mulsign(a, jnp.negative(b))


def abs_(x):
    if _lazy_any(x):
        return abs(x)
    return jnp.abs(x)


def sqr(x):
    return x * x


def isnan(x):
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.isnan(x)
    return jnp.isnan(x)


def isinf(x):
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.isinf(x)
    return jnp.isinf(x)


def isfinite(x):
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.isfinite(x)
    return jnp.isfinite(x)


def isdenormal(x):
    """True where x is a nonzero denormal (array_math.h isdenormal).
    NOTE: XLA flushes f32 denormals to zero on TPU/CPU, so this can
    only fire for values produced outside the FTZ pipeline (e.g. f64 on
    platforms that keep them, or bit-cast patterns)."""
    if _lazy_any(x):
        import enoki_tpu.trace as t

        tiny = float(jnp.finfo(x.dtype).tiny)
        a = abs(x)
        return (a < tiny) & (a > 0.0)
    x = jnp.asarray(x)
    tiny = jnp.finfo(x.dtype).tiny
    a = jnp.abs(x)
    return (a < tiny) & (a > 0)


def allclose(a, b, rtol=None, atol=None, equal_nan=False):
    """``allclose`` with the reference's dtype-dependent defaults
    (array_router.h:1310: rtol = 5*eps^(1/2)-ish; we mirror its published
    defaults: 1e-5/1e-8 for f64, 1e-3/1e-5 for f32 -- numpy-compatible)."""
    if _lazy_any(a, b):
        # allclose is a host-side verdict: force evaluation (the
        # reference's allclose on CUDAArray reads values back too)
        from . import backend as B

        a = a.jax() if B.is_lazy(a) else a
        b = b.jax() if B.is_lazy(b) else b
    a, b = jnp.asarray(a), jnp.asarray(b)
    dt = jnp.promote_types(a.dtype, b.dtype)
    if rtol is None:
        rtol = 1e-5 if dt == jnp.float64 else 1e-3
    if atol is None:
        atol = 1e-8 if dt == jnp.float64 else 1e-5
    return bool(jnp.allclose(a, b, rtol=rtol, atol=atol, equal_nan=equal_nan))


# ---------------------------------------------------------------------------
# Safe math (array_math.h:1397-1430): clamp the domain so neither the value
# NOR the derivative can produce inf/NaN. The reference clamps values only
# (its AD tape then multiplies the inf derivative by a zero weight under
# safe_mul, autodiff.cpp:1191); under jax.grad the equivalent discipline is
# a custom_jvp that zeroes the tangent at the domain boundary.
# ---------------------------------------------------------------------------


def _safe_lazy(x, fn):
    """Lazy-backend safe math: the value is selected to the clamped
    branch, so jax.vjp through the recorded program sends a ZERO
    cotangent into the out-of-domain branch -- the same derivative
    discipline the eager custom_jvp variants implement (and the
    reference's safe_mul tape semantics, autodiff.cpp:1191)."""
    import enoki_tpu.trace as t

    return fn(t, x)


def safe_sqrt(x):
    if _lazy_any(x):
        # the clamp must use the INPUT dtype's tiny (an f32 constant
        # would flatten every f64 input below 1.18e-38). The else branch
        # is v*0, not literal 0: NaN must propagate as it does eagerly
        # (NaN > 0 is False, so a literal would launder NaN into 0.0)
        # while the derivative through v*0 stays 0 at the clamp.
        return _safe_lazy(x, lambda t, v: t.select(
            v > 0.0, t.sqrt(t.maximum(v, float(jnp.finfo(v.dtype).tiny))),
            v * 0.0))
    return _safe_sqrt_eager(x)


@jax.custom_jvp
def _safe_sqrt_eager(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


@_safe_sqrt_eager.defjvp
def _safe_sqrt_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    y = _safe_sqrt_eager(x)
    d = jnp.where(x > 0, 0.5 / jnp.where(x > 0, y, 1.0), 0.0)
    return y, d * t


def safe_rsqrt(x):
    if _lazy_any(x):
        # value AND derivative match the eager custom_jvp: the max clamp
        # zeroes the derivative at x <= 0 (max' = 0 on the clamped side)
        # and rsqrt(tiny) is finite, so no 0*inf NaN in the VJP. The
        # clamp uses the input dtype's tiny, like the eager path.
        return _safe_lazy(x, lambda t, v: t.rsqrt(
            t.maximum(v, float(jnp.finfo(v.dtype).tiny))))
    return _safe_rsqrt_eager(x)


@jax.custom_jvp
def _safe_rsqrt_eager(x):
    return lax.rsqrt(jnp.maximum(x, jnp.finfo(jnp.result_type(x, 1.0)).tiny))


@_safe_rsqrt_eager.defjvp
def _safe_rsqrt_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    y = _safe_rsqrt_eager(x)
    d = jnp.where(x > 0, -0.5 * y * y * y, 0.0)
    return y, d * t


def _below_one(dtype):
    """Largest representable value < 1 in dtype (the clamp that keeps
    asin/acos derivatives finite without touching any in-domain value)."""
    import numpy as np

    return float(np.nextafter(np.asarray(1.0, dtype), np.asarray(0, dtype)))


def safe_asin(x):
    if _lazy_any(x):
        # |x| < 1 lanes: clamp to the largest value < 1 is a NO-OP (every
        # representable |x| < 1 is <= that), so the value is exact and
        # asin' stays finite; boundary lanes take the exact +-pi/2 branch
        # whose derivative w.r.t. x is 0 -- no 0*inf NaN in the VJP
        # (the derivative discipline of the eager custom_jvp)
        def route(t, v):
            c = _below_one(v.dtype)
            half_pi = 1.5707963267948966
            return t.select(t.abs(v) < 1.0, t.asin(t.clamp(v, -c, c)),
                            t.copysign(v * 0.0 + half_pi, v))

        return _safe_lazy(x, route)
    return _safe_asin_eager(x)


@jax.custom_jvp
def _safe_asin_eager(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


@_safe_asin_eager.defjvp
def _safe_asin_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    inside = jnp.abs(x) < 1.0
    d = jnp.where(inside, lax.rsqrt(jnp.maximum(1.0 - x * x, 1e-30)), 0.0)
    return _safe_asin_eager(x), d * t


def safe_acos(x):
    if _lazy_any(x):
        def route(t, v):
            c = _below_one(v.dtype)
            pi = 3.141592653589793
            return t.select(t.abs(v) < 1.0, t.acos(t.clamp(v, -c, c)),
                            t.select(v > 0.0, v * 0.0, v * 0.0 + pi))

        return _safe_lazy(x, route)
    return _safe_acos_eager(x)


@jax.custom_jvp
def _safe_acos_eager(x):
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


@_safe_acos_eager.defjvp
def _safe_acos_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    inside = jnp.abs(x) < 1.0
    d = jnp.where(inside, -lax.rsqrt(jnp.maximum(1.0 - x * x, 1e-30)), 0.0)
    return _safe_acos_eager(x), d * t


# ---------------------------------------------------------------------------
# Misc
# ---------------------------------------------------------------------------


def tile(x, count):
    """``tile(x, n)`` -- repeat the whole array n times (array_router.h)."""
    return jnp.tile(x, count)


def repeat(x, count):
    """``repeat(x, n)`` -- repeat each element n times."""
    return jnp.repeat(x, count)


def reverse(x):
    if _lazy_any(x):
        return x.reverse()
    return x[..., ::-1] if jnp.ndim(x) else x


def head(x, n):
    return x[:n]


def tail(x, n):
    return x[-n:]


def concat(*arrays):
    return jnp.concatenate([jnp.asarray(a) for a in arrays], axis=0)


def next_float(x):
    """Next representable float toward +inf (array_router.h next_float)."""
    return jnp.nextafter(x, jnp.inf)


def prev_float(x):
    return jnp.nextafter(x, -jnp.inf)


def deg_to_rad(x):
    return x * (jnp.pi / 180.0)


def rad_to_deg(x):
    return x * (180.0 / jnp.pi)


def range_packets(n, width, dim=1):
    """Vectorized 'range' iterable with automatic trailing-lane masks
    (array_utils.h:81; exercised by memory2.cpp test06_range /
    test07_range_2d): yields ``(index, mask)`` packets of ``width``
    lanes covering [0, n) -- the packet-loop idiom `for (auto [i, m] :
    range<UInt32P>(n))`.

    ``dim=1``: index is a 1-D int32 array. ``dim=2``: ``n`` is (nx, ny)
    and index is a tuple ``(ix, iy)`` with x varying fastest (the
    reference's divisor-chain unflattening, array_utils.h:117-133)."""
    if dim == 1:
        total = int(n)
        for start in range(0, total, width):  # empty range: no packets
            idx = jnp.arange(width, dtype=jnp.int32) + start
            yield idx, idx < total
        return
    if dim != 2:
        raise ValueError("range_packets supports dim 1 or 2")
    nx, ny = int(n[0]), int(n[1])
    total = nx * ny
    for start in range(0, total, width):
        flat = jnp.arange(width, dtype=jnp.int32) + start
        yield (flat % nx, flat // nx), flat < total


def extract(value, mask):
    """First element of ``value`` whose mask lane is set
    (array_router.h:948, extract_ array_static.h:964 -- the CPU vcall
    loop peels instances with it). Returns a size-1 array; if no lane is
    set, element 0 (the reference reads an undefined lane there).
    Lazy operands stay lazy (compress keeps everything in the fused
    program)."""
    if _lazy_any(value, mask):
        import enoki_tpu.trace as t

        value, mask = _lift_arr(value), _lift_arr(mask)
        packed, _ = value.compress(mask)
        zero = t.LazyArray(jnp.zeros((1,), jnp.int32))
        first = packed.gather(zero)
        # no lane set: compress zero-fills, but the contract (and the
        # eager path) reads element 0 of value instead
        return t.select(mask.any(), first, value.gather(zero))
    value, mask = jnp.asarray(value), jnp.asarray(mask)
    idx = jnp.argmax(mask)  # first True (0 if none)
    return value[idx][None]


def prefetch(source, index, mask=None):
    """Memory-prefetch hint (array_router.h:1031).

    The reference issues ``_mm_prefetch``/PTX ``prefetch.global`` for an
    upcoming gather. On TPU there is no software-prefetch instruction at
    the XLA level -- HBM->VMEM movement is scheduled by the compiler (and
    explicitly via Pallas DMA, see render/pallas_kernels.py) -- so this is
    a documented no-op kept for API parity.
    """
    return None


def binary_search(start, end, pred):
    """Vectorized predicate binary search (array_utils.h:153-171).

    Finds, per lane, the first index in [start, end) where ``pred`` turns
    False (pred must be monotone per lane: True...True False...False).
    ``pred`` receives an integer index array and returns a boolean array.
    The trip count is the static bound log2(end - start) + 1, so the loop
    is jit/Pallas-safe (same fixed-iteration formulation as the
    reference).
    """
    import math as _math

    start, end = int(start), int(end)  # scalar bounds, like the reference
    iters = _math.floor(_math.log2(end - start)) + 1 if end > start else 0
    lo = jnp.asarray(start, jnp.int32)
    hi = jnp.asarray(end, jnp.int32)
    if not iters:
        return lo + jnp.zeros_like(hi)

    # The first iteration doubles as the backend probe -- its pred call
    # is CONSUMED (a pred with recorded side effects runs exactly once
    # per iteration, never an extra discarded time). A pred written
    # against LazyArray state typically rejects a plain jnp index
    # (LazyArray.gather requires a lazy index): retry it once with lazy
    # bounds; if that also fails, re-raise the ORIGINAL error so genuine
    # pred bugs surface as themselves.
    mid0 = (start + end) >> 1  # iteration-1 bounds are scalar per lane
    cond = None
    # only consult the trace runtime if it is ALREADY loaded -- importing
    # it here would build the native library for pure-eager users, and a
    # lazy pred is impossible before the first LazyArray exists anyway
    import sys as _sys

    t = _sys.modules.get("enoki_tpu.trace")
    se_before = t._lib.et_num_side_effects() if t is not None else 0
    try:
        cond = pred((lo + hi) >> 1)
        probe_lazy = _lazy_any(cond)
    except Exception as e_eager:
        if t is None:
            raise
        if t._lib.et_num_side_effects() != se_before:
            # the failed probe already RECORDED lazy side effects; a
            # retry would record them twice. Refuse loudly instead of
            # silently corrupting the fused program.
            raise RuntimeError(
                "binary_search: the predicate recorded trace side "
                "effects before rejecting an eager index -- make the "
                "predicate accept both index types (or side-effect-"
                "free) so the probe call can be its first iteration"
            ) from e_eager
        try:
            cond = pred(t.LazyArray.literal(mid0, 1, jnp.int32))
        except Exception:
            raise e_eager
        probe_lazy = True
    if probe_lazy:
        import enoki_tpu.trace as t

        # consume the probe's cond as iteration 1 (scalar bounds)
        lo = t.select(cond, min(mid0 + 1, end), start)
        hi = t.select(cond, end, mid0)
        for _ in range(iters - 1):
            mid = (lo + hi) >> 1
            cond = pred(mid)
            lo = t.select(cond, t.minimum(mid + 1, hi), lo)
            hi = t.select(cond, hi, mid)
        return lo + hi * 0
    lo = jnp.where(cond, jnp.minimum(mid0 + 1, end), lo)
    hi = jnp.where(cond, hi, mid0)
    for _ in range(iters - 1):
        mid = (lo + hi) >> 1
        cond = pred(mid)
        # pred() sets the lane shape; lo/hi broadcast up
        lo = jnp.where(cond, jnp.minimum(mid + 1, hi), lo)
        hi = jnp.where(cond, hi, mid)
    return lo + jnp.zeros_like(hi)


def sqrt(x):
    """Elementwise square root (array_router.h sqrt; see safe_sqrt for the
    clamped-domain/clamped-gradient variant)."""
    if _lazy_any(x):
        import enoki_tpu.trace as t

        return t.sqrt(x)
    return jnp.sqrt(x)
