"""Horizontal (cross-lane) operations.

TPU-native analog of the reference's horizontal ops, which appear twice:
once as SIMD reductions on packets (array_static.h hsum_/hprod_/hmax_/...)
and once as device-wide cub calls for the lazy GPU backend
(src/cuda/horiz.cu: DeviceReduce/DeviceScan/DeviceSelect/radix sort).
On TPU all of these are single XLA HLO ops that the compiler schedules
optimally, so this module is thin -- the interesting pieces are:

* ``compress``  -- the reference returns a dynamically-sized array
  (cuda_compress, horiz.cu:158). XLA requires static shapes, so we return
  ``(packed_padded, count)`` where the first ``count`` entries are the
  selected lanes in order and the tail is padding.
* ``partition`` -- mirror of cuda_partition (horiz.cu:35): stable-sort by
  key and run-length encode, returning per-instance permutation info with
  static shapes (padded to ``max_instances``).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax import lax

# ---------------------------------------------------------------------------
# Reductions (array_router.h hsum/hprod/hmax/hmin/hmean, :1227-1295 nested)
# ---------------------------------------------------------------------------


def _is_lazy(x):
    from .backend import is_lazy

    return is_lazy(x)


def hsum(x, axis=None):
    """Routes to the lazy HSUM opcode for LazyArray ("one source, every
    backend" -- the reference's hsum instantiates for CUDAArray via a cub
    call, horiz.cu:162; here the reduction STAYS in the fused program)."""
    if _is_lazy(x):
        return x.hsum()
    return jnp.sum(x, axis=axis)


def hprod(x, axis=None):
    if _is_lazy(x):
        return x.hprod()
    return jnp.prod(x, axis=axis)


def hmax(x, axis=None):
    if _is_lazy(x):
        return x.hmax()
    return jnp.max(x, axis=axis)


def hmin(x, axis=None):
    if _is_lazy(x):
        return x.hmin()
    return jnp.min(x, axis=axis)


def hmean(x, axis=None):
    if _is_lazy(x):
        # Promote integer inputs first: LazyArray._coerce would pull the
        # 1/n float scalar down to the int dtype (truncating it to 0).
        # jnp.mean promotes the same way -- including int64 -> f64 under
        # x64 (a fixed f32 would lose precision past 2^24).
        if not jnp.issubdtype(x.dtype, jnp.inexact):
            x = x.cast(jnp.result_type(x.dtype, 0.5))
        # mean of an empty array is NaN eagerly; 1/0 would raise at
        # record time
        scale = (1.0 / len(x)) if len(x) else float("nan")
        return x.hsum() * scale
    return jnp.mean(x, axis=axis)


def hsum_nested(x):
    """Reduce across *all* axes (array_router.h:1227)."""
    return jnp.sum(x)


def hprod_nested(x):
    return jnp.prod(x)


def hmax_nested(x):
    return jnp.max(x)


def hmin_nested(x):
    return jnp.min(x)


def all_nested(mask):
    """all() across every nesting level (array_router.h all_nested).
    LazyArray is flat, so the nested variants coincide with the plain
    reductions there."""
    if _is_lazy(mask):
        return mask.all()
    return jnp.all(mask)


def any_nested(mask):
    if _is_lazy(mask):
        return mask.any()
    return jnp.any(mask)


def none_nested(mask):
    if _is_lazy(mask):
        return ~mask.any()
    return ~jnp.any(mask)


def count_nested(mask):
    if _is_lazy(mask):
        return mask.count()
    return jnp.sum(jnp.asarray(mask).astype(jnp.int32))


def psum(x, axis=-1):
    """Inclusive prefix sum (cuda_psum, horiz.cu:193 DeviceScan::InclusiveSum)."""
    if _is_lazy(x):
        return x.psum()
    return jnp.cumsum(x, axis=axis)


def all_(mask, axis=None):
    if _is_lazy(mask):
        return mask.all()
    return jnp.all(mask, axis=axis)


def any_(mask, axis=None):
    if _is_lazy(mask):
        return mask.any()
    return jnp.any(mask, axis=axis)


def none(mask, axis=None):
    if _is_lazy(mask):
        return ~mask.any()
    return ~jnp.any(mask, axis=axis)


def count(mask, axis=None):
    """Number of true lanes (cuda_count, horiz.cu:284)."""
    if _is_lazy(mask):
        return mask.count()
    return jnp.sum(mask.astype(jnp.int32), axis=axis)


def dot(a, b, axis=-1):
    """Horizontal dot product (array_base.h:165 dot_ fallback).

    For the common Vec3-over-wide-arrays case the component axis is the
    *leading* struct dimension and this is not used; this reduces jnp arrays.
    """
    if _is_lazy(a) or _is_lazy(b):
        return (a * b).hsum()
    return jnp.sum(a * b, axis=axis)


def abs_dot(a, b, axis=-1):
    if _is_lazy(a) or _is_lazy(b):
        return abs(dot(a, b))
    return jnp.abs(dot(a, b, axis))


def norm(a, axis=-1):
    if _is_lazy(a):
        import enoki_tpu.trace as t

        return t.sqrt(dot(a, a))
    return jnp.sqrt(dot(a, a, axis))


def squared_norm(a, axis=-1):
    return dot(a, a, axis)


def normalize(a, axis=-1):
    if _is_lazy(a):
        import enoki_tpu.trace as t

        return a * t.rsqrt((a * a).hsum())
    return a * lax.rsqrt(jnp.sum(a * a, axis=axis, keepdims=True))


def reverse(x, axis=0):
    """Order-reversal (common.cu:82 reverse kernel)."""
    if _is_lazy(x):
        return x.reverse()
    return jnp.flip(x, axis=axis)


# ---------------------------------------------------------------------------
# Compress (horiz.cu:158 cuda_compress / dynamic.h:562 compress_)
# ---------------------------------------------------------------------------


def compress(x, mask, fill=0):
    """Pack lanes where ``mask`` is true to the front, preserving order.

    Returns ``(packed, count)``: ``packed`` has the same (static) shape as
    ``x``; lanes ``[0, count)`` hold the selected values in original order,
    the remainder is ``fill``. This is the static-shape contract TPU
    requires; callers that need the exact size slice on the host after
    reading back ``count``.

    Implementation: exclusive prefix-sum of the mask gives each selected
    lane its output slot; a masked scatter places it. One fused XLA kernel.

    LazyArray x: records the COMPRESS opcode -- both results stay lazy
    (the reference must break the kernel at every cub call; zero-fill
    only, ``fill`` must be 0 there).
    """
    if _is_lazy(x) or _is_lazy(mask):
        if fill != 0:
            raise ValueError("lazy compress zero-fills (fill must be 0)")
        from enoki_tpu.trace import LazyArray

        if not _is_lazy(x):
            x = LazyArray(jnp.atleast_1d(jnp.asarray(x)))
        if not _is_lazy(mask):
            mask = LazyArray(jnp.atleast_1d(jnp.asarray(mask)))
        return x.compress(mask)
    x = jnp.asarray(x)
    mask = jnp.asarray(mask)
    slots = jnp.cumsum(mask.astype(jnp.int32)) - mask.astype(jnp.int32)
    n = x.shape[0]
    target = jnp.full((n,), fill, x.dtype)
    slots = jnp.where(mask, slots, n)  # dropped when out of range
    packed = target.at[slots].set(x, mode="drop")
    return packed, jnp.sum(mask.astype(jnp.int32))


# ---------------------------------------------------------------------------
# Partition (horiz.cu:35 cuda_partition): group lanes by an instance key.
# ---------------------------------------------------------------------------


def partition(keys, max_instances: int):
    """Stable-sort lanes by key and run-length encode.

    Mirrors ``cuda_partition`` (horiz.cu:35-123): the reference radix-sorts
    the pointer array and RLE-encodes to get, per unique pointer, the list of
    lanes using it. Static-shape version:

    Returns ``(unique, counts, perm)`` where
      unique: (max_instances,) int32 -- unique keys in ascending order,
              padded with -1
      counts: (max_instances,) int32 -- lanes per unique key, padded with 0
      perm:   (n,) int32 -- permutation grouping lanes by key (stable)

    ``keys`` must be non-negative integers < some bound; ``max_instances``
    is the static upper bound on distinct keys (the number of registered
    instances, known at trace time -- same as the reference, where the
    instance registry size is known on the host).
    """
    keys = jnp.asarray(keys, jnp.int32)
    n = keys.shape[0]
    perm = jnp.argsort(keys, stable=True).astype(jnp.int32)
    sorted_keys = keys[perm]
    # counts[k] = number of lanes with key k (dense histogram over instances)
    counts_dense = jnp.zeros((max_instances,), jnp.int32).at[keys].add(1, mode="drop")
    present = counts_dense > 0
    # unique keys packed to front
    ids = jnp.arange(max_instances, dtype=jnp.int32)
    slots = jnp.cumsum(present.astype(jnp.int32)) - present.astype(jnp.int32)
    slots = jnp.where(present, slots, max_instances)
    unique = jnp.full((max_instances,), -1, jnp.int32).at[slots].set(ids, mode="drop")
    counts = jnp.zeros((max_instances,), jnp.int32).at[slots].set(counts_dense, mode="drop")
    return unique, counts, perm


# ---------------------------------------------------------------------------
# Segmented helpers used by the vectorized-method-call machinery
# ---------------------------------------------------------------------------


def segment_offsets(counts):
    """Exclusive prefix sum of per-instance counts -> start offset of each
    instance's segment in the permuted order."""
    return jnp.cumsum(counts) - counts
