"""Vectorized method calls on the lazy trace (the CUDAArray vcall path).

Parity target: the reference dispatches ``ptrs->f(args...)`` on lazy GPU
arrays by partitioning the pointer array by instance -- a cub radix sort
+ run-length encoding (src/cuda/horiz.cu:35-123) producing per-instance
permutation arrays that are cached on the array (cuda.h:815-842) -- then,
per instance, gathering the arguments through the permutation, calling
the scalar C++ method once with vector args, and scattering the results
back (array_call.h:147-191). ``partition`` is an eval boundary there too:
the host must know the unique instance list to pick which methods to
call (partition_ calls cuda_eval, cuda.h:818).

TPU-native design: the same shape, minus the parts XLA makes unnecessary.

* ``partition(ids)`` evaluates the lazy id array once, sorts + RLEs on
  the host (the instance list IS host data -- it selects Python callees)
  and caches the per-instance permutations on the array id, invalidated
  by scatter dirtying, exactly the caching contract of cuda.h:815-842.
* ``dispatch(funcs, ids, *args)`` records per-instance gather -> callee
  trace -> scatter INTO THE TRACE: nothing except the partition itself
  executes until the consumer's eval, which fuses every callee into one
  XLA program. The permutations enter as data leaves, so a retrace of
  the same dispatch structure is a structural-hash cache hit (the
  reference re-traces PTX and hits its kernel cache the same way).
* Gradients flow through the recorded gathers/scatters via the tape's
  scatter adjoints -- the reference needs Special tape edges for this
  (autodiff.cpp:355-608); here it falls out of the trace AD.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from . import LazyArray, _lib, maximum as _maximum, select as _select

# per-array partition cache: var id -> ((instance, perm jnp.int32), ...)
# (cuda.h:816-842 caches the cuda_partition result on the array).
# Bounded by entries AND device bytes: var ids are never reused, so an
# entry whose LazyArray died is unreachable forever -- without the byte
# bound, a loop partitioning a fresh 1M-lane id array per frame would
# pin up to 256 x ~4 MB of dead device perms (the reference caches on
# the array object, so its cache dies with the array; a module dict
# needs explicit pressure relief).
_PARTITION_CACHE: dict = {}
_PARTITION_CACHE_MAX = 256
_PARTITION_CACHE_MAX_BYTES = 64 << 20
_CACHE_BYTES = 0  # running total (a per-miss full scan would be O(n^2))


def _parts_bytes(parts) -> int:
    return sum(int(p.size) * p.dtype.itemsize for _, p in parts)


def _cache_pop(vid) -> None:
    """Remove one entry, keeping the byte total consistent -- the ONLY
    sanctioned way to remove entries (scatter invalidation included)."""
    global _CACHE_BYTES
    parts = _PARTITION_CACHE.pop(vid, None)
    if parts is not None:
        _CACHE_BYTES -= _parts_bytes(parts)


def clear_partition_cache():
    global _CACHE_BYTES
    _PARTITION_CACHE.clear()
    _CACHE_BYTES = 0


def partition(ids: LazyArray):
    """Partition a lazy instance-id array (cuda_partition, horiz.cu:35).

    Returns a tuple of ``(instance_id, perm)`` pairs where ``perm`` is a
    jnp.int32 array of the lanes holding that id; the concatenation of
    all perms is the stable sort permutation of ``ids``. Forces
    evaluation of ``ids`` (the reference's partition_ also calls
    cuda_eval) and caches the result on the array until a scatter
    dirties it.
    """
    global _CACHE_BYTES
    if _lib.et_is_dirty(ids.index):
        _cache_pop(ids.index)
    parts = _PARTITION_CACHE.get(ids.index)
    if parts is not None:
        # LRU: re-insert on hit so a hot array's partition survives any
        # number of cold one-shot partitions (the reference caches on the
        # array itself, cuda.h:815-842; a module dict needs recency)
        del _PARTITION_CACHE[ids.index]
        _PARTITION_CACHE[ids.index] = parts
    if parts is None:
        while _PARTITION_CACHE and (
                len(_PARTITION_CACHE) >= _PARTITION_CACHE_MAX
                or _CACHE_BYTES >= _PARTITION_CACHE_MAX_BYTES):
            _cache_pop(next(iter(_PARTITION_CACHE)))
        vals = np.asarray(ids.numpy(), np.int64)
        order = np.argsort(vals, kind="stable").astype(np.int32)
        sv = vals[order]
        starts = np.flatnonzero(np.r_[True, sv[1:] != sv[:-1]])
        ends = np.r_[starts[1:], sv.size]
        parts = tuple((int(sv[b]), jnp.asarray(order[b:e]))
                      for b, e in zip(starts, ends))
        _PARTITION_CACHE[ids.index] = parts
        _CACHE_BYTES += _parts_bytes(parts)
    return parts


def _true_mask(size: int) -> LazyArray:
    return LazyArray.literal(True, size, jnp.bool_)


def dispatch(funcs, ids: LazyArray, *args):
    """Vectorized virtual call on the lazy trace: gather -> callee ->
    scatter per instance (array_call.h:147-165).

    ``funcs[i]`` handles lanes where ``ids == i`` and is called as
    ``f(mask, *gathered_args)`` (the reference threads a mask through
    every vcall, array_call.h:238-267); it returns a LazyArray, a tuple
    of LazyArrays (func4-style multi-results, tests/call.cpp:53), or any
    pytree of LazyArrays (an ENOKI_STRUCT value). Arguments may likewise
    be LazyArrays OR structs (pytrees) of LazyArrays: every leaf is
    gathered through the permutation, exactly how the reference's
    gather_helper routes arbitrary struct args through the vcall
    permutation (array_call.h:107-114, array_struct.h:9-60).
    Negative ids are null pointers: their lanes are skipped and produce
    zeros (array_call.h skips null entries).

    Everything this records stays lazy; one downstream eval fuses all
    callees into a single XLA program.
    """
    import jax.tree_util as jtu

    n = len(ids)
    parts = partition(ids)

    # single-instance fast path (array_call.h:150-151): no permutation
    if len(parts) == 1 and parts[0][0] >= 0:
        inst = parts[0][0]
        if inst >= len(funcs):
            raise IndexError(f"instance id {inst} out of range")
        res = funcs[inst](_true_mask(n), *args)
        return res

    pieces = []  # (perm LazyArray, result leaves)
    single = None        # first callee's result leaves
    single_tree = None   # ... and treedef (defines the output structure)
    for inst, perm in parts:
        if inst < 0:
            continue
        if inst >= len(funcs):
            raise IndexError(f"instance id {inst} out of range")
        perm_l = LazyArray(perm)
        gathered = tuple(
            jtu.tree_map(lambda a: a.gather(perm_l), arg) for arg in args)
        r = funcs[inst](_true_mask(len(perm)), *gathered)
        leaves, tree = jtu.tree_flatten(r)
        if single is not None:
            if tree != single_tree:
                raise ValueError(
                    f"dispatch: callees disagree on result structure "
                    f"({single_tree} vs {tree})")
            for a, b in zip(single, leaves):
                if a.dtype != b.dtype:
                    raise ValueError(
                        f"dispatch: callees disagree on result dtype "
                        f"({a.dtype} vs {b.dtype}) -- the scatter into "
                        "the shared output would cast silently")
        pieces.append((perm_l, leaves))
        if single is None:
            single, single_tree = leaves, tree

    if single is None:
        # All lanes null: no callee ran to define the result structure.
        # Derive it from funcs[0] under an all-false mask (the reference's
        # static return type decides this at compile time; the Python
        # equivalent is introspection-by-tracing). structure_probe()
        # makes the trace side-effect-free -- a printf or scatter in the
        # callee registers nothing -- and the probe's pure ops are
        # dropped unreferenced, so nothing of it is ever evaluated.
        if funcs:
            from . import structure_probe
            with structure_probe():
                probe = funcs[0](LazyArray.literal(False, n, jnp.bool_),
                                 *args)
            leaves, tree = jtu.tree_flatten(probe)
            return jtu.tree_unflatten(
                tree, [LazyArray.zeros(n, l.dtype) for l in leaves])
        return LazyArray.zeros(n)

    outs = [LazyArray.zeros(n, r.dtype) for r in single]
    for perm_l, leaves in pieces:
        for o, r in zip(outs, leaves):
            o.scatter(perm_l, r)
    return jtu.tree_unflatten(single_tree, outs)


def getter(table, ids: LazyArray):
    """Vectorized attribute read: ``ptrs->value`` as a lazy gather from
    an SoA parameter table (ENOKI_CALL_SUPPORT_GETTER, array_call.h:272).
    Null ids (< 0) read 0."""
    t = table if isinstance(table, LazyArray) else LazyArray(table)
    g = t.gather(_maximum(ids, 0))
    return _select(ids >= 0, g, 0)


def registry_dispatch(registry, method: str, ids: LazyArray, *args):
    """InstanceRegistry dispatch over LazyArray lanes (the FloatC
    counterpart of struct.call.InstanceRegistry.dispatch)."""
    funcs = [getattr(o, method) for o in registry.instances]
    return dispatch(funcs, ids, *args)


def registry_getter(registry, attr: str, ids: LazyArray):
    return getter(jnp.asarray(registry.stack(attr)), ids)
