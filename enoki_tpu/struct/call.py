"""Vectorized method calls over arrays of instance references.

Parity target: the reference's arrays-of-pointers with vectorized virtual
method calls (array_call.h:17,126). There, ``ptrs->f(args...)`` partitions
the pointer array by instance (GPU: cub radix sort + RLE, horiz.cu:35;
CPU: a mask-extract loop, array_call.h:141-146) and calls each instance's
method once on the gathered subset.

TPU-native design: instances are *integer ids* into a registry (pointers
are meaningless under XLA). Two dispatch strategies, both static-shape:

* ``dispatch_masked`` -- evaluate every callee on the full batch and blend
  with lane masks (branch-free select tree). Optimal when callees are
  cheap or few: everything stays fused, no data movement. This is the
  analog of the reference's CPU mask loop collapsed into straight-line
  code.
* ``dispatch_partition`` -- stable-sort lanes by id, run callees on the
  *permuted* (memory-coherent) arrays under segment masks, scatter back.
  The analog of cuda_partition + per-instance gather/scatter
  (array_call.h:147-165). Pays one sort; wins when callees are heavy and
  the compiler can skip masked-off tiles, or when callee work is
  data-dependent per instance.
* ``dispatch_switch`` -- ``lax.switch`` on a *uniform* id (all lanes same
  instance); the single-instance fast path (array_call.h:150-151).

``InstanceRegistry`` plays the role of the reference's pointer registry:
register python objects once, get stable ids, stack their parameters into
SoA arrays for gather-based "getters" (ENOKI_CALL_SUPPORT_GETTER,
array_call.h:272).
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax
import jax.numpy as jnp

from ..ops.horiz import partition
from .pytree import gather_struct, scatter_struct, select_struct


from ..ops.backend import is_lazy as _is_lazy


def dispatch_masked(funcs: Sequence[Callable], ids, *args, default=None):
    """Evaluate ``funcs[ids[i]]`` lanewise, branch-free.

    Every func sees the full argument arrays; its result is kept only on
    lanes where ``ids == i``. func signature: f(mask, *args) -> pytree;
    funcs must all return the same structure. ``ids < 0`` lanes produce
    ``default`` (or zeros) -- the null-pointer semantics of the reference
    (array_call.h: null entries are skipped).
    """
    ids = jnp.asarray(ids, jnp.int32)
    out = None
    for i, f in enumerate(funcs):
        m = ids == i
        r = f(m, *args)
        if out is None:
            if default is None:
                out = jax.tree_util.tree_map(jnp.zeros_like, r)
            else:
                out = default
        out = select_struct(m, r, out)
    return out


def dispatch_partition(funcs: Sequence[Callable], ids, *args, default=None):
    """Sort-based dispatch mirroring the reference GPU path
    (array_call.h:147-165):

    1. partition lanes by id (stable sort + RLE, horiz.cu:35)
    2. gather args through the permutation (memory-coherent per instance)
    3. run each callee under its segment mask
    4. scatter results back through the permutation
    """
    ids = jnp.asarray(ids, jnp.int32)
    n_inst = len(funcs)
    unique, counts, perm = partition(jnp.maximum(ids, 0), n_inst)
    perm_ids = ids[perm]
    gathered = tuple(gather_struct(a, perm) for a in args)
    out_p = None
    for i, f in enumerate(funcs):
        m = perm_ids == i
        r = f(m, *gathered)
        if out_p is None:
            if default is None:
                out_p = jax.tree_util.tree_map(jnp.zeros_like, r)
            else:
                # default travels through the same permutation as the
                # args, otherwise unmatched lanes would read
                # default[inv[j]] after the scatter-back
                out_p = gather_struct(default, perm)
        out_p = select_struct(m, r, out_p)
    # scatter back: out[perm[k]] = out_p[k]
    inv = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype))
    return gather_struct(out_p, inv)


def dispatch_switch(funcs: Sequence[Callable], uniform_id, *args):
    """Single-instance fast path: all lanes share one id (a traced scalar).
    ``lax.switch`` runs exactly one callee (array_call.h:150-151).

    Callee signature is ``f(mask, *args)`` -- the SAME contract as every
    other dispatcher (dispatch_masked/dispatch_partition and the lazy
    trace dispatcher), so a method written for one strategy works under
    all of them. The uniform path passes a SCALAR all-true mask: it
    broadcasts against any lane shape, whereas sizing it from one
    argument's leading axis would guess wrong whenever a non-lane array
    (a parameter table) comes first."""
    mask = jnp.bool_(True)
    return jax.lax.switch(jnp.asarray(uniform_id, jnp.int32),
                          [lambda a, f=f: f(mask, *a) for f in funcs],
                          args)


# strategy="auto" crossover: masked select-tree below this instance
# count, sort+partition at/above. Set from the measured chip table in
# docs/structs.md (tools/bench_vcall.py).
_AUTO_PARTITION_MIN_K = 16


class InstanceRegistry:
    """Host-side instance registry (the analog of enoki's pointer registry).

    Register objects once; ``ids_for`` converts object references to a
    lane array of ids; ``stack(attr)`` builds the SoA parameter table for
    gather-based getters.
    """

    def __init__(self):
        self._instances: List[Any] = []

    def register(self, obj) -> int:
        self._instances.append(obj)
        return len(self._instances) - 1

    def __len__(self):
        return len(self._instances)

    def __getitem__(self, i):
        return self._instances[i]

    @property
    def instances(self):
        return tuple(self._instances)

    def stack(self, attr: str):
        """SoA table of a scalar attribute across instances; index it with
        an id array to realize a vectorized getter."""
        vals = [getattr(o, attr) for o in self._instances]
        return jnp.stack([jnp.asarray(v) for v in vals])

    def getter(self, attr: str, ids):
        """Gather an attribute per lane; null ids (< 0) read 0 -- the same
        null-pointer semantics the dispatchers use
        (ENOKI_CALL_SUPPORT_GETTER, array_call.h:272)."""
        if _is_lazy(ids):
            from ..trace.call import registry_getter

            return registry_getter(self, attr, ids)
        from ..ops.router import gather

        ids = jnp.asarray(ids, jnp.int32)
        return gather(self.stack(attr), ids, mask=ids >= 0)

    def dispatch(self, method: str, ids, *args, strategy: str = "auto"):
        """Vectorized virtual call: ``ptrs->method(args...)``.

        Each instance's bound method is called as f(mask, *args).
        LazyArray ids route to the lazy-trace dispatcher (partition +
        gather/callee/scatter recorded into the trace -- the CUDAArray
        vcall path, array_call.h:147-165), regardless of ``strategy``.

        ``strategy="auto"`` (default) picks by instance count using the
        measured chip crossover (tools/bench_vcall.py, table in
        docs/structs.md): masked below _AUTO_PARTITION_MIN_K, partition
        at or above. The reference's partition path exists because it
        wins at high instance counts (horiz.cu:35); on TPU the masked
        tree holds on much longer because XLA's static shapes run every
        callee at full width under BOTH strategies.
        """
        funcs = [getattr(o, method) for o in self._instances]
        if _is_lazy(ids):
            from ..trace.call import dispatch as dispatch_lazy

            return dispatch_lazy(funcs, ids, *args)
        if strategy == "auto":
            strategy = ("partition"
                        if len(funcs) >= _AUTO_PARTITION_MIN_K
                        else "masked")
        if strategy == "masked":
            return dispatch_masked(funcs, ids, *args)
        if strategy == "partition":
            return dispatch_partition(funcs, ids, *args)
        raise ValueError(f"unknown dispatch strategy {strategy!r}")
