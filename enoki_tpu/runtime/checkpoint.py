"""Checkpoint / resume for training state.

The reference has NO persistence: its kernel cache dies with the process
(SURVEY §5, jit.cu:179) and there is no state checkpointing at all. For a
framework intended for long-running distributed fitting (dist/fit_scene),
this is a required subsystem: scene parameters, optimizer state and RNG
state survive preemption and move across host topologies.

Built on orbax (the jax-ecosystem checkpointer): multi-host safe --
every process calls save/restore with its addressable shards; orbax
coordinates the global write. Plain pytrees in, plain pytrees out, so
any @enoki_struct scene, optax state, or PCG32 generator checkpoints
as-is.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def _normalize(path: str) -> str:
    """Absolute path for local filesystems; URL paths (gs://, s3://, ...)
    pass through untouched -- os.path.abspath would mangle the scheme."""
    return path if "://" in path else os.path.abspath(path)


def save(path: str, state: Any, force: bool = True) -> None:
    """Write a pytree checkpoint (blocking).

    ``state`` is any pytree: @enoki_struct scenes, optax optimizer
    states, PCG32 generators, dicts of all of the above.
    """
    path = _normalize(path)
    ckpt = _checkpointer()
    ckpt.save(path, state, force=force)
    ckpt.wait_until_finished()


def restore(path: str, like: Optional[Any] = None) -> Any:
    """Read a checkpoint. ``like`` (an abstract or concrete pytree of the
    same structure) restores with correct dtypes/shardings; without it
    the stored structure is returned as saved."""
    path = _normalize(path)
    ckpt = _checkpointer()
    if like is not None:
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(
                jax.numpy.shape(x), jax.numpy.result_type(x),
                sharding=getattr(x, "sharding", None)),
            like)
        return ckpt.restore(path, template)
    return ckpt.restore(path)


def _listdir(root: str):
    if "://" in root:
        from etils import epath

        p = epath.Path(root)
        return [q.name for q in p.iterdir()] if p.exists() else []
    if not os.path.isdir(root):
        return []
    return os.listdir(root)


def latest_step(root: str) -> Optional[int]:
    """Highest step-numbered checkpoint under ``root`` (step_<N> dirs),
    or None."""
    steps = []
    for name in _listdir(root):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def save_step(root: str, step: int, state: Any,
              max_to_keep: Optional[int] = 3) -> None:
    """Save ``state`` as root/step_<N>, pruning all but the newest
    ``max_to_keep`` checkpoints (None = keep everything). Rotation keeps
    long preemptible runs from filling the volume."""
    save(os.path.join(root, f"step_{step}"), state)
    if max_to_keep is None:
        return
    # rotation runs on a single process: N hosts racing to rmtree the same
    # step dirs would see already-deleted / still-finalizing paths and
    # raise, killing the preemptible run the feature exists to protect
    if jax.process_index() != 0:
        return
    steps = sorted(int(n.split("_", 1)[1]) for n in _listdir(root)
                   if n.startswith("step_"))
    for old in steps[:-max_to_keep]:
        target = os.path.join(root, f"step_{old}")
        if "://" in target:
            from etils import epath

            try:
                epath.Path(target).rmtree()
            except OSError:  # concurrent writer / already gone
                pass
        else:
            shutil.rmtree(target, ignore_errors=True)


def restore_latest(root: str, like: Optional[Any] = None):
    """(state, step) from the newest checkpoint, or (None, None)."""
    step = latest_step(root)
    if step is None:
        return None, None
    return restore(os.path.join(root, f"step_{step}"), like), step
