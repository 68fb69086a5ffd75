"""Device-mesh construction helpers.

The reference is single-device (SURVEY §2.3: no NCCL/MPI anywhere); the
distributed layer is a new first-class subsystem. Design: a 2-D logical
mesh ('dp', 'sp') over however many devices exist -- 'dp' shards image
rows (data parallel over ray bundles), 'sp' shards image columns (the
"sequence"/span axis of a frame). Scene parameters are replicated; their
gradients are reduced over both axes.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
the same code spans hosts -- the mesh uses the global device list, XLA
routes 'dp'/'sp' collectives over ICI within a slice and DCN across
slices.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _factor2(n: int) -> Tuple[int, int]:
    """Most-square factorization n = a*b, a >= b."""
    b = int(math.isqrt(n))
    while n % b:
        b -= 1
    return n // b, b


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp", "sp")) -> Mesh:
    """2-D mesh over the first ``n_devices`` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if not devs:
        raise ValueError("make_mesh needs at least one device")
    a, b = _factor2(len(devs))
    import numpy as np

    if n_devices is None or n_devices == len(jax.devices()):
        # topology-aware layout on real hardware: create_device_mesh
        # orders devices along ICI links (raw enumeration order need
        # not follow torus coordinates on a pod slice, and a psum along
        # a mis-ordered axis hops non-adjacent chips)
        try:
            from jax.experimental import mesh_utils

            return Mesh(mesh_utils.create_device_mesh((a, b)), axis_names)
        except Exception:
            pass  # fall back to enumeration order (CPU, exotic configs)
    return Mesh(np.asarray(devs).reshape(a, b), axis_names)


def image_sharding(mesh: Mesh) -> NamedSharding:
    """(n, n) image: rows over dp, cols over sp."""
    return NamedSharding(mesh, P("dp", "sp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Multi-host runtime init (SURVEY §2.4: the distributed communication
    backend the reference never had).

    One call per host before any mesh construction. With no arguments,
    jax auto-detects the cluster environment (TPU pod metadata, SLURM,
    GKE); arguments override for manual launch. Returns the global device
    count. Safe to call on a single host (no-op if no cluster is
    detected and no arguments are given).
    """
    import os
    import warnings

    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except (ValueError, RuntimeError) as e:
        explicit = (coordinator_address is not None
                    or num_processes is not None or process_id is not None)
        cluster_env = any(k in os.environ for k in (
            "COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
            "SLURM_JOB_ID", "TPU_WORKER_HOSTNAMES"))
        if explicit or cluster_env:
            # a real cluster that failed to initialize must surface --
            # silently degrading to N independent single-host runs hangs
            # at the first cross-host collective or trains N replicas
            raise
        warnings.warn(f"jax.distributed.initialize unavailable "
                      f"({e}); running single-host")
    return len(jax.devices())
