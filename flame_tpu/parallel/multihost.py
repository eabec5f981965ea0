"""Multi-host (pod-slice) runtime setup.

On a TPU pod slice each host runs the same program; jax.distributed wires
the hosts into one global device mesh over ICI/DCN. This module is the
thin entry point: call initialize() once at startup, then build meshes
with global_mesh() — the sharded smoothing/BA steps
(flame_tpu.parallel.sharding / distributed_ba) are already expressed over
mesh axes and run unchanged on multi-host meshes (collectives ride ICI
within a slice and DCN across slices, scheduled by XLA).
"""

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

from flame_tpu.parallel.sharding import AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the distributed runtime. On TPU pods with standard env
    (TPU_WORKER_HOSTNAMES etc.) all arguments auto-detect; pass them
    explicitly for manual clusters."""
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def _device_grid(shape):
    """Topology-aware device arrangement: enumeration order is NOT an
    ICI-adjacency guarantee on pod slices, so let mesh_utils place mesh
    axes along physical links (ring/torus) when it can; fall back to the
    naive reshape on backends without topology info (virtual CPU)."""
    try:
        from jax.experimental import mesh_utils
        return mesh_utils.create_device_mesh(tuple(shape))
    except Exception:
        return np.asarray(jax.devices()).reshape(tuple(shape))


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over every device across all hosts."""
    return Mesh(_device_grid((len(jax.devices()),)), (axis,))


def grid_mesh(shape: Sequence[int], axes: Sequence[str]) -> Mesh:
    """N-D mesh over all global devices, e.g. (hosts, chips-per-host) for
    keyframe-block x graph sharding."""
    return Mesh(_device_grid(shape), tuple(axes))


def is_coordinator() -> bool:
    return jax.process_index() == 0
