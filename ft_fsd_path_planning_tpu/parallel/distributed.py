"""Multi-host execution — `jax.distributed` wiring + per-host data feeding.

The reference is single-process by construction (SURVEY.md §2.3); multi-host
scale-out is a design obligation of this framework: each host runs the same
program, `jax.distributed.initialize` forms the cluster, the device mesh
spans all hosts (ICI within a slice, DCN across hosts — XLA routes
collectives), and every host feeds only its local shard of the frame batch
(`jax.make_array_from_process_local_data`). The planner step itself is
unchanged: data parallelism over frames is process-count-agnostic.

On real v5e slices `initialize()` needs no arguments (the TPU runtime
provides coordinator/topology); the explicit coordinator path below is for
CPU simulation (N processes x M `--xla_force_host_platform_device_count`
devices, Gloo collectives) — the same program, smaller wires.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ft_fsd_path_planning_tpu.config import PlannerConfig
from ft_fsd_path_planning_tpu.models.planner import PlannerState
from ft_fsd_path_planning_tpu.parallel.batch import make_batch_state


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Form the multi-host cluster (idempotent).

    With no arguments, defers entirely to the TPU runtime's automatic
    discovery (the v5e production path). Explicit arguments drive the
    CPU-simulation path used by the 2-process test.
    """
    if jax.distributed.is_initialized():
        return
    kwargs: dict[str, Any] = {}
    if coordinator_address is not None:
        kwargs.update(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over every device of every process."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_slice(global_batch: int) -> tuple[int, int]:
    """[start, stop) rows of the global batch this process owns (equal split
    by process index — matches a batch-axis NamedSharding over the mesh)."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global_batch={global_batch} must divide evenly over "
            f"{n} processes (pad the batch to a multiple)"
        )
    per = global_batch // n
    i = jax.process_index()
    return i * per, (i + 1) * per

def make_global_batch(mesh: Mesh, local_tree: Any, global_batch: int, axis: str = "data") -> Any:
    """Assemble per-process local batches into global sharded arrays.

    ``local_tree`` leaves have leading dim = this process's share; the result
    leaves are global jax.Arrays of leading dim ``global_batch`` sharded over
    the mesh — each host contributes only the rows it loaded (per-host shard
    loading: no host ever materializes the full batch).
    """
    sharding = NamedSharding(mesh, P(axis))

    def build(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            sharding, x, (global_batch,) + x.shape[1:]
        )

    return jax.tree.map(build, local_tree)


def make_global_state(cfg: PlannerConfig, mesh: Mesh, global_batch: int, axis: str = "data") -> PlannerState:
    """Initial planner state replicated per-row, sharded over the mesh."""
    local = jax.process_count()
    if global_batch % local != 0:
        raise ValueError(
            f"global_batch={global_batch} must divide evenly over "
            f"{local} processes (pad the batch to a multiple)"
        )
    per = global_batch // local
    local_states = make_batch_state(cfg, per)
    host_local = jax.tree.map(np.asarray, local_states)
    return make_global_batch(mesh, host_local, global_batch, axis)
