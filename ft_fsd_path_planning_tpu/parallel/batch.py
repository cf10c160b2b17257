"""Batched + sharded execution — the scale-out layer.

The reference is strictly one-frame-at-a-time on one CPU core (SURVEY.md
§2.3). Here the whole planner step is a pure function, so scale-out is pure
JAX program transformation:

* `vmap` over a frame batch (thousands of scenarios in one XLA program),
* `lax.scan` over time for stateful replay (the checkpointable unit),
* `shard_map` over a device mesh with the batch axis sharded across chips;
  metric reductions ride ICI via `psum`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ft_fsd_path_planning_tpu.config import PlannerConfig
from ft_fsd_path_planning_tpu.models.planner import (
    FrameInput,
    PlannerState,
    StepOutput,
    make_initial_state,
    planner_step,
)

Array = jax.Array


def make_batch_state(cfg: PlannerConfig, batch: int) -> PlannerState:
    """Replicate the initial planner state across a batch axis."""
    state = make_initial_state(cfg)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)


def batched_step(cfg: PlannerConfig, states: PlannerState, frames: FrameInput):
    """vmapped single step: (B,...) states x (B,...) frames."""
    return jax.vmap(partial(planner_step, cfg))(states, frames)


def replay_scan(cfg: PlannerConfig, state: PlannerState, frames: FrameInput):
    """Scan one scenario's frame sequence through the planner, carrying
    state — the stateful-replay unit (relocalization, previous paths).
    ``frames`` has a leading time axis. Returns (final_state, (T, H, 4) paths)."""

    def body(carry, frame):
        out, new_state = planner_step(cfg, carry, frame)
        return new_state, out.path

    return jax.lax.scan(body, state, frames)


def batched_replay(cfg: PlannerConfig, states: PlannerState, frames: FrameInput):
    """(B, T, ...) frame batches through vmapped scan."""
    return jax.vmap(partial(replay_scan, cfg))(states, frames)


class BatchMetrics(NamedTuple):
    """Cross-device aggregated per-batch metrics (psum over the mesh)."""

    n_frames: Array
    mean_path_length: Array
    mean_abs_curvature: Array


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(jax.make_mesh((len(devices),), (axis,), devices=devices).devices, (axis,))


def sharded_batched_step(cfg: PlannerConfig, mesh: Mesh, axis: str = "data"):
    """Build a jitted multi-chip batched step.

    The batch axis is sharded across the mesh; each chip solves its shard of
    frames independently (planning is embarrassingly data-parallel — the
    correct TPU mapping per SURVEY.md §2.3) and metric reductions cross ICI
    via psum inside shard_map.
    """
    spec = P(axis)

    def shard_fn(states: PlannerState, frames: FrameInput):
        outs, new_states = batched_step(cfg, states, frames)
        paths = outs.path
        local_n = jnp.asarray(paths.shape[0], jnp.float32)
        n = jax.lax.psum(local_n, axis)
        path_len = jax.lax.psum(jnp.sum(paths[:, -1, 0]), axis) / n
        curv = jax.lax.psum(jnp.sum(jnp.abs(paths[:, :, 3])), axis) / (
            n * paths.shape[1]
        )
        metrics = BatchMetrics(
            n_frames=n, mean_path_length=path_len, mean_abs_curvature=curv
        )
        return outs, new_states, metrics

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, P()),
        # per-shard compute only (pure data parallel): skip the
        # varying-manual-axes propagation check, which rejects loop carries
        # initialized from replicated constants
        check_vma=False,
    )
    return jax.jit(mapped)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), tree
    )
