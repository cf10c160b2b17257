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
    """Cross-device aggregated per-batch metrics (psum over the mesh) —
    SURVEY.md §5 observability: solve success, fallback-path rate, and the
    shape statistics a race engineer watches during a run."""

    n_frames: Array
    mean_path_length: Array
    mean_abs_curvature: Array
    # fraction of frames whose path came out of the full solve (False means
    # the fallback lattice substituted the previous path, pathing.py ok-flag)
    solve_success_rate: Array
    # fraction of frames where the overwrite-if-too-far guard fired
    too_far_rate: Array
    # fraction of relocalized frames (skidpad/accel missions)
    relocalized_rate: Array
    # fraction of frames where a FITPACK fit exited on its knot/iteration
    # budget instead of acceptance (should be ~0 on real workloads)
    spline_budget_hit_rate: Array


def _point_to_polyline_dist(a: Array, ref_xy: Array) -> Array:
    """(B, H, 2) query points vs (B, R, 2) polylines -> (B, H) distances
    (point-to-segment, on device)."""
    p0 = ref_xy[:, :-1, :]  # (B, R-1, 2)
    seg = ref_xy[:, 1:, :] - p0
    seg_len2 = jnp.maximum(jnp.sum(seg * seg, axis=-1), 1e-12)  # (B, R-1)
    rel = a[:, :, None, :] - p0[:, None, :, :]  # (B, H, R-1, 2)
    t = jnp.clip(
        jnp.sum(rel * seg[:, None, :, :], axis=-1) / seg_len2[:, None, :], 0.0, 1.0
    )
    foot = p0[:, None, :, :] + t[..., None] * seg[:, None, :, :]
    d2 = jnp.sum((a[:, :, None, :] - foot) ** 2, axis=-1)  # (B, H, R-1)
    return jnp.sqrt(jnp.min(d2, axis=-1))  # (B, H)


def path_deviation(paths: Array, ref_xy: Array) -> Array:
    """Per-frame max lateral deviation of (B, H, 4) paths vs (B, R, 2)
    reference polylines.

    The parity / regression metric of BASELINE.md (<5 cm vs reference) as a
    batched program: no host round-trip, psum-able.
    """
    return _point_to_polyline_dist(paths[:, :, 1:3], ref_xy).max(axis=-1)  # (B,)


def path_parity_deviation_paths(a_paths: Array, b_paths: Array) -> Array:
    """Symmetric per-frame parity deviation between two (B, H, 4) path
    stacks over their common arc span — the on-device analog of the test
    suite's ``path_parity_deviation`` (the 20 m trim boundary can flip the
    final sample between float32/float64 runs; query points past the common
    theta span are excluded, target curves kept whole)."""
    d_ab = _point_to_polyline_dist(a_paths[:, :, 1:3], b_paths[:, :, 1:3])
    d_ba = _point_to_polyline_dist(b_paths[:, :, 1:3], a_paths[:, :, 1:3])
    span = jnp.minimum(a_paths[:, -1, 0], b_paths[:, -1, 0]) + 1e-6
    d_ab = jnp.where(a_paths[:, :, 0] <= span[:, None], d_ab, 0.0)
    d_ba = jnp.where(b_paths[:, :, 0] <= span[:, None], d_ba, 0.0)
    return jnp.maximum(d_ab.max(axis=-1), d_ba.max(axis=-1))  # (B,)


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
        psum_mean = lambda v: jax.lax.psum(jnp.sum(v.astype(jnp.float32)), axis) / n
        metrics = BatchMetrics(
            n_frames=n,
            mean_path_length=psum_mean(paths[:, -1, 0]),
            mean_abs_curvature=psum_mean(jnp.mean(jnp.abs(paths[:, :, 3]), axis=1)),
            solve_success_rate=psum_mean(outs.path_ok),
            too_far_rate=psum_mean(outs.path_too_far),
            relocalized_rate=psum_mean(outs.relocalized),
            spline_budget_hit_rate=psum_mean(outs.spline_budget_hit),
        )
        return outs, new_states, metrics

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec, P()),
        # varying-manual-axes checking stays ON: it guards exactly the class
        # of bug where a future collective reads a value with the wrong
        # replication status. Loop carries that initialize from replicated
        # constants satisfy it via data-derived zero seeds
        # (ops/fitpack.py::_varying_zeros).
        check_vma=True,
    )
    return jax.jit(mapped)


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Device-put a batched pytree with its leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, sharding), tree
    )
