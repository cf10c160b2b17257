"""Single-frame planner step — the jittable composition of all stages.

Mirrors `full_pipeline/full_pipeline.py:84-207`: (relocalize | sort -> match)
-> path calculation -> (transform back). The whole step is one pure function
of (static config, state pytree, frame input) so it jits once per shape
budget, vmaps over frame batches, and shard_maps over device meshes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.assets.known_paths import (
    BASE_ACCELERATION_PATH,
    BASE_SKIDPAD_PATH,
)
from ft_fsd_path_planning_tpu.config import PlannerConfig
from ft_fsd_path_planning_tpu.models import matching, pathing, relocalization, sorting
from ft_fsd_path_planning_tpu.ops import geometry as geo
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

Array = jax.Array

GLOBAL_PATH_BUFFER_LEN = 3072


class PlannerState(NamedTuple):
    path: pathing.PathState
    reloc: relocalization.RelocState
    global_path: pathing.GlobalPathBuffer  # user-set path (set_global_path)


class FrameInput(NamedTuple):
    cones: Array  # (N, 3) [x, y, color], color -1 on padding
    mask: Array  # (N,)
    position: Array  # (2,)
    direction: Array  # (2,)


class StepOutput(NamedTuple):
    path: Array  # (H, 4)
    path_ok: Array  # () bool: False = fell back to the previous path
    path_too_far: Array  # () bool: overwrite-if-too-far guard fired
    relocalized: Array  # () bool (always False for trackdrive/autocross)
    spline_budget_hit: Array  # () bool: a FITPACK fit hit its knot budget
    sorted_left: Array  # (L, 2)
    sorted_left_mask: Array
    sorted_right: Array
    sorted_right_mask: Array
    left_with_virtual: Array  # (S, 2)
    left_mask: Array
    right_with_virtual: Array
    right_mask: Array
    left_to_right: Array  # (S,)
    right_to_left: Array


def _known_global_path(cfg: PlannerConfig) -> pathing.GlobalPathBuffer:
    """The fixed mission path loaded after relocalization
    (full_pipeline.py:134, skidpad_relocalizer.py:242-243)."""
    if cfg.mission == MissionTypes.skidpad:
        path = BASE_SKIDPAD_PATH[::2]
    else:
        path = BASE_ACCELERATION_PATH
    g = GLOBAL_PATH_BUFFER_LEN
    buf = np.zeros((g, 2), np.float32)
    n = min(len(path), g)
    buf[:n] = path[:n]
    return pathing.GlobalPathBuffer(
        points=jnp.asarray(buf),
        n_valid=jnp.asarray(n, jnp.int32),
        active=jnp.asarray(True),
    )


def _build_initial_state(cfg: PlannerConfig) -> PlannerState:
    return PlannerState(
        path=pathing.initial_path_state(cfg),
        reloc=relocalization.RelocState.initial(),
        global_path=pathing.GlobalPathBuffer.empty(GLOBAL_PATH_BUFFER_LEN),
    )


@functools.lru_cache(maxsize=32)
def _initial_state_jit(cfg: PlannerConfig):
    return jax.jit(functools.partial(_build_initial_state, cfg))


def make_initial_state(cfg: PlannerConfig) -> PlannerState:
    # jit: built eagerly this is hundreds of tiny dispatches (very slow on
    # remote-attached accelerators); cached per config so repeated planner
    # construction doesn't recompile
    return _initial_state_jit(cfg)()


def planner_step(
    cfg: PlannerConfig, state: PlannerState, frame: FrameInput
) -> tuple[StepOutput, PlannerState]:
    return _planner_step_impl(cfg, state, frame, None)


def planner_step_presorted(
    cfg: PlannerConfig,
    state: PlannerState,
    frame: FrameInput,
    sorted_left: Array,
    sorted_left_mask: Array,
    sorted_right: Array,
    sorted_right_mask: Array,
) -> tuple[StepOutput, PlannerState]:
    """Step variant that skips the beam-search sorter and reuses a previous
    frame's sorted cone order — the TPU equivalent of the reference's
    `experimental_performance_improvements` sorting-result cache
    (core_trace_sorter.py:189-250, 298-301): when the facade's host-side
    similarity check passes, the cached order (remapped onto the current
    cone positions) is fed here and only matching + path calculation run."""
    if cfg.has_relocalizer:
        raise ValueError("presorted step only exists for the sorting pipeline")
    presorted = sorting.SortingOutput(
        left_cones=sorted_left,
        left_mask=sorted_left_mask,
        right_cones=sorted_right,
        right_mask=sorted_right_mask,
    )
    return _planner_step_impl(cfg, state, frame, presorted)


def _planner_step_impl(
    cfg: PlannerConfig,
    state: PlannerState,
    frame: FrameInput,
    presorted: sorting.SortingOutput | None,
) -> tuple[StepOutput, PlannerState]:
    s_len = cfg.shapes.side_len
    l_len = cfg.sorting.max_length

    position = frame.position
    direction = frame.direction

    empty_sorted = jnp.zeros((l_len, 2))
    empty_sorted_mask = jnp.zeros(l_len, bool)
    empty_side = jnp.zeros((s_len, 2))
    empty_side_mask = jnp.zeros(s_len, bool)
    empty_matches = jnp.full(s_len, -1, jnp.int32)

    if cfg.has_relocalizer:
        # relocalization replaces sorting+matching (full_pipeline.py:122-141)
        with jax.named_scope("relocalization"):
            reloc = relocalization.attempt_relocalization(
                cfg, state.reloc, frame.cones[:, :2], frame.mask, position, direction
            )
        relocalized = reloc.relocalized
        yaw = geo.angle_from_2d_vector(direction)
        pos_t, yaw_t = relocalization.transform_to_known_frame(reloc, position, yaw)
        position = jnp.where(relocalized, pos_t, position)
        direction = jnp.where(
            relocalized, geo.unit_2d_vector_from_angle(yaw_t), direction
        )
        known = _known_global_path(cfg)
        gp = known._replace(active=relocalized | state.global_path.active)

        sorted_l, sorted_l_m = empty_sorted, empty_sorted_mask
        sorted_r, sorted_r_m = empty_sorted, empty_sorted_mask
        match_out = matching.MatchingOutput(
            left_cones=empty_side, left_mask=empty_side_mask,
            left_virtual_mask=empty_side_mask,
            right_cones=empty_side, right_mask=empty_side_mask,
            right_virtual_mask=empty_side_mask,
            left_to_right=empty_matches, right_to_left=empty_matches,
        )
    else:
        reloc = state.reloc
        gp = state.global_path

        mask = frame.mask
        if not cfg.sorting.use_unknown_cones:
            mask = mask & (frame.cones[:, 2] != ConeTypes.UNKNOWN)

        if presorted is None:
            with jax.named_scope("cone_sorting"):
                sort_out = sorting.run_cone_sorting(
                    cfg, frame.cones, mask, position, direction
                )
        else:
            sort_out = presorted
        sorted_l, sorted_l_m = sort_out.left_cones, sort_out.left_mask
        sorted_r, sorted_r_m = sort_out.right_cones, sort_out.right_mask

        pad = lambda pts, m: (
            jnp.zeros((s_len, 2)).at[:l_len].set(pts),
            jnp.zeros(s_len, bool).at[:l_len].set(m),
        )
        ml, mlm = pad(sorted_l, sorted_l_m)
        mr, mrm = pad(sorted_r, sorted_r_m)
        with jax.named_scope("cone_matching"):
            match_out = matching.run_cone_matching(
                cfg,
                matching.MatchingInput(
                    left_cones=ml, left_mask=mlm,
                    right_cones=mr, right_mask=mrm,
                    position=position, direction=direction,
                ),
            )

    with jax.named_scope("path_calculation"):
        path_out = pathing.run_path_calculation(
            cfg,
            pathing.PathInput(
                left_cones=match_out.left_cones,
                left_mask=match_out.left_mask,
                right_cones=match_out.right_cones,
                right_mask=match_out.right_mask,
                left_to_right=match_out.left_to_right,
                right_to_left=match_out.right_to_left,
                position=position,
                direction=direction,
            ),
            gp,
            state.path,
        )

    final = path_out.path
    if cfg.has_relocalizer:
        # convert back to the original frame (full_pipeline.py:178-194)
        xy = final[:, 1:3]
        back, _ = relocalization.transform_to_original_frame(
            reloc, xy, jnp.zeros(xy.shape[0])
        )
        final = jnp.where(reloc.relocalized, final.at[:, 1:3].set(back), final)

    new_state = PlannerState(
        path=path_out.state, reloc=reloc, global_path=state.global_path
    )
    return (
        StepOutput(
            path=final,
            path_ok=path_out.ok,
            path_too_far=path_out.too_far,
            relocalized=reloc.relocalized,
            spline_budget_hit=path_out.spline_budget_hit,
            sorted_left=sorted_l,
            sorted_left_mask=sorted_l_m,
            sorted_right=sorted_r,
            sorted_right_mask=sorted_r_m,
            left_with_virtual=match_out.left_cones,
            left_mask=match_out.left_mask,
            right_with_virtual=match_out.right_cones,
            right_mask=match_out.right_mask,
            left_to_right=match_out.left_to_right,
            right_to_left=match_out.right_to_left,
        ),
        new_state,
    )
