"""Public NumPy-in/NumPy-out facade — drop-in replacement for the reference
`PathPlanner` (full_pipeline/full_pipeline.py:53-217).

The facade pads ragged host inputs into the fixed shape budget, invokes the
jitted planner step on device, and unpads the outputs. The heavy lifting is
all inside :func:`planner_step`; this class only carries host-side state.
"""

from __future__ import annotations

import dataclasses
import functools
import warnings
from functools import partial
from typing import Any, List, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import PlannerConfig, default_config
from ft_fsd_path_planning_tpu.models import pathing
from ft_fsd_path_planning_tpu.models.planner import (
    GLOBAL_PATH_BUFFER_LEN,
    FrameInput,
    make_initial_state,
    planner_step,
)
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

FloatArray = np.ndarray
IntArray = np.ndarray


@dataclasses.dataclass
class RelocalizationInformation:
    """Parity with reference relocalization_information.py:12-35."""

    translation: FloatArray
    rotation: float


def flatten_cones_by_type(cones: List[FloatArray], n_max: int) -> Tuple[np.ndarray, np.ndarray]:
    """Ravel the per-type cone lists into a padded (N, 3) [x, y, color]
    tensor + mask (reference flatten_cones_by_type_array,
    core_trace_sorter.py:37-54).

    Warns when the frame overflows the ``n_max`` budget — dropping cones on
    a full SLAM map would silently corrupt the planned path. Use
    ``config.large_map_config()`` / ``default_config(n_cones=...)`` to raise
    the budget (it is a static shape: changing it retraces the program).
    """
    total = sum(np.asarray(c).reshape(-1, 2).shape[0] for c in cones)
    if total > n_max:
        warnings.warn(
            f"frame has {total} cones but the configured shape budget is "
            f"n_cones={n_max}; {total - n_max} cones will be DROPPED. "
            "Construct the planner with a larger budget, e.g. "
            "PathPlanner(mission, config=default_config(mission, n_cones=256)).",
            RuntimeWarning,
            stacklevel=2,
        )
    pts = np.zeros((n_max, 3), np.float32)
    pts[:, 2] = -1.0
    mask = np.zeros(n_max, bool)
    start = 0
    for cone_type in range(len(cones)):
        arr = np.asarray(cones[cone_type], np.float32).reshape(-1, 2)
        n = min(len(arr), n_max - start)
        pts[start : start + n, :2] = arr[:n]
        pts[start : start + n, 2] = cone_type
        mask[start : start + n] = True
        start += n
    return pts, mask


@functools.lru_cache(maxsize=None)
def _jitted_step(cfg: PlannerConfig):
    """One compiled step per config (cfg is a frozen hashable pytree).

    A per-instance ``jax.jit(partial(...))`` would be a fresh callable every
    construction and recompile the whole pipeline for every PathPlanner —
    ~30 s per instance on CPU."""
    return jax.jit(partial(planner_step, cfg))


class PathPlanner:
    """Drop-in replacement for the reference PathPlanner."""

    def __init__(
        self,
        mission: MissionTypes,
        experimental_performance_improvements: bool = False,
        config: Optional[PlannerConfig] = None,
    ) -> None:
        self.mission = mission
        self.cfg = config or default_config(
            mission, experimental_performance_improvements
        )
        self._state = make_initial_state(self.cfg)
        self._step = _jitted_step(self.cfg)
        self.global_path: Optional[FloatArray] = None

    def _convert_direction_to_array(self, direction: Any) -> FloatArray:
        direction = np.squeeze(np.array(direction, float))
        if direction.shape == (2,):
            return direction
        if direction.shape in [(1,), ()]:
            return np.array([np.cos(float(direction)), np.sin(float(direction))])
        raise ValueError("direction must be a float or a 2 element array")

    def set_global_path(self, global_path: Optional[FloatArray]) -> None:
        self.global_path = global_path
        if global_path is None:
            buf = pathing.GlobalPathBuffer.empty(GLOBAL_PATH_BUFFER_LEN)
        else:
            gp = np.asarray(global_path, np.float32)
            n = min(len(gp), GLOBAL_PATH_BUFFER_LEN)
            pts = np.zeros((GLOBAL_PATH_BUFFER_LEN, 2), np.float32)
            pts[:n] = gp[:n]
            buf = pathing.GlobalPathBuffer(
                points=jnp.asarray(pts),
                n_valid=jnp.asarray(n, jnp.int32),
                active=jnp.asarray(True),
            )
        self._state = self._state._replace(global_path=buf)

    def calculate_path_in_global_frame(
        self,
        cones: List[FloatArray],
        vehicle_position: FloatArray,
        vehicle_direction: Union[FloatArray, float],
        return_intermediate_results: bool = False,
    ) -> Union[FloatArray, Tuple[FloatArray, ...]]:
        """Run the full planning pipeline for one frame. Returns an (N, 4)
        array of (spline_parameter, x, y, curvature) waypoints."""
        vehicle_direction = self._convert_direction_to_array(vehicle_direction)

        pts, mask = flatten_cones_by_type(cones, self.cfg.shapes.n_cones)
        frame = FrameInput(
            cones=jnp.asarray(pts),
            mask=jnp.asarray(mask),
            position=jnp.asarray(vehicle_position, jnp.float32),
            direction=jnp.asarray(vehicle_direction, jnp.float32),
        )
        out, self._state = self._step(self._state, frame)

        final_path = np.asarray(out.path, np.float64)
        if not return_intermediate_results:
            return final_path

        def unpad(arr, m):
            n = int(np.sum(np.asarray(m)))
            return np.asarray(arr, np.float64)[:n]

        def unpad_int(arr, m):
            n = int(np.sum(np.asarray(m)))
            return np.asarray(arr)[:n].astype(int)

        return (
            final_path,
            unpad(out.sorted_left, out.sorted_left_mask),
            unpad(out.sorted_right, out.sorted_right_mask),
            unpad(out.left_with_virtual, out.left_mask),
            unpad(out.right_with_virtual, out.right_mask),
            unpad_int(out.left_to_right, out.left_mask),
            unpad_int(out.right_to_left, out.right_mask),
        )

    @property
    def relocalization_info(self) -> Optional[RelocalizationInformation]:
        reloc = self._state.reloc
        if not self.cfg.has_relocalizer or not bool(reloc.relocalized):
            return None
        from ft_fsd_path_planning_tpu.models.relocalization import (
            transform_to_known_frame,
        )

        origin, _ = transform_to_known_frame(reloc, jnp.zeros(2), jnp.asarray(0.0))
        one_zero, _ = transform_to_known_frame(
            reloc, jnp.asarray([1.0, 0.0]), jnp.asarray(0.0)
        )
        origin = np.asarray(origin, np.float64)
        one_zero = np.asarray(one_zero, np.float64)
        rotation = float(
            np.arctan2(one_zero[1] - origin[1], one_zero[0] - origin[0])
        )
        return RelocalizationInformation(translation=origin, rotation=rotation)
