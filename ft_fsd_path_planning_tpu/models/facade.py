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


def flatten_cones_by_type(
    cones: List[FloatArray], n_max: int, dtype=np.float32
) -> Tuple[np.ndarray, np.ndarray]:
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
    pts = np.zeros((n_max, 3), dtype)
    pts[:, 2] = -1.0
    mask = np.zeros(n_max, bool)
    start = 0
    for cone_type in range(len(cones)):
        arr = np.asarray(cones[cone_type], dtype).reshape(-1, 2)
        n = min(len(arr), n_max - start)
        pts[start : start + n, :2] = arr[:n]
        pts[start : start + n, 2] = cone_type
        mask[start : start + n] = True
        start += n
    return pts, mask


@functools.lru_cache(maxsize=32)
def _jitted_step(cfg: PlannerConfig):
    """One compiled step per config (cfg is a frozen hashable pytree).

    A per-instance ``jax.jit(partial(...))`` would be a fresh callable every
    construction and recompile the whole pipeline for every PathPlanner —
    ~30 s per instance on CPU. Bounded (LRU 32): a long-lived process
    sweeping many configs evicts and recompiles instead of leaking
    executables; live planners keep working because they hold their own
    reference to the jitted callable."""
    return jax.jit(partial(planner_step, cfg))


@functools.lru_cache(maxsize=32)
def _jitted_presorted_step(cfg: PlannerConfig):
    from ft_fsd_path_planning_tpu.models.planner import planner_step_presorted

    return jax.jit(partial(planner_step_presorted, cfg))


@functools.lru_cache(maxsize=32)
def _jitted_start_cones(cfg: PlannerConfig):
    """Per-side starting-cone selection only — the cheap program the sorting
    cache's similarity check needs before deciding to skip the full sort
    (reference input_is_very_similar_to_previous_input,
    core_trace_sorter.py:218-250 checks starting cones first)."""
    from ft_fsd_path_planning_tpu.models import sorting

    def run(cones, mask, position, direction):
        if not cfg.sorting.use_unknown_cones:
            mask = mask & (cones[:, 2] != ConeTypes.UNKNOWN)
        out = []
        for ct in (int(ConeTypes.LEFT), int(ConeTypes.RIGHT)):
            prefix, n_first = sorting.select_starting_cones(
                cfg.sorting, cones, mask, ct, position, direction
            )
            out.append((prefix, n_first))
        return out

    return jax.jit(run)


@functools.lru_cache(maxsize=2)
def _jitted_refine(mission_name: str):
    """CPU-jitted f64 relocalization (see _refine_reloc_f64): eager f64
    execution costs ~6 s of per-op dispatch on the relocalization frame;
    the jitted program compiles in ~1 s (cached persistently) and runs in
    ~1 ms."""
    from ft_fsd_path_planning_tpu.models import relocalization as reloc_mod

    fn = (
        reloc_mod.skidpad_relocalize_once
        if mission_name == "skidpad"
        else reloc_mod.acceleration_relocalize_once
    )
    # fresh closure per cache entry: jax.jit keys its trace cache on the
    # wrapped callable, so wrapping the bare module function would resurrect
    # a stale trace (with the old known-path constants baked in) after
    # cache_clear() — the same reason _jitted_step wraps a fresh partial
    return jax.jit(lambda *args: fn(*args))


def _warm_refine(mission_name: str, n_cones: int) -> None:
    """Trace + compile the f64 refinement on dummy inputs (same shapes as
    the real call) so the relocalization frame only pays the ~1 ms run."""
    try:
        cpu = jax.devices("cpu")[0]
        with jax.enable_x64(True), jax.default_device(cpu):
            xy = jnp.zeros((n_cones, 2), jnp.float64)
            m = jnp.zeros((n_cones,), bool)
            v = jnp.zeros((2,), jnp.float64)
            refine = _jitted_refine(mission_name)
            if mission_name == "skidpad":
                out = refine(xy, m, v, v, v)
            else:
                out = refine(xy, m, v, v, v)
            jax.block_until_ready(out)
    except Exception:
        pass  # warmup only; the real call traces lazily if this failed


def _cone_arrays_are_similar(
    a: Optional[np.ndarray], b: Optional[np.ndarray], threshold: float
) -> bool:
    """Host-side replica of the reference's similarity test
    (core_trace_sorter.py:57-86): same shape, every cone within ``threshold``
    of its nearest counterpart, matching colors."""
    if a is None or b is None:
        return False
    if a.shape != b.shape:
        return False
    if a.shape[0] == 0:
        return True
    d = np.sum((a[:, None, :2] - b[None, :, :2]) ** 2, axis=-1)
    closest = d.min(axis=1)
    if not np.all(closest < threshold * threshold):
        return False
    if a.shape[1] == 2:
        return True
    idx = d.argmin(axis=1)
    return bool(np.all(a[:, 2] == b[idx, 2]))


def _remap_order(cached_sorted: np.ndarray, current_xy: np.ndarray) -> np.ndarray:
    """Apply a cached sorted ORDER to the current cone positions: each cached
    sorted cone is replaced by its nearest current cone (the similarity check
    guarantees a unique <0.1 m counterpart; track cones are >=1.4 m apart).
    Mirrors the reference cache-hit semantics where the cached config INDICES
    are applied to the fresh flattened cone array
    (core_trace_sorter.py:298-301 + :205-216)."""
    if len(cached_sorted) == 0:
        return cached_sorted
    d = np.sum((cached_sorted[:, None] - current_xy[None]) ** 2, axis=-1)
    return current_xy[d.argmin(axis=1)]


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
        # f64 relocalization refinement bookkeeping (see _refine_reloc_f64)
        self._origin64: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._was_relocalized = False
        if self.cfg.has_relocalizer:
            # pre-trace + compile the f64 refinement NOW (construction
            # already pays the main-program compile) so the relocalization
            # frame only pays the ~1 ms run. Synchronous on purpose: a
            # per-planner background thread racing XLA's own compile
            # threads destabilized long CPU sessions.
            _warm_refine(self.cfg.mission.name, self.cfg.shapes.n_cones)
        # sorting-result cache (experimental_performance_improvements):
        # reference ConeSortingCacheEntry, core_trace_sorter.py:100-110
        self._sort_cache: Optional[dict] = None
        self.sort_cache_hits: int = 0
        self._use_sort_cache = (
            self.cfg.experimental_performance_improvements
            and not self.cfg.has_relocalizer
        )
        if self._use_sort_cache:
            self._step_presorted = _jitted_presorted_step(self.cfg)
            self._start_cones = _jitted_start_cones(self.cfg)

    def _convert_direction_to_array(self, direction: Any) -> FloatArray:
        direction = np.squeeze(np.array(direction, float))
        if direction.shape == (2,):
            return direction
        if direction.shape in [(1,), ()]:
            return np.array([np.cos(float(direction)), np.sin(float(direction))])
        raise ValueError("direction must be a float or a 2 element array")

    def set_global_path(self, global_path: Optional[FloatArray]) -> None:
        self.global_path = global_path
        if global_path is not None and not self.cfg.supports_global_path:
            # the common trackdrive program compiles WITHOUT the global-path
            # branch (small centerline buffer); opting in switches to the
            # global-path-capable variant and retraces once. State shapes
            # are identical, so the carried state survives the switch.
            self.cfg = dataclasses.replace(self.cfg, supports_global_path=True)
            self._step = _jitted_step(self.cfg)
            if self._use_sort_cache:
                self._step_presorted = _jitted_presorted_step(self.cfg)
                self._start_cones = _jitted_start_cones(self.cfg)
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
        if self.cfg.has_relocalizer and self._origin64 is None:
            # the reference stores the FIRST pose as the relocalization
            # origin (relocalization_base_class.py:59-68); keep it at f64
            # for the refinement rerun
            self._origin64 = (
                np.array(vehicle_position, np.float64),
                np.array(vehicle_direction, np.float64),
            )

        if self._use_sort_cache:
            out, self._state = self._step_with_sort_cache(frame, pts, mask)
        else:
            out, self._state = self._step(self._state, frame)

        if (
            self.cfg.has_relocalizer
            and not self._was_relocalized
            and bool(self._state.reloc.relocalized)
        ):
            self._refine_reloc_f64(cones, vehicle_position, vehicle_direction)
            self._was_relocalized = True

        if not return_intermediate_results:
            return np.asarray(out.path, np.float64)

        # ONE bulk device->host fetch: per-leaf np.asarray would pay a full
        # link round trip each (7x per frame on a remote-attached chip)
        (path, sl, slm, sr, srm, lv, lm, rv, rm, l2r, r2l) = jax.device_get(
            (
                out.path,
                out.sorted_left, out.sorted_left_mask,
                out.sorted_right, out.sorted_right_mask,
                out.left_with_virtual, out.left_mask,
                out.right_with_virtual, out.right_mask,
                out.left_to_right, out.right_to_left,
            )
        )

        def unpad(arr, m):
            return np.asarray(arr, np.float64)[: int(np.sum(m))]

        def unpad_int(arr, m):
            return np.asarray(arr)[: int(np.sum(m))].astype(int)

        return (
            np.asarray(path, np.float64),
            unpad(sl, slm),
            unpad(sr, srm),
            unpad(lv, lm),
            unpad(rv, rm),
            unpad_int(l2r, lm),
            unpad_int(r2l, rm),
        )

    def _refine_reloc_f64(
        self,
        cones: List[FloatArray],
        vehicle_position: FloatArray,
        vehicle_direction: FloatArray,
    ) -> None:
        """Recompute the SE(2) transform at float64 once relocalization
        first succeeds.

        The device relocalizer runs in f32; its transform parameters differ
        from the reference's f64 computation by ~0.7 mm over the pose range
        — enough to flip the skidpad windowed tracker's argmin on
        knife-edge frames (measured gaps down to 2.5e-5 m where the
        multi-lap path overlaps itself near lap junctions). Rerunning the
        SAME relocalization code eagerly on CPU under ``enable_x64`` with
        this frame's f64 inputs recovers reference-grade precision without
        a second implementation; the refined parameters overwrite the
        carried state (the reference computes its transform in f64 once and
        freezes it, relocalization_base_class.py:70-75)."""
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            return
        pts64, mask = flatten_cones_by_type(
            cones, self.cfg.shapes.n_cones, dtype=np.float64
        )
        origin_pos, origin_dir = self._origin64
        try:
            with jax.enable_x64(True), jax.default_device(cpu):
                xy = jnp.asarray(pts64[:, :2], jnp.float64)
                m = jnp.asarray(mask)
                pos = jnp.asarray(vehicle_position, jnp.float64)
                refine = _jitted_refine(self.cfg.mission.name)
                if self.cfg.mission.name == "skidpad":
                    ok, rot, trans, center = refine(
                        xy, m, pos,
                        jnp.asarray(origin_pos, jnp.float64),
                        jnp.asarray(origin_dir, jnp.float64),
                    )
                else:
                    ok, rot, trans, center = refine(
                        xy, m, pos,
                        jnp.asarray(vehicle_direction, jnp.float64),
                        jnp.asarray(origin_pos, jnp.float64),
                    )
                if not bool(ok):
                    return  # gate knife edge: keep the device transform
                rot64 = np.float64(rot)
                trans64 = np.asarray(trans, np.float64)
                center64 = np.asarray(center, np.float64)
        except Exception:
            return  # refinement is an accuracy upgrade, never a failure mode
        reloc = self._state.reloc._replace(
            rotation=jnp.asarray(rot64, jnp.float32),
            translation=jnp.asarray(trans64, jnp.float32),
            center=jnp.asarray(center64, jnp.float32),
        )
        self._state = self._state._replace(reloc=reloc)

    def _step_with_sort_cache(self, frame: FrameInput, pts: np.ndarray, mask: np.ndarray):
        """Reference sorting-result cache (core_trace_sorter.py:189-250,
        298-301) at the facade boundary: if the per-side starting cones AND
        the full flattened cone set each sit within 0.1 m (positions and
        colors) of the previous frame's, skip the beam-search sorter and
        re-dispatch with the cached sorted order applied to the CURRENT cone
        positions. Unlike the reference's per-side cache this reuses only
        when BOTH sides hit (the fused step runs both sides as one search)."""
        threshold = 0.1
        if not self.cfg.sorting.use_unknown_cones:
            mask = mask & (pts[:, 2] != ConeTypes.UNKNOWN)
        flat = pts[mask]

        (pl, nl), (pr, nr) = self._start_cones(
            frame.cones, frame.mask, frame.position, frame.direction
        )

        def start_rows(prefix, n):
            idx = np.asarray(prefix)[: int(n)]
            return pts[idx] if len(idx) else np.zeros((0, 3), np.float32)

        start_l = start_rows(pl, nl)
        start_r = start_rows(pr, nr)

        c = self._sort_cache
        hit = (
            c is not None
            and _cone_arrays_are_similar(start_l, c["start_l"], threshold)
            and _cone_arrays_are_similar(start_r, c["start_r"], threshold)
            and _cone_arrays_are_similar(flat, c["flat"], threshold)
        )
        if hit:
            self.sort_cache_hits += 1
            xy = flat[:, :2]
            sl = np.array(c["sorted_l"])
            sr = np.array(c["sorted_r"])
            lm, rm = c["sorted_l_mask"], c["sorted_r_mask"]
            sl[lm] = _remap_order(sl[lm], xy)
            sr[rm] = _remap_order(sr[rm], xy)
            # refresh the cache with THIS frame (keeping the cached sorted
            # order applied to current positions): the reference rebuilds
            # its ConeSortingCacheEntry from the fresh flattened cones every
            # call (core_trace_sorter.py:189-196), so similarity is always
            # frame-to-frame — without this, slow cumulative SLAM drift
            # (> 0.1 m total over a stable stretch) would force re-sorts
            # the reference skips (round-4 advisor).
            self._sort_cache = {
                "flat": flat,
                "start_l": start_l,
                "start_r": start_r,
                "sorted_l": sl.astype(np.float32),
                "sorted_l_mask": lm,
                "sorted_r": sr.astype(np.float32),
                "sorted_r_mask": rm,
            }
            return self._step_presorted(
                self._state,
                frame,
                jnp.asarray(sl),
                jnp.asarray(lm),
                jnp.asarray(sr),
                jnp.asarray(rm),
            )

        out, state = self._step(self._state, frame)
        self._sort_cache = {
            "flat": flat,
            "start_l": start_l,
            "start_r": start_r,
            "sorted_l": np.asarray(out.sorted_left, np.float32),
            "sorted_l_mask": np.asarray(out.sorted_left_mask, bool),
            "sorted_r": np.asarray(out.sorted_right, np.float32),
            "sorted_r_mask": np.asarray(out.sorted_right_mask, bool),
        }
        return out, state

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
