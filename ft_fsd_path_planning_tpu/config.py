"""Static configuration pytrees for the TPU-native planner.

All numeric defaults mirror the reference factories
(`fsd_path_planning/config.py:28-163`) so that behaviour parity can be
validated frame-by-frame. On top of those, :class:`ShapeBudget` fixes every
tensor dimension of the pipeline — the TPU answer to the reference's ragged
NumPy arrays: jitted programs trace once per budget and never recompile.

The dataclasses are frozen + hashable so they can be passed as ``static_argnums``
to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import math

from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes


@dataclasses.dataclass(frozen=True)
class SortingConfig:
    """Trace-sorter parameters (reference `config.py:28-41`)."""

    max_n_neighbors: int = 5
    max_dist: float = 6.5
    max_dist_to_first: float = 6.0
    max_length: int = 12
    threshold_directional_angle: float = math.radians(40.0)
    threshold_absolute_angle: float = math.radians(65.0)
    use_unknown_cones: bool = True
    # beam width of the fixed-shape search that replaces the reference's
    # exhaustive DFS (end_configurations.py:320-431). Data-justified default
    # (BEAM_FIDELITY.md): across 600 adversarial side-searches the DFS's
    # per-depth viable frontier never exceeded 16 — the reference's own
    # pruning gates keep the search narrow — so K=32 holds every viable
    # candidate with 2x headroom and matched the exhaustive winner on all of
    # them, at ~26% less sorting time than K=64. Raise for custom gate
    # configurations that loosen the pruning envelope.
    beam_width: int = 32
    # pruning constants hard-coded inside the reference DFS
    car_size: float = 2.1  # find_configs_and_scores.py:93
    ellipse_major: float = 6.0  # end_configurations.py:282-300
    ellipse_minor: float = 3.0
    between_dist: float = 6.0  # end_configurations.py:227-257
    between_angle: float = math.radians(150.0)
    close_cone_dist: float = 4.0  # end_configurations.py:187-189
    # cost function constants (cost_function.py)
    angle_cost_threshold: float = math.radians(40.0)
    distance_cost_threshold: float = 3.0
    side_search_distance: float = 6.0
    side_search_angle: float = math.pi / 1.5


@dataclasses.dataclass(frozen=True)
class MatchingConfig:
    """Cone-matching parameters (reference `config.py:114-129`).

    The PathPlanner facade always flips ``matches_should_be_monotonic`` to
    False (reference `config.py:148-163`, `full_pipeline.py:65`).
    """

    min_track_width: float = 3.0
    max_search_range: float = 5.0
    max_search_angle: float = math.radians(50.0)
    matches_should_be_monotonic: bool = False

    @property
    def major_radius(self) -> float:
        # core_cone_matching.py:100-102
        return self.max_search_range * 1.5

    @property
    def minor_radius(self) -> float:
        return self.min_track_width


@dataclasses.dataclass(frozen=True)
class PathConfig:
    """Path-calculation parameters (reference `config.py:44-59`)."""

    smoothing: float = 0.2
    predict_every: float = 0.1
    max_deg: int = 3
    maximal_distance_for_valid_path: float = 5.0
    mpc_path_length: float = 20.0
    mpc_prediction_horizon: int = 40
    # parameterization (path_parameterization.py)
    refit_smoothing: float = 0.01
    curvature_radius_min: float = 1.0
    curvature_radius_max: float = 3000.0


@dataclasses.dataclass(frozen=True)
class ShapeBudget:
    """Fixed tensor dimensions of the whole pipeline.

    The reference operates on ragged arrays whose sizes depend on the frame;
    every one of those becomes a padded, masked axis here.
    """

    # max total cones per frame, all types flattened (pad color = -1)
    n_cones: int = 128
    # max cones in one sorted side config == SortingConfig.max_length
    config_len: int = 12
    # max cones per side after virtual-cone insertion (12 real + 12 virtual)
    side_len: int = 32
    # dense spline sample count used through the path post-chain.
    # With predict_every = 0.1 m this covers > 50 m of path.
    dense_samples: int = 512
    # window size cap for the curvature circle fit (path_parameterization.py:177)
    curvature_window: int = 31
    # points kept from a global path around the vehicle (global-path branch)
    global_window: int = 384
    # skidpad relocalization budgets
    reloc_closest_cones: int = 20
    reloc_max_centers: int = 64

    def __post_init__(self) -> None:
        # integer payloads ride one-hot f32 contractions on the hot path
        # (ops/gatherless.take_int_rows): exact only below 2**24
        for name in ("n_cones", "config_len", "side_len", "dense_samples",
                     "global_window"):
            value = getattr(self, name)
            if not 0 < value < 2**24:
                raise ValueError(
                    f"ShapeBudget.{name}={value} outside (0, 2**24): integer "
                    "indices are carried through f32 one-hot contractions"
                )


@dataclasses.dataclass(frozen=True)
class PlannerConfig:
    """Top-level static config: mission + stage configs + shape budget."""

    mission: MissionTypes = MissionTypes.trackdrive
    sorting: SortingConfig = SortingConfig()
    matching: MatchingConfig = MatchingConfig()
    path: PathConfig = PathConfig()
    shapes: ShapeBudget = ShapeBudget()
    experimental_performance_improvements: bool = False
    # static specialization: when False, the pathing stage compiles without
    # the global-path branch and fits its centerline on a small buffer (the
    # matches/previous-path centerline never exceeds ~40 live points, vs the
    # global_window-sized rolled-path window). PathPlanner.set_global_path
    # flips this and retraces; relocalizer missions always carry it.
    supports_global_path: bool = False

    @property
    def has_relocalizer(self) -> bool:
        # full_pipeline.py:46-50
        return self.mission in (
            MissionTypes.acceleration,
            MissionTypes.ebs_test,
            MissionTypes.skidpad,
        )


def default_config(
    mission: MissionTypes = MissionTypes.trackdrive,
    experimental_performance_improvements: bool = False,
    n_cones: int | None = None,
    **overrides,
) -> PlannerConfig:
    """Mission preset mirroring the reference factory defaults.

    ``n_cones`` overrides the flattened-cone budget; pass 256+ for full
    SLAM-map workloads (an FSG autocross map flattens to hundreds of cones,
    reference core_trace_sorter.py:37-54).
    """
    if mission in (
        MissionTypes.acceleration,
        MissionTypes.ebs_test,
        MissionTypes.skidpad,
    ):
        overrides.setdefault("supports_global_path", True)
    if "shapes" not in overrides and mission in (
        MissionTypes.acceleration,
        MissionTypes.ebs_test,
    ):
        # the acceleration known path is an out-and-back rectangle whose two
        # long legs run 5 m apart: the reference's <30 m roll window
        # (core_calculate_path.py:516-529) keeps BOTH legs plus the near
        # cross-leg — up to ~620 of the 1650 path points (~93 m of trace). A
        # 384-point window would truncate the forward leg (it comes last in
        # rolled order) and plan along the wrong leg, and a 512-sample dense
        # budget (51.2 m at 0.1 m) would cut the evaluated hairpin before
        # the forward leg that remove_path_behind_car later keeps.
        # Built BEFORE folding n_cones in so the mission sizing survives a
        # user-supplied cone budget (round-4 advisor finding).
        overrides["shapes"] = ShapeBudget(global_window=704, dense_samples=1024)
    if n_cones is not None:
        base = overrides.get("shapes", ShapeBudget())
        overrides["shapes"] = dataclasses.replace(base, n_cones=n_cones)
    return PlannerConfig(
        mission=mission,
        experimental_performance_improvements=experimental_performance_improvements,
        **overrides,
    )


def large_map_config(
    mission: MissionTypes = MissionTypes.trackdrive,
    experimental_performance_improvements: bool = False,
) -> PlannerConfig:
    """Preset sized for whole-SLAM-map frames (hundreds of cones)."""
    return default_config(
        mission, experimental_performance_improvements, n_cones=256
    )
