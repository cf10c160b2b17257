"""Reference-workload-scale parity: whole SLAM maps, hundreds of cones.

The reference flattens the ENTIRE map every frame
(core_trace_sorter.py:37-54), so an FSG frame carries 150-250+ cones, most
far from the car. These tests run closed-track maps at that scale through
both planners under the n_cones=256 budget and hold the <5 cm BASELINE.md
deviation target (round-2 VERDICT ask #2 — the target had only ever been
measured on <=16-cone corridors).
"""

import numpy as np
import pytest

from ft_fsd_path_planning_tpu import ConeTypes, MissionTypes, PathPlanner
from ft_fsd_path_planning_tpu.config import large_map_config
from ft_fsd_path_planning_tpu.parallel.scenarios import closed_track_frames
from tests.reference_oracle import load_reference
from tests.test_pathing import path_parity_deviation

ref_pkg = load_reference()


@pytest.fixture(scope="module")
def planners():
    ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.trackdrive)
    our_planner = PathPlanner(
        MissionTypes.trackdrive, config=large_map_config(MissionTypes.trackdrive)
    )
    return ref_planner, our_planner


def run_frames(planners, frames):
    ref_planner, our_planner = planners
    devs = []
    for cones, pos, direction in frames:
        ref_out = ref_planner.calculate_path_in_global_frame(
            [np.asarray(c, float).copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        devs.append(path_parity_deviation(ref_out, our_out))
    return np.asarray(devs)


def test_whole_map_parity(planners):
    frames = closed_track_frames(seed=0, n_frames=5, base_radius=42.0, spacing=3.2)
    n_cones = sum(len(c) for c in frames[0][0])
    assert n_cones > 150, n_cones  # genuinely whole-map scale
    devs = run_frames(planners, frames)
    assert devs.max() < 0.05, f"per-frame max deviations {np.round(devs, 4)}"


def test_whole_map_parity_dense(planners):
    """Denser, larger loop — pushes past 200 cones."""
    frames = closed_track_frames(
        seed=4, n_frames=3, base_radius=55.0, spacing=3.0, n_unknown=12
    )
    n_cones = sum(len(c) for c in frames[0][0])
    assert n_cones > 200, n_cones
    devs = run_frames(planners, frames)
    assert devs.max() < 0.05, f"per-frame max deviations {np.round(devs, 4)}"


def test_whole_map_colorless(planners):
    """Whole map with a 30% colorless fraction."""
    rng = np.random.default_rng(7)
    frames = closed_track_frames(seed=2, n_frames=3, base_radius=42.0, spacing=3.2)
    stripped = []
    for cones, pos, direction in frames:
        cones = [np.asarray(c, float).reshape(-1, 2) for c in cones]
        moved = []
        for ct in (ConeTypes.LEFT, ConeTypes.RIGHT):
            strip = rng.random(len(cones[ct])) < 0.3
            moved.append(cones[ct][strip])
            cones[ct] = cones[ct][~strip]
        cones[ConeTypes.UNKNOWN] = np.concatenate(
            [cones[ConeTypes.UNKNOWN]] + moved
        )
        stripped.append((cones, pos, direction))
    devs = run_frames(planners, stripped)
    assert devs.max() < 0.05, f"per-frame max deviations {np.round(devs, 4)}"


def test_overflow_warns():
    """The silent-truncation guard: overflowing the budget warns loudly."""
    planner = PathPlanner(MissionTypes.trackdrive)  # default n_cones=128
    cones = [np.zeros((0, 2))] * 5
    cones[ConeTypes.LEFT] = np.random.default_rng(0).normal(0, 30, (200, 2))
    with pytest.warns(RuntimeWarning, match="DROPPED"):
        planner.calculate_path_in_global_frame(
            cones, np.zeros(2), np.array([1.0, 0.0])
        )
