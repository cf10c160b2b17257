"""End-to-end full-pipeline parity vs the reference PathPlanner."""

import json
from pathlib import Path

import numpy as np
import pytest

from ft_fsd_path_planning_tpu import ConeTypes, MissionTypes, PathPlanner
from tests.reference_oracle import load_reference
from tests.test_pathing import curve_deviation, path_parity_deviation

ref_pkg = load_reference()
RefPathPlanner = ref_pkg.PathPlanner
RefMissionTypes = ref_pkg.MissionTypes

SKIDPAD_JSON = Path("/root/reference/fsd_path_planning/demo/skidpad.json")


def corridor_frames(n_frames=5, curv=0.6, n=12, width=3.0, spacing=3.5):
    """Synthetic drive along an arc corridor: car advances each frame."""
    s = np.arange(n) * spacing
    radius = 30.0 / curv if abs(curv) > 1e-9 else None
    if radius is None:
        center = np.stack([s, np.zeros(n)], axis=1)
        normal = np.tile([[0.0, 1.0]], (n, 1))
        car_pos = lambda t: np.array([t * 2.0, 0.0])
        car_dir = lambda t: np.array([1.0, 0.0])
    else:
        ang = s / radius
        center = radius * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
        normal = np.stack([-np.sin(ang), np.cos(ang)], axis=1)
        car_pos = lambda t: radius * np.array(
            [np.sin(t * 2.0 / radius), 1 - np.cos(t * 2.0 / radius)]
        )
        car_dir = lambda t: np.array(
            [np.cos(t * 2.0 / radius), np.sin(t * 2.0 / radius)]
        )
    left = center + normal * width / 2
    right = center - normal * width / 2
    frames = []
    for t in range(n_frames):
        cones = [np.zeros((0, 2)) for _ in range(5)]
        cones[ConeTypes.LEFT] = left
        cones[ConeTypes.RIGHT] = right
        frames.append((cones, car_pos(t), car_dir(t)))
    return frames


@pytest.mark.parametrize("curv", [0.0, 0.6, -0.8])
def test_trackdrive_pipeline_parity(curv):
    ref_planner = RefPathPlanner(RefMissionTypes.trackdrive)
    our_planner = PathPlanner(MissionTypes.trackdrive)

    for cones, pos, direction in corridor_frames(n_frames=4, curv=curv):
        ref_out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        dev = path_parity_deviation(ref_out, our_out)
        assert dev < 0.05, f"frame deviation {dev:.3f} m"


def test_intermediate_results_parity():
    ref_planner = RefPathPlanner(RefMissionTypes.trackdrive)
    our_planner = PathPlanner(MissionTypes.trackdrive)
    cones, pos, direction = corridor_frames(n_frames=1, curv=0.5)[0]

    ref_out = ref_planner.calculate_path_in_global_frame(
        [c.copy() for c in cones], pos.copy(), direction.copy(),
        return_intermediate_results=True,
    )
    our_out = our_planner.calculate_path_in_global_frame(
        cones, pos, direction, return_intermediate_results=True
    )
    (_, ref_sl, ref_sr, ref_lv, ref_rv, ref_l2r, ref_r2l) = ref_out
    (_, our_sl, our_sr, our_lv, our_rv, our_l2r, our_r2l) = our_out

    np.testing.assert_allclose(our_sl, ref_sl, atol=1e-3)
    np.testing.assert_allclose(our_sr, ref_sr, atol=1e-3)
    np.testing.assert_allclose(our_lv, ref_lv, atol=1e-3)
    np.testing.assert_allclose(our_rv, ref_rv, atol=1e-3)
    np.testing.assert_array_equal(our_l2r, ref_l2r)
    np.testing.assert_array_equal(our_r2l, ref_r2l)


@pytest.mark.skipif(not SKIDPAD_JSON.exists(), reason="skidpad replay log missing")
def test_skidpad_replay_parity():
    """Replay the recorded skidpad session through both planners."""
    data = json.loads(SKIDPAD_JSON.read_text())
    ref_planner = RefPathPlanner(RefMissionTypes.skidpad)
    our_planner = PathPlanner(MissionTypes.skidpad)

    deviations = []
    n_checked = 0
    for i, frame in enumerate(data[:120]):
        pos = np.array(frame["car_position"])
        direction = np.array(frame["car_direction"])
        cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
        ref_out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        if ref_planner.relocalization_info is not None:
            n_checked += 1
            deviations.append(path_parity_deviation(ref_out, our_out))

    assert our_planner.relocalization_info is not None, "we never relocalized"
    assert n_checked > 0, "reference never relocalized"
    deviations = np.array(deviations)
    # centimeter-grade agreement: the SE(2) estimate matches the reference to
    # ~1 cm (identical accepted circle trios incl. the RandomState(42) noise
    # stream, exact DBSCAN-equivalent clustering, measured-lobe path table)
    # and the FITPACK fewest-knots ladder reproduces the refit's corner
    # cutting; the residual few-cm tail is the known path table's ~1 cm wiggle
    # that the reference hardcodes and this repo regenerates
    assert np.median(deviations) < 0.05, f"median deviation {np.median(deviations):.3f}"
    assert deviations.max() < 0.2, f"max deviation {deviations.max():.3f}"
