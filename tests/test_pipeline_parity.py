"""End-to-end full-pipeline parity vs the reference PathPlanner."""

import functools
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


@functools.lru_cache(maxsize=1)
def _ref_skidpad_replay():
    """Replay the full recorded session through the reference planner once;
    both parity tests below compare against these outputs."""
    data = json.loads(SKIDPAD_JSON.read_text())
    ref_planner = RefPathPlanner(RefMissionTypes.skidpad)
    outs = []
    for frame in data:
        pos = np.array(frame["car_position"])
        direction = np.array(frame["car_direction"])
        cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
        out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        outs.append((out, ref_planner.relocalization_info is not None))
    return data, outs


def _our_skidpad_replay(data):
    our_planner = PathPlanner(MissionTypes.skidpad)
    outs = []
    for frame in data:
        pos = np.array(frame["car_position"])
        direction = np.array(frame["car_direction"])
        cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
        outs.append(our_planner.calculate_path_in_global_frame(cones, pos, direction))
    assert our_planner.relocalization_info is not None, "we never relocalized"
    return outs


@pytest.mark.slow
@pytest.mark.skipif(not SKIDPAD_JSON.exists(), reason="skidpad replay log missing")
def test_skidpad_replay_parity():
    """Full 341-frame recorded-session replay (both loop transitions and the
    exit straight included) against the reference, with this repo's
    regenerated path table.

    The pipeline itself is FITPACK-exact (see test_fitpack.py and the
    reference-table variant below); the residual here is the known-path
    *data* difference: the reference hardcodes a recorded drive whose four
    laps are four different near-circles (lap-to-lap lateral deviation up to
    ~6.5 cm, per-lap circle-fit residual up to ~6 cm), while this repo
    regenerates the table from 16 surveyed constants
    (assets/known_paths.py). That bounds the achievable parity at a few cm.
    """
    data, ref_outs = _ref_skidpad_replay()
    our_outs = _our_skidpad_replay(data)
    deviations = np.array(
        [
            path_parity_deviation(ref_out, our_out)
            for (ref_out, relocalized), our_out in zip(ref_outs, our_outs)
            if relocalized
        ]
    )
    assert len(deviations) > 300, "reference relocalized late"
    assert np.median(deviations) < 0.03, f"median {np.median(deviations):.3f}"
    assert np.percentile(deviations, 90) < 0.06, (
        f"p90 {np.percentile(deviations, 90):.3f}"
    )
    assert deviations.max() < 0.3, f"max {deviations.max():.3f}"


@pytest.mark.slow
@pytest.mark.skipif(not SKIDPAD_JSON.exists(), reason="skidpad replay log missing")
def test_skidpad_replay_parity_reference_table():
    """Same full replay with the reference's own hardcoded path table
    injected — isolates the pipeline from the table data: the planner must
    be centimeter-exact on EVERY frame, no exemptions. (Round 4 allowed 5
    frames over 5 cm from windowed-tracker argmin flips; those were traced
    to the f32 relocalization transform differing from the reference's f64
    one by ~0.7 mm — more than the 2.5e-5 m knife-edge gaps where the
    multi-lap path overlaps itself — and closed by the facade's f64
    transform refinement, facade.PathPlanner._refine_reloc_f64.)"""
    from fsd_path_planning.relocalization.skidpad.skidpad_path_data import (
        BASE_SKIDPAD_PATH as REF_TABLE,
    )

    import ft_fsd_path_planning_tpu.assets.known_paths as kp
    import ft_fsd_path_planning_tpu.models.planner as planner_mod
    import ft_fsd_path_planning_tpu.models.relocalization as reloc_mod
    from ft_fsd_path_planning_tpu.models import facade as facade_mod

    saved = kp.BASE_SKIDPAD_PATH
    data, ref_outs = _ref_skidpad_replay()
    try:
        kp.BASE_SKIDPAD_PATH = REF_TABLE
        planner_mod.BASE_SKIDPAD_PATH = REF_TABLE
        reloc_mod.BASE_SKIDPAD_PATH = REF_TABLE
        # the table is baked into the traced programs and the cached
        # reference centers — drop every cache that captured it
        reloc_mod._reference_centers.cache_clear()
        planner_mod._initial_state_jit.cache_clear()
        facade_mod._jitted_step.cache_clear()
        facade_mod._jitted_refine.cache_clear()

        our_outs = _our_skidpad_replay(data)
    finally:
        kp.BASE_SKIDPAD_PATH = saved
        planner_mod.BASE_SKIDPAD_PATH = saved
        reloc_mod.BASE_SKIDPAD_PATH = saved
        reloc_mod._reference_centers.cache_clear()
        planner_mod._initial_state_jit.cache_clear()
        facade_mod._jitted_step.cache_clear()
        facade_mod._jitted_refine.cache_clear()

    deviations = np.array(
        [
            path_parity_deviation(ref_out, our_out)
            for (ref_out, relocalized), our_out in zip(ref_outs, our_outs)
            if relocalized
        ]
    )
    assert np.median(deviations) < 0.005, f"median {np.median(deviations):.4f}"
    assert np.percentile(deviations, 95) < 0.01, (
        f"p95 {np.percentile(deviations, 95):.3f}"
    )
    assert deviations.max() < 0.05, f"max {deviations.max():.3f}"
