"""Scenario fixture library: every curated scenario must produce a sane path
from both planners with bounded deviation."""

import numpy as np
import pytest

from ft_fsd_path_planning_tpu import MissionTypes, PathPlanner
from ft_fsd_path_planning_tpu.demo.scenarios import ALL_SCENARIOS
from tests.reference_oracle import load_reference
from tests.test_pathing import path_parity_deviation

ref_pkg = load_reference()


@pytest.mark.parametrize("name", sorted(ALL_SCENARIOS))
def test_scenario(name):
    cones, pos, direction = ALL_SCENARIOS[name]()

    ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.trackdrive)
    our_planner = PathPlanner(MissionTypes.trackdrive)

    ref_out = ref_planner.calculate_path_in_global_frame(
        [c.copy() for c in cones], pos.copy(), direction.copy()
    )
    our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)

    assert our_out.shape == (40, 4)
    assert np.all(np.isfinite(our_out))
    dev = path_parity_deviation(ref_out, our_out)
    # wrong_sort is a TOTAL sorting failure on both planners: the output is
    # the fallback chain folding the previous path back through the car, and
    # the spline refit of that ~150 degree fold amplifies the FITPACK-vs-
    # penalized smoothing difference; everything else holds the strict bound
    limit = 0.25 if name == "wrong_sort" else 0.08
    assert dev < limit, f"{name}: deviation {dev:.3f} m"


def test_interactive_viz_export():
    """The dependency-free interactive viewer's exporter produces a complete
    payload for every fixture (the streamlit-demo equivalence surface)."""
    from ft_fsd_path_planning_tpu.demo.export_viz import build_payload
    from ft_fsd_path_planning_tpu.demo.scenarios import ALL_SCENARIOS

    payload = build_payload(max_session_frames=2)
    assert set(payload["scenarios"]) == set(ALL_SCENARIOS)
    assert len(payload["session"]) == 2
    for frame in list(payload["scenarios"].values()) + payload["session"]:
        assert len(frame["path"]) == 40
        assert len(frame["curv"]) == 40
        assert {"left", "right", "unknown"} <= set(frame["cones"])
        for key in ("sorted_left", "sorted_right", "left_v", "right_v"):
            assert isinstance(frame[key], list)
