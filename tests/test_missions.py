"""Mission-specific end-to-end tests: acceleration, EBS, global-path
trackdrive, colorless pipeline."""

import numpy as np
import pytest

from ft_fsd_path_planning_tpu import ConeTypes, MissionTypes, PathPlanner
from tests.reference_oracle import load_reference
from tests.test_pathing import path_parity_deviation

ref_pkg = load_reference()


def accel_frames(n_frames=6):
    """Straight corridor of cone rows like the acceleration track."""
    rng = np.random.default_rng(0)
    xs = np.arange(-5.0, 40.0, 4.0)
    left = np.stack([xs, np.full_like(xs, 1.6)], axis=1)
    right = np.stack([xs, np.full_like(xs, -1.6)], axis=1)
    left = left + rng.normal(0, 0.03, left.shape)
    right = right + rng.normal(0, 0.03, right.shape)
    frames = []
    for t in range(n_frames):
        cones = [np.zeros((0, 2)) for _ in range(5)]
        cones[ConeTypes.LEFT] = left
        cones[ConeTypes.RIGHT] = right
        frames.append((cones, np.array([t * 1.5, 0.0]), np.array([1.0, 0.0])))
    return frames


@pytest.mark.parametrize("mission", ["acceleration", "ebs_test"])
def test_acceleration_like_mission(mission):
    """Path parity on the acceleration/EBS missions.

    The reference's relocalizer draws its RANSAC 3-subsets from the UNSEEDED
    global NumPy RNG (acceleration_relocalization.py:32 `np.random.choice`),
    so its own yaw estimate varies ~2.3 mrad run-to-run and its own paths
    deviate up to ~6.3 cm between two invocations in the same process
    (measured over seeds {None,1..4}). Parity is therefore asserted to that
    envelope: exact translation (the origin pose, deterministic), rotation
    within 5 mrad, and path deviation within 8 cm (2.9 mrad of yaw over the
    ~25 m window). The pipeline downstream of the relocalizer is
    deterministic and FITPACK-exact (see test_fitpack.py / the skidpad
    reference-table replay, where parity is millimetric).

    The global-RNG draw also makes the reference's estimate depend on
    whatever ran before in the process (suite ordering!), so the oracle's
    RNG is pinned here — the bounds then measure OUR estimate against one
    fixed member of the reference's output family."""
    np.random.seed(7)  # pin the reference RANSAC's global-RNG stream
    ref_planner = ref_pkg.PathPlanner(getattr(ref_pkg.MissionTypes, mission))
    our_planner = PathPlanner(getattr(MissionTypes, mission))

    devs = []
    for cones, pos, direction in accel_frames():
        ref_out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        assert our_out.shape == (40, 4)
        assert np.all(np.isfinite(our_out))
        if ref_planner.relocalization_info is not None:
            devs.append(path_parity_deviation(ref_out, our_out))

    assert ref_planner.relocalization_info is not None
    assert our_planner.relocalization_info is not None
    assert len(devs) >= 5
    assert max(devs) < 0.08, f"max deviation {max(devs):.3f}"

    ref_info = ref_planner.relocalization_info
    our_info = our_planner.relocalization_info
    # translation is the recorded origin pose — bit-deterministic
    np.testing.assert_allclose(our_info.translation, ref_info.translation, atol=1e-5)
    # rotation inherits the reference RANSAC's run-to-run spread
    assert abs(our_info.rotation - ref_info.rotation) < 0.005


def test_trackdrive_with_global_path():
    """set_global_path drives the global-path centerline branch."""
    from tests.test_pipeline_parity import corridor_frames

    # closed-loop-ish circular global path
    ang = np.linspace(0, 2 * np.pi, 700, endpoint=False)
    radius = 30.0
    global_path = radius * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)

    ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.trackdrive)
    our_planner = PathPlanner(MissionTypes.trackdrive)
    ref_planner.set_global_path(global_path.copy())
    our_planner.set_global_path(global_path)

    for cones, pos, direction in corridor_frames(n_frames=3, curv=0.0):
        ref_out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        dev = path_parity_deviation(ref_out, our_out)
        assert dev < 0.1, f"deviation {dev:.3f} m"


def test_colorless_full_pipeline():
    from tests.test_pipeline_parity import corridor_frames

    ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.trackdrive)
    our_planner = PathPlanner(MissionTypes.trackdrive)

    for cones, pos, direction in corridor_frames(n_frames=3, curv=0.5):
        colorless = [np.zeros((0, 2)) for _ in range(5)]
        colorless[ConeTypes.UNKNOWN] = np.vstack(
            [cones[ConeTypes.LEFT], cones[ConeTypes.RIGHT]]
        )
        ref_out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in colorless], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(colorless, pos, direction)
        dev = path_parity_deviation(ref_out, our_out)
        assert dev < 0.08, f"deviation {dev:.3f} m"


def test_global_path_set_then_unset():
    """set_global_path flips the static specialization bit and retraces;
    clearing it must return to the plain sorting pipeline on the SAME
    planner (state shapes survive the config switch)."""
    from tests.test_pipeline_parity import corridor_frames

    ang = np.linspace(0, 2 * np.pi, 700, endpoint=False)
    gp = 30.0 * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)

    ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.trackdrive)
    our_planner = PathPlanner(MissionTypes.trackdrive)
    frames = corridor_frames(n_frames=4, curv=0.0)

    ref_planner.set_global_path(gp.copy())
    our_planner.set_global_path(gp)
    cones, pos, direction = frames[0]
    ref_out = ref_planner.calculate_path_in_global_frame(
        [c.copy() for c in cones], pos.copy(), direction.copy()
    )
    our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
    assert path_parity_deviation(ref_out, our_out) < 0.1

    ref_planner.set_global_path(None)
    our_planner.set_global_path(None)
    for cones, pos, direction in frames[1:]:
        ref_out = ref_planner.calculate_path_in_global_frame(
            [c.copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        dev = path_parity_deviation(ref_out, our_out)
        assert dev < 0.05, f"deviation {dev:.3f} after unset"
