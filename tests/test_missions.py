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
    """Path parity on the acceleration/EBS missions, to the 5 cm bar.

    The reference's relocalizer draws its RANSAC 3-subsets from the UNSEEDED
    global NumPy RNG (acceleration_relocalization.py:33 `np.random.choice`),
    so its output is a nondeterministic FAMILY: across pinned seeds its yaw
    estimate spans ~2.7 mrad and its own paths deviate up to ~6.3 cm
    run-to-run. The rigorous parity statement is therefore against the
    family, not one member: replay the reference N=5 times under different
    pinned global seeds and assert, per frame, that our path sits within
    5 cm of the NEAREST member, and that our rotation estimate lies inside
    the family's range. (Measured: nearest-member deviation <= 9 mm — our
    distinct-triple static RANSAC lands on the same discrete optima the
    reference's sampler does.) Translation is the recorded origin pose,
    deterministic on both sides."""
    frames = accel_frames()
    members = []
    for seed in (7, 11, 23, 51, 101):
        np.random.seed(seed)  # pin the reference RANSAC's global-RNG stream
        ref_planner = ref_pkg.PathPlanner(getattr(ref_pkg.MissionTypes, mission))
        outs = []
        for cones, pos, direction in frames:
            outs.append(
                ref_planner.calculate_path_in_global_frame(
                    [c.copy() for c in cones], pos.copy(), direction.copy()
                )
            )
        assert ref_planner.relocalization_info is not None
        members.append((outs, ref_planner.relocalization_info))

    our_planner = PathPlanner(getattr(MissionTypes, mission))
    our_outs = []
    for cones, pos, direction in frames:
        out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        assert out.shape == (40, 4)
        assert np.all(np.isfinite(out))
        our_outs.append(out)
    assert our_planner.relocalization_info is not None

    for fi in range(len(frames)):
        nearest = min(
            path_parity_deviation(m_outs[fi], our_outs[fi])
            for m_outs, _ in members
        )
        assert nearest < 0.05, f"frame {fi}: nearest-member dev {nearest:.3f}"

    our_info = our_planner.relocalization_info
    rotations = [info.rotation for _, info in members]
    assert min(rotations) - 1e-4 <= our_info.rotation <= max(rotations) + 1e-4, (
        f"rotation {our_info.rotation:.5f} outside family "
        f"[{min(rotations):.5f}, {max(rotations):.5f}]"
    )
    # translation is the recorded origin pose — deterministic on both sides
    np.testing.assert_allclose(
        our_info.translation, members[0][1].translation, atol=1e-5
    )


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
