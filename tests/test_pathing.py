"""Path-calculation stage parity vs the reference CalculatePath."""

import numpy as np
import pytest

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import pathing
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes
from tests.reference_oracle import load_reference

ref = load_reference()
from fsd_path_planning.calculate_path.core_calculate_path import (  # noqa: E402
    CalculatePath,
    PathCalculationInput,
)

CFG = default_config(MissionTypes.trackdrive)
S = CFG.shapes.side_len


def make_ref_calculate_path() -> CalculatePath:
    return CalculatePath(
        smoothing=0.2,
        predict_every=0.1,
        maximal_distance_for_valid_path=5,
        max_deg=3,
        mpc_path_length=20,
        mpc_prediction_horizon=40,
    )


def pad_side(cones: np.ndarray):
    out = np.zeros((S, 2), np.float32)
    out[: len(cones)] = cones
    mask = np.zeros(S, bool)
    mask[: len(cones)] = True
    return out, mask


def pad_matches(matches: np.ndarray):
    out = np.full(S, -1, np.int32)
    out[: len(matches)] = matches
    return out


def run_both(left, right, l2r, r2l, pos, direction):
    ref_calc = make_ref_calculate_path()
    ref_calc.set_new_input(
        PathCalculationInput(
            left_cones=left.astype(float),
            right_cones=right.astype(float),
            left_to_right_matches=l2r.astype(int),
            right_to_left_matches=r2l.astype(int),
            position_global=pos.astype(float),
            direction_global=direction.astype(float),
            global_path=None,
        )
    )
    ref_path, _ = ref_calc.run_path_calculation()

    lp, lm = pad_side(left)
    rp, rm = pad_side(right)
    inp = pathing.PathInput(
        left_cones=jnp.asarray(lp),
        left_mask=jnp.asarray(lm),
        right_cones=jnp.asarray(rp),
        right_mask=jnp.asarray(rm),
        left_to_right=jnp.asarray(pad_matches(l2r)),
        right_to_left=jnp.asarray(pad_matches(r2l)),
        position=jnp.asarray(pos, jnp.float32),
        direction=jnp.asarray(direction, jnp.float32),
    )
    state = pathing.initial_path_state(CFG)
    gp = pathing.GlobalPathBuffer.empty(CFG.shapes.global_window)
    out = pathing.run_path_calculation(CFG, inp, gp, state)
    return ref_path, np.asarray(out.path)


def build_track(curv_angle: float, n: int = 10, width: float = 3.0, spacing: float = 3.0):
    """Cone corridor along an arc; returns left, right, matches both ways."""
    s = np.arange(n) * spacing
    if abs(curv_angle) < 1e-9:
        center = np.stack([s, np.zeros(n)], axis=1)
        normal = np.tile([[0.0, 1.0]], (n, 1))
    else:
        radius = 30.0 / curv_angle
        ang = s / radius
        center = radius * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
        normal = np.stack([-np.sin(ang), np.cos(ang)], axis=1)
    left = center + normal * width / 2
    right = center - normal * width / 2
    matches = np.arange(n)
    return left, right, matches, matches


def path_parity_deviation(ref_path: np.ndarray, our_path: np.ndarray) -> float:
    """Symmetric curve deviation over the common arc span.

    The 20 m trim boundary is a float razor edge: the final sample count can
    flip by one between float64 (reference) and float32 runs, adding/removing
    one 0.165 m *tail* sample without moving the curve. Compare laterally over
    the overlapping theta range instead.
    """
    span = min(ref_path[-1, 0], our_path[-1, 0]) + 1e-6
    ref_q = ref_path[ref_path[:, 0] <= span, 1:3]
    our_q = our_path[our_path[:, 0] <= span, 1:3]
    # query points clipped to the common span, target curves kept whole
    return max(
        curve_deviation(our_q, ref_path[:, 1:3]),
        curve_deviation(ref_q, our_path[:, 1:3]),
    )


def curve_deviation(pts_a: np.ndarray, pts_b: np.ndarray) -> float:
    """Max over points of A of the distance to the polyline B (densified).

    Row-by-row comparison is too strict: a one-sample difference in the
    (float-razor-edge) sample count shifts the index-truncation pattern of the
    40-point resampling without moving the actual curve.
    """
    t = np.linspace(0, 1, 40)
    dense_t = np.linspace(0, len(pts_b) - 1, 4000)
    bx = np.interp(dense_t, np.arange(len(pts_b)), pts_b[:, 0])
    by = np.interp(dense_t, np.arange(len(pts_b)), pts_b[:, 1])
    dense_b = np.stack([bx, by], axis=1)
    d = np.linalg.norm(pts_a[:, None] - dense_b[None], axis=2)
    return float(d.min(axis=1).max())


@pytest.mark.parametrize("curv", [0.0, 0.5, 1.0, -0.8])
def test_matched_corridor_parity(curv):
    left, right, l2r, r2l = build_track(curv, n=12)
    pos = np.array([0.0, 0.0])
    direction = np.array([1.0, 0.0])
    ref_path, our_path = run_both(left, right, l2r, r2l, pos, direction)

    # positions: the headline parity metric (<5 cm, curve-to-curve over the
    # common arc span — the 20 m trim boundary is an exact-float razor edge:
    # cum_dist hits 20.0 +- one ulp, so the final 0.1 m sample can flip
    # between float64 (reference) and float32 runs without moving the curve)
    dev = path_parity_deviation(ref_path, our_path)
    assert dev < 0.05, f"max centerline deviation {dev:.3f} m"
    # spline parameter: same arc-length scale
    np.testing.assert_allclose(our_path[:, 0], ref_path[:, 0], atol=0.7)
    # curvature vs reference curvature at matching arc positions
    # (reference emits NaN on exactly-collinear windows — skip those)
    finite = np.isfinite(ref_path[:, 3])
    if finite.sum() > 2:
        ref_k_at_ours = np.interp(
            our_path[:, 0], ref_path[finite, 0], ref_path[finite, 3]
        )
        np.testing.assert_allclose(our_path[:, 3], ref_k_at_ours, atol=0.02)


def test_no_matches_falls_back_to_previous_path():
    left = np.zeros((0, 2))
    right = np.zeros((0, 2))
    l2r = np.zeros(0, int)
    r2l = np.zeros(0, int)
    pos = np.array([0.0, 0.0])
    direction = np.array([1.0, 0.0])
    ref_path, our_path = run_both(left, right, l2r, r2l, pos, direction)
    # common-span curve metric: the trim/sample-count razor edges (see
    # test_matched_corridor_parity) shift the 40-point resampling pattern
    # without moving the curve
    dev = path_parity_deviation(ref_path, our_path)
    assert dev < 0.05, f"max deviation {dev:.3f} m"
    np.testing.assert_allclose(our_path[:, 0], ref_path[:, 0], atol=0.7)


def test_initial_path_state_matches_reference():
    ref_calc = make_ref_calculate_path()
    ref_initial = ref_calc.previous_paths[-1]
    ours = np.asarray(pathing.initial_path_state(CFG).prev_path)
    dev = np.linalg.norm(ref_initial[:, 1:3] - ours[:, 1:3], axis=1)
    assert dev.max() < 0.05, f"max deviation {dev.max():.3f} m"
    np.testing.assert_allclose(ours[:, 3], ref_initial[:, 3], atol=0.01)
