"""Cone-matching stage parity vs the reference functional matching."""

import numpy as np
import pytest

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import matching
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes
from tests.reference_oracle import load_reference

ref = load_reference()
from fsd_path_planning.cone_matching.functional_cone_matching import (  # noqa: E402
    calculate_virtual_cones_for_both_sides,
)
from fsd_path_planning.cone_matching.match_directions import (  # noqa: E402
    calculate_match_search_direction,
)

CFG = default_config(MissionTypes.trackdrive)
S = CFG.shapes.side_len


def pad(cones):
    out = np.zeros((S, 2), np.float32)
    out[: len(cones)] = cones
    mask = np.zeros(S, bool)
    mask[: len(cones)] = True
    return jnp.asarray(out), jnp.asarray(mask)


def run_both(left, right, pos=(0.0, 0.0), direction=(1.0, 0.0)):
    pos = np.asarray(pos, float)
    direction = np.asarray(direction, float)
    ref_left, ref_right = calculate_virtual_cones_for_both_sides(
        left.astype(float),
        right.astype(float),
        pos,
        direction,
        CFG.matching.min_track_width,
        CFG.matching.major_radius,
        CFG.matching.minor_radius,
        CFG.matching.max_search_angle,
        matches_should_be_monotonic=False,
    )

    lp, lm = pad(left)
    rp, rm = pad(right)
    out = matching.run_cone_matching(
        CFG,
        matching.MatchingInput(
            left_cones=lp,
            left_mask=lm,
            right_cones=rp,
            right_mask=rm,
            position=jnp.asarray(pos, jnp.float32),
            direction=jnp.asarray(direction, jnp.float32),
        ),
    )
    return ref_left, ref_right, out


def unpack_side(cones, mask, virt, matches):
    n = int(np.sum(np.asarray(mask)))
    return (
        np.asarray(cones)[:n],
        np.asarray(virt)[:n],
        np.asarray(matches)[:n],
    )


def assert_side_equal(ref_side, our_cones, our_virt, our_matches, atol=1e-3):
    ref_cones, ref_virt, ref_matches = ref_side
    assert len(ref_cones) == len(our_cones), (
        f"cone count {len(our_cones)} != ref {len(ref_cones)}\n{ref_cones}\n{our_cones}"
    )
    np.testing.assert_allclose(our_cones, ref_cones, atol=atol)
    np.testing.assert_array_equal(our_virt, ref_virt)
    np.testing.assert_array_equal(our_matches, ref_matches)


def corridor(n=8, width=3.0, spacing=3.0, curv=0.0):
    s = np.arange(n) * spacing
    if abs(curv) < 1e-9:
        center = np.stack([s, np.zeros(n)], axis=1)
        normal = np.tile([[0.0, 1.0]], (n, 1))
    else:
        radius = 30.0 / curv
        ang = s / radius
        center = radius * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
        normal = np.stack([-np.sin(ang), np.cos(ang)], axis=1)
    left = center + normal * width / 2
    right = center - normal * width / 2
    return left, right


def test_search_directions_match_reference():
    left, _ = corridor(n=7, curv=0.8)
    dirs_ref = calculate_match_search_direction(left.astype(float), ConeTypes.LEFT)
    lp, lm = pad(left)
    dirs = np.asarray(matching.match_search_directions(lp, lm, ConeTypes.LEFT))[:7]
    np.testing.assert_allclose(dirs, dirs_ref, atol=1e-4)


@pytest.mark.parametrize("curv", [0.0, 0.7, -0.9])
def test_full_corridor(curv):
    left, right = corridor(n=8, curv=curv)
    ref_left, ref_right, out = run_both(left, right)
    assert_side_equal(
        ref_left, *unpack_side(out.left_cones, out.left_mask, out.left_virtual_mask, out.left_to_right)
    )
    assert_side_equal(
        ref_right, *unpack_side(out.right_cones, out.right_mask, out.right_virtual_mask, out.right_to_left)
    )


def test_missing_cones_one_side():
    left, right = corridor(n=8)
    right = np.delete(right, [3, 4], axis=0)  # two missing right cones
    ref_left, ref_right, out = run_both(left, right)
    assert_side_equal(
        ref_left, *unpack_side(out.left_cones, out.left_mask, out.left_virtual_mask, out.left_to_right)
    )
    assert_side_equal(
        ref_right, *unpack_side(out.right_cones, out.right_mask, out.right_virtual_mask, out.right_to_left)
    )


def test_one_side_empty():
    left, right = corridor(n=6)
    right = np.zeros((0, 2))
    ref_left, ref_right, out = run_both(left, right)
    assert_side_equal(
        ref_left, *unpack_side(out.left_cones, out.left_mask, out.left_virtual_mask, out.left_to_right)
    )
    assert_side_equal(
        ref_right, *unpack_side(out.right_cones, out.right_mask, out.right_virtual_mask, out.right_to_left)
    )


def test_unbalanced_sides_discard():
    left, right = corridor(n=9)
    right = right[:3]  # ratio 3 > 2 -> right side discarded
    ref_left, ref_right, out = run_both(left, right)
    assert_side_equal(
        ref_left, *unpack_side(out.left_cones, out.left_mask, out.left_virtual_mask, out.left_to_right)
    )
    assert_side_equal(
        ref_right, *unpack_side(out.right_cones, out.right_mask, out.right_virtual_mask, out.right_to_left)
    )


def test_both_sides_tiny():
    left = np.array([[0.0, 1.5]])
    right = np.array([[0.0, -1.5]])
    _, _, out = run_both(left, right)
    assert int(np.sum(np.asarray(out.left_mask))) == 0
    assert int(np.sum(np.asarray(out.right_mask))) == 0
