"""Beam-search sorter parity vs the reference exhaustive DFS trace sorter."""

import numpy as np
import pytest

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import sorting
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes
from tests.reference_oracle import load_reference

ref = load_reference()
from fsd_path_planning.sorting_cones.trace_sorter.core_trace_sorter import (  # noqa: E402
    TraceSorter,
    flatten_cones_by_type_array,
)

CFG = default_config(MissionTypes.trackdrive)
N = CFG.shapes.n_cones


def make_ref_sorter() -> TraceSorter:
    s = CFG.sorting
    return TraceSorter(
        max_n_neighbors=s.max_n_neighbors,
        max_dist=s.max_dist,
        max_dist_to_first=s.max_dist_to_first,
        max_length=s.max_length,
        threshold_directional_angle=s.threshold_directional_angle,
        threshold_absolute_angle=s.threshold_absolute_angle,
    )


def cones_by_type(left=None, right=None, unknown=None):
    lists = [np.zeros((0, 2)) for _ in range(5)]
    if left is not None:
        lists[ConeTypes.LEFT] = np.asarray(left, float)
    if right is not None:
        lists[ConeTypes.RIGHT] = np.asarray(right, float)
    if unknown is not None:
        lists[ConeTypes.UNKNOWN] = np.asarray(unknown, float)
    return lists


def run_both(lists, pos, direction):
    ref_sorter = make_ref_sorter()
    ref_left, ref_right = ref_sorter.sort_left_right(
        [c.copy() for c in lists], pos.astype(float), direction.astype(float)
    )

    flat = flatten_cones_by_type_array(lists)
    pts = np.zeros((N, 3), np.float32)
    pts[: len(flat)] = flat
    pts[len(flat):, 2] = -1
    mask = np.zeros(N, bool)
    mask[: len(flat)] = True

    out = sorting.run_cone_sorting(
        CFG,
        jnp.asarray(pts),
        jnp.asarray(mask),
        jnp.asarray(pos, jnp.float32),
        jnp.asarray(direction, jnp.float32),
    )
    n_l = int(np.sum(np.asarray(out.left_mask)))
    n_r = int(np.sum(np.asarray(out.right_mask)))
    our_left = np.asarray(out.left_cones)[:n_l]
    our_right = np.asarray(out.right_cones)[:n_r]
    return (ref_left, ref_right), (our_left, our_right)


def assert_sides_equal(ref_side, our_side, name):
    assert len(ref_side) == len(our_side), (
        f"{name}: count {len(our_side)} != ref {len(ref_side)}\nref:\n{ref_side}\nours:\n{our_side}"
    )
    if len(ref_side):
        np.testing.assert_allclose(our_side, ref_side, atol=1e-3, err_msg=name)


def corridor(n=8, width=3.0, spacing=3.5, curv=0.0, start=(0.0, 0.0)):
    s = np.arange(n) * spacing
    if abs(curv) < 1e-9:
        center = np.stack([s, np.zeros(n)], axis=1)
        normal = np.tile([[0.0, 1.0]], (n, 1))
    else:
        radius = 30.0 / curv
        ang = s / radius
        center = radius * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
        normal = np.stack([-np.sin(ang), np.cos(ang)], axis=1)
    center = center + np.asarray(start)
    left = center + normal * width / 2
    right = center - normal * width / 2
    return left, right


@pytest.mark.parametrize("curv", [0.0, 0.6, -0.6, 1.2])
def test_colored_corridor(curv):
    left, right = corridor(n=9, curv=curv, start=(1.5, 0.0))
    lists = cones_by_type(left=left, right=right)
    pos = np.array([0.0, 0.0])
    direction = np.array([1.0, 0.0])
    (rl, rr), (ol, orr) = run_both(lists, pos, direction)
    assert_sides_equal(rl, ol, "left")
    assert_sides_equal(rr, orr, "right")


def test_colorless_corridor():
    left, right = corridor(n=8, start=(1.5, 0.0))
    lists = cones_by_type(unknown=np.concatenate([left, right]))
    pos = np.array([0.0, 0.0])
    direction = np.array([1.0, 0.0])
    (rl, rr), (ol, orr) = run_both(lists, pos, direction)
    assert_sides_equal(rl, ol, "left")
    assert_sides_equal(rr, orr, "right")


def test_mixed_color_corridor():
    left, right = corridor(n=9, curv=0.5, start=(1.5, 0.0))
    # strip color from every third cone
    unknown = np.concatenate([left[::3], right[::3]])
    left_colored = np.delete(left, np.arange(0, len(left), 3), axis=0)
    right_colored = np.delete(right, np.arange(0, len(right), 3), axis=0)
    lists = cones_by_type(left=left_colored, right=right_colored, unknown=unknown)
    pos = np.array([0.0, 0.0])
    direction = np.array([1.0, 0.0])
    (rl, rr), (ol, orr) = run_both(lists, pos, direction)
    assert_sides_equal(rl, ol, "left")
    assert_sides_equal(rr, orr, "right")


def test_too_few_cones():
    lists = cones_by_type(left=np.array([[2.0, 1.5]]), right=np.array([[2.0, -1.5]]))
    pos = np.array([0.0, 0.0])
    direction = np.array([1.0, 0.0])
    (rl, rr), (ol, orr) = run_both(lists, pos, direction)
    assert_sides_equal(rl, ol, "left")
    assert_sides_equal(rr, orr, "right")


def test_distractor_cones_behind():
    left, right = corridor(n=8, start=(1.5, 0.0))
    # distractors behind the car / far off-track
    unknown = np.array([[-8.0, 2.0], [-9.0, -2.0], [5.0, 15.0]])
    lists = cones_by_type(left=left, right=right, unknown=unknown)
    pos = np.array([0.0, 0.0])
    direction = np.array([1.0, 0.0])
    (rl, rr), (ol, orr) = run_both(lists, pos, direction)
    assert_sides_equal(rl, ol, "left")
    assert_sides_equal(rr, orr, "right")
