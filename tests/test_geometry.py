"""Geometry kernel parity vs the reference NumPy/Numba implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops import geometry as geo
from tests.reference_oracle import load_reference

ref = load_reference()
from fsd_path_planning.utils import math_utils as ref_math  # noqa: E402

RNG = np.random.default_rng(0)


def test_rotate_matches_reference():
    pts = RNG.normal(size=(17, 2))
    for theta in [-2.1, 0.0, 0.7, 3.0]:
        got = np.asarray(geo.rotate(jnp.asarray(pts, jnp.float32), theta))
        want = ref_math.rotate(pts, theta)
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_vec_angle_between():
    a = RNG.normal(size=(50, 2))
    b = RNG.normal(size=(50, 2))
    got = np.asarray(geo.vec_angle_between(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    want = ref_math.vec_angle_between(a.copy(), b.copy())
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_angle_difference():
    a1 = RNG.uniform(-10, 10, size=200)
    a2 = RNG.uniform(-10, 10, size=200)
    got = np.asarray(geo.angle_difference(jnp.asarray(a1), jnp.asarray(a2)))
    want = ref_math.angle_difference(a1, a2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_cdist_sq():
    a = RNG.normal(size=(13, 2)) * 10
    b = RNG.normal(size=(9, 2)) * 10
    got = np.asarray(geo.cdist_sq(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)))
    want = ref_math.my_cdist_sq_euclidean(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_points_inside_ellipse():
    pts = RNG.normal(size=(100, 2)) * 8
    center = np.array([1.0, -2.0])
    direction = np.array([0.6, 0.8])
    got = np.asarray(
        geo.points_inside_ellipse(jnp.asarray(pts, jnp.float32), jnp.asarray(center, jnp.float32), jnp.asarray(direction, jnp.float32), 6.0, 3.0)
    )
    want = ref_math.points_inside_ellipse(pts, center, direction, 6.0, 3.0)
    # allow disagreement only for points within float32 noise of the boundary
    crit = ((ref_math.rotate(pts - center, -np.arctan2(0.8, 0.6))) ** 2 / np.array([36.0, 9.0])).sum(axis=1)
    boundary = np.abs(crit - 1.0) < 1e-4
    assert np.all((got == want) | boundary)


def test_circle_fit_matches_reference():
    for _ in range(20):
        c = RNG.normal(size=2) * 5
        r = RNG.uniform(2, 30)
        angles = np.sort(RNG.uniform(0, 1.5 * np.pi, size=12))
        pts = c + r * np.stack([np.cos(angles), np.sin(angles)], axis=1)
        pts = pts + RNG.normal(size=pts.shape) * 0.01
        got = np.asarray(geo.circle_fit(jnp.asarray(pts, jnp.float32)))
        want = ref_math.circle_fit(pts)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=5e-2)


def test_circle_fit_masked_equals_subset():
    c = np.array([3.0, -1.0])
    r = 9.125
    angles = np.linspace(0, 2.5, 16)
    pts = c + r * np.stack([np.cos(angles), np.sin(angles)], axis=1)
    pts_padded = np.concatenate([pts, np.full((4, 2), 1e3)], axis=0)
    mask = np.concatenate([np.ones(16, bool), np.zeros(4, bool)])
    got = np.asarray(geo.circle_fit(jnp.asarray(pts_padded, jnp.float32), jnp.asarray(mask)))
    want = np.asarray(geo.circle_fit(jnp.asarray(pts, jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_segments_intersect():
    from fsd_path_planning.sorting_cones.trace_sorter.line_segment_intersection import (
        lines_segments_intersect_indicator,
    )

    cases = RNG.normal(size=(300, 4, 2)) * 4
    got = np.asarray(
        geo.segments_intersect(
            jnp.asarray(cases[:, 0], jnp.float32),
            jnp.asarray(cases[:, 1], jnp.float32),
            jnp.asarray(cases[:, 2], jnp.float32),
            jnp.asarray(cases[:, 3], jnp.float32),
        )
    )
    want = np.array(
        [
            lines_segments_intersect_indicator(c[0], c[1], c[2], c[3])
            for c in cases
        ]
    )
    disagreements = int(np.sum(got != want))
    # near-degenerate cases may flip either way in float32; require < 1% drift
    assert disagreements <= 3, f"{disagreements} disagreements"


def test_masked_median():
    vals = RNG.normal(size=20)
    mask = RNG.uniform(size=20) > 0.4
    got = float(geo.masked_median(jnp.asarray(vals), jnp.asarray(mask)))
    want = float(np.median(vals[mask]))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_masked_median_empty_rows_stay_finite_under_jit():
    """Regression (round 2→3): for all-masked rows the two one-hot median
    picks both land on the f32-max fill value; XLA's algebraic simplifier
    turned `0.5*lo + 0.5*hi` back into `0.5*(lo+hi)` under jit, overflowing
    to inf and NaN-poisoning downstream one-hot contractions (this silently
    broke skidpad relocalization acceptance at exactly the freeze frame)."""
    vals = jnp.asarray(RNG.normal(size=(8, 16)), jnp.float32)
    mask = jnp.zeros((8, 16), bool).at[:4].set(True)  # rows 4..7 fully masked
    med = jax.jit(geo.masked_median)(vals, mask)
    assert np.all(np.isfinite(np.asarray(med))), np.asarray(med)
    # non-empty rows still match numpy
    want = np.median(np.asarray(vals)[:4], axis=1)
    np.testing.assert_allclose(np.asarray(med)[:4], want, atol=1e-6)
    # an inf row anywhere must not poison a one-hot contraction of the result
    from ft_fsd_path_planning_tpu.ops import gatherless as gl

    picked = jax.jit(lambda m: gl.take_vec(m, jnp.asarray([0, 1])))(med)
    assert np.all(np.isfinite(np.asarray(picked)))


def test_stable_compact():
    mask = np.array([False, True, False, True, True, False, True])
    idx, valid = geo.stable_compact(jnp.asarray(mask))
    x = np.arange(7) * 10
    gathered = np.asarray(x[np.asarray(idx)])[np.asarray(valid)]
    np.testing.assert_array_equal(gathered, [10, 30, 40, 60])


def test_trace_angles_between():
    trace = RNG.normal(size=(10, 2)) * 5
    got = np.asarray(geo.trace_angles_between(jnp.asarray(trace, jnp.float32)))
    want = ref_math.trace_angles_between(trace)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_polyline_self_intersections():
    import itertools

    import jax

    from ft_fsd_path_planning_tpu.ops import geometry as geo

    rng = np.random.default_rng(0)

    def brute(pts):
        segs = [(pts[i], pts[i + 1]) for i in range(len(pts) - 1)]
        n = 0
        for (i, (a0, a1)), (j, (b0, b1)) in itertools.combinations(
            enumerate(segs), 2
        ):
            if abs(i - j) <= 1:
                continue
            d1 = np.cross(b1 - b0, a0 - b0)
            d2 = np.cross(b1 - b0, a1 - b0)
            d3 = np.cross(a1 - a0, b0 - a0)
            d4 = np.cross(a1 - a0, b1 - a0)
            if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
                n += 1
        return n

    fn = jax.jit(geo.polyline_self_intersections)
    # a known figure-eight: exactly one crossing
    fig8 = np.array([[0.0, 0.0], [2.0, 2.0], [2.0, 0.0], [0.0, 2.0]], np.float32)
    assert int(fn(jnp.asarray(fig8), jnp.ones(4, bool))) == 1

    for _ in range(20):
        n = int(rng.integers(4, 10))
        pts = rng.normal(0, 3, (n, 2)).astype(np.float32)
        pad = np.zeros((12, 2), np.float32)
        pad[:n] = pts
        mask = np.arange(12) < n
        got = int(fn(jnp.asarray(pad), jnp.asarray(mask)))
        assert got == brute(pts.astype(np.float64)), (got, brute(pts))
