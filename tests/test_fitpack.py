"""ops/fitpack.py vs the real FITPACK (scipy.interpolate.splprep) oracle.

The reference pipeline's spline behavior IS FITPACK (reference
utils/spline_fit.py:113-128); these tests pin our fixed-shape emulation to
the genuine article: identical knot vectors and <1 mm evaluation agreement on
every realistic input class, graceful degradation when the interior-knot
budget is exceeded (only reachable with noisy data + near-interpolation
smoothing, which the planner never produces).
"""

import numpy as np
import pytest
from scipy.interpolate import splev, splprep

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops import fitpack as fpk


def _oracle(pts, s):
    u = np.concatenate(
        [[0.0], np.cumsum(np.linalg.norm(np.diff(pts, axis=0), axis=1))]
    )
    k = min(len(pts) - 1, 3)
    tck, _ = splprep(pts.T, s=s, k=k, u=u)
    return tck, u


def _ours(pts, s, m):
    buf = np.zeros((m, 2), np.float32)
    buf[: len(pts)] = pts
    mask = np.arange(m) < len(pts)
    return fpk.fitpack_fit(jnp.asarray(buf), jnp.asarray(mask), s)


def _check(pts, s, m=None, knot_exact=True, tol=5e-3):
    m = m or max(len(pts), 8)
    tck, u = _oracle(pts, s)
    k = tck[2]
    nint_ref = len(tck[0]) - 2 * (k + 1)
    fit = _ours(pts, s, m)
    nint = int(fit.n_int)
    if knot_exact:
        assert nint == nint_ref, (nint, nint_ref)
        np.testing.assert_allclose(
            np.asarray(fit.t_int)[:nint], tck[0][4 : 4 + nint_ref], atol=2e-3
        )
    grid = np.arange(0, u[-1] * 1.05 + 0.2, 0.1)
    ref_v = np.array(splev(grid, tck)).T
    our_v = np.asarray(fpk.fitpack_eval(fit, jnp.asarray(grid, jnp.float32)))
    dev = np.linalg.norm(ref_v - our_v, axis=1)
    in_dom = grid <= u[-1]
    assert dev[in_dom].max() < tol, dev[in_dom].max()
    return dev[in_dom].max()


@pytest.mark.parametrize("s", [0.2, 0.01])
def test_circle_arc(s):
    """Skidpad-loop shaped input: the case that broke the round-3 rung-ladder
    approximation (FITPACK cuts the corner with 1-4 specific knots)."""
    rng = np.random.default_rng(0)
    for trial in range(3):
        ang = np.linspace(trial, trial + 2.7, 250)
        pts = 9.125 * np.stack([np.cos(ang), np.sin(ang)], 1)
        pts = pts + rng.normal(0, 1e-3, pts.shape)
        _check(pts, s, m=512)


@pytest.mark.parametrize("s", [0.2, 0.01])
def test_smooth_curves(s):
    rng = np.random.default_rng(1)
    for trial in range(3):
        x = np.arange(0, 20, 0.1)
        y = 6 * np.sin(x / 10 + trial) + 0.3 * np.cos(x / 3 + trial)
        _check(np.stack([x, y], 1), s, m=256)


@pytest.mark.slow
def test_noisy_centerlines():
    """Matches-centerline shaped input (s=0.2, sparse, noisy)."""
    rng = np.random.default_rng(2)
    for trial in range(5):
        n = int(rng.integers(8, 40))
        x = np.linspace(0, n * 1.5, n)
        y = 3 * np.sin(x / 12 + trial) + rng.normal(0, 0.1, n)
        _check(np.stack([x, y], 1), 0.2, m=64)


@pytest.mark.parametrize("n", [2, 3, 4, 5])
def test_tiny_inputs(n):
    """Degree reduction k = clip(m-1, 1, 3) (reference spline_fit.py:113)."""
    pts = np.stack([np.linspace(0, 5, n), np.linspace(0, 2, n) ** 1.5], 1)
    _check(pts, 0.2, m=16)


def test_collinear():
    pts = np.stack([np.linspace(0, 10, 30), np.zeros(30)], 1)
    _check(pts, 0.2, m=64)


def test_extrapolation_matches_splev():
    """The refit evaluates to 1.5x the MPC length — past the data on short
    paths. FITPACK extrapolates the end polynomial piece (ext=0)."""
    ang = np.linspace(0.3, 2.0, 120)
    pts = 9.125 * np.stack([np.cos(ang), np.sin(ang)], 1)
    tck, u = _oracle(pts, 0.2)
    fit = _ours(pts, 0.2, 256)
    grid = np.linspace(u[-1], u[-1] + 3.0, 20)
    ref_v = np.array(splev(grid, tck)).T
    our_v = np.asarray(fpk.fitpack_eval(fit, jnp.asarray(grid, jnp.float32)))
    assert np.linalg.norm(ref_v - our_v, axis=1).max() < 5e-3


def test_budget_overflow_degrades_gracefully():
    """Noise + near-interpolation smoothing wants >MAX_INT knots; the fixed
    budget truncates but the fit must stay within ~the noise amplitude."""
    rng = np.random.default_rng(3)
    x = np.linspace(0, 30, 55)
    y = 4 * np.sin(x / 8) + rng.normal(0, 0.05, len(x))
    pts = np.stack([x, y], 1)
    tck, u = _oracle(pts, 0.01)
    assert len(tck[0]) - 8 > fpk.MAX_INT  # oracle indeed exceeds the budget
    dev = _check(pts, 0.01, m=128, knot_exact=False, tol=0.2)
    assert dev < 0.2


def test_duplicate_points_flagged_not_ok():
    pts = np.asarray([[0.0, 0.0], [1.0, 0.0], [1.0, 0.0], [2.0, 0.0], [3.0, 1.0]])
    buf = np.zeros((16, 2), np.float32)
    buf[: len(pts)] = pts
    mask = np.arange(16) < len(pts)
    fit = fpk.fitpack_fit(jnp.asarray(buf), jnp.asarray(mask), 0.2)
    assert not bool(fit.ok)
