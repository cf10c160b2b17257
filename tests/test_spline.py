"""Spline fit parity vs scipy's FITPACK (the reference's spline engine)."""

import numpy as np
import pytest
from scipy.interpolate import splev, splprep

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops import spline as sp


def fitpack_predict(trace: np.ndarray, smoothing: float, u_eval: np.ndarray) -> np.ndarray:
    """What the reference does in SplineFitterFactory.fit + predict."""
    k = int(np.clip(len(trace) - 1, 1, 3))
    d = np.linalg.norm(np.diff(trace, axis=0), axis=1)
    u_fit = np.concatenate([[0], np.cumsum(d)])
    tck, _ = splprep(trace.T, s=smoothing, k=k, u=u_fit)
    return np.array(splev(u_eval, tck)).T


def run_case(trace: np.ndarray, smoothing: float, tol: float) -> float:
    p = 64 if len(trace) <= 64 else 256
    pts = np.zeros((p, 2), np.float32)
    pts[: len(trace)] = trace
    mask = np.zeros(p, bool)
    mask[: len(trace)] = True

    fit = sp.fit_spline(jnp.asarray(pts), jnp.asarray(mask), smoothing)
    assert bool(fit.ok)
    u_max = float(fit.u_max)
    u_eval = np.arange(0, u_max, 0.1)
    ours = np.asarray(sp.eval_spline(fit, jnp.asarray(u_eval, jnp.float32)))
    ref = fitpack_predict(trace, smoothing, u_eval)
    err = np.linalg.norm(ours - ref, axis=1)
    assert err.max() < tol, f"max deviation {err.max():.4f} m > {tol}"
    return err.max()


def test_straight_line():
    trace = np.stack([np.linspace(0, 20, 15), np.zeros(15)], axis=1)
    run_case(trace, 0.2, 0.02)


def test_gentle_arc():
    ang = np.linspace(-0.4, 0.4, 18)
    trace = 25 * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
    run_case(trace, 0.2, 0.05)


def test_corner_90deg():
    ang = np.linspace(0, np.pi / 2, 14)
    trace = 10 * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
    run_case(trace, 0.2, 0.05)


def test_hairpin():
    ang = np.linspace(0, np.pi, 20)
    trace = 5 * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
    # extend with straights on both ends
    pre = np.stack([np.zeros(5), np.linspace(-6, -1, 5)], axis=1)
    post = trace[-1] + np.stack([np.zeros(5), np.linspace(-1, -6, 5)], axis=1)
    full = np.concatenate([pre, trace, post])
    run_case(full, 0.2, 0.10)


def test_noisy_centerline_low_smoothing():
    rng = np.random.default_rng(3)
    ang = np.linspace(0, 1.2, 25)
    trace = 15 * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
    trace += rng.normal(0, 0.02, trace.shape)
    run_case(trace, 0.01, 0.05)


def test_dense_refit_parity():
    # the refit stage input: an already-dense smooth path at 0.1 m spacing
    ang = np.linspace(0, 1.0, 220)
    trace = 22 * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
    run_case(trace, 0.2, 0.03)


def test_two_points_linear():
    trace = np.array([[0.0, 0.0], [3.0, 4.0]])
    p = 64
    pts = np.zeros((p, 2), np.float32)
    pts[:2] = trace
    mask = np.zeros(p, bool)
    mask[:2] = True
    fit = sp.fit_spline(jnp.asarray(pts), jnp.asarray(mask), 0.2)
    mid = np.asarray(sp.eval_spline(fit, jnp.asarray([2.5], jnp.float32)))[0]
    np.testing.assert_allclose(mid, [1.5, 2.0], atol=0.05)


def test_duplicate_points_flagged():
    pts = np.zeros((8, 2), np.float32)
    pts[:4] = [[0, 0], [1, 0], [1, 0], [2, 0]]
    mask = np.zeros(8, bool)
    mask[:4] = True
    fit = sp.fit_spline(jnp.asarray(pts), jnp.asarray(mask), 0.2)
    assert not bool(fit.ok)


def test_eval_every_grid_matches_reference_grid():
    trace = np.stack([np.linspace(0, 10, 12), np.zeros(12)], axis=1)
    pts = np.zeros((32, 2), np.float32)
    pts[:12] = trace
    mask = np.zeros(32, bool)
    mask[:12] = True
    fit = sp.fit_spline(jnp.asarray(pts), jnp.asarray(mask), 0.2)
    vals, u, valid = sp.eval_spline_every(fit, 0.1, 128)
    n_valid = int(np.sum(np.asarray(valid)))
    ref_grid = np.arange(0, float(fit.u_max), 0.1)
    assert n_valid == len(ref_grid)
    np.testing.assert_allclose(np.asarray(u[:n_valid]), ref_grid, atol=1e-4)
