"""Spline support ops: chord parameterization + banded SPD solves.

The spline *fitting* engine is tested against genuine FITPACK in
tests/test_fitpack.py; this file covers the shared plumbing in
ops/spline.py that both fitpack and the Pallas kernel tier build on.
"""

import numpy as np

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops import spline as sp


def test_chord_lengths_matches_reference_parameterization():
    rng = np.random.default_rng(0)
    trace = np.cumsum(rng.normal(0.5, 0.2, (20, 2)), axis=0).astype(np.float32)
    pts = np.zeros((32, 2), np.float32)
    pts[:20] = trace
    mask = np.arange(32) < 20

    u, u_max, ok = sp.chord_lengths(jnp.asarray(pts), jnp.asarray(mask))
    d = np.linalg.norm(np.diff(trace, axis=0), axis=1)
    ref_u = np.concatenate([[0.0], np.cumsum(d)])
    np.testing.assert_allclose(np.asarray(u)[:20], ref_u, rtol=1e-5, atol=1e-5)
    assert abs(float(u_max) - ref_u[-1]) < 1e-4
    assert bool(ok)
    # padded slots repeat u_max
    assert np.all(np.asarray(u)[20:] == np.asarray(u)[19])


def test_chord_lengths_flags_duplicates_and_degenerates():
    pts = np.asarray(
        [[0.0, 0.0], [1.0, 0.0], [1.0, 0.0], [2.0, 0.0]], np.float32
    )
    buf = np.zeros((8, 2), np.float32)
    buf[:4] = pts
    mask = np.arange(8) < 4
    _, _, ok = sp.chord_lengths(jnp.asarray(buf), jnp.asarray(mask))
    assert not bool(ok)  # consecutive duplicate -> splprep ValueError case

    _, _, ok1 = sp.chord_lengths(jnp.asarray(buf), jnp.asarray(np.arange(8) < 1))
    assert not bool(ok1)  # single point


def test_solve_spd_banded_matches_dense():
    rng = np.random.default_rng(1)
    c = 28
    for trial in range(3):
        # random SPD matrix with half-bandwidth 4
        band = rng.normal(0, 1, (c, c))
        band[np.abs(np.subtract.outer(np.arange(c), np.arange(c))) > 4] = 0.0
        a = band @ band.T + 0.5 * np.eye(c)
        a[np.abs(np.subtract.outer(np.arange(c), np.arange(c))) > 4] = 0.0
        # re-symmetrize after the bandwidth clip, keep SPD via diagonal boost
        a = (a + a.T) / 2 + np.eye(c) * np.abs(a).sum(1).max()
        b = rng.normal(0, 1, (c, 2))

        x = np.asarray(
            sp._solve_spd_banded(
                jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
            )
        )
        ref = np.linalg.solve(a, b)
        np.testing.assert_allclose(x, ref, rtol=2e-3, atol=2e-3)


def test_solve_spd_banded_batched():
    rng = np.random.default_rng(2)
    c, g = 12, 5
    a = np.zeros((g, c, c))
    for i in range(g):
        m = rng.normal(0, 1, (c, c))
        m[np.abs(np.subtract.outer(np.arange(c), np.arange(c))) > 3] = 0.0
        a[i] = m @ m.T + np.eye(c) * 3.0
        a[i][np.abs(np.subtract.outer(np.arange(c), np.arange(c))) > 4] = 0.0
        a[i] = (a[i] + a[i].T) / 2 + np.eye(c) * np.abs(a[i]).sum(1).max()
    b = rng.normal(0, 1, (g, c, 2))
    import jax

    x = np.asarray(
        jax.vmap(sp._solve_spd_banded)(
            jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
        )
    )
    for i in range(g):
        np.testing.assert_allclose(x[i], np.linalg.solve(a[i], b[i]), rtol=2e-3, atol=2e-3)
