"""Pallas banded-Cholesky kernel vs dense solves (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops.pallas.banded_cholesky import (
    BW,
    HALF_BW,
    banded_cholesky_solve,
    dense_to_band,
)


def make_spd_banded(rng, c):
    """Random SPD matrix with half-bandwidth HALF_BW."""
    d = np.zeros((c, c))
    for off in range(HALF_BW + 1):
        v = rng.normal(size=c - off) * (0.3 if off else 1.0)
        d += np.diag(v, off)
    a = d @ d.T + np.eye(c) * 1e-2
    # d has bandwidth HALF_BW -> a has bandwidth <= 2*HALF_BW... re-truncate
    i, j = np.indices(a.shape)
    a[np.abs(i - j) > HALF_BW] = 0.0
    a += np.eye(c) * (np.abs(a).sum(axis=1).max())  # diagonal dominance -> SPD
    return a


def test_banded_solve_matches_dense():
    rng = np.random.default_rng(0)
    c, b, r = 51, 7, 2
    mats = np.stack([make_spd_banded(rng, c) for _ in range(b)])
    rhs = rng.normal(size=(b, c, r))

    band = dense_to_band(jnp.asarray(mats, jnp.float32))
    assert band.shape == (b, c, BW)
    x = banded_cholesky_solve(
        band, jnp.asarray(rhs, jnp.float32), interpret=True
    )
    want = np.linalg.solve(mats, rhs)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-3)


def test_batch_padding():
    rng = np.random.default_rng(1)
    c, b = 20, 3  # b far below the 128-lane tile
    mats = np.stack([make_spd_banded(rng, c) for _ in range(b)])
    rhs = rng.normal(size=(b, c, 1))
    band = dense_to_band(jnp.asarray(mats, jnp.float32))
    x = banded_cholesky_solve(band, jnp.asarray(rhs, jnp.float32), interpret=True)
    want = np.linalg.solve(mats, rhs)
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=2e-3)
