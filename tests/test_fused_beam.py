"""Fused Pallas beam-search kernel vs the XLA scan: exact equivalence.

Runs the kernel in interpret mode on the CPU test mesh over randomized
scenario batches and checks the sorted outputs match the XLA path's
bit-for-bit at the config level (same survivor sets, same winners).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import ft_fsd_path_planning_tpu.models.sorting as S
from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.ops.pallas import beam_search as bs
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes


@pytest.fixture
def fused_interpret(monkeypatch):
    monkeypatch.setattr(bs, "INTERPRET", True)
    monkeypatch.setattr(S, "_use_fused_beam", lambda: True)


def _run_sorting(cfg, frames):
    run = jax.jit(
        jax.vmap(
            lambda f: S.run_cone_sorting(cfg, f.cones, f.mask, f.position, f.direction)
        )
    )
    out = run(frames)
    return (
        np.asarray(out.left_cones), np.asarray(out.left_mask),
        np.asarray(out.right_cones), np.asarray(out.right_mask),
    )


def test_fused_matches_xla_scan(fused_interpret):
    cfg = default_config(MissionTypes.trackdrive)
    frames = make_frame_batch(cfg, 16, seed=11)

    fused = _run_sorting(cfg, frames)

    # XLA reference path in the same process
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(S, "_use_fused_beam", lambda: False)
        ref = _run_sorting(cfg, frames)

    for f, r, name in zip(fused, ref, ("lc", "lm", "rc", "rm")):
        np.testing.assert_allclose(f, r, atol=1e-5, err_msg=name)


def test_fused_atan2_matches_numpy():
    rng = np.random.default_rng(0)
    y = rng.normal(0, 3, (64, 128)).astype(np.float32)
    x = rng.normal(0, 3, (64, 128)).astype(np.float32)
    # include axis / degenerate cases
    y[0, :] = 0.0
    x[1, :] = 0.0
    y[2, :], x[2, :] = 0.0, 0.0
    got = np.asarray(bs._atan2(jnp.asarray(y), jnp.asarray(x)))
    want = np.arctan2(y, x)
    np.testing.assert_allclose(got, want, atol=2e-6)
