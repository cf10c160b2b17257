"""Multi-chip sharding tests on the simulated 8-device CPU mesh."""

import numpy as np

import jax

from ft_fsd_path_planning_tpu.parallel import batch as pbatch
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_equals_single_device():
    import __graft_entry__ as ge

    cfg = ge._tiny_config()
    b = 8
    states = pbatch.make_batch_state(cfg, b)
    frames = make_frame_batch(cfg, b, seed=3)

    outs_single, _ = jax.jit(
        lambda s, f: pbatch.batched_step(cfg, s, f)
    )(states, frames)

    mesh = pbatch.make_mesh(8)
    step = pbatch.sharded_batched_step(cfg, mesh)
    outs_sharded, _, metrics = step(
        pbatch.shard_batch(mesh, states), pbatch.shard_batch(mesh, frames)
    )

    # different XLA partitionings reassociate float ops, which can flip the
    # 20 m trim boundary by one 0.165 m sample on some batch elements and
    # shift the theta grid; require tight median agreement and sample-level
    # worst case
    diff = np.abs(np.asarray(outs_sharded.path) - np.asarray(outs_single.path))
    assert np.median(diff) < 1e-3, np.median(diff)
    assert diff.max() < 0.35, diff.max()
    assert float(metrics.n_frames) == b


def test_replay_scan_matches_stepwise():
    import __graft_entry__ as ge

    cfg = ge._tiny_config()
    from ft_fsd_path_planning_tpu.models.planner import make_initial_state, planner_step

    t = 3
    frames_b = make_frame_batch(cfg, t, seed=5)

    state = make_initial_state(cfg)
    # stepwise
    s = state
    paths = []
    for i in range(t):
        frame = jax.tree.map(lambda x: x[i], frames_b)
        out, s = planner_step(cfg, s, frame)
        paths.append(np.asarray(out.path))

    final_state, scan_paths = jax.jit(
        lambda s0, f: pbatch.replay_scan(cfg, s0, f)
    )(state, frames_b)
    np.testing.assert_allclose(np.asarray(scan_paths), np.stack(paths), atol=5e-3)
