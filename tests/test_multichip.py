"""Multi-chip sharding tests on the simulated 8-device CPU mesh."""

import numpy as np

import jax

from ft_fsd_path_planning_tpu.parallel import batch as pbatch
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_equals_single_device():
    """Sharded-vs-single equivalence at the FLAGSHIP config (default shape
    budget), not a toy one — the point is shape coverage of the sharded
    program (round-4 verdict: a VMEM/layout issue at production shapes
    would otherwise only surface on a real slice)."""
    from ft_fsd_path_planning_tpu.config import default_config
    from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

    cfg = default_config(MissionTypes.trackdrive)
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
    # 20 m trim boundary by one 0.165 m sample and shift the theta grid;
    # compare the curves laterally over the common span — robust to the
    # razor edge AND 35x tighter than any pointwise bound that must absorb it
    from tests.test_pathing import path_parity_deviation

    single = np.asarray(outs_single.path)
    sharded = np.asarray(outs_sharded.path)
    for i in range(b):
        dev = path_parity_deviation(single[i], sharded[i])
        assert dev < 0.01, f"frame {i}: lateral deviation {dev:.4f} m"
    assert float(metrics.n_frames) == b
    assert 0.0 <= float(metrics.solve_success_rate) <= 1.0
    assert float(metrics.relocalized_rate) == 0.0  # trackdrive has no relocalizer


def test_replay_scan_matches_stepwise():
    import __graft_entry__ as ge

    cfg = ge._tiny_config()
    from ft_fsd_path_planning_tpu.models.facade import _jitted_step
    from ft_fsd_path_planning_tpu.models.planner import make_initial_state

    t = 3
    frames_b = make_frame_batch(cfg, t, seed=5)

    state = make_initial_state(cfg)
    # stepwise (jitted: eager tracing would replay the whole pipeline op by op)
    step = _jitted_step(cfg)
    s = state
    paths = []
    for i in range(t):
        frame = jax.tree.map(lambda x: x[i], frames_b)
        out, s = step(s, frame)
        paths.append(np.asarray(out.path))

    final_state, scan_paths = jax.jit(
        lambda s0, f: pbatch.replay_scan(cfg, s0, f)
    )(state, frames_b)
    # scan-wrapped and plain compilations of the same step reassociate float
    # ops differently, which can flip the 20 m trim boundary by one 0.165 m
    # tail sample (theta grid shifts); compare laterally over the common
    # span like the sharded-equivalence test above
    from tests.test_pathing import path_parity_deviation

    scan_paths = np.asarray(scan_paths)
    for i in range(t):
        dev = path_parity_deviation(scan_paths[i], paths[i])
        assert dev < 0.01, f"t={i}: lateral deviation {dev:.4f} m"
