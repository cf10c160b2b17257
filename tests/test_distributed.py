"""Multi-host execution test: 2 processes x 4 virtual CPU devices.

Spawns two `tests.distributed_worker` processes that form a jax.distributed
cluster (Gloo collectives), solve a global 8-frame batch with per-process
local feeding, and compare the stitched result + psum'd metrics against the
same program run single-process on the 8-device test mesh (SURVEY.md §2.3
host-pipeline row; BASELINE.md ">=2 hosts" scaling requirement).
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.parallel.batch import (
    make_batch_state,
    shard_batch,
    sharded_batched_step,
)
from ft_fsd_path_planning_tpu.parallel.distributed import host_local_slice
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

GLOBAL_BATCH = 8


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]



def _run_workers(tmp_path) -> None:
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tests.distributed_worker",
             str(pid), "2", str(port), str(tmp_path)],
            cwd=Path(__file__).resolve().parent.parent,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"


def test_two_process_distributed(tmp_path):
    # two fresh processes form a Gloo cluster and compile their own
    # executables; under heavy machine load the handshake/compile can time
    # out — one retry keeps the test meaningful without flaking the suite
    try:
        _run_workers(tmp_path)
    except AssertionError:
        _run_workers(tmp_path)

    paths = np.concatenate(
        [np.load(tmp_path / f"paths_{pid}.npy") for pid in (0, 1)]
    )
    assert paths.shape == (GLOBAL_BATCH, 40, 4)
    metrics = [
        json.loads((tmp_path / f"metrics_{pid}.json").read_text()) for pid in (0, 1)
    ]
    # psum'd metrics are identical on every process
    assert metrics[0]["n_frames"] == metrics[1]["n_frames"] == GLOBAL_BATCH
    assert metrics[0]["mean_path_length"] == pytest.approx(
        metrics[1]["mean_path_length"], rel=1e-5
    )

    # single-process reference: same shard_map program on the 8-device mesh
    import __graft_entry__
    from ft_fsd_path_planning_tpu.parallel.batch import make_mesh

    cfg = __graft_entry__._tiny_config()
    mesh = make_mesh()
    frames = make_frame_batch(cfg, GLOBAL_BATCH, seed=0)
    states = make_batch_state(cfg, GLOBAL_BATCH)
    step = sharded_batched_step(cfg, mesh)
    ref_outs, _, ref_metrics = step(
        shard_batch(mesh, states), shard_batch(mesh, frames)
    )
    ref_paths = np.asarray(ref_outs.path)

    # identical program + partitioning, but each process compiles its own
    # executable: float reassociation can flip the 20 m trim boundary by one
    # sample, so compare the curves laterally over the common span instead of
    # pointwise (the meaningful metric — and a far tighter one than any
    # pointwise tolerance that must absorb the razor edge)
    from tests.test_pathing import path_parity_deviation

    for b in range(GLOBAL_BATCH):
        dev = path_parity_deviation(ref_paths[b], paths[b])
        assert dev < 0.01, f"frame {b}: lateral deviation {dev:.4f} m"
    # the 20 m trim keeps/drops one 0.165 m sample per frame on fp noise, so
    # the batch-mean path length can differ by ~0.021 per flipped frame
    assert metrics[0]["mean_path_length"] == pytest.approx(
        float(ref_metrics.mean_path_length), abs=0.1
    )

    # per-host slicing covered the whole batch exactly once
    slices = sorted((m["lo"], m["hi"]) for m in metrics)
    assert slices == [(0, 4), (4, 8)]


def test_host_local_slice_single_process():
    lo, hi = host_local_slice(GLOBAL_BATCH)
    assert (lo, hi) == (0, GLOBAL_BATCH // jax.process_count() * (jax.process_index() + 1))
