#!/usr/bin/env python3
"""Weak-scaling harness: solves/s at 1/2/4/8 devices, batch-per-device fixed.

Runs the sharded batched step (`parallel/batch.py::sharded_batched_step`,
check_vma on) over meshes of growing size and reports throughput + parallel
efficiency vs the 1-device baseline. On this image the mesh is the simulated
8-device CPU host (`--xla_force_host_platform_device_count=8`) — the same
program a real v5e slice runs; here the curve validates wiring + efficiency
*shape* (the 8 "devices" share one host's cores, so perfect flatness is not
expected), and on real hardware it is the production measurement.

Usage: python tools/scaling_bench.py [per_device_batch] [> SCALING.json]
Emits one JSON object; also writes SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
_CACHE = Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.parallel import batch as B
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes


def measure(cfg, n_devices: int, per_device: int, iters: int = 8) -> float:
    mesh = B.make_mesh(n_devices)
    step = B.sharded_batched_step(cfg, mesh)
    global_batch = n_devices * per_device
    states = B.shard_batch(mesh, B.make_batch_state(cfg, global_batch))
    frames = B.shard_batch(mesh, make_frame_batch(cfg, global_batch, seed=0))

    outs, states, metrics = step(states, frames)
    float(np.asarray(metrics.n_frames))  # force execution

    t0 = time.perf_counter()
    for _ in range(iters):
        outs, states, metrics = step(states, frames)
    float(np.asarray(metrics.n_frames))
    elapsed = time.perf_counter() - t0
    assert float(np.asarray(metrics.n_frames)) == global_batch
    return global_batch * iters / elapsed


def main() -> None:
    per_device = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = default_config(MissionTypes.trackdrive)
    device_counts = [n for n in (1, 2, 4, 8) if n <= jax.device_count()]

    points = []
    base = None
    for n in device_counts:
        sps = measure(cfg, n, per_device)
        if base is None:
            base = sps
        points.append(
            {
                "n_devices": n,
                "global_batch": n * per_device,
                "solves_per_s": round(sps, 1),
                "weak_scaling_efficiency": round(sps / (base * n), 3),
            }
        )

    result = {
        "harness": "weak scaling, batch/device fixed",
        "per_device_batch": per_device,
        "backend": jax.default_backend(),
        "note": (
            "CPU-simulated mesh (one host's cores shared across simulated "
            "devices): validates wiring + efficiency shape; real-slice "
            "numbers come from the same harness on hardware"
        ),
        "points": points,
    }
    out = json.dumps(result)
    print(out)
    (Path(__file__).resolve().parent.parent / "SCALING.json").write_text(out + "\n")


if __name__ == "__main__":
    main()
