#!/usr/bin/env python3
"""Weak-scaling harness: solves/s at 1/2/4/8 devices, batch-per-device fixed.

Runs the sharded batched step (`parallel/batch.py::sharded_batched_step`,
check_vma on) over meshes of growing size and reports TWO efficiency
numbers per point:

* ``weak_scaling_efficiency`` — raw solves/s vs n_devices x the 1-device
  baseline. On the CPU-simulated mesh this is CONFOUNDED: the N simulated
  devices share one host's cores, so the curve mostly measures CPU
  contention, not wiring. Reported for continuity with real-slice runs,
  where it is the production metric.
* ``wiring_efficiency`` — solves/s of the N-device sharded step at global
  batch B divided by solves/s of the UNSHARDED single-program step at the
  SAME global batch B. Both runs use the host's full core pool, so the
  ratio isolates what sharding itself costs (partitioning, collectives,
  per-device dispatch) from core contention — the de-confounded artifact
  this harness exists to produce on a simulated mesh.

Usage: python tools/scaling_bench.py [per_device_batch] [> SCALING.json]
Emits one JSON object; also writes SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
_CACHE = Path(__file__).resolve().parent.parent / ".jax_cache" / "cpu"
_CACHE.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.parallel import batch as B
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes


def measure_sharded(cfg, n_devices: int, global_batch: int, iters: int = 8) -> float:
    mesh = B.make_mesh(n_devices)
    step = B.sharded_batched_step(cfg, mesh)
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


def measure_single(cfg, global_batch: int, iters: int = 8) -> float:
    """Unsharded single-program step at the same global batch — the
    same-total-cores baseline for wiring_efficiency."""
    step = jax.jit(partial(B.batched_step, cfg))
    states = B.make_batch_state(cfg, global_batch)
    frames = make_frame_batch(cfg, global_batch, seed=0)
    outs, _ = step(states, frames)
    float(np.asarray(outs.path[0, -1, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        outs, _ = step(states, frames)
    float(np.asarray(outs.path[0, -1, 0]))
    elapsed = time.perf_counter() - t0
    return global_batch * iters / elapsed


def main() -> None:
    per_device = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cfg = default_config(MissionTypes.trackdrive)
    device_counts = [n for n in (1, 2, 4, 8) if n <= jax.device_count()]

    points = []
    base = None
    for n in device_counts:
        global_batch = n * per_device
        sps = measure_sharded(cfg, n, global_batch)
        single = measure_single(cfg, global_batch)
        if base is None:
            base = sps
        points.append(
            {
                "n_devices": n,
                "global_batch": global_batch,
                "solves_per_s": round(sps, 1),
                "single_program_solves_per_s": round(single, 1),
                "weak_scaling_efficiency": round(sps / (base * n), 3),
                "wiring_efficiency": round(sps / single, 3),
            }
        )

    result = {
        "harness": "weak scaling, batch/device fixed",
        "per_device_batch": per_device,
        "backend": jax.default_backend(),
        "note": (
            "CPU-simulated mesh: the N devices share one host's cores, so "
            "weak_scaling_efficiency mostly measures core contention there "
            "(real-slice runs use the same harness and read it as the "
            "production metric). wiring_efficiency de-confounds it: "
            "sharded vs unsharded throughput at the SAME global batch on "
            "the same cores — sharding overhead only."
        ),
        "points": points,
    }
    out = json.dumps(result)
    print(out)
    (Path(__file__).resolve().parent.parent / "SCALING.json").write_text(out + "\n")


if __name__ == "__main__":
    main()
