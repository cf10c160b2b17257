#!/usr/bin/env python3
"""Benchmark: full-pipeline path solves/s on the attached TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solves/s", "vs_baseline": N}

Baseline: the reference runs ~100 solves/s sequentially (10 ms/frame on a
Jetson Xavier AGX, reference README.md:111 — see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time
from functools import partial

import jax

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.parallel.batch import batched_step, make_batch_state
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

BASELINE_SOLVES_PER_S = 100.0  # reference: ~10 ms/frame, single thread


def main() -> None:
    batch = int(os.environ.get("BENCH_BATCH", "256"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))

    cfg = default_config(MissionTypes.trackdrive)
    states = make_batch_state(cfg, batch)
    frames = make_frame_batch(cfg, batch, seed=0)

    step = jax.jit(partial(batched_step, cfg), donate_argnums=(0,))

    # warmup / compile
    outs, states = step(states, frames)
    jax.block_until_ready(outs.path)

    t0 = time.perf_counter()
    for _ in range(iters):
        outs, states = step(states, frames)
    jax.block_until_ready(outs.path)
    elapsed = time.perf_counter() - t0

    solves_per_s = batch * iters / elapsed
    print(
        json.dumps(
            {
                "metric": "full-pipeline path solves/s (1 chip, trackdrive, "
                f"batch={batch})",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
