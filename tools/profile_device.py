#!/usr/bin/env python3
"""Measured device profile of the batch-256 planner step on the attached TPU.

Captures a ``jax.profiler`` trace of the jitted batched step, parses the
Chrome-trace export, computes per-op EXCLUSIVE device time (nested while-loop
bodies subtracted from their parents), and aggregates by pipeline stage and
source line. This is the evidence behind PROFILE.md — run it after any
compute-path change:

    python tools/profile_device.py [batch] [--keep-dir DIR]

The stage attribution walks each HLO op's `source_stack` (JAX records the
originating Python frames) — ops inside `ops/fitpack.py` etc. are credited
to the *pipeline stage* whose model file appears in the stack, so shared
kernels (gatherless, geometry) land where they were called from.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

STAGE_FILES = [
    ("sorting", ("models/sorting.py", "models/sorting_cost.py")),
    ("matching", ("models/matching.py",)),
    ("pathing", ("models/pathing.py",)),
    ("relocalization", ("models/relocalization.py",)),
    ("planner-other", ("models/planner.py",)),
]


def capture(batch: int, trace_dir: str, iters: int = 10) -> float:
    from ft_fsd_path_planning_tpu.config import default_config
    from ft_fsd_path_planning_tpu.parallel.batch import batched_step, make_batch_state
    from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
    from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

    cfg = default_config(MissionTypes.trackdrive)
    states = make_batch_state(cfg, batch)
    frames = make_frame_batch(cfg, batch, seed=0)
    step = jax.jit(partial(batched_step, cfg))
    outs, _ = step(states, frames)
    np.asarray(outs.path[0, -1, 0])
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            outs, _ = step(states, frames)
        np.asarray(outs.path[0, -1, 0])
    wall = (time.perf_counter() - t0) / iters
    return wall


def load_device_ops(trace_dir: str):
    path = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))[-1]
    data = json.load(gzip.open(path))
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pid = next(p for p, n in pids.items() if "TPU" in n)
    tids = {
        e["tid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name" and e["pid"] == dev_pid
    }
    ops_tid = next(t for t, n in tids.items() if n == "XLA Ops")
    mod_tid = next(t for t, n in tids.items() if n == "XLA Modules")
    ops = [
        e
        for e in ev
        if e.get("pid") == dev_pid and e.get("tid") == ops_tid and e.get("ph") == "X"
    ]
    mods = [
        e
        for e in ev
        if e.get("pid") == dev_pid and e.get("tid") == mod_tid and e.get("ph") == "X"
    ]
    return ops, mods


def exclusive_times(ops):
    """Subtract nested child durations (while bodies nest inside while ops)."""
    ops.sort(key=lambda e: (e["ts"], -e["dur"]))
    stack = []
    for e in ops:
        e["excl"] = e["dur"]
        while stack and e["ts"] >= stack[-1]["ts"] + stack[-1]["dur"]:
            stack.pop()
        if stack and e["ts"] + e["dur"] <= stack[-1]["ts"] + stack[-1]["dur"] + 1e-9:
            stack[-1]["excl"] -= e["dur"]
        stack.append(e)
    return ops


def stage_of(e) -> str:
    ss = e.get("args", {}).get("source_stack", "")
    for stage, files in STAGE_FILES:
        if any(f in ss for f in files):
            return stage
    if any(f in ss for f in ("fitpack.py", "spline.py", "curvature.py")):
        return "pathing"  # ops-layer call without a recorded model frame
    return "(no-stack)"


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    iters = 10
    if "--keep-dir" in sys.argv:
        trace_dir = sys.argv[sys.argv.index("--keep-dir") + 1]
    else:
        trace_dir = tempfile.mkdtemp(prefix="tpu_prof_")
    wall = capture(batch, trace_dir, iters)
    ops, mods = load_device_ops(trace_dir)
    ops = exclusive_times(ops)

    step_modules = [m for m in mods if m["dur"] > 1000]  # the planner steps
    dev_ms = sum(m["dur"] for m in step_modules) / iters / 1e3
    print(f"batch={batch}: wall {wall * 1e3:.2f} ms/step, device {dev_ms:.2f} ms/step")
    n = len(step_modules)
    if n:
        span = step_modules[-1]["ts"] + step_modules[-1]["dur"] - step_modules[0]["ts"]
        print(f"device occupancy during loop: {sum(m['dur'] for m in step_modules) / span * 100:.1f}%")

    agg = collections.Counter()
    for e in ops:
        agg[stage_of(e)] += e["excl"]
    print("\n== exclusive device time by pipeline stage (ms/step)")
    for k, v in agg.most_common():
        print(f"{v / iters / 1e3:8.3f}  {k}")

    print("\n== fitpack/spline time by pathing call site (ms/step)")
    site = collections.Counter()
    for e in ops:
        ss = e.get("args", {}).get("source_stack", "")
        if "fitpack.py" not in ss and "spline.py" not in ss:
            continue
        m = re.search(r"pathing\.py:(\d+)", ss)
        site[f"pathing.py:{m.group(1)}" if m else "(other)"] += e["excl"]
    for k, v in site.most_common():
        print(f"{v / iters / 1e3:8.3f}  {k}")

    print("\n== top 15 ops by exclusive time (ms/step)")
    by_name = collections.Counter()
    count = collections.Counter()
    src = {}
    for e in ops:
        key = e["name"]
        by_name[key] += e["excl"]
        count[key] += 1
        src.setdefault(key, e.get("args", {}).get("source", ""))
    for k, v in by_name.most_common(15):
        s = src[k].replace("/root/repo/ft_fsd_path_planning_tpu/", "")
        print(f"{v / iters / 1e3:8.3f}  x{count[k] // iters:<4d} {k[:34]:36s} {s}")

    print(f"\ntrace dir: {trace_dir}")


if __name__ == "__main__":
    main()
