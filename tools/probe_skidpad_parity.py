"""Measure skidpad replay parity deviations (ours vs reference)."""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import os
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

from tests.reference_oracle import load_reference  # noqa: E402

ref_pkg = load_reference()

from ft_fsd_path_planning_tpu import MissionTypes, PathPlanner  # noqa: E402
from tests.test_pathing import path_parity_deviation  # noqa: E402

data = json.loads(
    open("/root/reference/fsd_path_planning/demo/skidpad.json").read()
)
ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.skidpad)
our_planner = PathPlanner(MissionTypes.skidpad)

deviations = []
for i, frame in enumerate(data[:120]):
    pos = np.array(frame["car_position"])
    direction = np.array(frame["car_direction"])
    cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
    ref_out = ref_planner.calculate_path_in_global_frame(
        [c.copy() for c in cones], pos.copy(), direction.copy()
    )
    our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
    if ref_planner.relocalization_info is not None:
        dev = path_parity_deviation(ref_out, our_out)
        deviations.append(dev)
        if dev > 0.05:
            print(f"frame {i}: dev={dev:.4f}")

d = np.array(deviations)
ri = ref_planner.relocalization_info
oi = our_planner.relocalization_info
print("ref reloc:", None if ri is None else (ri.translation, ri.rotation))
print("our reloc:", None if oi is None else (oi.translation, oi.rotation))
print(f"n={len(d)} median={np.median(d):.4f} p90={np.percentile(d, 90):.4f} max={d.max():.4f}")
