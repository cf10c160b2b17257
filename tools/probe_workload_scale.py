"""Whole-SLAM-map parity probe: FSG-scale closed-track frames through both
planners at the n_cones=256 budget."""

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
from ft_fsd_path_planning_tpu.config import large_map_config  # noqa: E402
from ft_fsd_path_planning_tpu.parallel.scenarios import closed_track_frames  # noqa: E402
from tests.test_pathing import path_parity_deviation  # noqa: E402

for seed in (0, 1, 2):
    frames = closed_track_frames(seed=seed, n_frames=6, base_radius=42.0, spacing=3.2)
    n_cones = sum(len(c) for c in frames[0][0])
    ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.trackdrive)
    our_planner = PathPlanner(
        MissionTypes.trackdrive, config=large_map_config(MissionTypes.trackdrive)
    )
    devs = []
    for cones, pos, direction in frames:
        ref_out = ref_planner.calculate_path_in_global_frame(
            [np.asarray(c, float).copy() for c in cones], pos.copy(), direction.copy()
        )
        our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)
        devs.append(path_parity_deviation(ref_out, our_out))
    devs = np.array(devs)
    print(f"seed {seed}: n_cones={n_cones} per-frame max dev: "
          f"{np.round(devs, 4)} | median {np.median(devs):.4f} max {devs.max():.4f}")
