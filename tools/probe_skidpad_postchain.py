"""Diagnose where skidpad output paths differ: radial smoothing vs tracking."""

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

data = json.loads(open("/root/reference/fsd_path_planning/demo/skidpad.json").read())
ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.skidpad)
our_planner = PathPlanner(MissionTypes.skidpad)

FRAME = 60
for i, frame in enumerate(data[: FRAME + 1]):
    pos = np.array(frame["car_position"])
    direction = np.array(frame["car_direction"])
    cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
    ref_out = ref_planner.calculate_path_in_global_frame(
        [c.copy() for c in cones], pos.copy(), direction.copy()
    )
    our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)

# at FRAME: compare curves; measure radial distance of each point from the
# active lobe center (transformed back to original frame)
print("ref path[:,0] span", ref_out[0, 0], ref_out[-1, 0], "n=", len(ref_out))
print("our path[:,0] span", our_out[0, 0], our_out[-1, 0], "n=", len(our_out))

# signed lateral: for each our point, nearest ref segment distance
from scipy.spatial import cKDTree

t = cKDTree(ref_out[:, 1:3])
d, j = t.query(our_out[:, 1:3])
print("pointwise nearest dist: median %.4f max %.4f" % (np.median(d), d.max()))
print("theta  ref_x    ref_y    our_x    our_y   nearest_d")
for k in range(0, 40, 4):
    print(f"{our_out[k,0]:7.3f} {ref_out[k,1]:8.3f} {ref_out[k,2]:8.3f} "
          f"{our_out[k,1]:8.3f} {our_out[k,2]:8.3f} {d[k]:8.4f}")
print("curvature ref vs ours (k=0,10,20,30,39):")
for k in (0, 10, 20, 30, 39):
    print(f"  {ref_out[k,3]:.4f} vs {our_out[k,3]:.4f}")
