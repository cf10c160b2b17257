"""Probe the reference skidpad relocalizer on the replay log.

Measures, per frame until relocalization: number of cones, number of
accepted powerset circles (and their subset sizes), number of DBSCAN
clusters, and the final SE(2). Validates the loop-shadowing observation
(skidpad_relocalizer.py:40-41 reuses `idxs`, so only size-3 subsets run).
"""

import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from tests.reference_oracle import load_reference  # noqa: E402

ref = load_reference()

from fsd_path_planning.relocalization.skidpad.skidpad_relocalizer import (  # noqa: E402
    SkidpadRelocalizer,
    circle_fit_powerset,
    calculate_circle_centers,
)

data = json.loads(open("/root/reference/fsd_path_planning/demo/skidpad.json").read())

reloc = SkidpadRelocalizer()
for i, frame in enumerate(data[:120]):
    pos = np.array(frame["car_position"])
    direction = np.array(frame["car_direction"])
    cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
    flat = np.row_stack([c for c in cones if len(c)]) if any(len(c) for c in cones) else np.zeros((0, 2))
    if len(flat) < 3:
        continue
    d = np.linalg.norm(flat[:, :2] - pos, axis=1)
    close = flat[np.argsort(d)[:20], :2]
    circles = circle_fit_powerset(close)
    sizes = sorted({len(s) for _, s in circles})
    ok = False
    n_clusters = -1
    if len(circles) >= 3:
        centers = np.array([c[:2] for c, _ in circles])
        try:
            cc = calculate_circle_centers(circles)
            ok = True
        except Exception:
            pass
        from sklearn.cluster import DBSCAN

        n_clusters = len(np.unique(DBSCAN(eps=3, min_samples=1).fit(centers).labels_))
    print(f"frame {i:3d}: n_cones={len(flat):3d} accepted={len(circles):4d} "
          f"sizes={sizes} clusters={n_clusters} pair_ok={ok}")

    reloc.attempt_relocalization_calculation(cones, pos, direction)
    if reloc.is_relocalized:
        info = reloc.transform_to_known_map_frame
        p0, y0 = info(np.zeros(2), 0.0)
        p1, y1 = info(np.array([1.0, 0.0]), 0.0)
        print(f"  RELOCALIZED at frame {i}; T(0,0)={p0}, rot={np.arctan2(*(p1 - p0)[::-1])}")
        break
