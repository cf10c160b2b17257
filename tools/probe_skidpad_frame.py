"""Compare accepted circles/centers at each early skidpad frame: ours vs ref."""

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
import jax.numpy as jnp

from tests.reference_oracle import load_reference  # noqa: E402

load_reference()
from fsd_path_planning.relocalization.skidpad.skidpad_relocalizer import (  # noqa: E402
    circle_fit_powerset,
)
from sklearn.cluster import DBSCAN  # noqa: E402

from ft_fsd_path_planning_tpu.models import relocalization as R  # noqa: E402

data = json.loads(open("/root/reference/fsd_path_planning/demo/skidpad.json").read())

for fi in range(10, 20):
    frame = data[fi]
    pos = np.array(frame["car_position"])
    direction = np.array(frame["car_direction"])
    cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
    flat = np.vstack([c for c in cones if len(c)])

    # reference side
    d = np.linalg.norm(flat[:, :2] - pos, axis=1)
    close = flat[np.argsort(d)[:20], :2]
    circles = circle_fit_powerset(close)
    centers_ref = np.array([c[:2] for c, _ in circles]).reshape(-1, 2)
    print(f"--- frame {fi}: ref accepted={len(circles)}")
    if len(circles) >= 2:
        labels = DBSCAN(eps=3, min_samples=1).fit(centers_ref).labels_
        meds = {l: np.median(centers_ref[labels == l], axis=0) for l in np.unique(labels)}
        for l, m in meds.items():
            print(f"  ref cluster {l}: n={np.sum(labels == l)} med={m}")

    # our side
    n = 128
    cxy = np.zeros((n, 2), np.float32)
    mask = np.zeros(n, bool)
    cxy[: len(flat)] = flat[:, :2]
    mask[: len(flat)] = True
    ok, rot, trans, center = jax.jit(R.skidpad_relocalize_once)(
        jnp.asarray(cxy), jnp.asarray(mask), jnp.asarray(pos, jnp.float32),
        jnp.asarray(pos, jnp.float32), jnp.asarray(direction, jnp.float32),
    )
    print(f"  ours ok={ok} rot={rot} trans={trans}")
