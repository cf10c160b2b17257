"""Compare accepted trios + fitted centers at skidpad frame 16: ours vs ref."""

import json
import sys
from itertools import combinations

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

from ft_fsd_path_planning_tpu.models import relocalization as R  # noqa: E402
from ft_fsd_path_planning_tpu.ops import geometry as geo  # noqa: E402
from ft_fsd_path_planning_tpu.ops import gatherless as gl  # noqa: E402

data = json.loads(open("/root/reference/fsd_path_planning/demo/skidpad.json").read())
frame = data[16]
pos = np.array(frame["car_position"])
cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
flat = np.vstack([c for c in cones if len(c)])

d = np.linalg.norm(flat[:, :2] - pos, axis=1)
order_ref = np.argsort(d)[:20]
close_ref = flat[order_ref, :2]
circles = circle_fit_powerset(close_ref)
print("ref accepted trios (indices into close):")
for c, s in circles:
    print(f"  {tuple(s)} center=({c[0]:.4f},{c[1]:.4f}) r={c[2]:.4f}")

# ours: replicate the first half of skidpad_relocalize_once
n = 128
cxy = np.zeros((n, 2), np.float32)
mask = np.zeros(n, bool)
cxy[: len(flat)] = flat[:, :2]
mask[: len(flat)] = True
cones_xy = jnp.asarray(cxy)
maskj = jnp.asarray(mask)
vp = jnp.asarray(pos, jnp.float32)

dist = jnp.where(maskj, jnp.linalg.norm(cones_xy - vp, axis=1), jnp.inf)
neg, close_idx = jax.lax.top_k(-dist, R._N_CLOSEST)
close = gl.take_rows(cones_xy, close_idx)
close_ok = jnp.isfinite(neg)
print("\nclose order match:", np.array_equal(np.array(close_idx)[: len(order_ref)], order_ref))

subsets = jnp.asarray(R._SUBSETS)
width = R._SUBSETS.shape[1]
sub_mask = subsets >= 0
sub_idx = jnp.clip(subsets, 0, R._N_CLOSEST - 1)
s_rows = sub_idx.shape[0]
pts = gl.take_rows(close, sub_idx.reshape(-1)).reshape(s_rows, width, 2)
member_ok = gl.take_vec(close_ok.astype(jnp.float32), sub_idx.reshape(-1)) > 0.5
valid_members = sub_mask & member_ok.reshape(s_rows, width)
subset_ok = jnp.all(valid_members == sub_mask, axis=1)

d2 = geo.cdist_sq(pts, pts)
pair_ok = sub_mask[:, :, None] & sub_mask[:, None, :] & ~jnp.eye(width, dtype=bool)
d2 = jnp.where(pair_ok, d2, jnp.inf)
nn = jnp.sqrt(jnp.min(d2, axis=-1))
count = jnp.maximum(jnp.sum(sub_mask, axis=1), 1)
mean_nn = jnp.sum(jnp.where(sub_mask, nn, 0.0), axis=1) / count

n_close = jnp.sum(close_ok.astype(jnp.int32))
onehot_n = (jnp.arange(R._N_CLOSEST + 1) == n_close).astype(jnp.float32)
noise = jnp.einsum("n,nswc->swc", onehot_n, jnp.asarray(R._NOISE_TABLES),
                   precision=jax.lax.Precision.HIGHEST)
pts_noisy = pts + noise
circ = geo.circle_fit(pts_noisy, sub_mask)
center_s, radius_s = circ[:, :2], circ[:, 2]
resid = jnp.abs(
    jnp.linalg.norm(center_s[:, None, :] - pts_noisy, axis=-1) - radius_s[:, None]
)
residual = jnp.sum(jnp.where(sub_mask, resid, 0.0), axis=1) / count
accept = (
    subset_ok
    & (jnp.abs(radius_s - R._CIRCLE_RADIUS) < 1.0)
    & (jnp.abs(mean_nn - R._NN_DIST) < 1.5)
    & (residual < R._RESIDUAL_MAX)
)
acc = np.array(accept)
print(f"\nours accepted={acc.sum()}:")
for i in np.nonzero(acc)[0]:
    s = tuple(R._SUBSETS[i])
    c = np.array(center_s[i])
    print(f"  {s} center=({c[0]:.4f},{c[1]:.4f}) r={float(radius_s[i]):.4f} "
          f"nn={float(mean_nn[i]):.4f} resid={float(residual[i]):.4f}")

ref_set = {tuple(int(order_ref.tolist().index(order_ref[j])) for j in s) for _, s in circles}
# ref trios are indices into close_ref which used order_ref; ours into close via close_idx
print("\nref trio set:", sorted(tuple(int(v) for v in s) for _, s in circles))
