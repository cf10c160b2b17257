"""Stage-by-stage skidpad post-chain comparison at one frame.

Captures the reference CalculatePath intermediates via method wrapping, then
replays OUR post-chain stages on the reference's own inputs to find which
stage diverges.
"""

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

ref_pkg = load_reference()

from ft_fsd_path_planning_tpu import MissionTypes, PathPlanner  # noqa: E402
from ft_fsd_path_planning_tpu.config import default_config  # noqa: E402
from ft_fsd_path_planning_tpu.models import pathing as P  # noqa: E402
from ft_fsd_path_planning_tpu.ops import fitpack as fpk  # noqa: E402

FRAME = 60
data = json.loads(open("/root/reference/fsd_path_planning/demo/skidpad.json").read())
ref_planner = ref_pkg.PathPlanner(ref_pkg.MissionTypes.skidpad)
our_planner = PathPlanner(MissionTypes.skidpad)

# wrap reference methods to capture intermediates
cp = ref_planner.pathing
captures = {}

orig_fit = cp.fit_matches_as_spline
orig_mpc = cp.create_path_for_mpc_from_path_update
orig_connect = cp.connect_path_to_car
orig_extend = cp.extend_path
orig_remove = cp.remove_path_behind_car
orig_refit = cp.refit_path_for_mpc_with_safety_factor
orig_horizon = cp.remove_path_not_in_prediction_horizon


def wrap(name, fn):
    def inner(*a, **k):
        out = fn(*a, **k)
        captures.setdefault(name, []).append(
            (tuple(np.copy(x) for x in a if isinstance(x, np.ndarray)), np.copy(out))
        )
        return out
    return inner


cp.fit_matches_as_spline = wrap("fit", orig_fit)
cp.connect_path_to_car = wrap("connect", orig_connect)
cp.extend_path = wrap("extend", orig_extend)
cp.remove_path_behind_car = wrap("remove", orig_remove)
cp.refit_path_for_mpc_with_safety_factor = wrap("refit", orig_refit)
cp.remove_path_not_in_prediction_horizon = wrap("horizon", orig_horizon)

for i, frame in enumerate(data[: FRAME + 1]):
    captures.clear()
    pos = np.array(frame["car_position"])
    direction = np.array(frame["car_direction"])
    cones = [np.array(c).reshape(-1, 2) for c in frame["slam_cones"]]
    ref_out = ref_planner.calculate_path_in_global_frame(
        [c.copy() for c in cones], pos.copy(), direction.copy()
    )
    our_out = our_planner.calculate_path_in_global_frame(cones, pos, direction)

for name in ("fit", "connect", "extend", "remove", "refit", "horizon"):
    if name in captures:
        for args, out in captures[name]:
            shp = [a.shape for a in args]
            print(f"{name}: in={shp} out={out.shape}")

# the reference 'fit' output is the tracked dense path (skidpad override)
ref_tracked = captures["fit"][0][1]
print("\nref tracked slice:", ref_tracked.shape, ref_tracked[0], ref_tracked[-1])

# ---- feed the reference's post-refit path through OUR parameterizer only
cfg = default_config(MissionTypes.skidpad)
refit_out = captures["refit"][0][1]
print("ref refit out:", refit_out.shape)

# reference applies trim (remove_path_not_in_prediction_horizon) then
# PathParameterizer; replicate trim from captures
trimmed = captures["horizon"][-1][1] if "horizon" in captures else refit_out
print("ref trimmed:", trimmed.shape)

d = cfg.shapes.dense_samples
buf = np.zeros((d, 2), np.float32)
n = min(len(trimmed), d)
buf[:n] = trimmed[:n]
out, ok = jax.jit(P._parameterize_path, static_argnums=0)(
    cfg, jnp.asarray(buf), jnp.asarray(n)
)
out = np.array(out)

# reference final path in skidpad frame: re-derive by transforming ref_out?
# simpler: compare our param output vs ref final (both in original frame? no --
# trimmed is in skidpad frame; ref_out is transformed back). So transform ours.
info = ref_planner.relocalization_info
# use reference transform_back: probe via planner internals
tb = ref_planner.relocalizer.transform_to_original_frame


def to_orig(xy):
    p, _ = tb(xy, np.zeros(len(xy)))
    return p


ours_xy = to_orig(out[:, 1:3])
ref_xy = ref_out[:, 1:3]
from scipy.spatial import cKDTree

d1, _ = cKDTree(ref_xy).query(ours_xy)
print("\nOUR parameterizer on REF trimmed path vs ref final:")
print("  median %.4f max %.4f" % (np.median(d1), d1.max()))

# ---- now OUR full post-chain on the reference's tracked slice
buf2 = np.zeros((d, 2), np.float32)
n2 = min(len(ref_tracked), d)
buf2[:n2] = ref_tracked[:n2]


def our_chain(pts, n_valid, position, direction):
    p0, n0 = P._remove_path_behind_car(pts, n_valid, position)
    p1, n1 = P._connect_path_to_car(p0, n0, position, direction)
    p2, n2_ = P._extend_path(p1, n1, position, direction, cfg.path.mpc_path_length)
    p3, n3 = P._remove_path_behind_car(p2, n2_, position)
    refit = fpk.fitpack_fit(p3, jnp.arange(d) < n3, cfg.path.smoothing)
    p4, _, v4 = fpk.fitpack_eval_every(
        refit, cfg.path.predict_every, d, max_u=cfg.path.mpc_path_length * 1.5
    )
    n4 = jnp.sum(v4)
    p5, n5, _ = P._trim_to_mpc_length(p4, n4, cfg.path.mpc_path_length)
    out, ok = P._parameterize_path(cfg, p5, n5)
    return out, p3, n3, p5, n5


# position in skidpad frame: the reference transforms pose first
tf = ref_planner.relocalizer.transform_to_known_map_frame
pos_t, yaw_t = tf(pos, np.arctan2(direction[1], direction[0]))
dir_t = np.array([np.cos(yaw_t), np.sin(yaw_t)])

out2, p3, n3, p5, n5 = jax.jit(our_chain)(
    jnp.asarray(buf2), jnp.asarray(n2),
    jnp.asarray(pos_t, jnp.float32), jnp.asarray(dir_t, jnp.float32),
)
ours2_xy = to_orig(np.array(out2[:, 1:3]))
d2, _ = cKDTree(ref_xy).query(ours2_xy)
print("OUR full post-chain on REF tracked slice vs ref final:")
print("  median %.4f max %.4f" % (np.median(d2), d2.max()))

# and the tracked slices themselves
ours_fit_in = captures  # placeholder
# our planner's own tracked slice: grab via running _skidpad_path_update
print("\nref tracked head/tail:", ref_tracked[:2], ref_tracked[-2:])
print("our p5 n=", int(n5), "ref trimmed n=", len(trimmed))
p5 = np.array(p5)[: int(n5)]
d3, _ = cKDTree(trimmed).query(p5)
print("our p5 vs ref trimmed (both on ref tracked): median %.4f max %.4f"
      % (np.median(d3), d3.max()))


# ---- densified (true lateral) comparisons
def dense_poly(pts, k=20):
    t = np.arange(len(pts))
    td = np.linspace(0, len(pts) - 1, len(pts) * k)
    return np.stack([np.interp(td, t, pts[:, 0]), np.interp(td, t, pts[:, 1])], axis=1)


def lat_dev(a, b):
    """max/median over points of a of distance to densified polyline b."""
    db = dense_poly(b)
    d, _ = cKDTree(db).query(a)
    return np.median(d), d.max()


print("\n=== densified lateral deviations ===")
m, M = lat_dev(ours_xy, ref_xy)
print(f"OUR parameterizer on REF trimmed vs ref final: median {m:.4f} max {M:.4f}")
m, M = lat_dev(ours2_xy, ref_xy)
print(f"OUR full chain on REF tracked vs ref final:    median {m:.4f} max {M:.4f}")
m, M = lat_dev(p5, trimmed)
print(f"our p5 vs ref trimmed (same tracked input):    median {m:.4f} max {M:.4f}")

# our own tracked slice vs ref tracked slice
from ft_fsd_path_planning_tpu.models import planner as PL
gp = PL._known_global_path(cfg)
state = P.PathState(
    prev_path=jnp.zeros((40, 4)), index_along_path=jnp.asarray(0, jnp.int32)
)
# approximate index state at frame 60 by replaying tracking only
idx = jnp.asarray(0, jnp.int32)
for i, frame in enumerate(data[: FRAME + 1]):
    pos_i = np.array(frame["car_position"])
    dir_i = np.array(frame["car_direction"])
    yaw_i = np.arctan2(dir_i[1], dir_i[0])
    pt_i, yaw_t_i = tf(pos_i, yaw_i)
    st = P.PathState(prev_path=jnp.zeros((40, 4)), index_along_path=idx)
    dense_i, n_dense_i, _, idx = P._skidpad_path_update(
        cfg, gp, st, jnp.asarray(pt_i, jnp.float32),
        jnp.asarray([np.cos(yaw_t_i), np.sin(yaw_t_i)], jnp.float32),
    )
our_tracked = np.array(dense_i)[: int(n_dense_i)]
print("our tracked n =", len(our_tracked), "ref tracked n =", len(ref_tracked))
m, M = lat_dev(our_tracked, ref_tracked)
print(f"our tracked slice vs ref tracked slice:        median {m:.4f} max {M:.4f}")
print("our tracked head/tail:", our_tracked[:2], our_tracked[-2:])
