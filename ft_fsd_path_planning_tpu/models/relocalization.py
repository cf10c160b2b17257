"""Relocalization — batched SE(2) transform estimation for skidpad/accel.

TPU-native re-design of the reference relocalizers
(`relocalization/relocalization_base_class.py`, `skidpad/skidpad_relocalizer.py`,
`acceleration/acceleration_relocalization.py`):

* the transform closures become an explicit SE(2) parameterization carried in
  :class:`RelocState`:   forward:  p' = R(rot) (p + t - c) + c,  yaw' = yaw+rot
                         inverse:  p  = R(-rot)(p' - c) + c - t, yaw' = yaw-rot
  (exact algebraic inverse of the reference's closure pair);
* the skidpad powerset circle fits (C(20,3..5) ~= 21.5k subsets,
  skidpad_relocalizer.py:31-64) become one vmapped masked circle fit over a
  static subset-index table;
* DBSCAN clustering becomes fixed-iteration label propagation over the
  (compacted) accepted centers + masked medians + an 18.25 m pair search;
* the acceleration RANSAC line fit uses a static random-subset table instead
  of np.random state.
"""

from __future__ import annotations

import functools
from itertools import combinations
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.assets.known_paths import BASE_SKIDPAD_PATH
from ft_fsd_path_planning_tpu.config import PlannerConfig
from ft_fsd_path_planning_tpu.ops import gatherless as gl
from ft_fsd_path_planning_tpu.ops import geometry as geo

Array = jax.Array

_N_CLOSEST = 20
_MAX_CENTERS = 64
_CIRCLE_RADIUS = 7.625  # cone circle radius gate (skidpad_relocalizer.py:59)
_NN_DIST = 2.4
_RESIDUAL_MAX = 0.4
_CENTER_SEP = 18.25
_DBSCAN_EPS = 3.0


class RelocState(NamedTuple):
    has_origin: Array  # () bool — original pose stored
    origin_position: Array  # (2,)
    origin_direction: Array  # (2,)
    relocalized: Array  # () bool
    rotation: Array  # ()
    translation: Array  # (2,)
    center: Array  # (2,)

    @staticmethod
    def initial(dtype=jnp.float32) -> "RelocState":
        return RelocState(
            has_origin=jnp.asarray(False),
            origin_position=jnp.zeros(2, dtype),
            origin_direction=jnp.zeros(2, dtype),
            relocalized=jnp.asarray(False),
            rotation=jnp.asarray(0.0, dtype),
            translation=jnp.zeros(2, dtype),
            center=jnp.zeros(2, dtype),
        )


def transform_to_known_frame(state: RelocState, pos: Array, yaw: Array) -> tuple[Array, Array]:
    p = geo.rotate(pos + state.translation - state.center, state.rotation) + state.center
    return p, yaw + state.rotation


def transform_to_original_frame(state: RelocState, pos: Array, yaw: Array) -> tuple[Array, Array]:
    p = geo.rotate(pos - state.center, -state.rotation) + state.center - state.translation
    return p, yaw - state.rotation


# ---------------------------------------------------------------------------
# skidpad
# ---------------------------------------------------------------------------


def _subset_table() -> np.ndarray:
    """All C(20,3) index subsets in lexicographic order.

    The reference intends sizes 3..5 but shadows its iterable
    (`for idxs in combinations(idxs, i)`, skidpad_relocalizer.py:36-41):
    after the size-3 pass ``idxs`` is the last 3-tuple, so the size-4/5
    passes iterate an empty ``combinations`` — only trios are ever fit
    (verified empirically against the replay log). Matching that exactly
    matters: at the relocalization frame only ~7 circles are accepted, so
    every extra accepted center shifts the cluster medians at decimeter
    scale.
    """
    return np.asarray(list(combinations(range(_N_CLOSEST), 3)), np.int32)


_SUBSETS = _subset_table()  # (1140, 3)


def _noise_tables() -> np.ndarray:
    """Per-``n_close`` noise tables replaying the reference's RandomState(42)
    stream exactly (skidpad_relocalizer.py:38-53: one fresh randn(size,2) draw
    per *evaluated* trio, in combinations(range(n),3) order, so the value a
    trio receives depends on how many close cones exist). Exactness matters:
    the 1e-3 jitter is amplified ~50x by the 3-point circle fit's conditioning
    into 2-5 cm center shifts — the gap between decimeter and centimeter
    SE(2) parity."""
    index_of = {t: i for i, t in enumerate(combinations(range(_N_CLOSEST), 3))}
    tables = np.zeros((_N_CLOSEST + 1, len(index_of), 3, 2), np.float32)
    for n in range(3, _N_CLOSEST + 1):
        rng = np.random.RandomState(42)
        for trio in combinations(range(n), 3):
            tables[n, index_of[trio]] = rng.randn(3, 2) * 1e-3
    return tables


_NOISE_TABLES = _noise_tables()  # (21, 1140, 3, 2)


def _circle_fit_np(pts: np.ndarray) -> np.ndarray:
    """Hyper-fit circle center in NumPy (same algebra as geo.circle_fit's
    moment form, Newton on the characteristic polynomial) — host-only so the
    lazy reference-center computation never touches the device (it may first
    run inside a jit trace, and import-time device work would initialize the
    XLA backend before `jax.distributed.initialize`)."""
    mean = pts.mean(axis=0)
    xc = pts[:, 0] - mean[0]
    yc = pts[:, 1] - mean[1]
    zi = xc * xc + yc * yc
    m = lambda p, q: np.mean(p * q)
    mxy, mxx, myy = m(xc, yc), m(xc, xc), m(yc, yc)
    mxz, myz, mzz = m(xc, zi), m(yc, zi), m(zi, zi)
    mz = mxx + myy
    cov_xy = mxx * myy - mxy * mxy
    var_z = mzz - mz * mz
    a2 = 4 * cov_xy - 3 * mz * mz - mzz
    a1 = var_z * mz + 4.0 * cov_xy * mz - mxz * mxz - myz * myz
    a0 = mxz * (mxz * myy - myz * mxy) + myz * (myz * mxx - mxz * mxy) - var_z * cov_xy
    a22 = a2 + a2
    x, y = 0.0, a0
    for _ in range(32):
        dy = a1 + x * (a22 + 16.0 * x * x)
        x_new = x - y / (dy if dy != 0 else 1.0)
        y_new = a0 + x_new * (a1 + x_new * (a2 + 4.0 * x_new * x_new))
        if x_new == x or not np.isfinite(x_new) or abs(y_new) >= abs(y):
            break
        x, y = x_new, y_new
    det = x * x - x * mz + cov_xy
    if det == 0:
        det = 1e-12
    cx = (mxz * (myy - x) - myz * mxy) / det / 2.0
    cy = (myz * (mxx - x) - mxz * mxy) / det / 2.0
    return np.asarray([cx + mean[0], cy + mean[1]])


@functools.cache
def _reference_centers() -> np.ndarray:
    """Circle centers of the known path's two lobes
    (skidpad_relocalizer.py:172-183): [right (y<-2), left (y>2)].

    Kept at float64: the facade's post-relocalization refinement rerun (see
    PathPlanner._refine_reloc_f64) needs reference-grade precision; the
    device path casts to its own dtype at the use site."""
    path = BASE_SKIDPAD_PATH
    neg = path[path[:, 1] < -2]
    pos = path[path[:, 1] > 2]
    return np.stack([_circle_fit_np(neg), _circle_fit_np(pos)]).astype(np.float64)


def skidpad_relocalize_once(
    cones_xy: Array,
    mask: Array,
    vehicle_position: Array,
    origin_position: Array,
    origin_direction: Array,
) -> tuple[Array, Array, Array, Array]:
    """One skidpad relocalization attempt
    (skidpad_relocalizer.py:198-240). Returns (ok, rotation, translation,
    center)."""
    n = cones_xy.shape[0]

    # 20 closest cones (:208-212)
    dist = jnp.where(mask, jnp.linalg.norm(cones_xy - vehicle_position, axis=1), jnp.inf)
    neg, close_idx = jax.lax.top_k(-dist, _N_CLOSEST)
    close = gl.take_rows(cones_xy, close_idx)  # (20, 2)
    close_ok = jnp.isfinite(neg)

    # powerset circle fits (:31-64)
    subsets = jnp.asarray(_SUBSETS)
    width = _SUBSETS.shape[1]
    sub_mask = subsets >= 0
    sub_idx = jnp.clip(subsets, 0, _N_CLOSEST - 1)
    s_rows = sub_idx.shape[0]
    pts = gl.take_rows(close, sub_idx.reshape(-1)).reshape(s_rows, width, 2)
    member_ok = gl.take_vec(close_ok.astype(jnp.float32), sub_idx.reshape(-1)) > 0.5
    valid_members = sub_mask & member_ok.reshape(s_rows, width)
    subset_ok = jnp.all(valid_members == sub_mask, axis=1)  # no padded-invalid member

    # mean nearest-neighbour distance inside the subset
    d2 = geo.cdist_sq(pts, pts)  # (S, W, W)
    pair_ok = sub_mask[:, :, None] & sub_mask[:, None, :] & ~jnp.eye(width, dtype=bool)
    d2 = jnp.where(pair_ok, d2, jnp.inf)
    nn = jnp.sqrt(jnp.min(d2, axis=-1))  # (S, 5)
    count = jnp.maximum(jnp.sum(sub_mask, axis=1), 1)
    mean_nn = jnp.sum(jnp.where(sub_mask, nn, 0.0), axis=1) / count

    # noise value depends on the traced close-cone count: one-hot row select
    # over the per-n tables (a (21,)x(21,S*6) contraction, not a gather)
    n_close = jnp.sum(close_ok.astype(jnp.int32))
    onehot_n = (jnp.arange(_N_CLOSEST + 1) == n_close).astype(jnp.float32)
    noise = jnp.einsum(
        "n,nswc->swc", onehot_n, jnp.asarray(_NOISE_TABLES),
        precision=jax.lax.Precision.HIGHEST,
    )
    pts_noisy = pts + noise
    circ = geo.circle_fit(pts_noisy, sub_mask)  # (S, 3)
    center_s, radius_s = circ[:, :2], circ[:, 2]
    resid = jnp.abs(
        jnp.linalg.norm(center_s[:, None, :] - pts_noisy, axis=-1) - radius_s[:, None]
    )
    residual = jnp.sum(jnp.where(sub_mask, resid, 0.0), axis=1) / count

    accept = (
        subset_ok
        & (jnp.abs(radius_s - _CIRCLE_RADIUS) < 1.0)
        & (jnp.abs(mean_nn - _NN_DIST) < 1.5)
        & (residual < _RESIDUAL_MAX)
    )
    enough = jnp.sum(accept) >= 3  # (:218-219)

    # compact accepted centers (up to 64) and cluster by label propagation.
    # center_s must be finite before the one-hot contraction: a single
    # inf/nan row would poison every output row via 0 * inf.
    center_s = jnp.where(jnp.isfinite(center_s), center_s, 0.0)
    order, cvalid = geo.stable_compact(accept, _MAX_CENTERS)
    centers = gl.take_rows(center_s, order)  # (64, 2)

    # DBSCAN(eps=3, min_samples=1) degenerates to connected components of the
    # <=eps graph (every point is core). Exact components via transitive
    # closure by path doubling: log2(64) squarings of the reachability
    # matrix (an f32 MXU matmul each), then label = min reachable index.
    cd = jnp.sqrt(geo.cdist_sq(centers, centers))
    adj = (cd <= _DBSCAN_EPS) & cvalid[:, None] & cvalid[None, :]
    reach = (adj | jnp.eye(_MAX_CENTERS, dtype=bool)).astype(jnp.float32)
    for _ in range(6):  # 2^6 = 64 >= _MAX_CENTERS hops
        reach = jnp.minimum(reach @ reach, 1.0)
    reach_b = reach > 0.0
    labels = jnp.min(
        jnp.where(reach_b, jnp.arange(_MAX_CENTERS)[None, :], _MAX_CENTERS), axis=1
    )
    labels = jnp.where(cvalid, labels, _MAX_CENTERS)

    # per-cluster medians (component-wise, like np.median over members)
    member = (labels[None, :] == labels[:, None]) & cvalid[None, :] & cvalid[:, None]
    med_x = geo.masked_median(jnp.broadcast_to(centers[:, 0], member.shape), member)
    med_y = geo.masked_median(jnp.broadcast_to(centers[:, 1], member.shape), member)
    medians = jnp.stack([med_x, med_y], axis=1)  # (64, 2) one per node

    is_leader = (labels == jnp.arange(_MAX_CENTERS)) & cvalid
    n_clusters = jnp.sum(is_leader)

    # pair of cluster medians separated by ~18.25 m (:78-98)
    sep = jnp.linalg.norm(medians[:, None, :] - medians[None, :, :], axis=-1)
    pair_valid = is_leader[:, None] & is_leader[None, :] & (
        jnp.arange(_MAX_CENTERS)[:, None] < jnp.arange(_MAX_CENTERS)[None, :]
    )
    score = jnp.where(pair_valid, jnp.abs(_CENTER_SEP - sep), jnp.inf)
    flat = jnp.argmin(score)
    bi, bj = flat // _MAX_CENTERS, flat % _MAX_CENTERS
    # reference rejects only if best_distance > 0.5 (skidpad_relocalizer.py:89)
    pair_found = (n_clusters > 1) & (jnp.min(score) <= 0.5)

    cc = gl.take_rows(medians, jnp.stack([bi, bj]))
    c1, c2 = cc[0], cc[1]

    # left/right assignment in the original vehicle frame (:112-119)
    yaw0 = geo.angle_from_2d_vector(origin_direction)
    f1 = geo.rotate(c1 - origin_position, -yaw0)
    c1_is_right = f1[1] < 0.0
    right_calc = jnp.where(c1_is_right, c1, c2)
    left_calc = jnp.where(c1_is_right, c2, c1)
    # both centers on the same side -> reference IndexError -> fail (:237-238)
    f2 = geo.rotate(c2 - origin_position, -yaw0)
    sides_ok = (f1[1] < 0.0) != (f2[1] < 0.0)

    ref_centers = _reference_centers()
    ref_right = jnp.asarray(ref_centers[0], cones_xy.dtype)
    ref_left = jnp.asarray(ref_centers[1], cones_xy.dtype)

    translation = ref_right - right_calc
    ref_angle = geo.angle_from_2d_vector(ref_left - ref_right)
    calc_angle = geo.angle_from_2d_vector(left_calc - right_calc)
    rotation = ref_angle - calc_angle

    ok = enough & pair_found & sides_ok
    return ok, rotation, translation, ref_right


# ---------------------------------------------------------------------------
# acceleration
# ---------------------------------------------------------------------------

_N_RANSAC = 100
_RANSAC_U = np.random.default_rng(3).random((_N_RANSAC, 3)).astype(np.float32)


def acceleration_relocalize_once(
    cones_xy: Array,
    mask: Array,
    vehicle_position: Array,
    vehicle_direction: Array,
    origin_position: Array,
) -> tuple[Array, Array, Array, Array]:
    """One acceleration relocalization attempt
    (acceleration_relocalization.py:121-169): RANSAC-style line fit of the
    near-left cone row. Returns (ok, rotation, translation, center)."""
    yaw = geo.angle_from_2d_vector(vehicle_direction)
    local = geo.rotate(cones_xy - vehicle_position, -yaw)
    row = mask & (local[:, 1] > 0.0) & (local[:, 1] < 2.0)
    n_row = jnp.sum(row)

    order, valid = geo.stable_compact(row)
    pts = gl.take_rows(local, order)  # compacted row cones

    # static pseudo-random DISTINCT 3-subsets over the live prefix, by the
    # order-statistics construction (draw from n, n-1, n-2 and shift past
    # the earlier picks). The reference samples without replacement
    # (np.random.choice(n, 3, replace=False), acceleration_relocalization.py:33);
    # with replacement a duplicated point makes any 2-point line exact
    # (SSE ~ 0), so the argmin would always select a degenerate trio and
    # the slope estimate would be a line through 2 random cones.
    u = jnp.asarray(_RANSAC_U)
    nn = jnp.maximum(n_row, 3)
    i1 = jnp.minimum((u[:, 0] * nn).astype(jnp.int32), nn - 1)
    r2 = jnp.minimum((u[:, 1] * (nn - 1)).astype(jnp.int32), nn - 2)
    i2 = r2 + (r2 >= i1)
    lo = jnp.minimum(i1, i2)
    hi = jnp.maximum(i1, i2)
    r3 = jnp.minimum((u[:, 2] * (nn - 2)).astype(jnp.int32), nn - 3)
    i3 = r3 + (r3 >= lo)
    i3 = i3 + (i3 >= hi)
    idx = jnp.stack([i1, i2, i3], axis=1)  # (N_RANSAC, 3) distinct
    sub = gl.take_rows(pts, idx.reshape(-1)).reshape(_N_RANSAC, 3, 2)

    x, y = sub[..., 0], sub[..., 1]
    mx = jnp.mean(x, axis=1, keepdims=True)
    my = jnp.mean(y, axis=1, keepdims=True)
    var = jnp.sum((x - mx) ** 2, axis=1)
    cov = jnp.sum((x - mx) * (y - my), axis=1)
    slope = cov / jnp.maximum(var, 1e-9)
    intercept = my[:, 0] - slope * mx[:, 0]
    sse = jnp.sum((y - (slope[:, None] * x + intercept[:, None])) ** 2, axis=1)
    best = jnp.argmin(sse)
    best_slope = gl.take_vec(slope, best[None])[0]

    angle_to_fix = jnp.arctan(best_slope) + yaw
    ok = n_row >= 4
    # unified SE(2): p' = R(-angle)(p - origin) -> rot=-angle, t=-origin, c=0
    return ok, -angle_to_fix, -origin_position, jnp.zeros(2, cones_xy.dtype)


def attempt_relocalization(
    cfg: PlannerConfig,
    state: RelocState,
    cones_xy: Array,
    mask: Array,
    position: Array,
    direction: Array,
) -> RelocState:
    """Reference Relocalizer.attempt_relocalization_calculation
    (relocalization_base_class.py:50-75): store the first pose, retry every
    frame until a transform is found, then freeze."""
    origin_pos = jnp.where(state.has_origin, state.origin_position, position)
    origin_dir = jnp.where(state.has_origin, state.origin_direction, direction)

    if cfg.mission.name == "skidpad":
        ok, rot, trans, center = skidpad_relocalize_once(
            cones_xy, mask, position, origin_pos, origin_dir
        )
    else:
        ok, rot, trans, center = acceleration_relocalize_once(
            cones_xy, mask, position, direction, origin_pos
        )

    take = ok & ~state.relocalized
    return RelocState(
        has_origin=jnp.asarray(True),
        origin_position=origin_pos,
        origin_direction=origin_dir,
        relocalized=state.relocalized | ok,
        rotation=jnp.where(take, rot, state.rotation),
        translation=jnp.where(take, trans, state.translation),
        center=jnp.where(take, center, state.center),
    )
