"""Path calculation stage — centerline fit, MPC post-chain, parameterization.

TPU-native re-design of the reference's CalculatePath
(`calculate_path/core_calculate_path.py:63-575`), PathParameterizer
(`calculate_path/path_parameterization.py:111-328`) and the skidpad override
(`calculate_path/skidpad_calculate_path.py:21-71`).

Every ragged array of the reference becomes a fixed buffer + valid-count:
  * centerline candidates: (CL, 2) + mask
  * dense path samples:    (D, 2) + n_valid  (0.1 m grid, D = 512)
  * final MPC path:        (H, 4), H = 40
The fallback lattice (previous-path substitutions on failures,
core_calculate_path.py:202-237, 561-570) becomes `where`-selects on ok-flags
threaded through the chain, with the previous parameterized path carried in
:class:`PathState`.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import PlannerConfig
from ft_fsd_path_planning_tpu.ops import gatherless as gl
from ft_fsd_path_planning_tpu.ops import geometry as geo
from ft_fsd_path_planning_tpu.ops import fitpack as fpk
from ft_fsd_path_planning_tpu.ops import spline as sp
from ft_fsd_path_planning_tpu.ops.curvature import path_curvature, uniform_filter1d_nearest

Array = jax.Array


class PathInput(NamedTuple):
    """Stage input (reference PathCalculationInput, core_calculate_path.py:36-51)."""

    left_cones: Array  # (S, 2)
    left_mask: Array  # (S,)
    right_cones: Array  # (S, 2)
    right_mask: Array  # (S,)
    left_to_right: Array  # (S,) int32, -1 = no match
    right_to_left: Array  # (S,) int32
    position: Array  # (2,)
    direction: Array  # (2,)


class GlobalPathBuffer(NamedTuple):
    """Fixed-size global path (relocalization / set_global_path)."""

    points: Array  # (G, 2)
    n_valid: Array  # ()
    active: Array  # () bool

    @staticmethod
    def empty(g: int, dtype=jnp.float32) -> "GlobalPathBuffer":
        return GlobalPathBuffer(
            points=jnp.zeros((g, 2), dtype),
            n_valid=jnp.asarray(0, jnp.int32),
            active=jnp.asarray(False),
        )


class PathState(NamedTuple):
    """Carried planner state for this stage."""

    prev_path: Array  # (H, 4) last parameterized path
    index_along_path: Array  # () int32, skidpad tracking state


def _almost_straight_path() -> np.ndarray:
    """Reference PathCalculatorHelpers.calculate_almost_straight_path
    (path_calculator_helpers.py:27-68): radius 1000 chord of angle pi/50,
    40 points, starting at origin pointing +x."""
    radius, maximum_angle, n = 1000.0, np.pi / 50, 40
    ang = np.linspace(0, abs(maximum_angle), n)
    points = np.stack([np.cos(ang), np.sin(ang)], axis=1)
    points -= np.array([1.0, 0.0])
    points *= radius
    c, s = np.cos(-np.pi / 2), np.sin(-np.pi / 2)
    points = points @ np.array([[c, -s], [s, c]]).T
    points[:, 1] *= np.sign(maximum_angle)
    return points.astype(np.float32)


ALMOST_STRAIGHT_PATH = _almost_straight_path()  # (40, 2)


def _shift_left(arr: Array, k: Array, fill: float = 0.0) -> Array:
    """arr[i] <- arr[i + k] with fill after the end (drop first k rows)."""
    return gl.shift_left(arr, k, fill)


def _fit_and_densify(
    cfg: PlannerConfig, points: Array, mask: Array, smoothing: float,
    n_samples: int | None = None,
) -> tuple[Array, Array, Array, Array]:
    """Spline fit + 0.1 m dense evaluation -> (dense (D,2), n_valid, ok,
    budget_hit)."""
    d = n_samples if n_samples is not None else cfg.shapes.dense_samples
    fit = fpk.fitpack_fit(points, mask, smoothing)
    vals, _, valid = fpk.fitpack_eval_every(fit, cfg.path.predict_every, d)
    return vals, jnp.sum(valid), fit.ok, fit.budget_hit


def trivial_path(position: Array, direction: Array) -> tuple[Array, Array]:
    """Reference calculate_trivial_path (core_calculate_path.py:127-134):
    the almost-straight chord (minus its first point) rotated to the car
    frame. Returns ((39, 2) points, mask)."""
    origin = jnp.asarray(ALMOST_STRAIGHT_PATH[1:])
    yaw = geo.angle_from_2d_vector(direction)
    pts = geo.rotate(origin, yaw) + position
    return pts, jnp.ones(pts.shape[0], bool)


# ---------------------------------------------------------------------------
# centerline selection (run_path_calculation branches, :514-549)
# ---------------------------------------------------------------------------


def _global_path_centerline(
    cfg: PlannerConfig, gp: GlobalPathBuffer, position: Array
) -> tuple[Array, Array]:
    """Roll the global path so the closest point sits at len//3, keep points
    within 30 m (core_calculate_path.py:516-529). Returns (CL, 2) + mask."""
    cl = cfg.shapes.global_window
    g = gp.points.shape[0]
    in_path = jnp.arange(g) < gp.n_valid
    dist = jnp.where(in_path, jnp.linalg.norm(gp.points - position, axis=1), jnp.inf)
    idx_closest = jnp.argmin(dist)
    n = jnp.maximum(gp.n_valid, 1)
    # rolled[i] = original[(i + s) mod n] for the valid prefix of length n,
    # built from two circular rolls of the full buffer (contiguous slices,
    # no gather): the second roll supplies the slots that wrap past n.
    s = jnp.mod(idx_closest - n // 3, n)
    pts_z = jnp.where(in_path[:, None], gp.points, 0.0)
    r1 = gl.circular_roll(pts_z, s)  # a[(i + s) mod g] — correct for i < n - s
    r2 = gl.circular_roll(pts_z, g - n + s)  # a[(i + s - n) mod g] — for i >= n - s
    rolled = jnp.where((jnp.arange(g) < n - s)[:, None], r1, r2)
    keep = (jnp.arange(g) < gp.n_valid) & (
        jnp.linalg.norm(rolled - position, axis=1) < 30.0
    )
    order, valid = geo.stable_compact(keep, cl)
    return gl.take_rows(rolled, order), valid


def _matches_centerline(
    cfg: PlannerConfig, inp: PathInput, prev_xy: Array, cl: int
) -> tuple[Array, Array]:
    """Midpoints of matched cone pairs of the better side
    (select_side_to_use + calculate_centerline_points_of_matches,
    core_calculate_path.py:151-205), previous path if < 2 matches."""

    def side_score(matches: Array, mask: Array) -> tuple[Array, Array]:
        has = (matches != -1) & mask
        return jnp.sum(has), jnp.sum(jnp.where(has, matches, 0))

    n_l, sum_l = side_score(inp.left_to_right, inp.left_mask)
    n_r, sum_r = side_score(inp.right_to_left, inp.right_mask)
    # max([LEFT, RIGHT], key=score): LEFT wins ties (core_calculate_path.py:168)
    use_left = (n_l > n_r) | ((n_l == n_r) & (sum_l >= sum_r))

    side = jnp.where(use_left, inp.left_cones, inp.right_cones)
    side_mask = jnp.where(use_left, inp.left_mask, inp.right_mask)
    matches = jnp.where(use_left, inp.left_to_right, inp.right_to_left)
    other = jnp.where(use_left, inp.right_cones, inp.left_cones)

    matched = (matches != -1) & side_mask
    partner = gl.take_rows(other, matches)  # -1 -> zero row, masked below
    centers = (side + partner) / 2.0

    order, valid = geo.stable_compact(matched, cl)
    centers_c = gl.take_rows(centers, order)

    # < 2 matched centers -> previous path points (:201-205)
    too_few = jnp.sum(matched) < 2
    h = prev_xy.shape[0]
    prev_padded = jnp.zeros((cl, 2), centers.dtype).at[:h].set(prev_xy)
    prev_valid = jnp.arange(cl) < h
    pts = jnp.where(too_few, prev_padded, jnp.where(valid[:, None], centers_c, 0.0))
    mask = jnp.where(too_few, prev_valid, valid)
    return pts, mask


# ---------------------------------------------------------------------------
# MPC post-chain (create_path_for_mpc_from_path_update, :336-378)
# ---------------------------------------------------------------------------


def _connect_path_to_car(
    path: Array, n_valid: Array, position: Array, direction: Array
) -> tuple[Array, Array]:
    """Prepend a point just in front of the car when the path starts ahead
    (core_calculate_path.py:430-457)."""
    first = path[0]
    car_to_first = first - position
    dist = jnp.linalg.norm(car_to_first)
    ang = geo.vec_angle_between(car_to_first, direction)
    skip = (dist < 0.5) | (ang > jnp.pi / 2)

    new_point = position + geo.normalize_last_axis(car_to_first[None])[0] * 0.2
    shifted = jnp.roll(path, 1, axis=0).at[0].set(new_point)
    d = path.shape[0]
    path_out = jnp.where(skip, path, shifted)
    n_out = jnp.where(skip, n_valid, jnp.minimum(n_valid + 1, d))
    return path_out, n_out


def _extend_path(
    path: Array, n_valid: Array, position: Array, direction: Array, mpc_path_length: float
) -> tuple[Array, Array]:
    """Append a circular arc (or straight ray) when the in-front path is
    shorter than the MPC horizon (core_calculate_path.py:261-334)."""
    d = path.shape[0]
    iota = jnp.arange(d)
    valid = iota < n_valid

    in_front_raw = jnp.sum((path - position) * direction, axis=1) > 0
    in_front = jax.lax.cummax((in_front_raw & valid).astype(jnp.int32)) > 0
    in_front = in_front | (iota >= n_valid - 20)
    in_front = in_front & valid

    seg_valid = in_front[1:] & in_front[:-1]
    seg_len = jnp.where(seg_valid, geo.trace_distance_to_next(path), 0.0)
    front_length = jnp.sum(seg_len)

    needs_ext = front_length <= mpc_path_length

    # last 20 valid points (contiguous dynamic window; negative slots zeroed
    # and masked)
    last_idx = jnp.maximum(n_valid - 1, 0)
    rel_raw = n_valid - 20 + jnp.arange(20)
    rel_mask = rel_raw >= 0
    relevant = gl.window(path, n_valid - 20, 20)
    circ = geo.circle_fit(relevant, rel_mask)
    center, radius = circ[:2], circ[2]
    radius_to_use = jnp.clip(radius, 10.0, 100.0)

    rel_centered = relevant - center
    count = jnp.sum(rel_mask)
    first_off = jnp.argmax(rel_mask)
    three = gl.take_rows(
        rel_centered,
        jnp.clip(
            jnp.stack([first_off, first_off + count // 2, first_off + count - 1]), 0, 19
        ),
    )
    det = (three[1, 0] - three[0, 0]) * (three[2, 1] - three[0, 1]) - (
        three[1, 1] - three[0, 1]
    ) * (three[2, 0] - three[0, 0])
    orientation_sign = jnp.sign(det)

    start_angle = geo.angle_from_2d_vector(three[0])
    end_angle = start_angle + orientation_sign * jnp.pi
    arc_angles = jnp.linspace(start_angle, end_angle, 50)
    arc_raw = geo.unit_2d_vector_from_angle(arc_angles) * radius_to_use
    tail2 = gl.take_rows(path, jnp.stack([last_idx, jnp.maximum(n_valid - 2, 0)]))
    last_point, second_last = tail2[0], tail2[1]
    arc_pts = (arc_raw - arc_raw[0] + last_point)[1:]  # 49 points

    ray_dir = geo.normalize_last_axis((last_point - second_last)[None])[0]
    ray_pts = last_point + ray_dir * jnp.arange(1, 30, dtype=path.dtype)[:, None]  # 29

    use_arc = radius_to_use < 80.0
    n_ext = jnp.where(use_arc, 49, 29)
    ext = jnp.where(use_arc, arc_pts, jnp.zeros_like(arc_pts).at[:29].set(ray_pts))

    # write the extension after n_valid: align it with a contiguous dynamic
    # shift and select (scatters hit the TPU slow path)
    ext_full = jnp.zeros((d, 2), path.dtype).at[:49].set(ext)
    ext_shifted = gl.shift_right(ext_full, n_valid)  # row i = ext[i - n_valid]
    row = jnp.arange(d)
    can_write = (row >= n_valid) & (row < n_valid + n_ext) & needs_ext
    path_out = jnp.where(can_write[:, None], ext_shifted, path)
    n_out = jnp.where(needs_ext, jnp.minimum(n_valid + n_ext, d), n_valid)
    return path_out, n_out


def _remove_path_behind_car(
    path: Array, n_valid: Array, position: Array
) -> tuple[Array, Array]:
    """Drop everything before the closest point to the car (:459-465)."""
    valid = jnp.arange(path.shape[0]) < n_valid
    dist = jnp.linalg.norm(path - position, axis=1)
    idx = geo.masked_argmin(dist, valid)
    return _shift_left(path, idx), n_valid - idx


def _trim_to_mpc_length(
    path: Array, n_valid: Array, mpc_path_length: float
) -> tuple[Array, Array, Array]:
    """Truncate at the first point whose cumulative distance exceeds the MPC
    length (:467-499). Returns (path, n_out, ok)."""
    d = path.shape[0]
    seg_valid = (jnp.arange(1, d) < n_valid)
    seg = jnp.where(seg_valid, geo.trace_distance_to_next(path), 0.0)
    cum = jnp.cumsum(seg)
    over = (cum > mpc_path_length) & seg_valid
    any_over = jnp.any(over)
    # argmax over cum: reference keeps path[:first_over] (point count first_over)
    first_over = jnp.argmax(over)
    n_keep = jnp.where(any_over, first_over, n_valid)
    ok = n_valid > 2  # reference: len(mask) <= 1 -> previous path
    return path, jnp.minimum(n_keep, n_valid), ok


# ---------------------------------------------------------------------------
# parameterization (path_parameterization.py:111-328)
# ---------------------------------------------------------------------------


def _parameterize_path(
    cfg: PlannerConfig, path: Array, n_valid: Array
) -> tuple[Array, Array]:
    """Refit with light smoothing, curvature via windowed circle fit, sample
    the MPC horizon -> ((H, 4) [theta, x, y, curvature], ok, budget_hit)."""
    d = path.shape[0]
    horizon = cfg.path.mpc_prediction_horizon
    valid = jnp.arange(d) < n_valid

    seg_valid = (jnp.arange(1, d) < n_valid)
    seg = jnp.where(seg_valid, geo.trace_distance_to_next(path), 0.0)
    path_length = jnp.sum(seg)
    first10 = jnp.minimum(jnp.maximum(jnp.sum(seg_valid), 1), 10)
    mean_point_distance = jnp.sum(jnp.where(jnp.arange(d - 1) < first10, seg, 0.0)) / first10

    predict_every = path_length / horizon / 3.0
    skip_f = predict_every / jnp.maximum(mean_point_distance, 1e-9)
    skip = jnp.maximum(jnp.where(jnp.isfinite(skip_f), skip_f.astype(jnp.int32), 1), 1)

    # path[::skip] (path_parameterization.py:152) — strided dynamic lookup as
    # a one-hot contraction (out-of-range rows come back zero, masked below).
    # Static sub-budgets: the input is post-trim (<= mpc_path_length / 0.1
    # ~= 211 valid points, or ~127 for the skip>1 initial-path case), so the
    # strided table fits 256 slots; the refit eval emits <= horizon*3 + 1
    # ~= 121 samples, so 192 slots cover it. Shrinking these cuts the
    # (P, d) one-hot and the per-iteration FITPACK work ~2-4x vs using the
    # full dense budget d.
    p_fit = min(256, d)
    p_eval = min(192, d)
    take = jnp.arange(p_fit) * skip
    skipped_valid = take < n_valid
    skipped = gl.take_rows(path, take)

    fit = fpk.fitpack_fit(skipped, skipped_valid, cfg.path.refit_smoothing)
    pts, u_grid, pts_valid = fpk.fitpack_eval_every(fit, predict_every, p_eval)
    n_pts = jnp.sum(pts_valid)

    window = jnp.minimum(n_pts // 5, 30)
    window = window + (window % 2 == 0)
    curv = path_curvature(
        pts,
        n_pts,
        window,
        cfg.shapes.curvature_window,
        cfg.path.curvature_radius_min,
        cfg.path.curvature_radius_max,
    )
    filt_size = jnp.maximum(2, window // 2)
    curv_f = uniform_filter1d_nearest(curv, n_pts, filt_size, cfg.shapes.curvature_window)

    # linspace(0, n-1, horizon) int truncation (path_parameterization.py:277-282)
    lin = jnp.arange(horizon, dtype=jnp.float32) * (
        jnp.maximum(n_pts - 1, 0).astype(jnp.float32) / (horizon - 1)
    )
    indices = jnp.clip(lin.astype(jnp.int32), 0, p_eval - 1)
    ok = (n_pts >= horizon) & fit.ok  # duplicates -> ValueError -> fallback

    pts_h = gl.take_rows(pts, indices)  # (H, 2)
    out = jnp.stack(
        [
            gl.take_vec(u_grid, indices),
            pts_h[:, 0],
            pts_h[:, 1],
            gl.take_vec(curv_f, indices),
        ],
        axis=1,
    )
    return out, ok, fit.budget_hit


def parameterize_trace(cfg: PlannerConfig, points: Array, mask: Array) -> Array:
    """Parameterize an arbitrary masked trace (used for the initial path,
    reference core_calculate_path.py:103-121).

    The internal refit reads at most 256 strided samples (p_fit in
    _parameterize_path); run_path_calculation's post-trim input always fits,
    but an arbitrary >256-point trace whose spacing makes skip == 1 would
    silently drop its tail from the refit — rejected here at trace time
    (round-4 advisor)."""
    d = cfg.shapes.dense_samples
    n = points.shape[0]
    if n > 256:
        raise ValueError(
            f"parameterize_trace supports at most 256 input points (got {n}): "
            "the refit's strided sample table holds 256 slots and skip can "
            "be 1 for densely spaced traces; downsample the trace first"
        )
    buf = jnp.zeros((d, 2), points.dtype).at[:n].set(points)
    n_valid = jnp.sum(mask)
    out, _, _ = _parameterize_path(cfg, buf, n_valid)
    return out


# ---------------------------------------------------------------------------
# stage entry
# ---------------------------------------------------------------------------


class PathOutput(NamedTuple):
    path: Array  # (H, 4)
    centerline: Array  # (CL, 2) aux: center_along_match_connection
    centerline_mask: Array  # (CL,)
    state: PathState
    ok: Array  # () bool: False = this frame fell back to the previous path
    too_far: Array  # () bool: path overwritten for being > max dist from car
    # any of the frame's FITPACK fits exited part 1 on the knot/iteration
    # budget instead of fp <= s acceptance (graceful-degradation regime;
    # advisor round 4: surface cap hits so regressions show in replay)
    spline_budget_hit: Array  # () bool


def run_path_calculation(
    cfg: PlannerConfig,
    inp: PathInput,
    gp: GlobalPathBuffer,
    state: PathState,
) -> PathOutput:
    """Full stage (reference run_path_calculation, core_calculate_path.py:514-575)."""
    d = cfg.shapes.dense_samples
    prev_xy = state.prev_path[:, 1:3]

    # ---- centerline selection
    n_l = jnp.sum(inp.left_mask)
    n_r = jnp.sum(inp.right_mask)

    # static specialization: without global-path support the centerline is
    # matches midpoints or the 40-point previous path — a 64-slot buffer
    # instead of the global_window-sized one (the fit cost scales with it)
    use_gp = cfg.supports_global_path
    cl = cfg.shapes.global_window if use_gp else 64
    match_pts, match_mask = _matches_centerline(cfg, inp, prev_xy, cl)

    prev_padded = jnp.zeros((cl, 2), match_pts.dtype).at[: prev_xy.shape[0]].set(prev_xy)
    prev_mask = jnp.arange(cl) < prev_xy.shape[0]

    too_few_cones = (n_l < 3) & (n_r < 3)
    camc_pts = jnp.where(too_few_cones, prev_padded, match_pts)
    camc_mask = jnp.where(too_few_cones, prev_mask, match_mask)
    if use_gp:
        global_pts, global_mask = _global_path_centerline(cfg, gp, inp.position)
        camc_pts = jnp.where(gp.active, global_pts, camc_pts)
        camc_mask = jnp.where(gp.active, global_mask, camc_mask)
    camc_pts = jnp.where(camc_mask[:, None], camc_pts, 0.0)

    # ---- fit + densify (fit_matches_as_spline, with skidpad override)
    new_index_along_path = state.index_along_path
    if cfg.mission.name == "skidpad":
        dense, n_dense, _, new_index_along_path = _skidpad_path_update(
            cfg, gp, state, inp.position, inp.direction
        )
        cl_budget = jnp.asarray(False)
    else:
        # splprep failure -> fit previous path instead (:207-223). The
        # failure condition (duplicate consecutive points / too few points)
        # is known from the chord parameterization BEFORE solving, so the
        # fallback is an input select rather than a second spline fit.
        _, _, camc_fit_ok = sp.chord_lengths(camc_pts, camc_mask)
        prev_pts = jnp.zeros((cl, 2), camc_pts.dtype).at[: prev_xy.shape[0]].set(prev_xy)
        prev_m = jnp.arange(cl) < prev_xy.shape[0]
        fit_pts = jnp.where(camc_fit_ok, camc_pts, prev_pts)
        fit_mask = jnp.where(camc_fit_ok, camc_mask, prev_m)
        dense, n_dense, _, cl_budget = _fit_and_densify(
            cfg, fit_pts, fit_mask, cfg.path.smoothing
        )

    # ---- overwrite if too far from the car (:225-237) -> raw previous points
    dense_valid = jnp.arange(d) < n_dense
    min_dist = jnp.min(
        jnp.where(dense_valid, jnp.linalg.norm(dense - inp.position, axis=1), jnp.inf)
    )
    too_far = min_dist > cfg.path.maximal_distance_for_valid_path
    h = prev_xy.shape[0]
    prev_as_dense = jnp.zeros((d, 2), dense.dtype).at[:h].set(prev_xy)
    dense = jnp.where(too_far, prev_as_dense, dense)
    n_dense = jnp.where(too_far, h, n_dense)

    # ---- MPC chain (:336-378)
    # early behind-car trim, global-path branch ONLY: that branch can fill
    # the whole dense buffer (car sits at 1/3 of a 60 m window), leaving no
    # room for the connect/extend steps; there the trim is semantics-
    # preserving because the car is ON the path. In the matches/fallback
    # branch the reference trims only AFTER connect_path_to_car — when the
    # previous path lies far away (total sorting failure), the closest
    # sample is the car-adjacent prepended point and nothing is removed,
    # while an early trim would cut the path body and change the output.
    if use_gp:
        dense_t, n_dense_t = _remove_path_behind_car(dense, n_dense, inp.position)
        dense = jnp.where(gp.active, dense_t, dense)
        n_dense = jnp.where(gp.active, n_dense_t, n_dense)

    p1, n1 = _connect_path_to_car(dense, n_dense, inp.position, inp.direction)
    p2, n2 = _extend_path(p1, n1, inp.position, inp.direction, cfg.path.mpc_path_length)
    p3, n3 = _remove_path_behind_car(p2, n2, inp.position)

    refit = fpk.fitpack_fit(p3, jnp.arange(d) < n3, cfg.path.smoothing)
    p4, _, v4 = fpk.fitpack_eval_every(
        refit, cfg.path.predict_every, d, max_u=cfg.path.mpc_path_length * 1.5
    )
    n4 = jnp.sum(v4)

    p5, n5, trim_ok = _trim_to_mpc_length(p4, n4, cfg.path.mpc_path_length)

    out, param_ok, param_budget = _parameterize_path(cfg, p5, n5)

    ok = refit.ok & trim_ok & param_ok
    final = jnp.where(ok, out, state.prev_path)

    new_state = PathState(prev_path=final, index_along_path=new_index_along_path)
    return PathOutput(
        path=final, centerline=camc_pts, centerline_mask=camc_mask, state=new_state,
        ok=ok, too_far=too_far,
        spline_budget_hit=cl_budget | refit.budget_hit | param_budget,
    )


def _skidpad_path_update(
    cfg: PlannerConfig,
    gp: GlobalPathBuffer,
    state: PathState,
    position: Array,
    direction: Array,
) -> tuple[Array, Array, Array, Array]:
    """Skidpad override of fit_matches_as_spline
    (skidpad_calculate_path.py:49-71): windowed nearest-point tracking along
    the fixed global path; pre-relocalization falls back to the trivial path.

    Returns (dense (D,2), n_valid, ok, new_index_along_path).
    """
    d = cfg.shapes.dense_samples
    g = gp.points.shape[0]

    seg = geo.trace_distance_to_next(gp.points[:10])
    mean_distance = jnp.maximum(jnp.mean(seg), 1e-6)
    max_change = (20.0 / mean_distance).astype(jnp.int32)

    min_index = jnp.maximum(state.index_along_path - max_change, 0)
    max_index = jnp.minimum(state.index_along_path + max_change, gp.n_valid)

    iota = jnp.arange(g)
    in_window = (iota >= min_index) & (iota < max_index)
    costs = jnp.where(in_window, jnp.linalg.norm(gp.points - position, axis=1), jnp.inf)
    index_to_use = jnp.argmin(costs)
    final_index = index_to_use + (25.0 / mean_distance).astype(jnp.int32)

    take = index_to_use + jnp.arange(d)
    track_valid = (take < final_index) & (take < gp.n_valid)
    tracked = gl.window(gp.points, index_to_use, d)  # contiguous, no gather

    # pre-relocalization: trivial straight path from the car (:54-55)
    triv, triv_mask = trivial_path(position, direction)
    triv_dense = jnp.zeros((d, 2), tracked.dtype).at[: triv.shape[0]].set(triv)
    triv_valid = jnp.arange(d) < triv.shape[0]

    dense = jnp.where(gp.active, jnp.where(track_valid[:, None], tracked, 0.0), triv_dense)
    n_dense = jnp.where(gp.active, jnp.sum(track_valid), jnp.sum(triv_valid))
    new_index = jnp.where(gp.active, index_to_use, state.index_along_path)
    return dense, n_dense, jnp.asarray(True), new_index


def initial_path_state(cfg: PlannerConfig) -> PathState:
    """Reference CalculatePath.__init__ (:103-121): previous path seeded with
    the spline-fitted almost-straight chord, parameterized."""
    base = jnp.asarray(ALMOST_STRAIGHT_PATH)
    cl = cfg.shapes.global_window
    pts = jnp.zeros((cl, 2), jnp.float32).at[:40].set(base)
    mask = jnp.arange(cl) < 40
    # the almost-straight chord is ~63 m long: use a larger one-off dense
    # budget here so the initial path spans the same length as the reference
    dense, n_dense, _, _ = _fit_and_densify(
        cfg, pts, mask, cfg.path.smoothing, n_samples=768
    )
    out, _, _ = _parameterize_path(cfg, dense, n_dense)
    return PathState(prev_path=out, index_along_path=jnp.asarray(0, jnp.int32))
