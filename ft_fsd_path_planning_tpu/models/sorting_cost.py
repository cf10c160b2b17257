"""Config cost function — all 7 terms of the reference, vectorized over a pool.

Re-design of `sorting_cones/trace_sorter/cost_function.py:23-305`,
`cone_distance_cost.py:14-32` and the Numba nearby-cone search
(`nearby_cone_search.py:40-367`): per-config Python loops and dict-memoized
angle checks become dense masked (C, L, N) tensor programs — on TPU,
recomputation beats memoization.

Gather-free: on this TPU target a general `gather` HLO lowers to a slow
scalar-core loop, so the config points are materialized ONCE via a one-hot
contraction (`ops/gatherless.py`) and threaded through every term; per-slot
neighbor lookups become axis shifts, and the (C, L, N) distance gate becomes
a one-hot matmul against the pairwise `within` matrix.

Configs are (C, L) int32 index tensors padded with -1; `valid` marks live pool
slots. Points are the flattened (N, 3) cone tensor of the frame.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import SortingConfig
from ft_fsd_path_planning_tpu.ops import gatherless as gl
from ft_fsd_path_planning_tpu.ops import geometry as geo
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes

Array = jax.Array

# cost term weights (cost_function.py:283-284)
# normalized on host: import-time device calls would initialize the XLA
# backend before jax.distributed.initialize can run in multi-host programs
_WEIGHTS_RAW = np.asarray([1000.0, 200.0, 5000.0, 1000.0, 0.0, 1000.0, 1000.0], np.float32)
_WEIGHTS = _WEIGHTS_RAW / _WEIGHTS_RAW.sum()


def config_points(points_xy: Array, configs: Array) -> Array:
    """(C, L, 2) config positions; padded (-1) slots become zero rows.

    Every consumer masks padded slots through `configs != -1`, so zero rows
    (vs the old clip-to-index-0 rows) never reach an unmasked term.
    """
    return gl.take_rows(points_xy, configs)


def angle_cost(pts: Array, configs: Array) -> Array:
    """Normalized inverted cone-to-cone angles x (1 + #angles under 40 deg)
    (cost_function.py:41-79)."""
    # reference all_to_next[i] = p[c_i] - p[c_{i+1}], masked slots -> (100, 100)
    to_next = pts[:, :-1, :] - pts[:, 1:, :]
    overwrite = (configs == -1)[:, 1:]
    to_next = jnp.where(overwrite[..., None], 100.0, to_next)

    mid_to_next = to_next[:, 1:, :]
    mid_to_prev = -to_next[:, :-1, :]
    angles = geo.vec_angle_between(mid_to_next, mid_to_prev)  # (C, L-2)

    is_part = (configs != -1)[:, 2:]
    cost_raw = (jnp.pi - angles) / jnp.pi * is_part
    under = (angles < jnp.deg2rad(40.0)) & is_part
    factors = jnp.sum(under, axis=-1) + 1
    denom = jnp.maximum(jnp.sum(is_part, axis=-1), 1)
    return jnp.sum(cost_raw, axis=-1) / denom * factors


def residual_distance_cost(pts: Array, configs: Array, threshold: float) -> Array:
    """Sum of segment lengths above the threshold (cone_distance_cost.py:14-32)."""
    d = geo.trace_distance_to_next(pts)
    seg_ok = (configs != -1)[:, 1:]
    d = d * seg_ok
    return jnp.sum(jnp.maximum(0.0, d - threshold), axis=-1)


def n_cones_cost(configs: Array) -> Array:
    n = jnp.maximum(jnp.sum(configs != -1, axis=-1), 1)
    return 1.0 / n


def initial_direction_cost(pts: Array, configs: Array, car_dir: Array) -> Array:
    first_seg = pts[:, 1, :] - pts[:, 0, :]
    return geo.vec_angle_between(first_seg, car_dir)


def _segment_angle_differences(pts: Array, configs: Array) -> tuple[Array, Array]:
    """angle_difference(angle[i], angle[i+1]) per consecutive segment pair
    (order matters: prev minus next), plus a per-difference validity mask."""
    d = jnp.diff(pts, axis=1)  # (C, L-1, 2)
    ang = jnp.arctan2(d[..., 1], d[..., 0])
    diff = geo.angle_difference(ang[:, :-1], ang[:, 1:])  # (C, L-2)
    valid = (configs != -1)[:, 2:]
    return diff, valid


def change_of_direction_cost(pts: Array, configs: Array) -> Array:
    """Zero-crossing cost (cost_function.py:107-146). Weight is 0 in the
    reference; kept for per-term parity / diagnostics."""
    diff, valid = _segment_angle_differences(pts, configs)
    pair_valid = valid[:, 1:] & valid[:, :-1]
    crossing = (jnp.sign(diff[:, :-1]) != jnp.sign(diff[:, 1:])) & pair_valid
    raw = jnp.abs(diff[:, :-1] - diff[:, 1:])
    out = jnp.sum(raw * crossing, axis=-1)
    n = jnp.sum(configs != -1, axis=-1)
    return jnp.where(n <= 3, 0.0, out)


def wrong_direction_cost(pts: Array, configs: Array, cone_type: int) -> Array:
    """|sum of over-threshold wrong-direction angle changes|
    (cost_function.py:149-188)."""
    diff, valid = _segment_angle_differences(pts, configs)
    unwanted_sign = jnp.where(cone_type == ConeTypes.LEFT, 1.0, -1.0)
    mask = (jnp.sign(diff) == unwanted_sign) & (jnp.abs(diff) > jnp.deg2rad(40.0)) & valid
    total = jnp.sum(jnp.where(mask, diff, 0.0), axis=-1)
    n = jnp.sum(configs != -1, axis=-1)
    return jnp.where(n <= 3, 0.0, jnp.abs(total))


def _config_search_directions(pts: Array, configs: Array, cone_type: int) -> Array:
    """Search direction at each config position: normal of the prev->next
    chord (match_directions.py:7-21 via nearby_cone_search.py:59-85).
    Endpoints use one-sided chords. Returns (C, L, 2).

    The prev/next lookups are pure axis shifts — position j reads j-1 / j+1 —
    so no gathers are needed; padded positions produce garbage directions that
    every consumer masks via `configs != -1`.
    """
    c, l = configs.shape
    lengths = jnp.sum(configs != -1, axis=-1)  # (C,)
    pos = jnp.arange(l)

    prev = jnp.concatenate([pts[:, :1], pts[:, :-1]], axis=1)  # pts[j-1]
    nxt = jnp.concatenate([pts[:, 1:], pts[:, -1:]], axis=1)  # pts[j+1]
    is_first = (pos == 0)[None, :, None]
    is_last = (pos[None, :] == lengths[:, None] - 1)[..., None]
    # interior: p[j+1]-p[j-1]; first: p[1]-p[0]; last: p[len-1]-p[len-2]
    chord = jnp.where(is_first, nxt - pts, jnp.where(is_last, pts - prev, nxt - prev))
    # rotate +pi/2 (RIGHT): (x,y)->(-y,x); -pi/2 (LEFT): (x,y)->(y,-x)
    sign = jnp.where(cone_type == ConeTypes.RIGHT, 1.0, -1.0)
    rotated = jnp.stack([-sign * chord[..., 1], sign * chord[..., 0]], axis=-1)
    return geo.normalize_last_axis(rotated)


def cones_on_side_cost(
    points: Array,
    points_mask: Array,
    pts: Array,
    configs: Array,
    valid: Array,
    cone_type: int,
    cfg: SortingConfig,
) -> Array:
    """1 / (n_good - n_bad + |min| + 1) visibility cost
    (cost_function.py:191-210, nearby_cone_search.py:213-297).

    The candidate set per config mirrors the reference exactly: cones within
    the search distance of any pooled-config cone but in no pooled config
    ("close"), plus cones used by *other* pooled configs ("extra"); then per
    position the <6 m distance gate and the +-60 deg angle gates around the
    search direction.
    """
    n = points.shape[0]
    c, l = configs.shape
    points_xy = points[:, :2]

    cfg_onehot = (configs[..., None] == jnp.arange(n)) & valid[:, None, None]  # (C,L,N)
    in_config = jnp.any(cfg_onehot, axis=1)  # (C, N)
    in_any = jnp.any(in_config, axis=0)  # (N,)

    d2 = geo.cdist_sq(points_xy, points_xy)
    d2 = d2 + jnp.where(jnp.eye(n, dtype=bool), 1e6, 0.0)
    within = d2 < cfg.side_search_distance**2  # (N, N)

    near_any_config_cone = jnp.any(within & in_any[:, None] & points_mask[:, None], axis=0)
    close = near_any_config_cone & ~in_any & points_mask  # (N,)
    extra = in_any[None, :] & ~in_config  # (C, N)
    candidate = close[None, :] | extra  # (C, N)

    dirs = _config_search_directions(pts, configs, cone_type)  # (C, L, 2)
    vec = points_xy[None, None, :, :] - pts[:, :, None, :]  # (C, L, N, 2)

    # angle(vec, ±dir) < half  <=>  ±dot(vec, dir) > cos(half)·|vec|
    # (dirs are unit vectors) — no arccos on the (C, L, N) tensor
    half_cos = jnp.cos(cfg.side_search_angle / 2.0)
    vec_norm = jnp.linalg.norm(vec, axis=-1)
    dots = jnp.sum(vec * dirs[:, :, None, :], axis=-1)
    good_angle = dots > half_cos * vec_norm
    bad_angle = -dots > half_cos * vec_norm

    pos_valid = (configs != -1)[:, :, None]  # (C, L, 1)
    # within[configs] as a one-hot contraction (gathers hit the slow path)
    dist_gate = (
        jnp.einsum(
            "cln,nm->clm",
            (configs[..., None] == jnp.arange(n)).astype(jnp.float32),
            within.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        > 0.5
    )  # (C, L, N)

    base = candidate[:, None, :] & dist_gate & pos_valid
    n_good = jnp.sum(base & good_angle, axis=(1, 2))
    n_bad = jnp.sum(base & bad_angle, axis=(1, 2))

    diff = (n_good - n_bad).astype(jnp.float32)
    pool_min = jnp.min(jnp.where(valid, diff, jnp.inf))
    pool_min = jnp.where(jnp.isfinite(pool_min), pool_min, 0.0)
    diff = diff + jnp.abs(pool_min) + 1.0
    return 1.0 / diff


def cost_configurations(
    points: Array,
    points_mask: Array,
    configs: Array,
    valid: Array,
    cone_type: int,
    car_position: Array,
    car_direction: Array,
    cfg: SortingConfig,
    return_individual: bool = False,
) -> Array:
    """Total weighted cost per pooled config (cost_function.py:213-305).
    Invalid pool slots get +inf."""
    points_xy = points[:, :2]
    pts = config_points(points_xy, configs)  # the ONE config-point lookup
    terms = jnp.stack(
        [
            angle_cost(pts, configs),
            residual_distance_cost(pts, configs, cfg.distance_cost_threshold),
            n_cones_cost(configs),
            initial_direction_cost(pts, configs, car_direction),
            change_of_direction_cost(pts, configs),
            cones_on_side_cost(points, points_mask, pts, configs, valid, cone_type, cfg),
            wrong_direction_cost(pts, configs, cone_type),
        ],
        axis=-1,
    )  # (C, 7)
    weighted = terms * _WEIGHTS
    if return_individual:
        return weighted
    total = jnp.sum(weighted, axis=-1)
    return jnp.where(valid, total, jnp.inf)
