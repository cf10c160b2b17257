"""Cone sorting — fixed-width beam search over masked cone adjacency.

TPU-native re-design of the reference trace sorter
(`sorting_cones/trace_sorter/*`): the exhaustive iterative-stack DFS
(`end_configurations.py:320-431`) becomes a K-wide beam search — L-1 steps,
each scoring all (K, N) candidate extensions with the reference's pruning
gates expressed as boolean masks, ranking the surviving children with an
incrementally-maintained partial cost, and keeping the best K. Finished
branches (no valid extension) stay in the pool as leaf candidates, exactly
like the DFS's end-configurations. The final winner is chosen by the full
7-term cost (`sorting_cost.py`).

Hash-memoized adjacency (adjacency_matrix.py:21-57) and result caches are
dropped: recomputation is the TPU idiom — one batched matmul beats a cache.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import PlannerConfig, SortingConfig
from ft_fsd_path_planning_tpu.models import sorting_cost
from ft_fsd_path_planning_tpu.ops import gatherless as gl
from ft_fsd_path_planning_tpu.ops import geometry as geo
from ft_fsd_path_planning_tpu.ops.pallas import beam_search as bs
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes

Array = jax.Array

_INF = jnp.inf


import os


def _use_fused_beam() -> bool:
    """Opt-in switch for the fused Pallas search kernel
    (ops/pallas/beam_search.py, FT_FSD_FUSED_BEAM=1).

    Measured on the attached v5e (round 3): the kernel produces bit-identical
    outputs to the XLA scan at the same runtime (18.4 vs 17.9 ms for the
    batch-256 sorting stage) — the search is bound by its vector-op count,
    which the lane-batched kernel reproduces rather than reduces, while
    compiling 10x slower (Mosaic unrolls the whole loop). Re-measured in
    round 5 after the op-stream thinning (flat lanes, argmin-extract,
    select-scatter): the XLA scan pulled decisively ahead — full batch-256
    step 10.3 ms vs 20.7 ms with the kernel enabled — so the scan stays the
    default; the kernel remains exercised by exact-equivalence tests as a
    record of the layout-level alternative."""
    return os.environ.get("FT_FSD_FUSED_BEAM", "") == "1" and (
        jax.default_backend() != "cpu"
    )


def _invert(cone_type: Array) -> Array:
    """LEFT (2) <-> RIGHT (1); works on traced values."""
    return 3 - cone_type


def _left_sign(cone_type: Array) -> Array:
    """+1 for LEFT, -1 for RIGHT (traced)."""
    return jnp.where(cone_type == ConeTypes.LEFT, 1.0, -1.0)


# ---------------------------------------------------------------------------
# start-cone selection (core_trace_sorter.py:344-465)
# ---------------------------------------------------------------------------


def select_starting_cones(
    cfg: SortingConfig,
    points: Array,
    mask: Array,
    cone_type: int,
    car_position: Array,
    car_direction: Array,
) -> tuple[Array, Array]:
    """Select up to two starting cones: closest valid in front and the cone
    behind, ordered behind->front. Returns (prefix (2,) int32, n_first ())."""
    xy = points[:, :2]
    color = points[:, 2]

    rel = geo.rotate(xy - car_position, -geo.angle_from_2d_vector(car_direction))
    rel_angle = geo.angle_from_2d_vector(rel)
    dist = jnp.linalg.norm(rel, axis=-1)

    in_ellipse = geo.points_inside_ellipse(
        xy, car_position, car_direction,
        cfg.max_dist_to_first * 1.5, cfg.max_dist_to_first / 1.5,
    )
    valid_sign = _left_sign(cone_type)
    sign_ok = jnp.sign(rel_angle) == valid_sign
    angle_ok = (jnp.abs(rel_angle) < jnp.pi - jnp.pi / 5) & (
        jnp.abs(rel_angle) > jnp.pi / 10
    )
    right_color = color == cone_type
    side_ok = (sign_ok & angle_ok) | right_color
    not_opposite = color != _invert(cone_type)
    base = in_ellipse & side_ok & not_opposite & mask

    d1 = jnp.where(base, dist, _INF)
    i1 = jnp.argmin(d1)
    ok1 = jnp.min(d1) <= cfg.max_dist_to_first

    # second cone: behind the car, not the first (core_trace_sorter.py:409-445)
    angle_to_car = geo.vec_angle_between(xy - car_position, car_direction)
    skip = (jnp.abs(angle_to_car) < jnp.pi / 2) | (jnp.arange(xy.shape[0]) == i1)
    d2 = jnp.where(base & ~skip, dist, _INF)
    i2 = jnp.argmin(d2)
    ok2 = jnp.min(d2) <= cfg.max_dist_to_first

    xy12 = gl.take_rows(xy, jnp.stack([i1, i2]))
    cone_dir_1 = xy12[0] - xy12[1]
    a1 = geo.vec_angle_between(cone_dir_1, car_direction)
    a2 = geo.vec_angle_between(-cone_dir_1, car_direction)
    swap = a1 > a2
    j1 = jnp.where(swap, i2, i1)
    j2 = jnp.where(swap, i1, i2)

    dd = jnp.linalg.norm(cone_dir_1)
    pair_ok = ok2 & (dd <= cfg.max_dist * 1.1) & (dd >= 1.4)

    single = jnp.where(ok2, j1, i1)  # post-swap index_1 when a pair was found
    prefix = jnp.where(
        pair_ok,
        jnp.stack([j2, j1]),
        jnp.stack([single, jnp.asarray(-1)]),
    ).astype(jnp.int32)
    n_first = jnp.where(~ok1, 0, jnp.where(pair_ok, 2, 1)).astype(jnp.int32)
    return prefix, n_first


# ---------------------------------------------------------------------------
# adjacency (adjacency_matrix.py:60-128) + reachability (common.py:37-67)
# ---------------------------------------------------------------------------


def build_adjacency(
    cfg: SortingConfig,
    points: Array,
    mask: Array,
    cone_type: int,
    start_idx: Array,
) -> tuple[Array, Array, Array]:
    """Masked k-NN adjacency, symmetrized; returns (adj (N,N) bool,
    node_table (N, 4C) f32, target_length ()).

    The node table packs, per cone, its <=C surviving neighbors as
    [idx | ok | x | y] so the beam step can expand a whole beam front with a
    single one-hot contraction (see ops/gatherless.py) instead of gathers.
    """
    n = points.shape[0]
    c = cfg.max_n_neighbors
    xy = points[:, :2]
    color = points[:, 2]

    d2 = geo.cdist_sq(xy, xy)
    opposite = color == _invert(cone_type)
    bad = (
        opposite[:, None]
        | opposite[None, :]
        | ~mask[:, None]
        | ~mask[None, :]
        | jnp.eye(n, dtype=bool)
    )
    d2 = jnp.where(bad, _INF, d2)

    # k-nearest by k argmin-extract rounds: exact lax.top_k(-d2, k) semantics
    # (argmin breaks value ties at the lowest index, and a just-extracted
    # entry is masked to +inf, strictly above every remaining finite value,
    # so equal-value runs come out in index order like the stable sort) at a
    # fraction of the cost — XLA lowers top_k to a full 128-wide variadic
    # sort, 0.8 ms/step at batch 256 vs ~0.1 for the extraction rounds.
    iota_n = jnp.arange(n)
    cur = d2
    knn_cols = []
    for _ in range(c):
        pick = jnp.argmin(cur, axis=-1)
        knn_cols.append(pick)
        cur = jnp.where(iota_n[None, :] == pick[:, None], jnp.inf, cur)
    knn = jnp.stack(knn_cols, axis=-1)
    # one-hot membership instead of scatter (TPU scatters hit the slow path)
    adj = jnp.any(knn[:, :, None] == jnp.arange(n)[None, None, :], axis=1)
    adj = adj & (d2 <= cfg.max_dist**2)
    adj = adj & adj.T

    # reachable set: <= max_length synchronous propagation rounds suffice to
    # know min(reachable, max_length) exactly
    reach = jnp.arange(n) == start_idx
    for _ in range(cfg.max_length):
        reach = reach | jnp.any(adj & reach[None, :], axis=-1)
    target_length = jnp.minimum(jnp.sum(reach), cfg.max_length)

    # compressed neighbor lists: after AND-symmetrization each node keeps at
    # most max_n_neighbors edges, so the beam search only ever scores
    # (K, max_n_neighbors) candidates instead of (K, N). First-k-set-bits by
    # rank (set bits in index order, then unset bits — exactly
    # lax.top_k(adj.int32, k)'s stable order, without the variadic sort).
    n_set = jnp.sum(adj, axis=-1, dtype=jnp.int32)  # (N,)
    rank_set = jnp.cumsum(adj, axis=-1, dtype=jnp.int32) - 1
    rank_unset = n_set[:, None] + jnp.cumsum(~adj, axis=-1, dtype=jnp.int32) - 1
    slot = jnp.where(adj, rank_set, rank_unset)  # (N, N) slot of column j
    sel = slot[:, :, None] == jnp.arange(c)[None, None, :]  # (N, N, c)
    nb_idx = jnp.sum(
        jnp.where(sel, iota_n[None, :, None], 0), axis=1, dtype=jnp.int32
    )
    neighbor_ok = jnp.arange(c)[None, :] < n_set[:, None]
    nb_pos = gl.take_rows(xy, nb_idx.reshape(-1)).reshape(n, c, 2)
    node_table = jnp.concatenate(
        [
            nb_idx.astype(jnp.float32),
            neighbor_ok.astype(jnp.float32),
            nb_pos[:, :, 0],
            nb_pos[:, :, 1],
        ],
        axis=1,
    )
    return adj, node_table, target_length


# ---------------------------------------------------------------------------
# beam search (replaces end_configurations.py DFS)
# ---------------------------------------------------------------------------


class _BeamState(NamedTuple):
    configs: Array  # (K, L) int32
    lengths: Array  # (K,)
    alive: Array  # (K,) slot holds a config
    done: Array  # (K,) leaf (no valid extension)
    # incremental partial-cost carries
    angle_sum: Array  # (K,) sum of (pi - theta)/pi interior angle costs
    n_under: Array  # (K,) interior angles under 40 deg
    residual: Array  # (K,) sum residual distances
    init_cost: Array  # (K,) initial-direction cost
    wrong_sum: Array  # (K,) signed wrong-direction accumulator
    # carried positional tail — keeps the hot loop free of config gathers
    # (the clip-indexing semantics of the old tail() reads reduce to a pure
    # shift: on extension last'=child, prev'=last, prev2'=prev)
    last_idx: Array  # (K,) int32 cone index of the tail element
    last_pos: Array  # (K, 2)
    prev_pos: Array  # (K, 2)
    prev2_pos: Array  # (K, 2)
    first_pos: Array  # (K, 2)


def _partial_score(cfg: SortingConfig, st: _BeamState) -> Array:
    """Ranking heuristic: the reference cost minus the cones-on-side term,
    computable incrementally (weights cost_function.py:283-284)."""
    n_interior = jnp.maximum(st.lengths - 2, 1)
    angle = st.angle_sum / n_interior * (st.n_under + 1)
    w = sorting_cost._WEIGHTS
    return (
        w[0] * angle
        + w[1] * st.residual
        + w[2] / jnp.maximum(st.lengths, 1)
        + w[3] * st.init_cost
        + w[6] * jnp.abs(st.wrong_sum) * (st.lengths >= 4)
    )


def _cross2(a: Array, b: Array) -> Array:
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def _extension_gates(
    cfg: SortingConfig,
    cand: Array,
    cand_idx: Array,
    can0: Array,
    st: _BeamState,
    cone_type: int,
    car_position: Array,
    car_direction: Array,
) -> tuple[Array, Array, Array, Array]:
    """All DFS pruning gates (end_configurations.py:109-223) on the expanded
    (K, C) candidate set, C = max_n_neighbors.

    After AND-symmetrization every node has <= C neighbors, so scoring (K, C)
    candidates is exact — every angular threshold is evaluated through
    cos/cross comparisons, and all tail positions come from the carried beam
    state, so the hot loop has no gathers and (almost) no transcendentals.
    Returns (can (K,C), theta, seg_len, diff) with theta/diff as real angles
    for the cost carries.
    """
    k, l = st.configs.shape

    last, prev, prev2 = st.last_pos, st.prev_pos, st.prev2_pos  # (K, 2)
    first = st.first_pos
    p = st.lengths - 1  # position_in_stack of the last element

    # 1. not already in config
    in_config = jnp.any(cand_idx[:, :, None] == st.configs[:, None, :], axis=-1)
    can = can0 & ~in_config

    # 2. ellipse gate, p >= 1 (:282-300) — rotation via the normalized major
    # direction, no trig
    major = geo.normalize_last_axis(last - prev)  # (K, 2)
    rel = cand - last[:, None, :]
    xr = jnp.sum(rel * major[:, None, :], axis=-1)
    yr = _cross2(major[:, None, :], rel)
    ellipse = (xr / cfg.ellipse_major) ** 2 + (yr / cfg.ellipse_minor) ** 2 < 1.0
    can = can & jnp.where((p >= 1)[:, None], ellipse, True)

    # 3. second cone on correct vehicle side, p == 0 (:260-278)
    car_to_cand = cand - car_position
    dsign = jnp.arctan2(
        _cross2(car_direction, car_to_cand),
        jnp.sum(car_direction * car_to_cand, axis=-1),
    )
    expected = _left_sign(cone_type)
    side_gate = (jnp.sign(dsign) == expected) | (jnp.abs(dsign) < jnp.deg2rad(5.0))
    can = can & jnp.where((p == 0)[:, None], side_gate, True)

    # 4. no cone skipped between last and candidate (:227-257): any *other*
    # neighbor m of `last` with both distances < 6 and angle at m > 150 deg
    pos_m = cand  # the m set == the neighbor set of `last`
    m_ok = can0
    v_ml = last[:, None, :] - pos_m  # (K, M, 2)
    v_mc = cand[:, :, None, :] - pos_m[:, None, :, :]  # (K, C, M, 2)
    d_ml = jnp.linalg.norm(v_ml, axis=-1)  # (K, M)
    d_mc = jnp.linalg.norm(v_mc, axis=-1)  # (K, C, M)
    dots = jnp.sum(v_ml[:, None, :, :] * v_mc, axis=-1)  # (K, C, M)
    # angle(v_ml, v_mc) > 150deg  <=>  cos < cos(150deg)
    cos_gate = dots < jnp.cos(cfg.between_angle) * d_ml[:, None, :] * d_mc
    not_self = cand_idx[:, :, None] != cand_idx[:, None, :]
    blocker = (
        m_ok[:, None, :]
        & not_self
        & (d_mc < cfg.between_dist)
        & (d_ml[:, None, :] < cfg.between_dist)
        & cos_gate
    )
    can = can & ~jnp.any(blocker, axis=-1)

    # 5. direction-change thresholds, p >= 1 (:172-191)
    seg_prev = last - prev  # (K, 2)
    seg_new = cand - last[:, None, :]  # (K, C, 2)
    diff = jnp.arctan2(
        _cross2(seg_prev[:, None, :], seg_new),
        jnp.sum(seg_prev[:, None, :] * seg_new, axis=-1),
    )  # (K, C) == angle_difference(atan2(seg_new), atan2(seg_prev))
    seg_len = jnp.linalg.norm(seg_new, axis=-1)
    abs_ok = jnp.abs(diff) <= cfg.threshold_absolute_angle
    # LEFT: diff < thr; RIGHT: diff > -thr  ==  sign*diff < thr
    directional = (_left_sign(cone_type) * diff < cfg.threshold_directional_angle) | (
        seg_len < cfg.close_cone_dist
    )
    can = can & jnp.where((p >= 1)[:, None], abs_ok & directional, True)

    # 6. flip-kill, p >= 2 (:194-205)
    seg_pp = prev - prev2
    diff2 = jnp.arctan2(
        _cross2(seg_pp, seg_prev), jnp.sum(seg_pp * seg_prev, axis=-1)
    )[:, None]  # (K, 1)
    flip = (jnp.sign(diff) != jnp.sign(diff2)) & (jnp.abs(diff - diff2) > 1.3)
    can = can & jnp.where((p >= 2)[:, None], ~flip, True)

    # 7. direction offset from start, p == 1 (:207-211): angle < pi/2 <=> dot > 0
    off_ok = jnp.sum(car_direction * (cand - first[:, None, :]), axis=-1) > 0
    can = can & jnp.where((p == 1)[:, None], off_ok, True)

    # 8. no car-body crossing (:213-221)
    dnorm = car_direction / jnp.linalg.norm(car_direction)
    car_start = car_position - dnorm * cfg.car_size / 2
    car_end = car_position + dnorm * cfg.car_size
    crosses = geo.segments_intersect(
        last[:, None, :], cand, car_start[None, None, :], car_end[None, None, :]
    )
    can = can & ~crosses

    # interior-angle increment for the scoring update: angle at `last`
    theta = geo.vec_angle_between(prev[:, None, :] - last[:, None, :], seg_new)
    return can, theta, seg_len, diff


def _pack_state_feats(st: _BeamState) -> Array:
    """(K, L+16) float survivor-feature matrix — the packed layout shared by
    the XLA pool re-selection and the fused Pallas kernel."""
    f32 = lambda a: a.astype(jnp.float32)
    col = lambda a: f32(a)[:, None]
    return jnp.concatenate(
        [
            f32(st.configs),
            col(st.lengths),
            col(st.done),
            col(st.angle_sum),
            col(st.n_under),
            col(st.residual),
            col(st.init_cost),
            col(st.wrong_sum),
            col(st.last_idx),
            st.last_pos,
            st.prev_pos,
            st.prev2_pos,
            st.first_pos,
        ],
        axis=1,
    )


@functools.lru_cache(maxsize=None)
def _fused_search_fn(n: int, k: int, l: int, c: int, weights: tuple, gates_items: tuple):
    """Batched fused-search callable for one static shape/config signature.

    custom_vmap collapses any number of outer vmap axes (sides, frames) into
    the kernel's lane-batched program axis — one pallas_call for the whole
    planner batch."""
    gates = dict(gates_items)

    @jax.custom_batching.custom_vmap
    def fn(node_table, feats0, alive0, params):
        return bs.fused_beam_search(
            node_table, feats0, alive0, params,
            n=n, k=k, l=l, c=c, weights=weights, gates=gates,
        )

    @fn.def_vmap
    def fn_vmap(axis_size, in_batched, node_table, feats0, alive0, params):
        args = []
        for a, b in zip((node_table, feats0, alive0, params), in_batched):
            if not b:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            args.append(a.reshape((-1,) + a.shape[2:]))
        f, al = fn(*args)
        return (
            f.reshape((axis_size, -1) + f.shape[1:]),
            al.reshape((axis_size, -1) + al.shape[1:]),
        ), (True, True)

    return fn


def _gate_items(cfg: SortingConfig) -> tuple:
    return (
        ("ellipse_major", cfg.ellipse_major),
        ("ellipse_minor", cfg.ellipse_minor),
        ("side_eps", math.radians(5.0)),
        ("between_angle", cfg.between_angle),
        ("between_dist", cfg.between_dist),
        ("thr_abs", cfg.threshold_absolute_angle),
        ("thr_dir", cfg.threshold_directional_angle),
        ("close_dist", cfg.close_cone_dist),
        ("car_size", cfg.car_size),
        ("under_angle", math.radians(40.0)),
    )


def _beam_search_side(
    cfg: SortingConfig,
    beam_width: int,
    points: Array,
    mask: Array,
    cone_type: int,
    prefix: Array,
    n_first: Array,
    car_position: Array,
    car_direction: Array,
    node_table: Array,
    target_length: Array,
) -> tuple[Array, Array]:
    """Run the beam search; returns (configs (K, L), pool_valid (K,)).

    Gather-free hot loop: on this TPU target a general `gather` HLO lowers to
    a ~0.5 ms scalar-core loop regardless of size (profiled r2), so ~20
    gathers/iter made the loop ~100 ms. Instead (a) the beam front expands via
    one one-hot contraction against the packed per-node neighbor table, and
    (b) the top-k re-selection reads ALL survivor state through a single
    one-hot matmul over a packed (K + K*C, F) pool-feature matrix.
    """
    n = points.shape[0]
    k = beam_width
    l = cfg.max_length
    c = cfg.max_n_neighbors
    xy = points[:, :2]

    configs0 = jnp.full((k, l), -1, jnp.int32)
    configs0 = configs0.at[0, 0].set(prefix[0])
    configs0 = configs0.at[0, 1].set(jnp.where(n_first >= 2, prefix[1], -1))

    # start positions (prefix[1] == -1 reads a zero row; unused when n_first<2)
    p0 = gl.take_rows(xy, prefix)  # (2, 2)
    init_cost0 = jnp.where(
        n_first >= 2, geo.vec_angle_between(p0[1] - p0[0], car_direction), 0.0
    )
    last_idx0 = jnp.where(n_first >= 2, prefix[1], prefix[0])
    last0 = jnp.where(n_first >= 2, p0[1], p0[0])
    slot0 = jnp.arange(k) == 0
    at0 = lambda v: jnp.where(slot0[:, None], v[None, :], 0.0)

    st = _BeamState(
        configs=configs0,
        lengths=jnp.where(slot0, n_first, 0).astype(jnp.int32),
        alive=slot0 & (n_first >= 1),
        done=jnp.zeros(k, bool),
        angle_sum=jnp.zeros(k),
        n_under=jnp.zeros(k, jnp.int32),
        residual=jnp.zeros(k),
        init_cost=jnp.where(slot0, init_cost0, 0.0),
        wrong_sum=jnp.zeros(k),
        last_idx=jnp.where(slot0, last_idx0, -1).astype(jnp.int32),
        last_pos=at0(last0),
        prev_pos=at0(p0[0]),
        prev2_pos=at0(p0[0]),
        first_pos=at0(p0[0]),
    )

    if _use_fused_beam():
        # the whole search loop as ONE pallas call (ops/pallas/beam_search.py)
        sgn = _left_sign(cone_type)
        params = jnp.stack(
            [
                car_position[0], car_position[1],
                car_direction[0], car_direction[1],
                sgn, target_length.astype(jnp.float32),
            ]
        )
        feats0 = jnp.transpose(_pack_state_feats(st))  # (F, K)
        weights = tuple(float(sorting_cost._WEIGHTS[i]) for i in (0, 1, 2, 3, 6))
        fn = _fused_search_fn(n, k, l, c, weights, _gate_items(cfg))
        feats, alive = fn(
            node_table[None], feats0[None],
            st.alive.astype(jnp.float32)[None], params[None],
        )
        feats_t = jnp.transpose(feats[0])  # (K, F)
        out_configs = jnp.round(feats_t[:, :l]).astype(jnp.int32)
        return out_configs, alive[0] > 0.5

    # ------------------------------------------------------------------
    # Lane-friendly flat layout. TPU tiling pads the LAST axis to 128
    # lanes, so every (K, C=5) or (*, 2) tensor crossing a fusion boundary
    # materializes 25-64x padded in HBM — measured to dominate the whole
    # step. The loop carries ONE (F, K) feature matrix whose rows are
    # (K,)-shaped columns, and ALL candidate math runs on flat j-major
    # (C*K,) arrays (round 4: the round-3 per-neighbor lists of (K,) ops
    # ran at K/128 = 25% lane occupancy and 5x the op count). The j-major
    # flat order is exactly the pool's child order, so the pool build is a
    # single concatenate and score ties break identically.
    # ------------------------------------------------------------------
    w = sorting_cost._WEIGHTS
    sgn = _left_sign(cone_type)
    under_angle = jnp.deg2rad(40.0)
    cos_between = jnp.cos(cfg.between_angle)
    dnorm = car_direction / jnp.linalg.norm(car_direction)
    car_sx, car_sy = car_position - dnorm * cfg.car_size / 2
    car_ex, car_ey = car_position + dnorm * cfg.car_size
    cp_x, cp_y = car_position[0], car_position[1]
    cd_x, cd_y = car_direction[0], car_direction[1]
    ck = c * k

    def partial_score(length, angle_sum, n_under, residual, init_cost, wrong_sum):
        n_int = jnp.maximum(length - 2.0, 1.0)
        return (
            w[0] * angle_sum / n_int * (n_under + 1.0)
            + w[1] * residual
            + w[2] / jnp.maximum(length, 1.0)
            + w[3] * init_cost
            + w[6] * jnp.abs(wrong_sum) * (length >= 4.0)
        )

    def _angle_xy(ax, ay, bx, by):
        # geo.vec_angle_between on components (identical arithmetic)
        na = jnp.sqrt(jnp.maximum(ax * ax + ay * ay, 0.0))
        nb = jnp.sqrt(jnp.maximum(bx * bx + by * by, 0.0))
        cos_t = (ax * bx + ay * by) / jnp.maximum(na * nb, 1e-12)
        return jnp.arccos(jnp.clip(cos_t, -1.0, 1.0))

    def step(_, carry):
        feats_t, alive = carry  # (F, K) f32, (K,) bool
        configs = [feats_t[j] for j in range(l)]
        lengths = feats_t[l]
        done = feats_t[l + 1] > 0.5
        angle_sum, n_under = feats_t[l + 2], feats_t[l + 3]
        residual, init_cost = feats_t[l + 4], feats_t[l + 5]
        wrong_sum, last_idx = feats_t[l + 6], feats_t[l + 7]
        last_x, last_y = feats_t[l + 8], feats_t[l + 9]
        prev_x, prev_y = feats_t[l + 10], feats_t[l + 11]
        prev2_x, prev2_y = feats_t[l + 12], feats_t[l + 13]
        first_x, first_y = feats_t[l + 14], feats_t[l + 15]
        p = lengths - 1.0

        # expansion: ONE one-hot contraction, then flat j-major (C*K,) views
        row = gl.take_rows(node_table, jnp.round(last_idx).astype(jnp.int32))

        def flat_block(off):  # (K, C) slice -> (C*K,) j-major
            return jnp.transpose(row[:, off * c : (off + 1) * c]).reshape(ck)

        cand_f = flat_block(0)
        can0_f = flat_block(1) > 0.5
        cx_f = flat_block(2)
        cy_f = flat_block(3)

        T = lambda a: jnp.tile(a, c)  # parent column -> (C*K,) j-major

        # shared tail geometry (per parent, tiled once)
        mjx, mjy = last_x - prev_x, last_y - prev_y
        inv = jax.lax.rsqrt(jnp.maximum(mjx * mjx + mjy * mjy, 1e-24))
        umx, umy = mjx * inv, mjy * inv  # ellipse major direction
        ppx, ppy = prev_x - prev2_x, prev_y - prev2_y
        diff2 = jnp.arctan2(ppx * mjy - ppy * mjx, ppx * mjx + ppy * mjy)

        expandable = alive & ~done & (lengths < target_length)

        lx, ly = T(last_x), T(last_y)
        p_f = T(p)
        umx_f, umy_f = T(umx), T(umy)
        fx, fy = T(first_x), T(first_y)

        relx, rely = cx_f - lx, cy_f - ly

        # 1. not already in config
        in_cfg = T(configs[0]) == cand_f
        for jj in range(1, l):
            in_cfg = in_cfg | (T(configs[jj]) == cand_f)
        ok = can0_f & ~in_cfg
        # 2. ellipse gate (p >= 1)
        xr = relx * umx_f + rely * umy_f
        yr = umx_f * rely - umy_f * relx
        ell = (xr / cfg.ellipse_major) ** 2 + (yr / cfg.ellipse_minor) ** 2 < 1.0
        ok = ok & (ell | (p_f < 1.0))
        # 3. second cone on correct side (p == 0)
        ccx, ccy = cx_f - cp_x, cy_f - cp_y
        dsign = jnp.arctan2(cd_x * ccy - cd_y * ccx, cd_x * ccx + cd_y * ccy)
        side_ok = (jnp.sign(dsign) == sgn) | (jnp.abs(dsign) < jnp.deg2rad(5.0))
        ok = ok & (side_ok | (p_f != 0.0))
        # 4. no cone skipped between last and candidate (C passes over the
        # flat candidates, each against one tiled neighbor column)
        blocked = jnp.zeros_like(ok)
        for m in range(c):
            cxm = T(row[:, 2 * c + m])
            cym = T(row[:, 3 * c + m])
            can0m = T(row[:, c + m] > 0.5)
            candm = T(row[:, m])
            d_ml_m = jnp.sqrt((lx - cxm) ** 2 + (ly - cym) ** 2)
            vmcx, vmcy = cx_f - cxm, cy_f - cym
            d_mc = jnp.sqrt(vmcx * vmcx + vmcy * vmcy)
            dots = (lx - cxm) * vmcx + (ly - cym) * vmcy
            blocked = blocked | (
                can0m
                & (cand_f != candm)
                & (d_mc < cfg.between_dist)
                & (d_ml_m < cfg.between_dist)
                & (dots < cos_between * d_ml_m * d_mc)
            )
        ok = ok & ~blocked
        # 5. direction-change thresholds (p >= 1)
        mjx_f, mjy_f = T(mjx), T(mjy)
        dj = jnp.arctan2(mjx_f * rely - mjy_f * relx, mjx_f * relx + mjy_f * rely)
        sl = jnp.sqrt(relx * relx + rely * rely)
        abs_ok = jnp.abs(dj) <= cfg.threshold_absolute_angle
        directional = (sgn * dj < cfg.threshold_directional_angle) | (
            sl < cfg.close_cone_dist
        )
        ok = ok & ((abs_ok & directional) | (p_f < 1.0))
        # 6. flip-kill (p >= 2)
        diff2_f = T(diff2)
        flip = (jnp.sign(dj) != jnp.sign(diff2_f)) & (jnp.abs(dj - diff2_f) > 1.3)
        ok = ok & (~flip | (p_f < 2.0))
        # 7. offset from start (p == 1)
        off_ok = cd_x * (cx_f - fx) + cd_y * (cy_f - fy) > 0.0
        ok = ok & (off_ok | (p_f != 1.0))
        # 8. no car-body crossing (geo.segments_intersect on components)
        eps = 1e-6
        bdx, bdy = car_ex - car_sx, car_ey - car_sy
        d1 = bdx * (ly - car_sy) - bdy * (lx - car_sx)
        d2 = bdx * (cy_f - car_sy) - bdy * (cx_f - car_sx)
        d3 = relx * (car_sy - ly) - rely * (car_sx - lx)
        d4 = relx * (car_ey - ly) - rely * (car_ex - lx)
        proper = ((d1 > eps) & (d2 < -eps) | (d1 < -eps) & (d2 > eps)) & (
            (d3 > eps) & (d4 < -eps) | (d3 < -eps) & (d4 > eps)
        )

        def on_seg(px0, py0, qx, qy, rx, ry):
            wx = (rx >= jnp.minimum(px0, qx) - eps) & (rx <= jnp.maximum(px0, qx) + eps)
            wy = (ry >= jnp.minimum(py0, qy) - eps) & (ry <= jnp.maximum(py0, qy) + eps)
            return wx & wy

        collinear_touch = (
            (jnp.abs(d1) <= eps) & on_seg(car_sx, car_sy, car_ex, car_ey, lx, ly)
            | (jnp.abs(d2) <= eps) & on_seg(car_sx, car_sy, car_ex, car_ey, cx_f, cy_f)
            | (jnp.abs(d3) <= eps) & on_seg(lx, ly, cx_f, cy_f, car_sx, car_sy)
            | (jnp.abs(d4) <= eps) & on_seg(lx, ly, cx_f, cy_f, car_ex, car_ey)
        )
        crosses = proper | collinear_touch
        ok = ok & ~crosses & T(expandable)

        theta_f = _angle_xy(T(prev_x) - lx, T(prev_y) - ly, relx, rely)

        # children carries + scores, flat
        add_int = p >= 1.0
        c_len = lengths + 1.0
        add_int_f = T(add_int)
        c_len_f = T(c_len)
        a_sum_f = T(angle_sum) + jnp.where(add_int_f, (jnp.pi - theta_f) / jnp.pi, 0.0)
        nu_f = T(n_under) + jnp.where(add_int_f & (theta_f < under_angle), 1.0, 0.0)
        res_f = T(residual) + jnp.maximum(0.0, sl - 3.0)
        f_ang = _angle_xy(cx_f - fx, cy_f - fy, cd_x, cd_y)
        ini_f = jnp.where(p_f == 0.0, f_ang, T(init_cost))
        wr_f = T(wrong_sum) + jnp.where(
            add_int_f & (jnp.sign(dj) == sgn) & (jnp.abs(dj) > under_angle),
            dj,
            0.0,
        )
        sc = partial_score(c_len_f, a_sum_f, nu_f, res_f, ini_f, wr_f)
        scores_children_f = jnp.where(ok, sc, _INF)

        # parents that could not expand become leaves
        any_can = jnp.any(ok.reshape(c, k), axis=0)
        newly_done = expandable & ~any_can
        done2 = done | newly_done
        frozen = alive & (done2 | ~expandable)
        parent_score = jnp.where(
            frozen,
            partial_score(lengths, angle_sum, n_under, residual, init_cost, wrong_sum),
            _INF,
        )

        # pool: K frozen parents + the j-major flat children -> (P, F);
        # re-selected with one top_k + one one-hot matmul
        def pool_col(parent_col, child_flat):
            return jnp.concatenate([parent_col, child_flat])

        cols = []
        for jj in range(l):
            cols.append(pool_col(
                configs[jj],
                jnp.where(T(lengths) == float(jj), cand_f, T(configs[jj])),
            ))
        cols.append(pool_col(lengths, c_len_f))
        cols.append(pool_col(done2.astype(jnp.float32), jnp.zeros(ck)))
        for parent_c, child_c in (
            (angle_sum, a_sum_f),
            (n_under, nu_f),
            (residual, res_f),
            (init_cost, ini_f),
            (wrong_sum, wr_f),
        ):
            cols.append(pool_col(parent_c, child_c))
        cols.append(pool_col(last_idx, cand_f))
        cols.append(pool_col(last_x, cx_f))
        cols.append(pool_col(last_y, cy_f))
        cols.append(pool_col(prev_x, lx))
        cols.append(pool_col(prev_y, ly))
        cols.append(pool_col(prev2_x, T(prev_x)))
        cols.append(pool_col(prev2_y, T(prev_y)))
        cols.append(pool_col(first_x, fx))
        cols.append(pool_col(first_y, fy))
        pool_feats = jnp.stack(cols, axis=-1)  # (P, F)

        pool_scores = jnp.concatenate([parent_score, scores_children_f])
        # rank-based exact top-K (ties broken by pool index, identical to
        # lax.top_k's stable order): XLA's top_k lowers to a full variadic
        # sort of the 192-entry pool on this target; the (P, P) compare+sum
        # runs on the VPU and feeds the same one-hot re-selection matmul the
        # sort path needed anyway.
        pool_n = pool_scores.shape[0]
        iota_p = jnp.arange(pool_n)
        better = (pool_scores[None, :] < pool_scores[:, None]) | (
            (pool_scores[None, :] == pool_scores[:, None])
            & (iota_p[None, :] < iota_p[:, None])
        )
        rank = jnp.sum(better, axis=1)  # (P,)
        onehot_sel = (rank[None, :] == jnp.arange(k)[:, None]).astype(
            pool_feats.dtype
        )  # (K, P)
        feats = jnp.matmul(
            onehot_sel, pool_feats, precision=jax.lax.Precision.HIGHEST
        )  # (K, F)
        sel_valid = jnp.arange(k) < jnp.sum(jnp.isfinite(pool_scores))

        new_feats_t = jnp.transpose(feats)  # (F, K)
        invalid = ~sel_valid
        # invalid slots: configs -1, length 0, done 0, last_idx -1
        rows = []
        for fi in range(l + 16):
            r = new_feats_t[fi]
            if fi < l or fi == l + 7:
                r = jnp.where(invalid, -1.0, r)
            elif fi in (l, l + 1):
                r = jnp.where(invalid, 0.0, r)
            rows.append(r)
        return jnp.stack(rows), sel_valid

    feats_t0 = jnp.transpose(_pack_state_feats(st))  # (F, K)
    feats_t, alive = jax.lax.fori_loop(0, l - 1, step, (feats_t0, st.alive))
    out_configs = jnp.round(jnp.transpose(feats_t[:l])).astype(jnp.int32)
    return out_configs, alive


def _postfilter_pool(
    points: Array, configs: Array, valid: Array, cone_type: int
) -> tuple[Array, Array]:
    """End-configuration post-processing (end_configurations.py:484-518):
    >= 3 cones, strip trailing wrong-color cone, drop strict prefixes of
    other pool configs."""
    k, l = configs.shape
    lengths = jnp.sum(configs != -1, axis=1)
    valid = valid & (lengths >= 3)

    last_pos = jnp.maximum(lengths - 1, 0)
    last_cone = jnp.sum(
        jnp.where(jnp.arange(l)[None, :] == last_pos[:, None], configs, 0), axis=1
    )
    last_color = gl.take_vec(points[:, 2], jnp.clip(last_cone, 0, points.shape[0] - 1))
    strip = (last_color != cone_type) & valid
    configs = jnp.where(
        strip[:, None] & (jnp.arange(l)[None, :] == last_pos[:, None]), -1, configs
    )
    lengths = lengths - strip.astype(lengths.dtype)
    valid = valid & (lengths >= 3)
    configs = jnp.where(valid[:, None], configs, -1)

    # exact duplicates: keep first occurrence
    same = jnp.all(configs[:, None, :] == configs[None, :, :], axis=-1)
    same = same & valid[:, None] & valid[None, :]
    earlier = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]
    dup = jnp.any(same & earlier, axis=0)
    valid = valid & ~dup

    # strict-prefix removal: config j removed when some other config i
    # matches j on all of j's non(-1) positions
    eq = (configs[:, None, :] == configs[None, :, :]) | (configs[None, :, :] == -1)
    prefix = jnp.all(eq, axis=-1) & valid[:, None] & valid[None, :]
    not_self = ~jnp.eye(k, dtype=bool)
    removed = jnp.any(prefix & not_self, axis=0)
    valid = valid & ~removed
    return jnp.where(valid[:, None], configs, -1), valid


class SideResult(NamedTuple):
    configs: Array  # (K, L) pool
    valid: Array  # (K,)
    costs: Array  # (K,)
    best: Array  # (L,) best config (-1 padded)
    has_result: Array  # ()


def sort_one_side(
    cfg: PlannerConfig,
    points: Array,
    mask: Array,
    cone_type: int,
    car_position: Array,
    car_direction: Array,
) -> SideResult:
    """Reference calc_configurations_with_score_for_one_side
    (core_trace_sorter.py:252-327) + calc_scores_and_end_configurations."""
    s = cfg.sorting
    k = s.beam_width
    l = s.max_length
    n = points.shape[0]

    prefix, n_first = select_starting_cones(
        s, points, mask, cone_type, car_position, car_direction
    )
    enough_cones = jnp.sum(mask) >= 3
    startable = (n_first >= 1) & enough_cones

    adj, node_table, target_length = build_adjacency(
        s, points, mask, cone_type, prefix[0]
    )

    configs, valid = _beam_search_side(
        s, k, points, mask, cone_type, prefix, n_first,
        car_position, car_direction, node_table, target_length,
    )
    configs, valid = _postfilter_pool(points, configs, valid, cone_type)
    valid = valid & startable

    costs = sorting_cost.cost_configurations(
        points, mask, configs, valid, cone_type, car_position, car_direction, s
    )
    best_idx = jnp.argmin(costs)
    has_result = jnp.any(valid) & startable
    best_row = jnp.round(
        gl.take_rows(configs.astype(jnp.float32), best_idx[None])[0]
    ).astype(jnp.int32)
    best = jnp.where(has_result, best_row, -1)
    return SideResult(
        configs=configs, valid=valid, costs=costs, best=best, has_result=has_result
    )


# ---------------------------------------------------------------------------
# left/right combination (combine_traces.py:21-275)
# ---------------------------------------------------------------------------


def _angle_change_at(points_xy: Array, config: Array, pos: Array) -> Array:
    """calc_angle_change_at_position (combine_traces.py:260-275)."""
    l = config.shape[0]
    idx3 = jnp.clip(jnp.stack([pos - 1, pos, pos + 1]), 0, l - 1)
    cfg3 = jnp.round(gl.take_vec(config.astype(jnp.float32), idx3)).astype(jnp.int32)
    pts3 = gl.take_rows(points_xy, cfg3)  # padded (-1) slots -> zero rows
    prev_c, inter, next_c = pts3[0], pts3[1], pts3[2]
    a_next = geo.angle_from_2d_vector(next_c - inter)
    a_prev = geo.angle_from_2d_vector(prev_c - inter)
    return geo.angle_difference(a_next, a_prev)


def combine_traces(
    points: Array,
    left: SideResult,
    right: SideResult,
    car_position: Array,
    car_direction: Array,
) -> tuple[Array, Array]:
    """Pick the best config per side and resolve cones claimed by both
    (calc_final_configs_for_left_and_right). Returns (left (L,), right (L,))
    -1-padded index configs."""
    xy = points[:, :2]
    l = left.best.shape[0]

    left_cfg = jnp.where(left.has_result, left.best, -1)
    right_cfg = jnp.where(right.has_result, right.best, -1)
    len_l = jnp.sum(left_cfg != -1)
    len_r = jnp.sum(right_cfg != -1)

    # first common cone positions
    common = (
        (left_cfg[:, None] == right_cfg[None, :])
        & (left_cfg[:, None] != -1)
        & (right_cfg[None, :] != -1)
    )
    l_in_r = jnp.any(common, axis=1)
    r_in_l = jnp.any(common, axis=0)
    has_common = jnp.any(common)
    big = l + 1
    li = jnp.min(jnp.where(l_in_r, jnp.arange(l), big))
    ri = jnp.min(jnp.where(r_in_l, jnp.arange(l), big))

    # --- the arbitration decision table (combine_traces.py:150-257)
    n = xy.shape[0]
    both_cfg = jnp.concatenate([left_cfg, right_cfg]).astype(jnp.float32)  # (2L,)
    idx = jnp.concatenate(
        [
            jnp.clip(jnp.stack([li, li - 1, li]), 0, l - 1),
            l + jnp.clip(jnp.stack([ri - 1, ri]), 0, l - 1),
        ]
    )  # [inter@li, prev_left, left@li, prev_right, right@ri]
    cones5 = jnp.round(gl.take_vec(both_cfg, idx)).astype(jnp.int32)
    inter_cone, prev_left, prev_right = cones5[0], cones5[1], cones5[3]
    pts3 = gl.take_rows(xy, jnp.clip(cones5[:4], 0, n - 1))
    d_left = jnp.linalg.norm(pts3[0] - pts3[1])
    d_right = jnp.linalg.norm(pts3[0] - pts3[3])

    both_pos = (li > 0) & (ri > 0)
    ll = d_left < 3.0
    rl = d_right < 3.0
    rule1 = both_pos & (ll ^ rl)
    r1_left_stop = jnp.where(ll, len_l, li)
    r1_right_stop = jnp.where(ll, ri, len_r)

    # middle-intersection rule
    same_cone = cones5[2] == cones5[4]
    li_mid = (li >= 1) & (li <= len_l - 2)
    ri_mid = (ri >= 1) & (ri <= len_r - 2)
    rule2 = ~rule1 & same_cone & li_mid & ri_mid

    angle_left = _angle_change_at(xy, left_cfg, li)
    angle_right = _angle_change_at(xy, right_cfg, ri)
    sign_same = jnp.sign(angle_left) == jnp.sign(angle_right)
    n_cones_diff = jnp.abs(len_l - len_r)
    abs_angle_diff = jnp.abs(jnp.abs(angle_left) - jnp.abs(angle_right))

    prefer_left = jnp.where(
        sign_same,
        jnp.sign(angle_left) == 1,
        jnp.where(
            n_cones_diff > 2,
            len_l > len_r,
            jnp.abs(angle_left) > jnp.abs(angle_right),
        ),
    )
    r2_truncate_both = ~sign_same & ~(n_cones_diff > 2) & ~(
        abs_angle_diff > jnp.deg2rad(5.0)
    )
    r2_left_stop = jnp.where(r2_truncate_both, li, jnp.where(prefer_left, len_l, li))
    r2_right_stop = jnp.where(r2_truncate_both, ri, jnp.where(prefer_left, ri, len_r))

    # end-intersection rule
    rule3 = ~rule1 & ~rule2
    l_end = li == len_l - 1
    r_end = ri == len_r - 1
    r3_left_stop = jnp.where(
        l_end & r_end, len_l - 1, jnp.where(l_end, li, jnp.where(r_end, len_l, li))
    )
    r3_right_stop = jnp.where(
        l_end & r_end, len_r - 1, jnp.where(l_end, len_r, jnp.where(r_end, ri, ri))
    )

    left_stop = jnp.where(rule1, r1_left_stop, jnp.where(rule2, r2_left_stop, r3_left_stop))
    right_stop = jnp.where(rule1, r1_right_stop, jnp.where(rule2, r2_right_stop, r3_right_stop))

    left_stop = jnp.where(has_common, left_stop, len_l)
    right_stop = jnp.where(has_common, right_stop, len_r)

    iota = jnp.arange(l)
    left_out = jnp.where(iota < left_stop, left_cfg, -1)
    right_out = jnp.where(iota < right_stop, right_cfg, -1)

    # one-sided / zero-sided cases (combine_traces.py:44-52, 68-90)
    left_out = jnp.where(left.has_result, left_out, -1)
    right_out = jnp.where(right.has_result, right_out, -1)
    only_left = left.has_result & ~right.has_result
    only_right = right.has_result & ~left.has_result
    left_out = jnp.where(only_left, left_cfg, left_out)
    right_out = jnp.where(only_right, right_cfg, right_out)
    return left_out, right_out


class SortingOutput(NamedTuple):
    left_cones: Array  # (L, 2)
    left_mask: Array  # (L,)
    right_cones: Array  # (L, 2)
    right_mask: Array  # (L,)


def run_cone_sorting(
    cfg: PlannerConfig,
    points: Array,
    mask: Array,
    car_position: Array,
    car_direction: Array,
) -> SortingOutput:
    """Reference TraceSorter.sort_left_right (core_trace_sorter.py:148-216).

    `points` is the flattened (N, 3) [x, y, color] cone tensor. UNKNOWN-cone
    filtering (use_unknown_cones=False) is applied by the caller.
    """
    # both sides run as ONE vmapped search (cone_type is traced data):
    # halves the sequential beam-step depth vs running the sides back-to-back
    both = jax.vmap(
        lambda ct: sort_one_side(cfg, points, mask, ct, car_position, car_direction)
    )(jnp.asarray([ConeTypes.LEFT, ConeTypes.RIGHT], jnp.int32))
    left = jax.tree.map(lambda x: x[0], both)
    right = jax.tree.map(lambda x: x[1], both)

    left_cfg, right_cfg = combine_traces(points, left, right, car_position, car_direction)

    xy = points[:, :2]
    n = xy.shape[0]

    def compact(config: Array) -> tuple[Array, Array]:
        keep = config != -1
        order, valid = geo.stable_compact(keep)
        cfg_c = jnp.round(gl.take_vec(config.astype(jnp.float32), order)).astype(
            jnp.int32
        )
        cones = gl.take_rows(xy, cfg_c)
        return jnp.where(valid[:, None], cones, 0.0), valid

    lc, lm = compact(left_cfg)
    rc, rm = compact(right_cfg)
    return SortingOutput(left_cones=lc, left_mask=lm, right_cones=rc, right_mask=rm)
