"""Cone matching stage — masked pairwise scoring + virtual cone synthesis.

TPU-native re-design of the reference's functional cone matching
(`cone_matching/functional_cone_matching.py:32-588`, `match_directions.py`):
per-cone Python loops become (M, N) masked score tensors, the sequential
virtual-cone insertion loop becomes a fixed-trip `fori_loop` of branchless
shift-inserts, ragged arrays become (S,) masks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import PlannerConfig
from ft_fsd_path_planning_tpu.ops import gatherless as gl
from ft_fsd_path_planning_tpu.ops import geometry as geo
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes

Array = jax.Array

_BIG = 1e9


class MatchingInput(NamedTuple):
    """Sorted left/right traces (reference ConeMatchingInput)."""

    left_cones: Array  # (S, 2)
    left_mask: Array  # (S,)
    right_cones: Array  # (S, 2)
    right_mask: Array  # (S,)
    position: Array  # (2,)
    direction: Array  # (2,)


class MatchingOutput(NamedTuple):
    left_cones: Array  # (S, 2) with virtual cones inserted
    left_mask: Array
    left_virtual_mask: Array
    right_cones: Array
    right_mask: Array
    right_virtual_mask: Array
    left_to_right: Array  # (S,) int32, -1 = unmatched
    right_to_left: Array


def match_search_directions(cones: Array, mask: Array, cone_type: int) -> Array:
    """Normals of the prev->next chords, rotated to point across the track
    (reference match_directions.py:7-44). Endpoints use one-sided chords."""
    s = cones.shape[0]
    n = jnp.sum(mask)
    i = jnp.arange(s)
    # first cone: chord (0, 1); last: (n-2, n-1); interior: (i-1, i+1).
    # prev/next lookups are pure axis shifts; the three scalar endpoint rows
    # come from one one-hot contraction — no gathers.
    first = i == 0
    last = (i == n - 1) & (n >= 2)
    prev = jnp.concatenate([cones[:1], cones[:-1]], axis=0)
    nxt = jnp.concatenate([cones[1:], cones[-1:]], axis=0)
    ends = gl.take_rows(
        cones,
        jnp.clip(jnp.stack([n - 2, n - 1, jnp.minimum(1, n - 1)]), 0, s - 1),
    )  # [cones[n-2], cones[n-1], cones[min(1, n-1)]]
    a = jnp.where(first[:, None], cones[0], jnp.where(last[:, None], ends[0], prev))
    b = jnp.where(first[:, None], ends[2], jnp.where(last[:, None], ends[1], nxt))
    track_dir = b - a
    rotation = jnp.pi / 2 if cone_type == ConeTypes.RIGHT else -jnp.pi / 2
    d = geo.rotate(track_dir, rotation)
    return geo.normalize_last_axis(d)


def potential_matches_mask(
    cones: Array,
    cones_mask: Array,
    directions: Array,
    other: Array,
    other_mask: Array,
    other_directions: Array,
    major_radius: float,
    minor_radius: float,
    max_search_angle: float,
) -> Array:
    """(M, N) candidate mask (reference
    find_boolean_mask_of_all_potential_matches, :73-144): rotated-ellipse
    membership + half-angle gate + direction-opposition gate, then keep only
    the 2 nearest candidates per cone."""
    vec = other[None, :, :] - cones[:, None, :]  # (M, N, 2)
    ang = geo.angle_from_2d_vector(directions)  # (M,)
    rotated = geo.rotate(vec, -ang[:, None])
    ellipse = (rotated[..., 0] / major_radius) ** 2 + (
        rotated[..., 1] / minor_radius
    ) ** 2 < 1.0

    rot_angle = geo.angle_from_2d_vector(rotated)
    angle_ok = jnp.abs(rot_angle / 2.0) <= max_search_angle

    dir_diff = geo.vec_angle_between(directions[:, None, :], other_directions[None, :, :])
    opposition_ok = dir_diff >= jnp.pi / 2

    valid = cones_mask[:, None] & other_mask[None, :]
    mask = ellipse & angle_ok & opposition_ok & valid

    # keep only the 2 closest candidates per cone (:132-142) — one-hot
    # membership instead of scatter (TPU scatters hit the slow path); the
    # 2 closest come from 2 argmin-extract rounds rather than lax.top_k
    # (XLA lowers top_k to a full-width variadic sort, ~0.4 ms/step at
    # batch 256 across this stage's call sites)
    dist = jnp.where(mask, jnp.linalg.norm(vec, axis=-1), jnp.inf)
    n = mask.shape[1]
    keep = jnp.zeros_like(mask)
    cur = dist
    for _ in range(2):
        mn = jnp.min(cur, axis=1)
        pick = jnp.argmin(cur, axis=1)
        hit = jnp.arange(n)[None, :] == pick[:, None]
        keep = keep | (hit & jnp.isfinite(mn)[:, None])
        cur = jnp.where(hit, jnp.inf, cur)
    return keep & mask


def select_best_match(
    cones: Array,
    cones_mask: Array,
    match_mask: Array,
    other: Array,
    other_mask: Array,
    monotonic: bool,
) -> Array:
    """Best match per cone = argmin distance over the whole other side, -1
    when the cone has no candidates (reference select_best_match_candidate,
    :147-175 — note the argmin deliberately ignores the candidate mask)."""
    d2 = geo.cdist_sq(cones, other)
    d2 = jnp.where(other_mask[None, :], d2, jnp.inf)
    matched = jnp.argmin(d2, axis=1).astype(jnp.int32)

    if monotonic:
        cummax = jax.lax.associative_scan(jnp.maximum, matched)
        prev_cummax = jnp.roll(cummax, 1).at[0].set(matched[0])
        keep = matched >= prev_cummax
        matched = jnp.where(keep, matched, -1)

    has_candidate = jnp.any(match_mask, axis=1)
    no_other = jnp.sum(other_mask) == 0
    return jnp.where(cones_mask & has_candidate & ~no_other, matched, -1)


def _insert_virtual_cones(
    existing: Array,
    existing_count: Array,
    to_insert: Array,
    insert_mask: Array,
    car_position: Array,
) -> tuple[Array, Array]:
    """Sequential shift-insert of virtual cones into an ordered trace
    (reference insert_virtual_cones_to_existing, :195-261), as a fixed-trip
    fori_loop over a fixed buffer."""
    s = existing.shape[0]
    v = to_insert.shape[0]

    # insertion order: ascending min-distance to the existing cones (:212-213)
    d2 = geo.cdist_sq(to_insert, existing)
    d2 = jnp.where(jnp.arange(s)[None, :] < existing_count, d2, jnp.inf)
    min_d = jnp.where(insert_mask, jnp.min(d2, axis=1), jnp.inf)
    order = jnp.argsort(min_d)
    to_insert = gl.take_rows(to_insert, order)
    insert_mask = gl.take_vec(insert_mask.astype(jnp.float32), order) > 0.5

    def body(k, carry):
        buf, count = carry
        cone = jax.lax.dynamic_slice_in_dim(to_insert, k, 1, axis=0)[0]
        do = jax.lax.dynamic_slice_in_dim(insert_mask, k, 1, axis=0)[0]

        iota = jnp.arange(s)
        valid = iota < count
        dist = jnp.where(valid, jnp.linalg.norm(buf - cone, axis=1), jnp.inf)
        neg, two = jax.lax.top_k(-dist, 2)
        closest, second = two[0], two[1]
        near2 = gl.take_rows(buf, two)

        # single existing cone: insert by car distance (:221-222, :264-282)
        d_cone = jnp.linalg.norm(cone - car_position)
        d_exist = jnp.linalg.norm(buf[0] - car_position)
        idx_single = jnp.where(d_cone < d_exist, 0, 1)

        adjacent = jnp.abs(closest - second) == 1
        v1 = near2[0] - cone
        v2 = near2[1] - cone
        between = geo.vec_angle_between(v1, v2) > jnp.pi / 2
        idx_multi = jnp.where(
            between,
            jnp.minimum(closest, second) + 1,
            jnp.where(closest < second, closest, closest + 1),
        )

        idx = jnp.where(count == 1, idx_single, idx_multi)
        do = do & ((count == 1) | adjacent) & (count < s)

        # branchless shift-insert (shift is a static slice, not a gather)
        buf_shift = jnp.concatenate([buf[:1], buf[:-1]], axis=0)
        shifted = jnp.where((iota[:, None] > idx) & do, buf_shift, buf)
        new_buf = jnp.where((iota[:, None] == idx) & do, cone, shifted)
        return new_buf, count + do.astype(count.dtype)

    return jax.lax.fori_loop(0, v, body, (existing, existing_count))


def combine_and_sort_virtual_with_real(
    other_cones: Array,
    other_mask: Array,
    virtual_cones: Array,
    virtual_mask: Array,
    car_position: Array,
) -> tuple[Array, Array, Array]:
    """Reference combine_and_sort_virtual_with_real (:306-337): merge virtual
    cones into the real other-side trace, drop sharp (<85 deg) kinks, flag
    virtuals by distance. Returns (cones, mask, is_virtual)."""
    s = other_cones.shape[0]
    n_other = jnp.sum(other_mask)
    n_virtual = jnp.sum(virtual_mask)

    # larger array hosts, smaller is inserted (:204-208); ties host the virtuals
    other_hosts = n_other > n_virtual

    host = jnp.where(other_hosts, other_cones, virtual_cones)
    host_count = jnp.where(other_hosts, n_other, n_virtual)
    ins = jnp.where(other_hosts, virtual_cones, other_cones)
    ins_mask = jnp.where(other_hosts, virtual_mask, other_mask)

    merged, merged_count = _insert_virtual_cones(
        host, host_count, ins, ins_mask, car_position
    )
    merged_mask = jnp.arange(s) < merged_count

    # remove sharp kinks (:252-259) — interior angles < 85 deg
    angles = geo.trace_angles_between(merged)  # (s-2,)
    interior = (jnp.arange(1, s - 1) < merged_count - 1) & (merged_count >= 3)
    low = jnp.concatenate(
        [
            jnp.zeros(1, bool),
            (angles < jnp.deg2rad(85.0)) & interior,
            jnp.zeros(1, bool),
        ]
    )
    keep = merged_mask & ~low
    order, valid = geo.stable_compact(keep)
    merged = gl.take_rows(merged, order)
    merged_mask = valid

    # virtual flag: farther than epsilon from every real cone (:331-335)
    d2 = geo.cdist_sq(merged, other_cones)
    d2 = jnp.where(other_mask[None, :], d2, jnp.inf)
    is_virtual = jnp.where(
        merged_mask, jnp.min(d2, axis=1) > 1e-4, False
    )

    # degenerate cases (:317-325)
    no_other = n_other == 0
    no_virtual = n_virtual == 0
    cones_out = jnp.where(no_other, virtual_cones, jnp.where(no_virtual, other_cones, merged))
    mask_out = jnp.where(no_other, virtual_mask, jnp.where(no_virtual, other_mask, merged_mask))
    virt_out = jnp.where(
        no_other, virtual_mask, jnp.where(no_virtual, jnp.zeros(s, bool), is_virtual)
    )
    return cones_out, mask_out, virt_out


def _matches_for_side(
    cfg: PlannerConfig,
    cones: Array,
    cones_mask: Array,
    cone_type: int,
    other: Array,
    other_mask: Array,
) -> tuple[Array, Array]:
    """Reference calculate_matches_for_side (:340-384).

    Returns (matches (S,), search_directions (S, 2))."""
    m = cfg.matching
    dirs = match_search_directions(cones, cones_mask, cone_type)
    other_type = ConeTypes.LEFT if cone_type == ConeTypes.RIGHT else ConeTypes.RIGHT
    other_dirs = match_search_directions(other, other_mask, other_type)
    # reference: other side needs > 1 cones for directions, else zeros
    other_dirs = jnp.where(jnp.sum(other_mask) > 1, other_dirs, 0.0)

    cand = potential_matches_mask(
        cones,
        cones_mask,
        dirs,
        other,
        other_mask,
        other_dirs,
        m.major_radius,
        m.minor_radius,
        m.max_search_angle,
    )
    matches = select_best_match(
        cones, cones_mask, cand, other, other_mask, m.matches_should_be_monotonic
    )
    # reference: sides with < 2 cones produce no matches (:352-382)
    matches = jnp.where(jnp.sum(cones_mask) > 1, matches, -1)
    return matches, dirs


def _cones_for_other_side(
    cfg: PlannerConfig,
    cones: Array,
    cones_mask: Array,
    cone_type: int,
    other: Array,
    other_mask: Array,
    position: Array,
) -> tuple[Array, Array, Array]:
    """Reference calculate_cones_for_other_side (:387-440)."""
    s = cones.shape[0]
    matches, dirs = _matches_for_side(cfg, cones, cones_mask, cone_type, other, other_mask)

    unmatched = (matches == -1) & cones_mask
    virtual = cones + dirs * cfg.matching.min_track_width
    order, virt_valid = geo.stable_compact(unmatched)
    virtual = gl.take_rows(virtual, order)

    combined, combined_mask, is_virtual = combine_and_sort_virtual_with_real(
        other, other_mask, virtual, virt_valid, position
    )

    # < 2 combined -> keep plain other side (:436-438)
    too_few = jnp.sum(combined_mask) < 2
    combined = jnp.where(too_few, other, combined)
    combined_mask = jnp.where(too_few, other_mask, combined_mask)
    is_virtual = jnp.where(too_few, jnp.zeros(s, bool), is_virtual)

    # this side needs >= 2 cones to produce virtuals at all (:536-541)
    inactive = jnp.sum(cones_mask) < 2
    combined = jnp.where(inactive, other, combined)
    combined_mask = jnp.where(inactive, other_mask, combined_mask)
    is_virtual = jnp.where(inactive, jnp.zeros(s, bool), is_virtual)
    return combined, combined_mask, is_virtual


def run_cone_matching(cfg: PlannerConfig, inp: MatchingInput) -> MatchingOutput:
    """Reference calculate_virtual_cones_for_both_sides (:479-588)."""
    s = inp.left_cones.shape[0]
    n_l = jnp.sum(inp.left_mask)
    n_r = jnp.sum(inp.right_mask)

    # side-discard guard (:513-521)
    min_len = jnp.minimum(n_l, n_r)
    max_len = jnp.maximum(n_l, n_r)
    discard = (min_len == 0) | (max_len > 2 * min_len)
    drop_left = discard & (n_l < n_r)
    drop_right = discard & ~(n_l < n_r)

    left_mask = inp.left_mask & ~drop_left
    right_mask = inp.right_mask & ~drop_right

    right_w, right_w_mask, right_virt = _cones_for_other_side(
        cfg, inp.left_cones, left_mask, ConeTypes.LEFT,
        inp.right_cones, right_mask, inp.position,
    )
    left_w, left_w_mask, left_virt = _cones_for_other_side(
        cfg, inp.right_cones, right_mask, ConeTypes.RIGHT,
        inp.left_cones, left_mask, inp.position,
    )

    l2r, _ = _matches_for_side(
        cfg, left_w, left_w_mask, ConeTypes.LEFT, right_w, right_w_mask
    )
    r2l, _ = _matches_for_side(
        cfg, right_w, right_w_mask, ConeTypes.RIGHT, left_w, left_w_mask
    )

    # both sides < 2 -> empty result (:508-511)
    degenerate = (n_l < 2) & (n_r < 2)
    empty_mask = jnp.zeros(s, bool)
    return MatchingOutput(
        left_cones=left_w,
        left_mask=jnp.where(degenerate, empty_mask, left_w_mask),
        left_virtual_mask=jnp.where(degenerate, empty_mask, left_virt),
        right_cones=right_w,
        right_mask=jnp.where(degenerate, empty_mask, right_w_mask),
        right_virtual_mask=jnp.where(degenerate, empty_mask, right_virt),
        left_to_right=jnp.where(degenerate, -1, l2r),
        right_to_left=jnp.where(degenerate, -1, r2l),
    )
