"""Batched 2-D geometry kernels.

TPU-native re-design of the reference Numba kernel library
(`fsd_path_planning/utils/math_utils.py`): every function here is pure jnp,
shape-polymorphic over leading batch axes, mask-aware where the reference used
ragged arrays, and safe to ``vmap``/``jit``. Scalar loops in the reference
(normalize, circle-fit Newton) become fixed-iteration vector programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_EPS = 1e-12


def vec_dot(a: Array, b: Array) -> Array:
    """Elementwise dot over last axis (math_utils.py:41-53)."""
    return jnp.sum(a * b, axis=-1)


def norm_last_axis(a: Array) -> Array:
    return jnp.sqrt(jnp.maximum(vec_dot(a, a), 0.0))


def normalize_last_axis(a: Array) -> Array:
    """Unit vectors; zero vectors map to zero (reference divides by 0 -> nan;
    we keep it finite for mask-padded slots)."""
    n = norm_last_axis(a)
    return a / jnp.maximum(n, _EPS)[..., None]


def vec_angle_between(a: Array, b: Array) -> Array:
    """Angle in [0, pi] between vectors of the last axis (math_utils.py:70-100)."""
    cos_theta = vec_dot(a, b) / jnp.maximum(norm_last_axis(a) * norm_last_axis(b), _EPS)
    return jnp.arccos(jnp.clip(cos_theta, -1.0, 1.0))


def rotate(points: Array, theta: Array) -> Array:
    """Rotate points (..., 2) by angle(s) theta around the origin
    (math_utils.py:103-117). ``theta`` broadcasts against the batch shape."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x, y = points[..., 0], points[..., 1]
    return jnp.stack([c * x - s * y, s * x + c * y], axis=-1)


def angle_from_2d_vector(v: Array) -> Array:
    return jnp.arctan2(v[..., 1], v[..., 0])


def unit_2d_vector_from_angle(rad: Array) -> Array:
    rad = jnp.asarray(rad)
    return jnp.stack([jnp.cos(rad), jnp.sin(rad)], axis=-1)


def angle_difference(angle1: Array, angle2: Array) -> Array:
    """Wrapped difference in [-pi, pi); order matters (math_utils.py:663-676)."""
    return (angle1 - angle2 + 3 * jnp.pi) % (2 * jnp.pi) - jnp.pi


def cdist_sq(a: Array, b: Array) -> Array:
    """Pairwise squared euclidean distances (..., M, K) x (..., N, K) -> (..., M, N).

    The reference uses a 3K-wide matmul trick (math_utils.py:120-150); on TPU a
    single |a|^2 + |b|^2 - 2ab matmul rides the MXU and XLA fuses the rest.
    """
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.matmul(a, jnp.swapaxes(b, -1, -2), precision=jax.lax.Precision.HIGHEST)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


def trace_distance_to_next(trace: Array) -> Array:
    """Distance from each point to the next (math_utils.py:223-234)."""
    return norm_last_axis(jnp.diff(trace, axis=-2))


def trace_angles_between(trace: Array) -> Array:
    """Interior angle at each inner point of a polyline (math_utils.py:237-252)."""
    to_next = jnp.diff(trace, axis=-2)
    mid_to_next = to_next[..., 1:, :]
    mid_to_prev = -to_next[..., :-1, :]
    return vec_angle_between(mid_to_next, mid_to_prev)


def points_inside_ellipse(
    points: Array,
    center: Array,
    major_direction: Array,
    major_radius: Array,
    minor_radius: Array,
) -> Array:
    """Boolean mask of points strictly inside a rotated ellipse
    (math_utils.py:493-530). Broadcasts over leading axes."""
    centered = points - center
    angle = jnp.arctan2(major_direction[..., 1], major_direction[..., 0])
    rotated = rotate(centered, -angle[..., None] if jnp.ndim(angle) else -angle)
    crit = (rotated[..., 0] / major_radius) ** 2 + (rotated[..., 1] / minor_radius) ** 2
    return crit < 1.0


def lerp(values: Array, start1: Array, stop1: Array, start2: Array, stop2: Array) -> Array:
    return (values - start1) / (stop1 - start1) * (stop2 - start2) + start2


def circle_fit(points: Array, mask: Array | None = None, max_iter: int = 32) -> Array:
    """Masked hyper-fit circle estimation -> [cx, cy, r].

    Same algebraic method as the reference's njit'd hyper fit
    (math_utils.py:579-646: moment matrix + Newton on the characteristic
    polynomial) but expressed as a fixed-iteration vector program with a
    keep-last-good carry, so it vmaps over thousands of point sets at once.

    Args:
        points: (..., P, 2)
        mask: optional (..., P) boolean validity; invalid points get weight 0.
    """
    if mask is None:
        w = jnp.ones(points.shape[:-1], dtype=points.dtype)
    else:
        w = mask.astype(points.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1), 1.0)

    mean = jnp.sum(points * w[..., None], axis=-2) / n[..., None]
    xi = (points[..., 0] - mean[..., 0:1]) * w
    yi = (points[..., 1] - mean[..., 1:2]) * w
    # note: xi, yi already weighted once; use raw centered values for products
    xc = points[..., 0] - mean[..., 0:1]
    yc = points[..., 1] - mean[..., 1:2]
    zi = xc * xc + yc * yc

    def m(p, q):
        return jnp.sum(p * q * w, axis=-1) / n

    mxy = m(xc, yc)
    mxx = m(xc, xc)
    myy = m(yc, yc)
    mxz = m(xc, zi)
    myz = m(yc, zi)
    mzz = m(zi, zi)

    mz = mxx + myy
    cov_xy = mxx * myy - mxy * mxy
    var_z = mzz - mz * mz

    a2 = 4 * cov_xy - 3 * mz * mz - mzz
    a1 = var_z * mz + 4.0 * cov_xy * mz - mxz * mxz - myz * myz
    a0 = mxz * (mxz * myy - myz * mxy) + myz * (myz * mxx - mxz * mxy) - var_z * cov_xy
    a22 = a2 + a2

    def newton_body(_, carry):
        x, y, done = carry
        dy = a1 + x * (a22 + 16.0 * x * x)
        x_new = x - y / jnp.where(dy == 0, 1.0, dy)
        y_new = a0 + x_new * (a1 + x_new * (a2 + 4.0 * x_new * x_new))
        stop = (x_new == x) | ~jnp.isfinite(x_new) | (jnp.abs(y_new) >= jnp.abs(y))
        newly_done = done | stop
        x_next = jnp.where(done | stop, x, x_new)
        y_next = jnp.where(done | stop, y, y_new)
        return x_next, y_next, newly_done

    x0 = jnp.zeros_like(a0)
    y0 = a0
    done0 = jnp.zeros_like(a0, dtype=bool)
    x, _, _ = jax.lax.fori_loop(0, max_iter, newton_body, (x0, y0, done0))

    det = x * x - x * mz + cov_xy
    # clamp |det| >= eps keeping its sign (sign 0 counts as +): a plain
    # sign(det)*eps would collapse to 0 for det == 0
    det_sign = jnp.where(det < 0, -1.0, 1.0)
    det = det_sign * jnp.maximum(jnp.abs(det), _EPS)
    xc_center = (mxz * (myy - x) - myz * mxy) / det / 2.0
    yc_center = (myz * (mxx - x) - mxz * mxy) / det / 2.0

    cx = xc_center + mean[..., 0]
    cy = yc_center + mean[..., 1]
    r = jnp.sqrt(jnp.abs(xc_center**2 + yc_center**2 + mz))
    return jnp.stack([cx, cy, r], axis=-1)


def segments_intersect(
    a_start: Array, a_end: Array, b_start: Array, b_end: Array, eps: float = 1e-6
) -> Array:
    """Proper segment-segment intersection test, broadcasting over batch axes.

    Re-design of the reference's homogeneous-cross-product test
    (line_segment_intersection.py:18-200) using signed-area orientation
    predicates, which handle the parallel/collinear case uniformly without
    branches.
    """

    def orient(p, q, r):
        return (q[..., 0] - p[..., 0]) * (r[..., 1] - p[..., 1]) - (
            q[..., 1] - p[..., 1]
        ) * (r[..., 0] - p[..., 0])

    d1 = orient(b_start, b_end, a_start)
    d2 = orient(b_start, b_end, a_end)
    d3 = orient(a_start, a_end, b_start)
    d4 = orient(a_start, a_end, b_end)

    proper = ((d1 > eps) & (d2 < -eps) | (d1 < -eps) & (d2 > eps)) & (
        (d3 > eps) & (d4 < -eps) | (d3 < -eps) & (d4 > eps)
    )

    def on_segment(p, q, r):
        # r collinear with pq and inside bounding box
        within_x = (r[..., 0] >= jnp.minimum(p[..., 0], q[..., 0]) - eps) & (
            r[..., 0] <= jnp.maximum(p[..., 0], q[..., 0]) + eps
        )
        within_y = (r[..., 1] >= jnp.minimum(p[..., 1], q[..., 1]) - eps) & (
            r[..., 1] <= jnp.maximum(p[..., 1], q[..., 1]) + eps
        )
        return within_x & within_y

    collinear_touch = (
        (jnp.abs(d1) <= eps) & on_segment(b_start, b_end, a_start)
        | (jnp.abs(d2) <= eps) & on_segment(b_start, b_end, a_end)
        | (jnp.abs(d3) <= eps) & on_segment(a_start, a_end, b_start)
        | (jnp.abs(d4) <= eps) & on_segment(a_start, a_end, b_end)
    )
    return proper | collinear_touch


def polyline_self_intersections(points: Array, mask: Array) -> Array:
    """Count intersecting non-adjacent segment pairs of a masked polyline.

    Batched re-design of the reference's per-config self-intersection
    counters (line_segment_intersection.py:320-441, used by its sorting
    debug page): all segment pairs are tested at once with the orientation
    predicate; adjacent pairs (sharing an endpoint) are excluded, matching
    the reference's number_of_intersections_in_configuration semantics.
    Broadcasts over leading batch axes of ``points`` (..., L, 2) / ``mask``
    (..., L).
    """
    a_start = points[..., :-1, :]
    a_end = points[..., 1:, :]
    seg_ok = mask[..., :-1] & mask[..., 1:]
    hit = segments_intersect(
        a_start[..., :, None, :],
        a_end[..., :, None, :],
        a_start[..., None, :, :],
        a_end[..., None, :, :],
    )
    m = points.shape[-2] - 1
    i = jnp.arange(m)
    non_adjacent = jnp.abs(i[:, None] - i[None, :]) > 1
    pair_ok = seg_ok[..., :, None] & seg_ok[..., None, :] & non_adjacent
    return jnp.sum(hit & pair_ok, axis=(-2, -1)) // 2


def masked_median(values: Array, mask: Array, axis: int = -1) -> Array:
    """Median over the masked elements (matches np.median incl. even-count mean)."""
    big = jnp.finfo(values.dtype).max
    filled = jnp.where(mask, values, big)
    sorted_vals = jnp.sort(filled, axis=axis)
    count = jnp.sum(mask, axis=axis)
    lo_idx = jnp.maximum((count - 1) // 2, 0)
    hi_idx = jnp.maximum(count // 2, 0)
    # per-row slot picks as one-hot reductions (gathers hit the TPU slow path)
    if axis != -1 and axis != values.ndim - 1:
        raise ValueError("masked_median supports axis=-1 only")
    iota = jnp.arange(values.shape[-1])
    lo = jnp.sum(jnp.where(iota == lo_idx[..., None], sorted_vals, 0.0), axis=-1)
    hi = jnp.sum(jnp.where(iota == hi_idx[..., None], sorted_vals, 0.0), axis=-1)
    # Empty rows pick lo = hi = f32 max, whose sum overflows to inf.  Writing
    # `0.5*lo + 0.5*hi` is NOT a fix: XLA's algebraic simplifier rewrites it
    # back to 0.5*(lo+hi) under jit, and an inf result then NaN-poisons any
    # downstream one-hot contraction (0*inf).  Select the fill value for
    # empty rows explicitly — a where() cannot be simplified away.
    med = 0.5 * (lo + hi)
    return jnp.where(count > 0, med, big)


def masked_argmin(values: Array, mask: Array, axis: int = -1) -> Array:
    """Argmin restricted to masked slots (invalid -> +inf)."""
    big = jnp.asarray(jnp.inf, dtype=values.dtype)
    return jnp.argmin(jnp.where(mask, values, big), axis=axis)


def stable_compact(mask: Array, length: int | None = None) -> tuple[Array, Array]:
    """Indices that gather the True slots of ``mask`` to the front, stably.

    Returns (gather_indices, valid_mask_of_output). The TPU replacement for
    boolean fancy-indexing: ``x[mask]`` becomes ``x[idx] * valid``.
    """
    n = mask.shape[-1]
    length = n if length is None else length
    iota = jnp.arange(n)
    key = jnp.where(mask, iota, n + iota)  # stable: invalid pushed back, order kept
    order = jnp.argsort(key, axis=-1)
    if length <= n:
        order = order[..., :length]
    else:
        pad = jnp.zeros(order.shape[:-1] + (length - n,), order.dtype)
        order = jnp.concatenate([order, pad], axis=-1)
    count = jnp.sum(mask, axis=-1)
    valid = jnp.arange(length) < count[..., None] if mask.ndim > 1 else jnp.arange(length) < count
    return order, valid
