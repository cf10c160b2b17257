"""Windowed circle-fit curvature + box filtering, masked and batched.

Re-design of the reference's Numba curvature kernel
(`calculate_path/path_parameterization.py:49-108`) and its
`scipy.ndimage.uniform_filter1d` smoothing (:185-193): per-sample sliding
windows become a stack of statically-shifted copies of the path (each
`jnp.roll` is two slices + a concat — no gather traffic on TPU) with the
dynamic window size expressed as a validity mask over a fixed W budget, plus
one vmapped masked circle fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops import gatherless as gl
from ft_fsd_path_planning_tpu.ops.geometry import circle_fit

Array = jax.Array


def _rolled_windows(values: Array, max_window: int) -> Array:
    """(P, ...) -> (P, W, ...) with out[i, d] = values[(i - W//2 + d) mod P].

    Static shifts only: each slice of the stack is a roll, which XLA lowers
    to two contiguous slices and a concatenation — far cheaper on TPU than a
    (P, W) gather. Wrapped entries must be masked by the caller.
    """
    half = max_window // 2
    return jnp.stack(
        [jnp.roll(values, half - d, axis=0) for d in range(max_window)], axis=1
    )


def path_curvature(
    points: Array,
    n_valid: Array,
    window_size: Array,
    max_window: int,
    radius_min: float = 1.0,
    radius_max: float = 3000.0,
) -> Array:
    """Signed curvature at every sample of an open path.

    Args:
        points: (P, 2) dense path samples (padding after n_valid).
        n_valid: () number of valid samples.
        window_size: () odd window length (traced; <= max_window).
        max_window: static window budget W (odd).

    Returns:
        (P,) signed curvature (1/r, sign from local orientation), zeros on
        padding.
    """
    p = points.shape[0]
    half = (window_size - 1) // 2
    shalf = max_window // 2

    centers = jnp.arange(p)
    offs = jnp.arange(max_window)
    # static window [i - W//2, i + W//2]; the dynamic window selects the
    # central 2*half+1 slots; truncated at both path ends
    # (reference: cyclic windows + cut at the wrap discontinuity == clamping)
    raw = centers[:, None] - shalf + offs[None, :]  # (P, W)
    in_window = jnp.abs(offs[None, :] - shalf) <= half
    valid = (raw >= 0) & (raw < n_valid) & in_window & (centers[:, None] < n_valid)
    win_pts = _rolled_windows(points, max_window)  # (P, W, 2)

    circ = circle_fit(win_pts, valid)  # (P, 3)
    radius = jnp.clip(circ[:, 2], radius_min, radius_max)
    curvature = 1.0 / radius

    # orientation sign via det of [1, x, y] rows of first/mid/last window points
    first_off = jnp.argmax(valid, axis=1)
    count = jnp.sum(valid, axis=1)
    last_off = first_off + jnp.maximum(count - 1, 0)
    mid_off = first_off + count // 2  # reference: index len//2 of the window
    mid_off = jnp.minimum(mid_off, last_off)

    def take(offsets):
        # per-row slot pick as a one-hot reduce (gathers hit the slow path)
        return gl.select_slot(win_pts, jnp.clip(offsets, 0, max_window - 1))

    p0, p1, p2 = take(first_off), take(mid_off), take(last_off)
    det = (p1[:, 0] - p0[:, 0]) * (p2[:, 1] - p0[:, 1]) - (p1[:, 1] - p0[:, 1]) * (
        p2[:, 0] - p0[:, 0]
    )
    signed = curvature * jnp.sign(det)
    return jnp.where(centers < n_valid, signed, 0.0)


def uniform_filter1d_nearest(
    values: Array, n_valid: Array, size: Array, max_size: int
) -> Array:
    """`scipy.ndimage.uniform_filter1d(mode="nearest")` with traced size.

    scipy centers an even-sized window at offset -(size // 2): indices
    [i - size//2, i + size - size//2 - 1]; out-of-range indices clamp to the
    edges (nearest), i.e. the first/last valid sample contribute once per
    clamped slot. Expressed as a static rolled-window sum plus closed-form
    edge corrections — no (P, W) gather.
    """
    p = values.shape[0]
    centers = jnp.arange(p)
    offs = jnp.arange(max_size)
    shalf = max_size // 2

    vals_masked = jnp.where(centers < n_valid, values, 0.0)
    win = _rolled_windows(vals_masked, max_size)  # (P, W)

    # dynamic window [i - size//2, i - size//2 + size) in static slot space
    lo_slot = shalf - size // 2
    in_window = (offs[None, :] >= lo_slot) & (offs[None, :] < lo_slot + size)
    raw = centers[:, None] - shalf + offs[None, :]
    in_range = (raw >= 0) & (raw < n_valid)
    body = jnp.sum(jnp.where(in_window & in_range, win, 0.0), axis=1)

    # clamped-slot corrections: below-range slots read values[0], above-range
    # slots read values[n_valid - 1]
    n_below = jnp.clip(size // 2 - centers, 0, size)
    n_above = jnp.clip(centers - size // 2 + size - 1 - (n_valid - 1), 0, size)
    v_first = values[0]
    v_last = gl.take_vec(values, jnp.clip(n_valid - 1, 0, p - 1)[None])[0]

    out = (body + n_below * v_first + n_above * v_last) / jnp.maximum(size, 1)
    return jnp.where(centers < n_valid, out, 0.0)
