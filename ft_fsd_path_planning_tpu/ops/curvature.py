"""Windowed circle-fit curvature + box filtering, masked and batched.

Re-design of the reference's Numba curvature kernel
(`calculate_path/path_parameterization.py:49-108`) and its
`scipy.ndimage.uniform_filter1d` smoothing (:185-193): per-sample sliding
windows become a static (P, W) gather + one vmapped masked circle fit, the
dynamic window size becomes a validity mask over a fixed W budget.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops.geometry import circle_fit

Array = jax.Array


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
        max_window: static window budget W.

    Returns:
        (P,) signed curvature (1/r, sign from local orientation), zeros on
        padding.
    """
    p = points.shape[0]
    half = (window_size - 1) // 2

    centers = jnp.arange(p)
    offs = jnp.arange(max_window)
    # raw window indices centered at each sample, truncated at both path ends
    # (reference: cyclic windows + cut at the wrap discontinuity == clamping)
    raw = centers[:, None] - half + offs[None, :]  # (P, W)
    in_window = offs[None, :] < window_size
    valid = (raw >= 0) & (raw < n_valid) & in_window & (centers[:, None] < n_valid)
    idx = jnp.clip(raw, 0, p - 1)
    win_pts = points[idx]  # (P, W, 2)

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
        gathered = jnp.take_along_axis(
            win_pts, jnp.clip(offsets, 0, max_window - 1)[:, None, None], axis=1
        )
        return gathered[:, 0, :]

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
    edges (nearest). Padding slots (>= n_valid) are excluded by clamping to
    the last valid sample.
    """
    p = values.shape[0]
    centers = jnp.arange(p)
    offs = jnp.arange(max_size)
    raw = centers[:, None] - size // 2 + offs[None, :]
    in_window = offs[None, :] < size
    idx = jnp.clip(raw, 0, jnp.maximum(n_valid - 1, 0))
    gathered = jnp.where(in_window, values[idx], 0.0)
    out = jnp.sum(gathered, axis=1) / jnp.maximum(size, 1)
    return jnp.where(centers < n_valid, out, 0.0)
