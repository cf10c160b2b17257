"""Known mission paths, generated from the official track geometry.

The reference ships a hardcoded 5786x2 skidpad point table
(`relocalization/skidpad/skidpad_path_data.py`) and generates the
acceleration path at import (`acceleration_relocalization.py:175-210`). Both
are reproduced here *from the underlying FSG track geometry* (not copied):

Skidpad (FSG rules / measured from the reference table's structure):
  - entry straight x in [-20, 0] along y = 0
  - two full right-hand laps: circle of radius 9.125 m centered (0, -9.125)
  - two full left-hand laps: circle of radius 9.125 m centered (0, +9.125)
  - exit straight x in [0, 40]
  - ~0.05 m point spacing, tiny y-noise so downstream spline fits never see
    exactly collinear points (the reference table has the same jitter)

Acceleration: 0.2 m-step rectangle -10..150 m with sigma=0.01 noise
(seeded), matching the reference generator's shape.
"""

from __future__ import annotations

import numpy as np

_SKIDPAD_RADIUS = 9.125
_SKIDPAD_SPACING = 0.05
_CENTER_SEPARATION = 18.25  # distance between loop centers


def _circle_points(center: np.ndarray, radius: float, start_angle: float,
                   end_angle: float, spacing: float) -> np.ndarray:
    arc_len = abs(end_angle - start_angle) * radius
    n = int(round(arc_len / spacing))
    ang = np.linspace(start_angle, end_angle, n, endpoint=False)
    return center + radius * np.stack([np.cos(ang), np.sin(ang)], axis=1)


def generate_skidpad_path() -> np.ndarray:
    rng = np.random.default_rng(7)
    spacing = _SKIDPAD_SPACING

    entry_x = np.arange(-20.0, 0.0, spacing)
    entry = np.stack([entry_x, np.zeros_like(entry_x)], axis=1)

    right_center = np.array([0.0, -_SKIDPAD_RADIUS])
    left_center = np.array([0.0, +_SKIDPAD_RADIUS])

    # right loops: start at origin (angle pi/2 w.r.t. right center), clockwise
    right_loop = _circle_points(right_center, _SKIDPAD_RADIUS, np.pi / 2,
                                np.pi / 2 - 2 * np.pi, spacing)
    # left loops: start at origin (angle -pi/2 w.r.t. left center), counter-cw
    left_loop = _circle_points(left_center, _SKIDPAD_RADIUS, -np.pi / 2,
                               -np.pi / 2 + 2 * np.pi, spacing)

    exit_x = np.arange(0.0, 40.0, spacing)
    exit_ = np.stack([exit_x, np.zeros_like(exit_x)], axis=1)

    path = np.concatenate([entry, right_loop, right_loop, left_loop, left_loop, exit_])
    path = path + rng.normal(0.0, 1e-3, path.shape)
    return path.astype(np.float64)


def generate_acceleration_path() -> np.ndarray:
    """Same shape as the reference generator (acceleration_relocalization.py:
    175-207): out along +x, across, back, across."""
    rng = np.random.default_rng(42)
    path_x = np.arange(-10, 150, 0.2)
    path_y = rng.normal(0, 0.01, len(path_x))

    path_2_y = np.arange(0, 5, 0.2)
    path_2_x = rng.normal(0, 0.01, len(path_2_y)) + path_x[-1]

    path_3_x = path_x[::-1]
    path_3_y = path_y[::-1] + path_2_y[-1]

    path_4_y = path_2_y[::-1]
    path_4_x = rng.normal(0, 0.01, len(path_4_y)) + path_x[0]

    xs = np.concatenate([path_x, path_2_x, path_3_x, path_4_x])
    ys = np.concatenate([path_y, path_2_y, path_3_y, path_4_y])
    return np.stack([xs, ys], axis=1)


BASE_SKIDPAD_PATH = generate_skidpad_path()
BASE_ACCELERATION_PATH = generate_acceleration_path()
