"""Synthetic scenario generation + perturbations as batch axes.

The reference's "fault injection" is demo flags (color stripping, cone
shuffling, missing cones — SURVEY.md §5). Here perturbations are generators
producing padded frame batches: noise, dropout and color-masking become data,
solved as one vmapped program.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import PlannerConfig
from ft_fsd_path_planning_tpu.models.planner import FrameInput
from ft_fsd_path_planning_tpu.utils.cone_types import ConeTypes


def corridor_scenario(
    curv: float, n_cones_side: int = 10, width: float = 3.0, spacing: float = 3.5
):
    """A cone corridor along an arc of the given curvature sign/strength."""
    s = np.arange(n_cones_side) * spacing
    if abs(curv) < 1e-9:
        center = np.stack([s, np.zeros(n_cones_side)], axis=1)
        normal = np.tile([[0.0, 1.0]], (n_cones_side, 1))
    else:
        radius = 30.0 / curv
        ang = s / radius
        center = radius * np.stack([np.sin(ang), 1 - np.cos(ang)], axis=1)
        normal = np.stack([-np.sin(ang), np.cos(ang)], axis=1)
    left = center + normal * width / 2
    right = center - normal * width / 2
    return left, right


def closed_track_scenario(
    seed: int = 0,
    base_radius: float = 36.0,
    half_width: float = 1.5,
    spacing: float = 3.5,
    n_unknown: int = 6,
):
    """A closed FSG-autocross-like map: a smooth random loop with cones on
    both borders plus a few off-track UNKNOWN distractors.

    This is the workload the reference actually runs on — it flattens the
    WHOLE SLAM map every frame (core_trace_sorter.py:37-54), so a realistic
    frame carries 150-250 cones, most of them far from the car. Returns
    ``(left, right, unknown, centerline, tangents)`` with the centerline
    sampled uniformly in arc length (car poses for replay come from it).
    """
    rng = np.random.default_rng(seed)

    # radial harmonics: smooth, closed, no self-intersection for small amps
    theta = np.linspace(0.0, 2 * np.pi, 4096, endpoint=False)
    r = np.full_like(theta, base_radius)
    for k in (2, 3, 4):
        amp = base_radius * rng.uniform(0.03, 0.10)
        r = r + amp * np.cos(k * theta + rng.uniform(0, 2 * np.pi))
    center = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)

    # resample uniformly in arc length
    seg = np.linalg.norm(np.diff(center, axis=0, append=center[:1]), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])[:-1]
    total = s[-1] + seg[-1]
    n_samples = int(total / spacing)
    su = np.arange(n_samples) * (total / n_samples)
    cx = np.interp(su, s, center[:, 0], period=total)
    cy = np.interp(su, s, center[:, 1], period=total)
    cl = np.stack([cx, cy], axis=1)

    tangent = np.roll(cl, -1, axis=0) - np.roll(cl, 1, axis=0)
    tangent /= np.linalg.norm(tangent, axis=1, keepdims=True)
    normal = np.stack([-tangent[:, 1], tangent[:, 0]], axis=1)

    # counter-clockwise loop: inner border is LEFT (blue), outer is RIGHT
    left = cl + normal * half_width
    right = cl - normal * half_width
    unknown = (
        cl[rng.integers(0, n_samples, n_unknown)]
        + rng.normal(0, 1.0, (n_unknown, 2))
        + normal[rng.integers(0, n_samples, n_unknown)] * rng.uniform(
            4.0, 8.0, (n_unknown, 1)
        )
    )
    return left, right, unknown, cl, tangent


def closed_track_frames(seed: int = 0, n_frames: int = 8, **kwargs):
    """Whole-map frames with the car stepping along the closed track."""
    left, right, unknown, cl, tangent = closed_track_scenario(seed, **kwargs)
    n = len(cl)
    frames = []
    for i in range(n_frames):
        j = (i * n) // n_frames
        cones = [np.zeros((0, 2)) for _ in range(5)]
        cones[ConeTypes.UNKNOWN] = unknown
        cones[ConeTypes.LEFT] = left
        cones[ConeTypes.RIGHT] = right
        frames.append((cones, cl[j].copy(), tangent[j].copy()))
    return frames


def make_frame_batch(
    cfg: PlannerConfig,
    batch: int,
    seed: int = 0,
    noise: float = 0.05,
    dropout: float = 0.1,
    colorless: float = 0.2,
) -> FrameInput:
    """Build a (B, ...) FrameInput of perturbed corridor scenarios."""
    rng = np.random.default_rng(seed)
    n = cfg.shapes.n_cones

    cones = np.zeros((batch, n, 3), np.float32)
    cones[:, :, 2] = -1.0
    mask = np.zeros((batch, n), bool)
    positions = np.zeros((batch, 2), np.float32)
    directions = np.zeros((batch, 2), np.float32)

    for b in range(batch):
        curv = rng.uniform(-1.2, 1.2)
        left, right = corridor_scenario(curv, n_cones_side=int(rng.integers(7, 12)))
        left = left + rng.normal(0, noise, left.shape)
        right = right + rng.normal(0, noise, right.shape)
        keep_l = rng.random(len(left)) > dropout
        keep_r = rng.random(len(right)) > dropout
        left, right = left[keep_l], right[keep_r]

        strip_l = rng.random(len(left)) < colorless
        strip_r = rng.random(len(right)) < colorless

        rows = []
        for pts in (left[strip_l], right[strip_r]):
            for p in pts:
                rows.append((p[0], p[1], ConeTypes.UNKNOWN))
        for p in right[~strip_r]:
            rows.append((p[0], p[1], ConeTypes.RIGHT))
        for p in left[~strip_l]:
            rows.append((p[0], p[1], ConeTypes.LEFT))

        rows = rows[:n]
        cones[b, : len(rows)] = rows
        mask[b, : len(rows)] = True
        positions[b] = (0.0, 0.0)
        directions[b] = (1.0, 0.0)

    return FrameInput(
        cones=jnp.asarray(cones),
        mask=jnp.asarray(mask),
        position=jnp.asarray(positions),
        direction=jnp.asarray(directions),
    )
