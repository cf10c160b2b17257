"""Spline-stack support ops: chord parameterization + banded SPD solves.

The round-3 penalized-LSQ spline engine that used to live here was replaced
in round 4 by the FITPACK-exact adaptive-knot emulation (`ops/fitpack.py`) —
the rung-ladder matched FITPACK's residual *budget* but not its residual
*shape*, costing 10-27 cm of skidpad replay parity at the loop transitions.
What remains here is the shared plumbing both the old and new engines were
built on:

* `chord_lengths` — the reference's ``u = [0, cumsum(dists)]``
  parameterization (utils/spline_fit.py:113-115) with the duplicate-point
  validity flag that mirrors splprep's ValueError;
* `_solve_spd_banded` / `_banded_solve` — half-bandwidth-<=4 SPD solves on
  the Pallas lane-batched banded Cholesky kernel
  (`ops/pallas/banded_cholesky.py`), with a `custom_vmap` that collapses
  any stack of batch axes into the kernel's lane-batched system axis and
  one round of iterative refinement to recover f32 accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops.pallas.banded_cholesky import (
    banded_cholesky_solve,
    dense_to_band,
)

Array = jax.Array


def _use_pallas_solver() -> bool:
    """The Pallas lane-batched banded kernel runs on real TPU backends; the
    CPU test mesh keeps XLA's dense Cholesky (pallas interpret mode would be
    slower than dense there)."""
    return jax.default_backend() != "cpu"


def _band_matvec(band: Array, x: Array) -> Array:
    """(G, C, BW) banded matrix times (G, C, R): y[i] = sum_d band[i,d] x[i-4+d]."""
    g, c, bw = band.shape
    half = (bw - 1) // 2
    y = jnp.zeros_like(x)
    for d in range(bw):
        off = d - half
        lo, hi = max(0, -off), c - max(0, off)
        seg = band[:, lo:hi, d, None] * x[:, lo + off : hi + off]
        y = y.at[:, lo:hi].add(seg)
    return y


@jax.custom_batching.custom_vmap
def _banded_solve(band: Array, rhs: Array) -> Array:
    """Solve the SPD banded systems (G, C, BW) @ x = (G, C, R).

    custom_vmap collapses any number of outer `vmap` batch axes into the
    kernel's lane-batched system axis — one pallas_call for the whole planner
    batch instead of a per-frame grid. One round of iterative refinement
    recovers the accuracy lost to f32 (without it, FITPACK's SSR-vs-budget
    decisions wobble enough to flip knot selection — a real parity cost)."""
    x = banded_cholesky_solve(band, rhs)
    resid = rhs - _band_matvec(band, x)
    return x + banded_cholesky_solve(band, resid)


@_banded_solve.def_vmap
def _banded_solve_vmap(axis_size, in_batched, band: Array, rhs: Array) -> tuple[Array, bool]:
    band_b, rhs_b = in_batched
    if not band_b:
        band = jnp.broadcast_to(band[None], (axis_size,) + band.shape)
    if not rhs_b:
        rhs = jnp.broadcast_to(rhs[None], (axis_size,) + rhs.shape)
    flat = _banded_solve(
        band.reshape((-1,) + band.shape[2:]), rhs.reshape((-1,) + rhs.shape[2:])
    )
    return flat.reshape(rhs.shape), True


def _solve_spd_banded(a: Array, b: Array) -> Array:
    """Solve SPD systems with half-bandwidth <= 4: a (..., C, C), b (..., C, R).

    TPU: Pallas lane-batched banded Cholesky (small dense cholesky on TPU
    lowers to scalar-core loops). CPU: XLA dense Cholesky.
    """
    if _use_pallas_solver():
        if a.ndim == 2:
            return _banded_solve(dense_to_band(a)[None], b[None])[0]
        return _banded_solve(dense_to_band(a), b)
    chol = jnp.linalg.cholesky(a)
    return jax.scipy.linalg.cho_solve((chol, True), b)


def chord_lengths(points: Array, mask: Array) -> tuple[Array, Array, Array]:
    """Cumulative chord parameter of a masked trace.

    Returns (u, u_max, ok) where u[i] is the chord position of point i
    (invalid slots repeat u_max), matching the reference's
    ``u = [0, cumsum(dists)]`` (spline_fit.py:113-115). ``ok`` is False when
    two consecutive valid points coincide — the case where splprep raises and
    the reference falls back to the previous path.
    """
    p = points.shape[0]
    seg_valid = mask[1:] & mask[:-1]
    d = jnp.sqrt(jnp.maximum(jnp.sum(jnp.diff(points, axis=0) ** 2, axis=-1), 0.0))
    d = jnp.where(seg_valid, d, 0.0)
    u = jnp.concatenate([jnp.zeros((1,), points.dtype), jnp.cumsum(d)])
    u_max = u[-1] if p > 1 else jnp.asarray(0.0, points.dtype)
    u_max = jnp.max(jnp.where(mask, u, 0.0))
    n_valid = jnp.sum(mask)
    ok = (jnp.sum(seg_valid & (d <= 1e-9)) == 0) & (n_valid >= 2) & (u_max > 1e-9)
    return u, u_max, ok
