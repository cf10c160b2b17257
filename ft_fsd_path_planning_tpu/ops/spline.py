"""Fixed-shape penalized B-spline fitting — the TPU replacement for FITPACK.

The reference wraps `scipy.interpolate.splprep/splev` (utils/spline_fit.py:15,
113-128): a smoothing spline with chord-length parameterization that finds the
smoothest cubic spline whose sum of squared residuals is <= ``s``, choosing
knots adaptively. Adaptive knot placement is data-dependent control flow that
cannot live inside a jitted TPU program, so this module re-designs the fit:

* fixed uniform (unclamped) cubic B-spline basis on t in [0, 1] with
  ``n_intervals`` segments — shapes are static, basis evaluation is closed form;
* penalized least squares ``(B^T W B + lam * Omega) c = B^T W y`` solved by
  Cholesky; Omega is a 4th-order coefficient-difference penalty whose null
  space is exactly the single-cubic curves, so ``lam -> inf`` reproduces
  FITPACK's zero-interior-knot limit while ``lam -> 0`` approaches
  interpolation;
* ``lam`` found by a fixed-iteration log-space bisection so that the weighted
  SSR matches the smoothing budget ``s`` — the same "smoothest within budget"
  contract as FITPACK, expressed as a data-parallel program.

Everything vmaps over batches of traces; the normal-equation build is a
matmul (MXU) and the (C x C) Cholesky solves are tiny and batched.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.ops import gatherless as gl
from ft_fsd_path_planning_tpu.ops.pallas.banded_cholesky import (
    banded_cholesky_solve,
    dense_to_band,
)

Array = jax.Array

# number of uniform B-spline intervals on [0, 1]; C = N_INTERVALS + 3 coefs
N_INTERVALS = 48
N_COEF = N_INTERVALS + 3

# FITPACK's fpcurf adds knots in rounds (roughly doubling) and stops at the
# FIRST knot set whose least-squares spline meets the SSR budget — the fit's
# stiffness comes from that fewest-knots rule, not from the smoothing
# parameter alone (e.g. the skidpad s=0.2 refit settles on 2 interior knots
# over 25 m and cuts the straight->circle corner by ~8 cm; a dense-knot
# penalized fit tracks the corner instead, a real parity error). Emulated
# here with a dyadic ladder of nested uniform bases: the fit picks the
# coarsest rung whose LSQ SSR fits the budget, then lambda-tunes within it.
_CANDIDATE_INTERVALS = (3, 6, 12, 24, 48)

_LOG_LAM_LO = -7.0
# the upper end stops where f32 conditioning of gram + lam*Omega is still
# sound (cond ~ lam * ||Omega|| / gram_min); the smoother-than-this regime is
# covered exactly by the single-cubic fallback (_fit_single_cubic)
_LOG_LAM_HI = 2.0
# lambda grid resolution: the penalty weight is searched over a fixed log
# grid solved as ONE batched Cholesky (serial depth 1) instead of a
# sequential bisection — the TPU answer to FITPACK's iterative knot search
_LAM_GRID = 16


def _difference_penalty(order: int, n_coef: int = N_COEF) -> np.ndarray:
    d = np.eye(n_coef)
    for _ in range(order):
        d = np.diff(d, axis=0)
    return d.T @ d


def _make_omega(n_coef: int) -> np.ndarray:
    """Omega: 4th-difference penalty (null space = single cubic) with small
    lower order terms so that degenerate inputs (< 4 distinct points) fall
    back to quadratic / linear / constant fits instead of a singular system —
    mirroring the reference's k = clip(n - 1, 1, 3) degree reduction
    (spline_fit.py:113)."""
    return (
        _difference_penalty(4, n_coef)
        + 1e-4 * _difference_penalty(2, n_coef)
        + 1e-7 * _difference_penalty(1, n_coef)
        + 1e-9 * np.eye(n_coef)
    )


_OMEGA = _make_omega(N_COEF)


def _basis_np(t: np.ndarray, n: int) -> np.ndarray:
    """NumPy mirror of :func:`bspline_basis` (der=0) for import-time algebra."""
    x = np.clip(t, 0.0, 1.0) * n
    j = np.clip(np.floor(x), 0, n - 1).astype(int)
    u = x - j
    vals = np.stack(
        [
            (1 - u) ** 3 / 6.0,
            (3 * u**3 - 6 * u**2 + 4) / 6.0,
            (-3 * u**3 + 3 * u**2 + 3 * u + 1) / 6.0,
            u**3 / 6.0,
        ],
        axis=-1,
    )
    out = np.zeros((len(t), n + 3))
    for k in range(4):
        out[np.arange(len(t)), j + k] += vals[:, k]
    return out


def _refine_matrix(n_coarse: int) -> np.ndarray:
    """(N_COEF, n_coarse + 3) knot-insertion map: the coarse uniform spline
    space is nested in the fine one (dyadic refinement), so B_fine @ M equals
    B_coarse exactly; M is recovered by least squares on a dense grid."""
    tg = np.linspace(0.0, 1.0, 8 * N_INTERVALS + 7)
    bf = _basis_np(tg, N_INTERVALS)
    bc = _basis_np(tg, n_coarse)
    m, *_ = np.linalg.lstsq(bf, bc, rcond=None)
    return m


_REFINE = {n: _refine_matrix(n).astype(np.float32) for n in _CANDIDATE_INTERVALS}
_OMEGAS = {n: _make_omega(n + 3) for n in _CANDIDATE_INTERVALS}


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
    recovers the accuracy lost to f32 at the ill-conditioned (small-lambda)
    end of the penalty grid (the serial factorization is the spline stage's
    dominant cost, so the refinement doubles it — but without it the
    small-lambda SSR estimates wobble enough to flip rung/lambda selection,
    a real parity cost; measured: refinement keeps skidpad replay parity at
    median 4 cm where dropping it loses the margin)."""
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


class SplineFit(NamedTuple):
    """Fitted spline: coefficients + chord-length span + validity flag."""

    coef: Array  # (N_COEF, 2)
    u_max: Array  # () total chord length of the input trace
    ok: Array  # () bool: False mirrors the reference's splprep ValueError


def bspline_basis(t: Array, der: int = 0, n: int = N_INTERVALS) -> Array:
    """Uniform cubic B-spline basis matrix at normalized positions t in [0,1].

    Returns (..., n + 3). Closed-form blending polynomials of the uniform
    cubic B-spline; derivative orders 0..2 supported (w.r.t. the *unnormalized*
    chord parameter handled by caller scaling).
    """
    x = jnp.clip(t, 0.0, 1.0) * n
    j = jnp.clip(jnp.floor(x), 0, n - 1)
    u = x - j

    if der == 0:
        b0 = (1 - u) ** 3 / 6.0
        b1 = (3 * u**3 - 6 * u**2 + 4) / 6.0
        b2 = (-3 * u**3 + 3 * u**2 + 3 * u + 1) / 6.0
        b3 = u**3 / 6.0
    elif der == 1:
        scale = n
        b0 = -((1 - u) ** 2) / 2.0 * scale
        b1 = (9 * u**2 - 12 * u) / 6.0 * scale
        b2 = (-9 * u**2 + 6 * u + 3) / 6.0 * scale
        b3 = u**2 / 2.0 * scale
    elif der == 2:
        scale = n**2
        b0 = (1 - u) * scale
        b1 = (3 * u - 2) * scale
        b2 = (-3 * u + 1) * scale
        b3 = u * scale
    else:
        raise ValueError(f"derivative order {der} not supported")

    vals = jnp.stack([b0, b1, b2, b3], axis=-1)  # (..., 4)
    cols = j[..., None] + jnp.arange(4)  # (..., 4)
    coef_ids = jnp.arange(n + 3)  # (C,)
    onehot = coef_ids == cols[..., None]  # (..., 4, C)
    return jnp.sum(vals[..., None] * onehot, axis=-2)  # (..., C)


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


def _fit_single_cubic(t: Array, points: Array, w: Array, n_valid: Array) -> Array:
    """Exact FITPACK zero-interior-knot limit: LSQ fit of one cubic curve,
    returned as B-spline coefficients via the cubic-exact quasi-interpolant
    c_i = p(xi_i) - h^2/6 p''(xi_i) at the Greville abscissae.

    The polynomial degree is capped at n_valid - 1 (clipped to [1, 3]) —
    FITPACK's k = clip(n - 1, 1, 3) degree reduction (spline_fit.py:113)."""
    degree = jnp.clip(n_valid - 1, 1, 3)
    col_ok = (jnp.arange(4) <= degree).astype(points.dtype)
    # powers design matrix, 4 columns, well conditioned since t in [0, 1]
    powers = jnp.stack([jnp.ones_like(t), t, t * t, t * t * t], axis=-1) * w[:, None]
    powers = powers * col_ok
    g = jnp.matmul(powers.T, powers, precision=jax.lax.Precision.HIGHEST)
    rhs = jnp.matmul(powers.T, points * w[:, None], precision=jax.lax.Precision.HIGHEST)
    g = g + 1e-7 * jnp.trace(g) / 4.0 * jnp.eye(4, dtype=points.dtype)
    a = jnp.linalg.solve(g, rhs)  # (4, 2)

    xi = (jnp.arange(N_COEF, dtype=points.dtype) - 1.0) / N_INTERVALS
    h2_6 = (1.0 / N_INTERVALS) ** 2 / 6.0
    p_xi = jnp.matmul(
        jnp.stack([jnp.ones_like(xi), xi, xi * xi, xi * xi * xi], axis=-1),
        a,
        precision=jax.lax.Precision.HIGHEST,
    )
    ppp_xi = jnp.matmul(
        jnp.stack(
            [jnp.zeros_like(xi), jnp.zeros_like(xi), 2.0 * jnp.ones_like(xi), 6.0 * xi],
            axis=-1,
        ),
        a,
        precision=jax.lax.Precision.HIGHEST,
    )
    return p_xi - h2_6 * ppp_xi


def _solve_spd_banded(a: Array, b: Array) -> Array:
    """Solve SPD systems with half-bandwidth <= 4: a (..., C, C), b (..., C, R).

    TPU: Pallas lane-batched banded Cholesky (small dense cholesky on TPU
    lowers to scalar-core loops — the reason the candidate ladder must NOT
    call jnp.linalg.cholesky per rung). CPU: XLA dense Cholesky.
    """
    if _use_pallas_solver():
        if a.ndim == 2:
            return _banded_solve(dense_to_band(a)[None], b[None])[0]
        return _banded_solve(dense_to_band(a), b)
    chol = jnp.linalg.cholesky(a)
    return jax.scipy.linalg.cho_solve((chol, True), b)


def _band_np(a: np.ndarray) -> np.ndarray:
    """NumPy band extraction: (..., C, C) -> (..., C, BW)."""
    c = a.shape[-1]
    i = np.arange(c)[:, None]
    j = np.clip(i - HALF_BW_ + np.arange(BW_)[None, :], 0, c - 1)
    valid = np.abs(i - (i - HALF_BW_ + np.arange(BW_)[None, :])) <= HALF_BW_
    valid &= (i - HALF_BW_ + np.arange(BW_)[None, :] >= 0) & (
        i - HALF_BW_ + np.arange(BW_)[None, :] < c
    )
    out = np.take_along_axis(
        a, np.broadcast_to(j, a.shape[:-2] + j.shape), axis=-1
    )
    return np.where(valid, out, 0.0)


HALF_BW_ = 4
BW_ = 9


def _padded_candidate_tables() -> dict[str, np.ndarray]:
    """Static identity-padded embeddings of every ladder rung into the fine
    coefficient size, so all rungs share one (K, C, *) batched solve and the
    chosen rung is a one-hot row select (no data-dependent shapes)."""
    k = len(_CANDIDATE_INTERVALS)
    omegas = np.zeros((k, N_COEF, N_COEF), np.float32)
    refines = np.zeros((k, N_COEF, N_COEF), np.float32)
    coef_masks = np.zeros((k, N_COEF), np.float32)
    for ki, n_i in enumerate(_CANDIDATE_INTERVALS):
        c_i = n_i + 3
        omegas[ki, :c_i, :c_i] = _OMEGAS[n_i]
        refines[ki, :, :c_i] = _REFINE[n_i]
        coef_masks[ki, :c_i] = 1.0
    return {
        "omegas": omegas,
        "refines": refines,
        "coef_masks": coef_masks,
        # band form of the penalties: the TPU path assembles the lambda-grid
        # systems directly in (C, BW) band storage — no dense (G, C, C)
        # materialization, no per-fit dense_to_band gather
        "omegas_band": _band_np(omegas).astype(np.float32),
    }


_PADDED = _padded_candidate_tables()


def fit_spline(points: Array, mask: Array, smoothing: float | Array) -> SplineFit:
    """Fit a smoothing spline to a masked 2-D trace.

    Args:
        points: (P, 2) trace, padded.
        mask: (P,) validity.
        smoothing: FITPACK-style SSR budget ``s`` (0 = interpolate).
    """
    w = mask.astype(points.dtype)
    u, u_max, ok = chord_lengths(points, mask)
    t = u / jnp.maximum(u_max, 1e-9)
    s_budget = jnp.asarray(smoothing, points.dtype)
    y = points * w[:, None]
    k = len(_CANDIDATE_INTERVALS)

    # ONE fine basis build; every rung's normal equations are exact small
    # projections of it (nested dyadic spaces: B_k = B_fine @ M_k, so
    # B_k^T W B_k = M_k^T G_fine M_k) — no per-rung basis evaluation
    basis48 = bspline_basis(t)  # (P, C)
    basis48_w = basis48 * w[:, None]
    gram48 = jnp.matmul(
        basis48_w.T, basis48_w, precision=jax.lax.Precision.HIGHEST
    )  # (C, C)
    rhs48 = jnp.matmul(
        basis48_w.T, y, precision=jax.lax.Precision.HIGHEST
    )  # (C, 2)

    refines = jnp.asarray(_PADDED["refines"], points.dtype)  # (K, C, C)
    # refines[k] maps coarse -> fine (rows = fine index, cols = coarse index);
    # two explicit pairwise matmuls — a 3-operand einsum here compiled
    # pathologically on the TPU backend
    refines_t = jnp.swapaxes(refines, -1, -2)  # (K, C coarse, C fine)
    gm = jnp.matmul(
        refines_t, gram48, precision=jax.lax.Precision.HIGHEST
    )  # (K, Cc, Cf)
    grams = jnp.matmul(gm, refines, precision=jax.lax.Precision.HIGHEST)  # (K, C, C)
    rhss = jnp.matmul(
        refines_t, rhs48, precision=jax.lax.Precision.HIGHEST
    )  # (K, C, 2)
    omegas = jnp.asarray(_PADDED["omegas"], points.dtype)
    coef_masks = jnp.asarray(_PADDED["coef_masks"], points.dtype)

    # per-rung lambda scale from the live block's trace; padded diagonal uses
    # the same scale so the embedded systems stay SPD and well-conditioned
    c_live = coef_masks.sum(axis=1)  # (K,)
    scales = (
        jnp.einsum("kcc->k", grams) / c_live + 1e-12
    )  # (K,)
    eye_pad = (
        jnp.eye(N_COEF)[None] * (1.0 - coef_masks)[:, None, :] * scales[:, None, None]
    )
    grams = grams + eye_pad

    def ssr_of_k(c_k: Array) -> Array:
        """SSR per rung: c_k (K, C, 2) in each rung's own (padded) basis;
        predictions ride the fine basis on the lifted coefficients."""
        lifted = jnp.matmul(refines, c_k, precision=jax.lax.Precision.HIGHEST)
        pred = jnp.matmul(basis48, lifted, precision=jax.lax.Precision.HIGHEST)
        resid = (pred - points[None]) * w[None, :, None]
        return jnp.sum(resid * resid, axis=(-2, -1))

    # on the TPU path every linear system lives in (C, BW) band storage:
    # assembling the lambda grid densely would materialize (G, C, C) tensors
    # and gather them through dense_to_band per fit
    use_banded = _use_pallas_solver()
    if use_banded:
        grams_rep = dense_to_band(grams)  # (K, C, BW), one small extraction
        omegas_rep = jnp.asarray(_PADDED["omegas_band"], points.dtype)

        def solve(a_band, b):
            if a_band.ndim == 2:
                return _banded_solve(a_band[None], b[None])[0]
            return _banded_solve(a_band, b)
    else:
        grams_rep, omegas_rep = grams, omegas

        def solve(a, b):
            chol = jnp.linalg.cholesky(a)
            return jax.scipy.linalg.cho_solve((chol, True), b)

    # fewest-knots-first probe (FITPACK fpcurf emulation): ONE near-LSQ solve
    # per rung, batched; use the coarsest rung whose LSQ SSR fits the budget
    lam0 = 10.0**_LOG_LAM_LO * scales
    a0 = grams_rep + lam0[:, None, None] * omegas_rep
    c0 = solve(a0, rhss)  # (K, C, 2)
    lsq_ssr = ssr_of_k(c0)  # (K,)
    fits_budget = lsq_ssr <= s_budget
    chosen = jnp.where(jnp.any(fits_budget), jnp.argmax(fits_budget), k - 1)
    oh_k = (jnp.arange(k) == chosen).astype(points.dtype)

    # one-hot collapse the chosen rung's system; the lambda-grid runs once
    sel = lambda v: jnp.einsum(
        "k,k...->...", oh_k, v, precision=jax.lax.Precision.HIGHEST
    )
    gram = sel(grams_rep)
    rhs = sel(rhss)
    omega = sel(omegas_rep)
    scale = jnp.sum(oh_k * scales)
    refine_sel = sel(refines)  # (C fine, C coarse)

    def ssr_of(c: Array) -> Array:
        # HIGHEST precision: the TPU default (bf16 inputs) would round the
        # ~|coords| predictions by ~0.16 m, swamping the ~cm residuals
        lifted = jnp.matmul(refine_sel, c, precision=jax.lax.Precision.HIGHEST)
        pred = jnp.matmul(basis48, lifted, precision=jax.lax.Precision.HIGHEST)
        resid = (pred - points) * w[:, None]
        return jnp.sum(resid * resid, axis=(-2, -1))

    # one batched solve over the whole lambda grid (serial depth 1)
    log_lams = jnp.linspace(_LOG_LAM_LO, _LOG_LAM_HI, _LAM_GRID, dtype=points.dtype)
    lams = 10.0**log_lams * scale
    a = gram[None, :, :] + lams[:, None, None] * omega[None, :, :]
    c_grid = solve(a, jnp.broadcast_to(rhs, (_LAM_GRID,) + rhs.shape))

    ssr_grid = ssr_of(c_grid)  # (G,)
    # true SSR(lam) is nondecreasing; running-max removes spurious dips from
    # ill-conditioned solves so they can never be selected
    ssr_grid = jax.lax.cummax(ssr_grid)
    # FITPACK contract: the smoothest spline whose SSR is within the budget =
    # the largest lambda with ssr <= s; if none satisfies it, the smallest
    # lambda (closest to interpolation)
    within = ssr_grid <= s_budget
    best = jnp.where(jnp.any(within), _LAM_GRID - 1 - jnp.argmax(within[::-1]), 0)
    # grid-row selects as one-hot reductions (gathers hit the TPU slow path)
    oh_best = (jnp.arange(_LAM_GRID) == best).astype(points.dtype)
    c_best = jnp.einsum(
        "g,gcf->cf", oh_best, c_grid, precision=jax.lax.Precision.HIGHEST
    )

    # refine inside the bracketing grid cell [lam_best, lam_best+1]: SSR(lam)
    # is monotone, so log-interpolate the s-crossing and re-solve once. This
    # keeps the selected smoothing continuous in the inputs (a hard grid
    # threshold flips a whole cell on 1-ulp SSR changes) and lands SSR ~= s,
    # FITPACK's own stopping rule (spline_fit.py:117-124).
    have_bracket = jnp.any(within) & ~within[-1]
    hi = jnp.minimum(best + 1, _LAM_GRID - 1)
    oh_hi = (jnp.arange(_LAM_GRID) == hi).astype(points.dtype)
    pick = lambda oh, v: jnp.sum(oh * v)
    ssr_lo = jnp.maximum(pick(oh_best, ssr_grid), 1e-20)
    ssr_hi = jnp.maximum(pick(oh_hi, ssr_grid), ssr_lo * (1.0 + 1e-6))
    frac = (jnp.log(jnp.maximum(s_budget, 1e-20)) - jnp.log(ssr_lo)) / (
        jnp.log(ssr_hi) - jnp.log(ssr_lo)
    )
    frac = jnp.clip(jnp.where(jnp.isfinite(frac), frac, 0.0), 0.0, 1.0)
    ll_best = pick(oh_best, log_lams)
    log_lam_star = ll_best + frac * (pick(oh_hi, log_lams) - ll_best)
    lam_star = 10.0**log_lam_star * scale
    a_star = gram + lam_star * omega
    c_star = solve(a_star, rhs)
    use_star = have_bracket & (ssr_of(c_star) <= s_budget)
    c_best = jnp.where(use_star, c_star, c_best)

    # lift to the fine basis (exact: nested dyadic spline spaces)
    c_lifted = jnp.matmul(
        refine_sel, c_best, precision=jax.lax.Precision.HIGHEST
    )

    # FITPACK's "no interior knots needed" case: when a single cubic satisfies
    # the budget, use it exactly (also sidesteps large-lambda conditioning)
    c_cubic = _fit_single_cubic(t, points, w, jnp.sum(mask))
    pred_cubic = jnp.matmul(
        basis48, c_cubic, precision=jax.lax.Precision.HIGHEST
    )
    resid_cubic = (pred_cubic - points) * w[:, None]
    cubic_ok = jnp.sum(resid_cubic * resid_cubic, axis=(-2, -1)) <= s_budget

    c_final = jnp.where(cubic_ok, c_cubic, c_lifted)
    c_final = jnp.where(jnp.isfinite(c_final), c_final, 0.0)
    return SplineFit(coef=c_final, u_max=u_max, ok=ok)


def eval_spline(fit: SplineFit, u: Array, der: int = 0) -> Array:
    """Evaluate the spline at chord positions ``u`` (clamped to [0, u_max])."""
    t = u / jnp.maximum(fit.u_max, 1e-9)
    basis = bspline_basis(t, der=der)
    vals = jnp.matmul(basis, fit.coef, precision=jax.lax.Precision.HIGHEST)
    if der > 0:
        # chain rule: d/du = (1/u_max) d/dt per derivative order
        vals = vals / jnp.maximum(fit.u_max, 1e-9) ** der
    return vals


def eval_spline_every(
    fit: SplineFit, predict_every: float | Array, n_samples: int, der: int = 0,
    max_u: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Evaluate on the reference's ``arange(0, max_u, predict_every)`` grid
    (spline_fit.py:30-63) with a fixed sample budget.

    Returns (values (n_samples, 2), u_grid (n_samples,), valid (n_samples,)).
    Samples beyond max_u are clamped to the end point and masked out.
    """
    limit = fit.u_max if max_u is None else max_u
    u_grid = jnp.arange(n_samples, dtype=fit.coef.dtype) * predict_every
    valid = u_grid < limit
    vals = eval_spline(fit, jnp.minimum(u_grid, fit.u_max), der=der)
    return vals, u_grid, valid
