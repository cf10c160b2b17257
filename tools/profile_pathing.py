#!/usr/bin/env python3
"""Micro-profile of pathing internals on the chip."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ft_fsd_path_planning_tpu.ops import spline as sp
from ft_fsd_path_planning_tpu.ops.curvature import path_curvature, uniform_filter1d_nearest


def _fetch(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def bench(name, fn, *args, iters=20):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.2f} ms/iter")
    return dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(0)

    # (B, 64, 2) traces like the centerline input
    t = np.linspace(0, 1, 64)[None, :]
    pts = np.stack([np.broadcast_to(t * 40, (batch, 64)), np.sin(t * 3) * 5 + rng.normal(0, 0.05, (batch, 64))], -1)
    pts = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones((batch, 64), bool)

    fit1 = jax.jit(jax.vmap(lambda p, m: sp.fit_spline(p, m, 0.2)))
    bench("fit_spline (B,64) x1", fit1, pts, mask)

    # dense (B, 512, 2) refit
    t2 = np.linspace(0, 1, 512)[None, :]
    pts2 = np.stack([np.broadcast_to(t2 * 40, (batch, 512)), np.sin(t2 * 3) * 5 + rng.normal(0, 0.01, (batch, 512))], -1)
    pts2 = jnp.asarray(pts2, jnp.float32)
    mask2 = jnp.ones((batch, 512), bool)
    fit2 = jax.jit(jax.vmap(lambda p, m: sp.fit_spline(p, m, 0.2)))
    bench("fit_spline (B,512) x1", fit2, pts2, mask2)

    # eval
    def ev(p, m):
        f = sp.fit_spline(p, m, 0.2)
        return sp.eval_spline_every(f, 0.1, 512)
    bench("fit+eval (B,512)", jax.jit(jax.vmap(ev)), pts2, mask2)

    # curvature
    nv = jnp.full((batch,), 512, jnp.int32)
    wins = jnp.full((batch,), 31, jnp.int32)
    curv = jax.jit(jax.vmap(lambda p, n, w: path_curvature(p, n, w, 31)))
    bench("path_curvature (B,512,W31)", curv, pts2, nv, wins)

    filt = jax.jit(jax.vmap(
        lambda v, n, s: uniform_filter1d_nearest(v, n, s, 31)))
    vals = jnp.asarray(rng.normal(0, 1, (batch, 512)), jnp.float32)
    bench("uniform_filter (B,512)", filt, vals, nv, jnp.full((batch,), 15, jnp.int32))

    # cholesky isolation: the lambda-grid solve alone
    def chol_only(p, m):
        w = m.astype(p.dtype)
        u, u_max, ok = sp.chord_lengths(p, m)
        tt = u / jnp.maximum(u_max, 1e-9)
        basis = sp.bspline_basis(tt) * w[:, None]
        gram = basis.T @ basis
        rhs = basis.T @ (p * w[:, None])
        omega = jnp.asarray(sp._OMEGA, p.dtype)
        scale = jnp.trace(gram) / sp.N_COEF + 1e-12
        log_lams = jnp.linspace(sp._LOG_LAM_LO, sp._LOG_LAM_HI, sp._LAM_GRID, dtype=p.dtype)
        lams = 10.0**log_lams * scale
        a = gram[None] + lams[:, None, None] * omega[None]
        chol = jnp.linalg.cholesky(a)
        return jax.scipy.linalg.cho_solve((chol, True), jnp.broadcast_to(rhs, (sp._LAM_GRID,) + rhs.shape))
    bench("  lambda-grid chol+solve (B,64)", jax.jit(jax.vmap(chol_only)), pts, mask)

    def basis_only(p, m):
        w = m.astype(p.dtype)
        u, u_max, ok = sp.chord_lengths(p, m)
        tt = u / jnp.maximum(u_max, 1e-9)
        basis = sp.bspline_basis(tt) * w[:, None]
        return basis.T @ basis
    bench("  basis+gram only (B,64)", jax.jit(jax.vmap(basis_only)), pts, mask)


if __name__ == "__main__":
    main()
