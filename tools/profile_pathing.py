#!/usr/bin/env python3
"""Micro-profile of pathing internals (FITPACK fits, curvature) on the chip.

NB: naive per-call timing on a remote-attached chip measures the link round
trip (see LATENCY.md); these numbers carry ~RTT/iters of additive noise and
are for RELATIVE comparison only. tools/profile_stages.py gives the stage
split; PERF.md records chained-scan (noise-free) numbers.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ft_fsd_path_planning_tpu.ops import fitpack as fpk
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

    # (B, 64, 2) traces like the matches-centerline input
    t = np.linspace(0, 1, 64)[None, :]
    pts = np.stack(
        [
            np.broadcast_to(t * 40, (batch, 64)),
            np.sin(t * 3) * 5 + rng.normal(0, 0.05, (batch, 64)),
        ],
        -1,
    )
    pts = jnp.asarray(pts, jnp.float32)
    mask = jnp.ones((batch, 64), bool)

    fit1 = jax.jit(jax.vmap(lambda p, m: fpk.fitpack_fit(p, m, 0.2)))
    bench("fitpack_fit (B,64) s=0.2", fit1, pts, mask)

    # dense (B, 512, 2) refit-shaped input
    t2 = np.linspace(0, 1, 512)[None, :]
    pts2 = np.stack(
        [
            np.broadcast_to(t2 * 40, (batch, 512)),
            np.sin(t2 * 3) * 5 + rng.normal(0, 0.01, (batch, 512)),
        ],
        -1,
    )
    pts2 = jnp.asarray(pts2, jnp.float32)
    mask2 = jnp.ones((batch, 512), bool)
    fit2 = jax.jit(jax.vmap(lambda p, m: fpk.fitpack_fit(p, m, 0.2)))
    bench("fitpack_fit (B,512) s=0.2", fit2, pts2, mask2)
    fit3 = jax.jit(jax.vmap(lambda p, m: fpk.fitpack_fit(p, m, 0.01)))
    bench("fitpack_fit (B,512) s=0.01", fit3, pts2, mask2)

    fits = jax.jit(jax.vmap(lambda p, m: fpk.fitpack_fit(p, m, 0.2)))(pts2, mask2)
    ev = jax.jit(jax.vmap(lambda f: fpk.fitpack_eval_every(f, 0.1, 512)))
    bench("fitpack_eval_every (B,512)", ev, fits)

    nv = jnp.full((batch,), 512, jnp.int32)
    wins = jnp.full((batch,), 31, jnp.int32)
    curv = jax.jit(jax.vmap(lambda p, n, w: path_curvature(p, n, w, 31, 1.0, 3000.0)))
    bench("path_curvature (B,512,W31)", curv, pts2, nv, wins)

    filt = jax.jit(jax.vmap(lambda v, n, s: uniform_filter1d_nearest(v, n, s, 31)))
    vals = jnp.asarray(rng.normal(0, 1, (batch, 512)), jnp.float32)
    bench("uniform_filter (B,512)", filt, vals, nv, jnp.full((batch,), 15, jnp.int32))


if __name__ == "__main__":
    main()
