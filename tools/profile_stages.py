#!/usr/bin/env python3
"""Stage-level wall-clock profile of the batched planner step on the
attached chip. Times each pipeline stage as its own jitted program (upper
bound: inter-stage fusion is lost) to locate the hot stage.

Usage: python profile_stages.py [batch]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp

from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import matching, pathing, sorting
from ft_fsd_path_planning_tpu.parallel.batch import batched_step, make_batch_state
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes


def _fetch(out):
    """Force full execution: on the remote-attached chip block_until_ready
    can return at dispatch completion."""
    import numpy as np
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:9.2f} ms/iter")
    return out, dt


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    cfg = default_config(MissionTypes.trackdrive)
    states = make_batch_state(cfg, batch)
    frames = make_frame_batch(cfg, batch, seed=0)
    print(f"batch={batch} n_cones={cfg.shapes.n_cones} "
          f"beam={cfg.sorting.beam_width} L={cfg.sorting.max_length}")

    # full step
    step = jax.jit(partial(batched_step, cfg))
    (outs, _), full_dt = bench("FULL batched_step", step, states, frames)

    drop_unknown = not cfg.sorting.use_unknown_cones
    def prep(frame):
        pts, msk = frame.cones, frame.mask
        if drop_unknown:
            msk = msk & (pts[:, 2] != 0)
        return pts, msk

    # sorting alone
    def sort_only(frames):
        def one(frame):
            pts, msk = prep(frame)
            return sorting.run_cone_sorting(
                cfg, pts, msk, frame.position, frame.direction)
        return jax.vmap(one)(frames)
    sorted_out, sort_dt = bench("sorting", jax.jit(sort_only), frames)

    # matching alone
    s_len = cfg.shapes.side_len
    l_len = cfg.sorting.max_length

    def match_only(frames, sorted_out):
        def one(frame, s):
            pad = lambda pts, m: (
                jnp.zeros((s_len, 2)).at[:l_len].set(pts),
                jnp.zeros(s_len, bool).at[:l_len].set(m),
            )
            ml, mlm = pad(s.left_cones, s.left_mask)
            mr, mrm = pad(s.right_cones, s.right_mask)
            return matching.run_cone_matching(
                cfg,
                matching.MatchingInput(
                    left_cones=ml, left_mask=mlm, right_cones=mr, right_mask=mrm,
                    position=frame.position, direction=frame.direction))
        return jax.vmap(one)(frames, sorted_out)
    matched, match_dt = bench("matching", jax.jit(match_only), frames, sorted_out)

    # pathing alone
    def path_only(frames, matched, states):
        def one(frame, m, st):
            return pathing.run_path_calculation(
                cfg,
                pathing.PathInput(
                    left_cones=m.left_cones, left_mask=m.left_mask,
                    right_cones=m.right_cones, right_mask=m.right_mask,
                    left_to_right=m.left_to_right, right_to_left=m.right_to_left,
                    position=frame.position, direction=frame.direction),
                st.global_path, st.path)
        return jax.vmap(one)(frames, matched, states)
    bench("pathing", jax.jit(path_only), frames, matched, states)

    # sorting internals
    def sort_sides(frames):
        def one(frame):
            pts, msk = prep(frame)
            return jax.vmap(
                lambda ct: sorting.sort_one_side(
                    cfg, pts, msk, ct, frame.position, frame.direction)
            )(jnp.asarray([2, 1], jnp.int32))
        return jax.vmap(one)(frames)
    bench("  sorting: both sides", jax.jit(sort_sides), frames)

    def beam_only(frames):
        def one(frame):
            pts, msk = prep(frame)
            def side(ct):
                s = cfg.sorting
                prefix, n_first = sorting.select_starting_cones(
                    s, pts, msk, ct, frame.position, frame.direction)
                adj, node_table, tl = sorting.build_adjacency(
                    s, pts, msk, ct, prefix[0])
                return sorting._beam_search_side(
                    s, s.beam_width, pts, msk, ct, prefix, n_first,
                    frame.position, frame.direction, node_table, tl)
            return jax.vmap(side)(jnp.asarray([2, 1], jnp.int32))
        return jax.vmap(one)(frames)
    bench("  sorting: beam search", jax.jit(beam_only), frames)

    def cost_only(frames, pool):
        def one(frame, p):
            pts, msk = prep(frame)
            def side(ct, cv):
                configs, valid = cv
                return sorting.sorting_cost.cost_configurations(
                    pts, msk, configs, valid, ct, frame.position,
                    frame.direction, cfg.sorting)
            return jax.vmap(side)(jnp.asarray([2, 1], jnp.int32), p)
        return jax.vmap(one)(frames, pool)
    pool = jax.jit(beam_only)(frames)
    bench("  sorting: 7-term cost", jax.jit(cost_only), frames, pool)

    print(f"\nfull: {full_dt*1e3:.2f} ms -> {batch/full_dt:.0f} solves/s")


if __name__ == "__main__":
    main()
