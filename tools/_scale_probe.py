import time, sys
from functools import partial
import jax, jax.numpy as jnp
from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import sorting
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes
import dataclasses

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0)/iters
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt

for batch in (64, 256, 1024):
    for K in (16, 64):
        cfg = default_config(MissionTypes.trackdrive)
        s = dataclasses.replace(cfg.sorting, beam_width=K)
        cfg = dataclasses.replace(cfg, sorting=s)
        frames = make_frame_batch(cfg, batch, seed=0)
        drop_unknown = not cfg.sorting.use_unknown_cones
        def beam_only(frames):
            def one(frame):
                pts, msk = frame.cones, frame.mask
                if drop_unknown: msk = msk & (pts[:, 2] != 0)
                def side(ct):
                    sc = cfg.sorting
                    prefix, n_first = sorting.select_starting_cones(sc, pts, msk, ct, frame.position, frame.direction)
                    adj, nb_i, nb_ok, tl = sorting.build_adjacency(sc, pts, msk, ct, prefix[0])
                    return sorting._beam_search_side(sc, sc.beam_width, pts, msk, ct, prefix, n_first, frame.position, frame.direction, nb_i, nb_ok, tl)
                return jax.vmap(side)(jnp.asarray([2,1], jnp.int32))
            return jax.vmap(one)(frames)
        bench(f"beam B={batch} K={K}", jax.jit(beam_only), frames)
