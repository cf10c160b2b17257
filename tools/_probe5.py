import time
import jax, jax.numpy as jnp
from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import sorting
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

B, K, C, L, N = 256, 64, 5, 12, 128
P = K*(1+C)
cfg = default_config(MissionTypes.trackdrive)
s = cfg.sorting
frames = make_frame_batch(cfg, B, seed=0)
drop_unknown = not s.use_unknown_cones

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

# stage A: setup only (start cones + adjacency), nested vmap
def setup_only(frames):
    def one(frame):
        pts, msk = frame.cones, frame.mask
        if drop_unknown: msk = msk & (pts[:, 2] != 0)
        def side(ct):
            prefix, n_first = sorting.select_starting_cones(s, pts, msk, ct, frame.position, frame.direction)
            adj, nb_i, nb_ok, tl = sorting.build_adjacency(s, pts, msk, ct, prefix[0])
            return prefix, n_first, nb_i, nb_ok, tl
        return jax.vmap(side)(jnp.asarray([2,1], jnp.int32))
    return jax.vmap(one)(frames)
setup_jit = jax.jit(setup_only)
outs = bench("setup only (start+adjacency)", setup_jit, frames)
prefix, n_first, nb_i, nb_ok, tl = setup_jit(frames)

# stage B: beam search consuming precomputed setup, nested vmap
def beam_given(frames, prefix, n_first, nb_i, nb_ok, tl):
    def one(frame, prefix, n_first, nb_i, nb_ok, tl):
        pts, msk = frame.cones, frame.mask
        if drop_unknown: msk = msk & (pts[:, 2] != 0)
        def side(ct, prefix, n_first, nb_i, nb_ok, tl):
            return sorting._beam_search_side(s, s.beam_width, pts, msk, ct, prefix, n_first, frame.position, frame.direction, nb_i, nb_ok, tl)
        return jax.vmap(side)(jnp.asarray([2,1], jnp.int32), prefix, n_first, nb_i, nb_ok, tl)
    return jax.vmap(one)(frames, prefix, n_first, nb_i, nb_ok, tl)
bench("beam given setup (nested vmap)", jax.jit(beam_given), frames, prefix, n_first, nb_i, nb_ok, tl)
