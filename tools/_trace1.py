import time, glob
import jax, jax.numpy as jnp
from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import sorting
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

B = 256
cfg = default_config(MissionTypes.trackdrive)
s = cfg.sorting
frames = make_frame_batch(cfg, B, seed=0)

def beam(frames):
    def one(frame):
        pts, msk = frame.cones, frame.mask
        msk = msk & (pts[:, 2] != 0)
        def side(ct):
            prefix, n_first = sorting.select_starting_cones(s, pts, msk, ct, frame.position, frame.direction)
            adj, nb_i, nb_ok, tl = sorting.build_adjacency(s, pts, msk, ct, prefix[0])
            return sorting._beam_search_side(s, s.beam_width, pts, msk, ct, prefix, n_first, frame.position, frame.direction, nb_i, nb_ok, tl)
        return jax.vmap(side)(jnp.asarray([2,1], jnp.int32))
    return jax.vmap(one)(frames)

f = jax.jit(beam)
out = f(frames); jax.block_until_ready(out)
with jax.profiler.trace("/tmp/beamtrace"):
    for _ in range(3):
        out = f(frames)
    jax.block_until_ready(out)
print("trace done")
