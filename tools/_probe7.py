import time
import jax, jax.numpy as jnp
from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import sorting
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

B = 256
cfg = default_config(MissionTypes.trackdrive)
s = cfg.sorting
frames = make_frame_batch(cfg, B, seed=0)

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

def make(body, reduce_out=False):
    def f(frames):
        def one(frame):
            pts, msk = frame.cones, frame.mask
            msk = msk & (pts[:, 2] != 0)
            return jax.vmap(lambda ct: body(pts, msk, ct, frame.position, frame.direction))(jnp.asarray([2,1], jnp.int32))
        out = jax.vmap(one)(frames)
        if reduce_out:
            return jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)), out)
        return out
    return jax.jit(f)

# a: full setup with data-dependent start, full outputs
def setup_dd(p,m,ct,pos,d):
    prefix, n_first = sorting.select_starting_cones(s,p,m,ct,pos,d)
    adj, nb_i, nb_ok, tl = sorting.build_adjacency(s,p,m,ct,prefix[0])
    return prefix, n_first, nb_i, nb_ok, tl
bench("setup, dd start, full out", make(setup_dd), frames)
bench("setup, dd start, reduced out", make(setup_dd, True), frames)

# b: constant start
def setup_c0(p,m,ct,pos,d):
    prefix, n_first = sorting.select_starting_cones(s,p,m,ct,pos,d)
    adj, nb_i, nb_ok, tl = sorting.build_adjacency(s,p,m,ct,jnp.int32(0))
    return prefix, n_first, nb_i, nb_ok, tl
bench("setup, const start, full out", make(setup_c0), frames)

# c: drop adj from outputs of build_adjacency (return only nb)
def setup_no_adj(p,m,ct,pos,d):
    prefix, n_first = sorting.select_starting_cones(s,p,m,ct,pos,d)
    adj, nb_i, nb_ok, tl = sorting.build_adjacency(s,p,m,ct,prefix[0])
    return nb_i, nb_ok
bench("setup, dd start, nb only out", make(setup_no_adj), frames)
