import time
import jax, jax.numpy as jnp
from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import sorting
from ft_fsd_path_planning_tpu.ops import geometry as geo
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

B, N, C = 256, 128, 5
cfg = default_config(MissionTypes.trackdrive)
s = cfg.sorting
frames = make_frame_batch(cfg, B, seed=0)

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

def nested(body):
    def f(frames):
        def one(frame):
            pts, msk = frame.cones, frame.mask
            msk = msk & (pts[:, 2] != 0)
            return jax.vmap(lambda ct: body(pts, msk, ct, frame.position, frame.direction))(jnp.asarray([2,1], jnp.int32))
        return jax.vmap(one)(frames)
    return jax.jit(f)

# start cones only
bench("start cones", nested(lambda p,m,ct,pos,d: sorting.select_starting_cones(s,p,m,ct,pos,d)), frames)

# adjacency pieces
def adj_d2(p, m, ct, pos, d):
    xy = p[:, :2]; color = p[:, 2]
    d2 = geo.cdist_sq(xy, xy)
    opposite = color == (3-ct)
    bad = opposite[:,None] | opposite[None,:] | ~m[:,None] | ~m[None,:] | jnp.eye(N, dtype=bool)
    return jnp.where(bad, jnp.inf, d2)
bench("adjacency: masked d2", nested(adj_d2), frames)

def adj_knn(p, m, ct, pos, d):
    d2 = adj_d2(p, m, ct, pos, d)
    _, knn = jax.lax.top_k(-d2, C)
    return knn
bench("adjacency: +top_k", nested(adj_knn), frames)

def adj_scatter(p, m, ct, pos, d):
    d2 = adj_d2(p, m, ct, pos, d)
    _, knn = jax.lax.top_k(-d2, C)
    adj = jnp.zeros((N, N), bool)
    adj = adj.at[jnp.arange(N)[:,None], knn].set(True)
    adj = adj & (d2 <= s.max_dist**2)
    return adj & adj.T
bench("adjacency: +scatter+sym", nested(adj_scatter), frames)

def adj_onehot(p, m, ct, pos, d):
    d2 = adj_d2(p, m, ct, pos, d)
    _, knn = jax.lax.top_k(-d2, C)
    adj = jnp.any(knn[:, :, None] == jnp.arange(N)[None, None, :], axis=1)
    adj = adj & (d2 <= s.max_dist**2)
    return adj & adj.T
bench("adjacency: +onehot+sym", nested(adj_onehot), frames)

def adj_reach(p, m, ct, pos, d):
    adj = adj_onehot(p, m, ct, pos, d)
    reach = jnp.arange(N) == 0
    for _ in range(s.max_length):
        reach = reach | jnp.any(adj & reach[None, :], axis=-1)
    return jnp.minimum(jnp.sum(reach), s.max_length)
bench("adjacency: +reach loop", nested(adj_reach), frames)

def adj_full_onehot(p, m, ct, pos, d):
    d2 = adj_d2(p, m, ct, pos, d)
    _, knn = jax.lax.top_k(-d2, C)
    adj = jnp.any(knn[:, :, None] == jnp.arange(N)[None, None, :], axis=1)
    adj = adj & (d2 <= s.max_dist**2)
    adj = adj & adj.T
    reach = jnp.arange(N) == 0
    for _ in range(s.max_length):
        reach = reach | jnp.any(adj & reach[None, :], axis=-1)
    tl = jnp.minimum(jnp.sum(reach), s.max_length)
    nb_vals, nb_idx = jax.lax.top_k(adj.astype(jnp.int32), C)
    return nb_idx, nb_vals > 0, tl
bench("adjacency: full (onehot variant)", nested(adj_full_onehot), frames)

bench("adjacency: full (current impl)", nested(lambda p,m,ct,pos,d: sorting.build_adjacency(s,p,m,ct,0)), frames)
