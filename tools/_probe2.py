import time
import jax, jax.numpy as jnp
from ft_fsd_path_planning_tpu.config import default_config
from ft_fsd_path_planning_tpu.models import sorting, sorting_cost
from ft_fsd_path_planning_tpu.parallel.scenarios import make_frame_batch
from ft_fsd_path_planning_tpu.utils.mission_types import MissionTypes

cfg = default_config(MissionTypes.trackdrive)
B = 256
frames = make_frame_batch(cfg, B, seed=0)
drop_unknown = not cfg.sorting.use_unknown_cones
s = cfg.sorting
K, L, C = s.beam_width, s.max_length, s.max_n_neighbors

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/iters*1e3:9.2f} ms")

def setup(frame):
    pts, msk = frame.cones, frame.mask
    if drop_unknown: msk = msk & (pts[:, 2] != 0)
    def side(ct):
        prefix, n_first = sorting.select_starting_cones(s, pts, msk, ct, frame.position, frame.direction)
        adj, nb_i, nb_ok, tl = sorting.build_adjacency(s, pts, msk, ct, prefix[0])
        return pts, msk, ct, prefix, n_first, frame.position, frame.direction, nb_i, nb_ok, tl
    return jax.vmap(side)(jnp.asarray([2,1], jnp.int32))

def init_state(pts, prefix, n_first, car_dir):
    n = pts.shape[0]; xy = pts[:, :2]
    configs0 = jnp.full((K, L), -1, jnp.int32).at[0,0].set(prefix[0]).at[0,1].set(jnp.where(n_first>=2, prefix[1], -1))
    init_cost0 = jnp.where(n_first>=2, sorting.geo.vec_angle_between(xy[jnp.clip(prefix[1],0,n-1)]-xy[jnp.clip(prefix[0],0,n-1)], car_dir), 0.0)
    return sorting._BeamState(
        configs=configs0,
        lengths=jnp.where(jnp.arange(K)==0, n_first, 0).astype(jnp.int32),
        alive=(jnp.arange(K)==0)&(n_first>=1), done=jnp.zeros(K,bool),
        angle_sum=jnp.zeros(K), n_under=jnp.zeros(K,jnp.int32), residual=jnp.zeros(K),
        init_cost=jnp.where(jnp.arange(K)==0, init_cost0, 0.0), wrong_sum=jnp.zeros(K))

# 1: gates only, looped (carry a fold of outputs to keep dependency)
def gates_only(args):
    pts, msk, ct, prefix, n_first, pos, cdir, nb_i, nb_ok, tl = args
    xy = pts[:, :2]
    st = init_state(pts, prefix, n_first, cdir)
    def step(_, carry):
        st2, acc = carry
        can, cand_idx, theta, seg_len, diff = sorting._extension_gates(s, xy, nb_i, nb_ok, st2, ct, pos, cdir)
        acc = acc + jnp.sum(jnp.where(can, theta+seg_len+diff, 0.0)) + jnp.sum(cand_idx)
        # mutate state trivially to keep loop serial
        st3 = st2._replace(angle_sum=st2.angle_sum + acc*1e-20)
        return st3, acc
    _, acc = jax.lax.fori_loop(0, L-1, step, (st, 0.0))
    return acc

# 2: topk+regather only: fake scores from carries
def select_only(args):
    pts, msk, ct, prefix, n_first, pos, cdir, nb_i, nb_ok, tl = args
    n = pts.shape[0]; xy = pts[:, :2]
    st = init_state(pts, prefix, n_first, cdir)
    def step(i, st):
        last_idx = jnp.take_along_axis(st.configs, jnp.maximum(st.lengths-1,0)[:,None], axis=1)[:,0]
        cand_idx = nb_i[jnp.clip(last_idx,0,n-1)]
        can = nb_ok[jnp.clip(last_idx,0,n-1)]
        c_score = st.angle_sum[:,None] + cand_idx.astype(jnp.float32)*0.01
        c_score = jnp.where(can, c_score, jnp.inf)
        parent_score = jnp.where(st.alive, st.angle_sum, jnp.inf)
        pool = jnp.concatenate([parent_score, c_score.reshape(-1)])
        _, sel = jax.lax.top_k(-pool, K)
        is_parent = sel < K
        parent_of = jnp.where(is_parent, sel, (sel-K)//C)
        child_slot = jnp.where(is_parent, 0, (sel-K)%C).astype(jnp.int32)
        child_cone = cand_idx[parent_of, child_slot]
        sel_valid = jnp.isfinite(pool[sel])
        g = lambda a: a[parent_of]
        new_configs = g(st.configs)
        wp = jnp.clip(g(st.lengths), 0, L-1)
        appended = jnp.where((jnp.arange(L)[None,:]==wp[:,None]) & ~is_parent[:,None], child_cone[:,None], new_configs)
        ext = ~is_parent & sel_valid
        return st._replace(configs=jnp.where(sel_valid[:,None], appended, -1),
                           lengths=jnp.where(sel_valid, g(st.lengths)+ext, 0).astype(jnp.int32),
                           alive=sel_valid, angle_sum=g(st.angle_sum)+0.001)
    st = jax.lax.fori_loop(0, L-1, step, st)
    return st.configs

def wrap(inner):
    def f(frames):
        def one(frame):
            args = setup(frame)
            return jax.vmap(lambda *a: inner(a))(*args)
        return jax.vmap(one)(frames)
    return jax.jit(f)

bench("gates only (no topk/regather)", wrap(gates_only), frames)
bench("select only (topk+regather, no gates)", wrap(select_only), frames)
