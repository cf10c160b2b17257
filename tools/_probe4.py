import time
import jax, jax.numpy as jnp

B2, K, C, L, N = 512, 64, 5, 12, 128
P = K*(1+C)

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

key = jax.random.PRNGKey(0)
nb_i = jax.random.randint(key, (B2, N, C), 0, N)
nb_ok = jax.random.bernoulli(key, 0.9, (B2, N, C))
configs0 = jnp.full((B2, K, L), -1, jnp.int32)
configs0 = configs0.at[:, 0, 0].set(3).at[:, 0, 1].set(7)
lengths0 = jnp.zeros((B2, K), jnp.int32).at[:, 0].set(2)
alive0 = jnp.zeros((B2, K), bool).at[:, 0].set(True)
angle0 = jnp.zeros((B2, K))

def make(body):
    def f(nb_i, nb_ok, configs, lengths, alive, angle):
        def one(nb_i, nb_ok, configs, lengths, alive, angle):
            def step(i, st):
                return body(nb_i, nb_ok, *st)
            return jax.lax.fori_loop(0, 11, step, (configs, lengths, alive, angle))
        return jax.vmap(one)(nb_i, nb_ok, configs, lengths, alive, angle)
    return jax.jit(f)

# v0: full select step (as in sorting.py)
def v0(nb_i, nb_ok, configs, lengths, alive, angle):
    last_idx = jnp.take_along_axis(configs, jnp.maximum(lengths-1,0)[:,None], axis=1)[:,0]
    cand_idx = nb_i[jnp.clip(last_idx,0,N-1)]
    can = nb_ok[jnp.clip(last_idx,0,N-1)]
    c_score = angle[:,None] + cand_idx.astype(jnp.float32)*0.01
    c_score = jnp.where(can, c_score, jnp.inf)
    parent_score = jnp.where(alive, angle, jnp.inf)
    pool = jnp.concatenate([parent_score, c_score.reshape(-1)])
    _, sel = jax.lax.top_k(-pool, K)
    is_parent = sel < K
    parent_of = jnp.where(is_parent, sel, (sel-K)//C)
    child_slot = jnp.where(is_parent, 0, (sel-K)%C).astype(jnp.int32)
    child_cone = cand_idx[parent_of, child_slot]
    sel_valid = jnp.isfinite(pool[sel])
    g = lambda a: a[parent_of]
    new_configs = g(configs)
    wp = jnp.clip(g(lengths), 0, L-1)
    appended = jnp.where((jnp.arange(L)[None,:]==wp[:,None]) & ~is_parent[:,None], child_cone[:,None], new_configs)
    ext = ~is_parent & sel_valid
    return (jnp.where(sel_valid[:,None], appended, -1),
            jnp.where(sel_valid, g(lengths)+ext, 0).astype(jnp.int32),
            sel_valid, g(angle)+0.001)
bench("v0 full", make(v0), nb_i, nb_ok, configs0, lengths0, alive0, angle0)

# v1: skip the nb_i/nb_ok gather (use fixed slice)
def v1(nb_i, nb_ok, configs, lengths, alive, angle):
    last_idx = jnp.take_along_axis(configs, jnp.maximum(lengths-1,0)[:,None], axis=1)[:,0]
    cand_idx = nb_i[:K]  # fake
    can = nb_ok[:K]
    c_score = angle[:,None] + cand_idx.astype(jnp.float32)*0.01
    c_score = jnp.where(can, c_score, jnp.inf)
    parent_score = jnp.where(alive, angle, jnp.inf)
    pool = jnp.concatenate([parent_score, c_score.reshape(-1)])
    _, sel = jax.lax.top_k(-pool, K)
    is_parent = sel < K
    parent_of = jnp.where(is_parent, sel, (sel-K)//C)
    child_slot = jnp.where(is_parent, 0, (sel-K)%C).astype(jnp.int32)
    child_cone = cand_idx[parent_of, child_slot]
    sel_valid = jnp.isfinite(pool[sel])
    g = lambda a: a[parent_of]
    new_configs = g(configs)
    wp = jnp.clip(g(lengths), 0, L-1)
    appended = jnp.where((jnp.arange(L)[None,:]==wp[:,None]) & ~is_parent[:,None], child_cone[:,None], new_configs)
    ext = ~is_parent & sel_valid
    return (jnp.where(sel_valid[:,None], appended, -1),
            jnp.where(sel_valid, g(lengths)+ext, 0).astype(jnp.int32),
            sel_valid, g(angle)+0.001)
bench("v1 no neighbor-table gather", make(v1), nb_i, nb_ok, configs0, lengths0, alive0, angle0)

# v2: v0 but skip topk (sel = iota)
def v2(nb_i, nb_ok, configs, lengths, alive, angle):
    last_idx = jnp.take_along_axis(configs, jnp.maximum(lengths-1,0)[:,None], axis=1)[:,0]
    cand_idx = nb_i[jnp.clip(last_idx,0,N-1)]
    can = nb_ok[jnp.clip(last_idx,0,N-1)]
    c_score = angle[:,None] + cand_idx.astype(jnp.float32)*0.01
    c_score = jnp.where(can, c_score, jnp.inf)
    parent_score = jnp.where(alive, angle, jnp.inf)
    pool = jnp.concatenate([parent_score, c_score.reshape(-1)])
    sel = (jnp.arange(K) * 6 + (pool[:K] > 0)).astype(jnp.int32)  # fake but data-dep
    is_parent = sel < K
    parent_of = jnp.where(is_parent, sel, (sel-K)//C)
    child_slot = jnp.where(is_parent, 0, (sel-K)%C).astype(jnp.int32)
    child_cone = cand_idx[parent_of, child_slot]
    sel_valid = jnp.isfinite(pool[sel])
    g = lambda a: a[parent_of]
    new_configs = g(configs)
    wp = jnp.clip(g(lengths), 0, L-1)
    appended = jnp.where((jnp.arange(L)[None,:]==wp[:,None]) & ~is_parent[:,None], child_cone[:,None], new_configs)
    ext = ~is_parent & sel_valid
    return (jnp.where(sel_valid[:,None], appended, -1),
            jnp.where(sel_valid, g(lengths)+ext, 0).astype(jnp.int32),
            sel_valid, g(angle)+0.001)
bench("v2 no topk", make(v2), nb_i, nb_ok, configs0, lengths0, alive0, angle0)

# v3: v0 with topk replaced by sort-of-keys trick (argsort)
def v3(nb_i, nb_ok, configs, lengths, alive, angle):
    last_idx = jnp.take_along_axis(configs, jnp.maximum(lengths-1,0)[:,None], axis=1)[:,0]
    cand_idx = nb_i[jnp.clip(last_idx,0,N-1)]
    can = nb_ok[jnp.clip(last_idx,0,N-1)]
    c_score = angle[:,None] + cand_idx.astype(jnp.float32)*0.01
    c_score = jnp.where(can, c_score, jnp.inf)
    parent_score = jnp.where(alive, angle, jnp.inf)
    pool = jnp.concatenate([parent_score, c_score.reshape(-1)])
    sel = jnp.argsort(pool)[:K].astype(jnp.int32)
    is_parent = sel < K
    parent_of = jnp.where(is_parent, sel, (sel-K)//C)
    child_slot = jnp.where(is_parent, 0, (sel-K)%C).astype(jnp.int32)
    child_cone = cand_idx[parent_of, child_slot]
    sel_valid = jnp.isfinite(pool[sel])
    g = lambda a: a[parent_of]
    new_configs = g(configs)
    wp = jnp.clip(g(lengths), 0, L-1)
    appended = jnp.where((jnp.arange(L)[None,:]==wp[:,None]) & ~is_parent[:,None], child_cone[:,None], new_configs)
    ext = ~is_parent & sel_valid
    return (jnp.where(sel_valid[:,None], appended, -1),
            jnp.where(sel_valid, g(lengths)+ext, 0).astype(jnp.int32),
            sel_valid, g(angle)+0.001)
bench("v3 argsort instead of topk", make(v3), nb_i, nb_ok, configs0, lengths0, alive0, angle0)
