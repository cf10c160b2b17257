import time
import jax, jax.numpy as jnp

B2, K, C, L, N = 512, 64, 5, 12, 128

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

key = jax.random.PRNGKey(0)
xy = jax.random.normal(key, (B2, N, 2)) * 30

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
    wp = jnp.clip(g(lengths), 0, L-1)
    appended = jnp.where((jnp.arange(L)[None,:]==wp[:,None]) & ~is_parent[:,None], child_cone[:,None], g(configs))
    ext = ~is_parent & sel_valid
    return (jnp.where(sel_valid[:,None], appended, -1),
            jnp.where(sel_valid, g(lengths)+ext, 0).astype(jnp.int32),
            sel_valid, g(angle)+0.001)

def init(B2):
    configs0 = jnp.full((B2, K, L), -1, jnp.int32).at[:, 0, 0].set(3).at[:, 0, 1].set(7)
    lengths0 = jnp.zeros((B2, K), jnp.int32).at[:, 0].set(2)
    alive0 = jnp.zeros((B2, K), bool).at[:, 0].set(True)
    angle0 = jnp.zeros((B2, K))
    return configs0, lengths0, alive0, angle0

# setup (cdist + topk) INSIDE the same jit feeding the loop
def with_setup(xy):
    def one(xy):
        d2 = jnp.sum((xy[:,None,:]-xy[None,:,:])**2, axis=-1)
        d2 = jnp.where(jnp.eye(N, dtype=bool), jnp.inf, d2)
        _, knn = jax.lax.top_k(-d2, C)
        adj = jnp.any(knn[:, :, None] == jnp.arange(N)[None,None,:], axis=1)
        adj = adj & (d2 < 400.0); adj = adj & adj.T
        nb_vals, nb_i = jax.lax.top_k(adj.astype(jnp.int32), C)
        nb_ok = nb_vals > 0
        return nb_i, nb_ok
    nb_i, nb_ok = jax.vmap(one)(xy)
    c, le, al, an = init(xy.shape[0])
    def step(i, st):
        return jax.vmap(v0)(nb_i, nb_ok, *st)
    return jax.lax.fori_loop(0, 11, step, (c, le, al, an))
bench("setup in-jit -> loop", jax.jit(with_setup), xy)

# same but force nb through device roundtrip barrier (optimization_barrier)
def with_setup_barrier(xy):
    def one(xy):
        d2 = jnp.sum((xy[:,None,:]-xy[None,:,:])**2, axis=-1)
        d2 = jnp.where(jnp.eye(N, dtype=bool), jnp.inf, d2)
        _, knn = jax.lax.top_k(-d2, C)
        adj = jnp.any(knn[:, :, None] == jnp.arange(N)[None,None,:], axis=1)
        adj = adj & (d2 < 400.0); adj = adj & adj.T
        nb_vals, nb_i = jax.lax.top_k(adj.astype(jnp.int32), C)
        nb_ok = nb_vals > 0
        return nb_i, nb_ok
    nb_i, nb_ok = jax.vmap(one)(xy)
    nb_i, nb_ok = jax.lax.optimization_barrier((nb_i, nb_ok))
    c, le, al, an = init(xy.shape[0])
    def step(i, st):
        return jax.vmap(v0)(nb_i, nb_ok, *st)
    return jax.lax.fori_loop(0, 11, step, (c, le, al, an))
bench("setup in-jit -> barrier -> loop", jax.jit(with_setup_barrier), xy)
