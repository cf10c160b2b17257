import time
import jax, jax.numpy as jnp

K, C, L, N = 64, 5, 12, 128
P = K*(1+C)

def bench(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

key = jax.random.PRNGKey(0)

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

def run_flat(B2):
    nb_i = jax.random.randint(key, (B2, N, C), 0, N)
    nb_ok = jax.random.bernoulli(key, 0.9, (B2, N, C))
    configs0 = jnp.full((B2, K, L), -1, jnp.int32).at[:, 0, 0].set(3).at[:, 0, 1].set(7)
    lengths0 = jnp.zeros((B2, K), jnp.int32).at[:, 0].set(2)
    alive0 = jnp.zeros((B2, K), bool).at[:, 0].set(True)
    angle0 = jnp.zeros((B2, K))
    def f(nb_i, nb_ok, c, le, al, an):
        def one(nb_i, nb_ok, c, le, al, an):
            return jax.lax.fori_loop(0, 11, lambda i, st: v0(nb_i, nb_ok, *st), (c, le, al, an))
        return jax.vmap(one)(nb_i, nb_ok, c, le, al, an)
    bench(f"flat vmap B={B2}", jax.jit(f), nb_i, nb_ok, configs0, lengths0, alive0, angle0)

def run_nested(B):
    nb_i = jax.random.randint(key, (B, 2, N, C), 0, N)
    nb_ok = jax.random.bernoulli(key, 0.9, (B, 2, N, C))
    configs0 = jnp.full((B, 2, K, L), -1, jnp.int32).at[:, :, 0, 0].set(3).at[:, :, 0, 1].set(7)
    lengths0 = jnp.zeros((B, 2, K), jnp.int32).at[:, :, 0].set(2)
    alive0 = jnp.zeros((B, 2, K), bool).at[:, :, 0].set(True)
    angle0 = jnp.zeros((B, 2, K))
    def f(nb_i, nb_ok, c, le, al, an):
        def one(nb_i, nb_ok, c, le, al, an):
            def side(nb_i, nb_ok, c, le, al, an):
                return jax.lax.fori_loop(0, 11, lambda i, st: v0(nb_i, nb_ok, *st), (c, le, al, an))
            return jax.vmap(side)(nb_i, nb_ok, c, le, al, an)
        return jax.vmap(one)(nb_i, nb_ok, c, le, al, an)
    bench(f"nested vmap B={B}x2", jax.jit(f), nb_i, nb_ok, configs0, lengths0, alive0, angle0)

run_flat(512)
run_nested(256)

# also: loop-inside-vs-outside — fori_loop OUTSIDE the vmap
def run_flat_loop_out(B2):
    nb_i = jax.random.randint(key, (B2, N, C), 0, N)
    nb_ok = jax.random.bernoulli(key, 0.9, (B2, N, C))
    configs0 = jnp.full((B2, K, L), -1, jnp.int32).at[:, 0, 0].set(3).at[:, 0, 1].set(7)
    lengths0 = jnp.zeros((B2, K), jnp.int32).at[:, 0].set(2)
    alive0 = jnp.zeros((B2, K), bool).at[:, 0].set(True)
    angle0 = jnp.zeros((B2, K))
    vstep = jax.vmap(v0)
    def f(nb_i, nb_ok, c, le, al, an):
        return jax.lax.fori_loop(0, 11, lambda i, st: vstep(nb_i, nb_ok, *st), (c, le, al, an))
    bench(f"flat, loop outside vmap B={B2}", jax.jit(f), nb_i, nb_ok, configs0, lengths0, alive0, angle0)
run_flat_loop_out(512)
