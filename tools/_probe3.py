import time
import jax, jax.numpy as jnp
import numpy as np

B, K, C, L = 512, 64, 5, 12
P = K*(1+C)  # 384

def bench(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

key = jax.random.PRNGKey(0)
scores = jax.random.normal(key, (B, P))
state = jax.random.normal(key, (B, K, 24))
idx = jax.random.randint(key, (B, K), 0, K)

# topk alone, looped 11x serial
def topk_loop(scores):
    def step(i, s):
        _, sel = jax.lax.top_k(-s, K)
        return s.at[:, :K].add(sel.astype(s.dtype)*1e-9)
    return jax.lax.fori_loop(0, 11, step, scores)
bench("top_k(384->64) x11 serial", jax.jit(topk_loop), scores)

# variant: argsort
def sort_loop(scores):
    def step(i, s):
        sel = jnp.argsort(s, axis=-1)[:, :K]
        return s.at[:, :K].add(sel.astype(s.dtype)*1e-9)
    return jax.lax.fori_loop(0, 11, step, scores)
bench("argsort x11 serial", jax.jit(sort_loop), scores)

# gather regather x11: state[b, idx[b]] via vmap take
def gather_loop(state, idx):
    def step(i, st):
        g = jax.vmap(lambda s, ix: s[ix])(st, idx)
        return g + 1e-9
    return jax.lax.fori_loop(0, 11, step, state)
bench("regather (B,K,24) by idx x11 (gather)", jax.jit(gather_loop), state, idx)

# one-hot matmul regather
def onehot_loop(state, idx):
    def step(i, st):
        oh = jax.nn.one_hot(idx, K, dtype=st.dtype)  # (B,K,K)
        g = jnp.einsum('bkj,bjf->bkf', oh, st)
        return g + 1e-9
    return jax.lax.fori_loop(0, 11, step, state)
bench("regather x11 (one-hot matmul)", jax.jit(onehot_loop), state, idx)

# neighbor-table expansion: F (B,N,F) gathered by (B,K) idx
N, Fdim = 128, 24
F = jax.random.normal(key, (B, N, Fdim))
idxn = jax.random.randint(key, (B, K), 0, N)
def expand_gather(F, idxn):
    def step(i, acc):
        g = jax.vmap(lambda f, ix: f[ix])(F, idxn)
        return acc + g
    return jax.lax.fori_loop(0, 11, step, jnp.zeros((B,K,Fdim)))
bench("expand (B,128,24) by (B,64) x11 (gather)", jax.jit(expand_gather), F, idxn)
def expand_onehot(F, idxn):
    def step(i, acc):
        oh = jax.nn.one_hot(idxn, N, dtype=F.dtype)
        g = jnp.einsum('bkn,bnf->bkf', oh, F)
        return acc + g
    return jax.lax.fori_loop(0, 11, step, jnp.zeros((B,K,Fdim)))
bench("expand x11 (one-hot matmul)", jax.jit(expand_onehot), F, idxn)
