import time
import jax, jax.numpy as jnp

B, K, C, M = 256, 64, 5, 5

def bench(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

key = jax.random.PRNGKey(0)

# elementwise chain + reduce, three layouts, 11 serial iterations
def chain(x):  # ~10 elementwise ops + reduce over last "M-like" axis
    def step(i, x):
        y = jnp.sin(x) * 1.1 + jnp.cos(x)
        z = jnp.maximum(y, 0.3) * jnp.where(y > 0, 1.0, 0.5)
        w = z**2 + z - jnp.abs(y)
        return x + 1e-6 * w
    return jax.lax.fori_loop(0, 11, step, x)

for shape, name in [((B,2,K,C,M), "(B,2,K,C,M=5 lanes)"),
                    ((B,2,C,M,K), "(B,2,C,M,K=64 lanes)"),
                    ((B,C,M,2*K), "(B,C,M,2K=128 lanes)")]:
    x = jax.random.normal(key, shape)
    bench(f"chain {name}", jax.jit(chain), x)

# one-hot expansion einsum (B, SN=256, F=20) @ onehot (B, SN, 2K) -> (B, F, 2K), 11 iters
SN, F, K2 = 256, 24, 128
T = jax.random.normal(key, (B, SN, F))
last = jax.random.randint(key, (B, K2), 0, SN)
def expand(T, last):
    def step(i, acc):
        oh = (last[:, None, :] == jnp.arange(SN)[None, :, None]).astype(jnp.float32)
        out = jnp.einsum('bnk,bnf->bfk', oh, T)
        return acc + out
    return jax.lax.fori_loop(0, 11, step, jnp.zeros((B, F, K2)))
bench("one-hot expand einsum x11", jax.jit(expand), T, last)

# state regather einsum (B, 2K, 2K) x (B, X=32, 2K)
X = 32
st = jax.random.normal(key, (B, X, K2))
par = jax.random.randint(key, (B, K2), 0, K2)
def regather(st, par):
    def step(i, st):
        oh = (par[:, None, :] == jnp.arange(K2)[None, :, None]).astype(jnp.float32)
        return jnp.einsum('bjk,bxj->bxk', oh, st) + 1e-9
    return jax.lax.fori_loop(0, 11, step, st)
bench("state regather einsum x11", jax.jit(regather), st, par)

# per-side topk: (B,2,384) -> 64, via reshape (B*2, 384), x11
pool = jax.random.normal(key, (B, 6, K2))  # (1+C)=6 rows of K2.. -> per side? emulate (B*2, 384)
def topk11(pool):
    def step(i, p):
        flat = p.transpose(0,2,1).reshape(B, K2*6)  # mix
        flat2 = flat.reshape(B*2, 384)
        _, sel = jax.lax.top_k(-flat2, 64)
        upd = jnp.zeros_like(p).at[:, 0, :64].add(sel.reshape(B,2,64)[:, 0].astype(p.dtype)*1e-9)
        return p + upd
    return jax.lax.fori_loop(0, 11, step, pool)
bench("transpose+reshape+topk x11", jax.jit(topk11), pool)
