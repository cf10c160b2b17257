import time
import jax, jax.numpy as jnp

B, S, K, N, F, X, C = 256, 2, 64, 128, 20, 58, 5

def bench(name, fn, *args, iters=20):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:56s} {(time.perf_counter()-t0)/iters*1e3:9.3f} ms")

key = jax.random.PRNGKey(0)
T = jax.random.normal(key, (B, S, N, F))
St = jax.random.normal(key, (B, S, K, X))
last = jax.random.randint(key, (B, S, K), 0, N)
par = jax.random.randint(key, (B, S, K), 0, K)

def loop11(body):
    def f(T, St, last, par):
        def step(i, acc):
            a, b = body(T, St, last, par)
            return acc + jnp.sum(a) * 1e-9 + jnp.sum(b) * 1e-9
        return jax.lax.fori_loop(0, 11, step, 0.0)
    return jax.jit(f)

def einsum_hi(T, St, last, par):
    ohn = (last[..., None] == jnp.arange(N)).astype(jnp.float32)  # (B,S,K,N)
    a = jnp.einsum('bskn,bsnf->bskf', ohn, T, precision=jax.lax.Precision.HIGHEST)
    ohk = (par[..., None] == jnp.arange(K)).astype(jnp.float32)
    b = jnp.einsum('bskj,bsjx->bskx', ohk, St, precision=jax.lax.Precision.HIGHEST)
    return a, b
bench("one-hot einsum HIGHEST x11", loop11(einsum_hi), T, St, last, par)

def einsum_def(T, St, last, par):
    ohn = (last[..., None] == jnp.arange(N)).astype(jnp.float32)
    a = jnp.einsum('bskn,bsnf->bskf', ohn, T)
    ohk = (par[..., None] == jnp.arange(K)).astype(jnp.float32)
    b = jnp.einsum('bskj,bsjx->bskx', ohk, St)
    return a, b
bench("one-hot einsum default x11", loop11(einsum_def), T, St, last, par)

def mulreduce(T, St, last, par):
    ohn = last[..., None] == jnp.arange(N)
    a = jnp.sum(jnp.where(ohn[..., None], T[:, :, None, :, :], 0.0), axis=-2)
    ohk = par[..., None] == jnp.arange(K)
    b = jnp.sum(jnp.where(ohk[..., None], St[:, :, None, :, :], 0.0), axis=-2)
    return a, b
bench("one-hot mask+reduce x11", loop11(mulreduce), T, St, last, par)
