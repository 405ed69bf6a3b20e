"""Headroom check: full minibatch grad step vs bare matmul chain."""
import time
import jax, jax.numpy as jnp

MB = 2_097_152
def cs(t): return jnp.sum(jnp.stack([jnp.sum(x).astype(jnp.float32) for x in jax.tree_util.tree_leaves(t)]))
def timeit(name, f, *a, n=5):
    r = f(*a); float(jax.jit(cs)(r))
    t0=time.perf_counter()
    for _ in range(n):
        r = f(*a); float(jax.jit(cs)(r))
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.1f} ms")

@jax.jit
def make(key):
    ks = jax.random.split(key, 4)
    return (jax.random.normal(ks[0], (MB, 5)),
            jax.random.normal(ks[1], (5, 64)) * 0.1,
            jax.random.normal(ks[2], (64, 64)) * 0.1,
            jax.random.normal(ks[3], (64, 3)) * 0.1)
x, w1, w2, w3 = make(jax.random.PRNGKey(0))

@jax.jit
def fwd_only(x, w1, w2, w3):
    h1 = jnp.tanh(x @ w1)
    h2 = jnp.tanh(h1 @ w2)
    return h2 @ w3

def loss_fn(ws, x):
    w1, w2, w3 = ws
    h1 = jnp.tanh(x @ w1)
    h2 = jnp.tanh(h1 @ w2)
    out = h2 @ w3
    return jnp.mean(jnp.square(out))

grad = jax.jit(jax.value_and_grad(loss_fn))
timeit("fwd only", fwd_only, x, w1, w2, w3)
timeit("fwd+bwd (value_and_grad)", lambda ws, x: grad(ws, x), (w1, w2, w3), x)

# theoretical min bytes: read x (42MB) + write/read h1,h2 (537MB*2 rw in f32)
# remat variant: checkpoint to drop h storage
grad_remat = jax.jit(jax.value_and_grad(jax.checkpoint(loss_fn)))
timeit("fwd+bwd remat", lambda ws, x: grad_remat(ws, x), (w1, w2, w3), x)
