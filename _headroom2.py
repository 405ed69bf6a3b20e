import time
import jax, jax.numpy as jnp

MB = 2_097_152
@jax.jit
def make(key):
    ks = jax.random.split(key, 4)
    return (jax.random.normal(ks[0], (MB, 5)),
            jax.random.normal(ks[1], (5, 64)) * 0.1,
            jax.random.normal(ks[2], (64, 64)) * 0.1,
            jax.random.normal(ks[3], (64, 3)) * 0.1)
x, w1, w2, w3 = make(jax.random.PRNGKey(0))

def loss_fn(ws, x):
    w1, w2, w3 = ws
    h1 = jnp.tanh(x @ w1)
    h2 = jnp.tanh(h1 @ w2)
    out = h2 @ w3
    return jnp.mean(jnp.square(out))

N = 16
@jax.jit
def fwd16(ws, x):
    def body(c, _):
        return c, loss_fn(ws, x)
    _, ls = jax.lax.scan(body, 0, None, length=N)
    return jnp.sum(ls)

g = jax.value_and_grad(loss_fn)
@jax.jit
def grad16(ws, x):
    def body(c, _):
        l, grads = g(jax.tree_util.tree_map(lambda a,b: a + 0.0*b, ws, c), x)
        return grads, l
    z = jax.tree_util.tree_map(jnp.zeros_like, ws)
    gs, ls = jax.lax.scan(body, z, None, length=N)
    return jnp.sum(ls) + jnp.sum(gs[0])

for name, f in (("fwd x16", fwd16), ("fwd+bwd x16", grad16)):
    r = f((w1,w2,w3), x); float(r)
    t0=time.perf_counter(); float(f((w1,w2,w3), x)); dt=time.perf_counter()-t0
    print(f"{name}: {dt/N*1e3:.1f} ms/iter")
