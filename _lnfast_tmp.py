import numpy as np, jax, jax.numpy as jnp, time
jax.config.update("jax_compilation_cache_dir", "/tmp/btia_jax_cache")

M, D = 65536, 768
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(M, D), jnp.bfloat16)
scale = jnp.asarray(rng.randn(D), jnp.float32)
bias = jnp.asarray(rng.randn(D), jnp.float32)

import flax.linen as nn
ln = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)
params = {'params': {'scale': scale, 'bias': bias}}

def flax_ln_chain(x):
    def body(i, acc):
        y = ln.apply(params, x + (i*1e-6).astype(x.dtype))
        return acc + y.astype(jnp.float32).sum()
    return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

ones = jnp.ones((D, 1), jnp.bfloat16)
def fast_ln(xi):
    x32sum = jax.lax.dot_general(xi, ones, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    mean = x32sum / D  # (M,1)
    sqsum = jax.lax.dot_general(xi*xi, ones, (((1,),(0,)),((),())), preferred_element_type=jnp.float32)
    var = sqsum / D - mean*mean
    inv = jax.lax.rsqrt(var + 1e-6)
    return ((xi.astype(jnp.float32) - mean) * inv * scale + bias)

def fast_ln_chain(x):
    def body(i, acc):
        y = fast_ln(x + (i*1e-6).astype(x.dtype))
        return acc + y.sum()
    return jax.lax.fori_loop(0, 20, body, jnp.float32(0))

f1 = jax.jit(flax_ln_chain); f2 = jax.jit(fast_ln_chain)
a=float(f1(x)); b=float(f2(x))
# correctness
ref = ln.apply(params, x).astype(jnp.float32)
fast = fast_ln(x)
print("LN max diff:", float(jnp.abs(ref-fast).max()), flush=True)
for name, f in [("flax_ln", f1), ("mxu_ln", f2)]:
    t0=time.perf_counter()
    for _ in range(5): s=float(f(x))
    dt=(time.perf_counter()-t0)/5/20
    print(f"{name}: {dt*1000:.3f} ms per LN of (65536,768)", flush=True)
