import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
from scflow_tpu.ops.fused_norm import instance_norm, _reference_in
print("backend:", jax.default_backend())
key = jax.random.PRNGKey(0)
for shape, dt in [((32,64,64,64), jnp.float32), ((32,64,64,64), jnp.bfloat16),
                  ((32,32,32,96), jnp.bfloat16), ((8,128,128,64), jnp.bfloat16),
                  ((32,16,16,128), jnp.float32)]:
    x = (jax.random.normal(key, shape, jnp.float32) * 3 + 1).astype(dt)
    g = jax.random.normal(jax.random.PRNGKey(1), (shape[-1],)) * 0.5 + 1
    b = jax.random.normal(jax.random.PRNGKey(2), (shape[-1],)) * 0.2
    y1 = jax.jit(lambda x,g,b: instance_norm(x,g,b,1e-5))(x,g,b)
    y2 = jax.jit(lambda x,g,b: _reference_in(x,g,b,1e-5))(x,g,b)
    err = jnp.max(jnp.abs(y1.astype(jnp.float32)-y2.astype(jnp.float32)))
    print(shape, dt.__name__, "max_abs_err:", float(err))
    # timing
    f1 = jax.jit(lambda x,g,b: instance_norm(x,g,b,1e-5))
    f2 = jax.jit(lambda x,g,b: _reference_in(x,g,b,1e-5))
    for name, f in [("pallas", f1), ("xla", f2)]:
        y = f(x,g,b); jax.block_until_ready(y)
        t0=time.perf_counter()
        for _ in range(50): y=f(x,g,b)
        jax.block_until_ready(y)
        print("  ", name, f"{1e6*(time.perf_counter()-t0)/50:.1f} us")
