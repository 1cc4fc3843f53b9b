import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax
import jax.numpy as jnp
from fast_ray_tracer_tpu.utils import enable_compile_cache
enable_compile_cache()

N = 640_000
B = 655360
dtype = jnp.float32
rng = np.random.default_rng(0)
act = jnp.asarray(rng.random(N) < 0.6)
payload = jnp.asarray(rng.normal(size=(N, 8)).astype(np.float32))

def timed(fn, *args, reps=10):
    out = fn(*args); jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        jax.block_until_ready(outs)
        best = min(best, (time.perf_counter() - t0) / reps)
    return best

@jax.jit
def f_nonzero(a):
    return jnp.nonzero(a, size=B, fill_value=N)[0]

@jax.jit
def f_cumsum(a):
    return jnp.cumsum(a.astype(jnp.int32))

@jax.jit
def f_gather(idx, p):
    pad = jnp.concatenate([p, jnp.zeros((1, 8), dtype)])
    return pad[idx]

@jax.jit
def f_gather2(idx, p):
    pad = jnp.concatenate([p, jnp.zeros((1, 8), dtype)])
    return pad[idx, :3], pad[idx, 3:6]

@jax.jit
def f_scatter(a, p):
    pos = jnp.cumsum(a.astype(jnp.int32)) - 1
    pos = jnp.where(a & (pos < B), pos, B)
    return jnp.zeros((B, 8), dtype).at[pos].set(p, mode="drop")

@jax.jit
def f_full_current(a, p):
    idx = jnp.nonzero(a, size=B, fill_value=N)[0]
    pad = jnp.concatenate([p, jnp.zeros((1, 8), dtype)])
    o = pad[idx][:, :3]
    d = pad[idx][:, 3:6]
    return o, d

idx = f_nonzero(act)
print("nonzero        ", round(timed(f_nonzero, act)*1e3, 2), "ms")
print("cumsum         ", round(timed(f_cumsum, act)*1e3, 2), "ms")
print("gather(N,8)    ", round(timed(f_gather, idx, payload)*1e3, 2), "ms")
print("gather 2 slices", round(timed(f_gather2, idx, payload)*1e3, 2), "ms")
print("scatter compact", round(timed(f_scatter, act, payload)*1e3, 2), "ms")
print("full current   ", round(timed(f_full_current, act, payload)*1e3, 2), "ms")
