"""Microbenchmarks: achievable HBM bandwidth + dispatch overhead on this chip."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 4096
a = jnp.ones((N, N), jnp.float32)
b = jnp.ones((N, N), jnp.float32) * 2


def timeit(name, fn, *args, reps=20, traffic_bytes=None):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out if not isinstance(out, tuple) else out[0]))
    dt = (time.perf_counter() - t0) / reps
    msg = f"[{name}] {dt*1e3:.3f} ms"
    if traffic_bytes:
        msg += f"  -> {traffic_bytes/dt/1e9:.0f} GB/s"
    print(msg, flush=True)
    return dt


fb = N * N * 4  # one field in bytes

# 1. dispatch overhead: tiny jitted op
tiny = jax.jit(lambda x: x + 1.0)
small = jnp.zeros((8, 128))
timeit("dispatch tiny", tiny, small)

# 2. single add (read 2 + write 1)
add = jax.jit(lambda x, y: x + y)
timeit("add 4096^2", add, a, b, traffic_bytes=3 * fb)


# 3. chain of 20 adds in one jit: if fused -> same traffic as single add
@jax.jit
def chain(x, y):
    for _ in range(20):
        x = x + y
    return x


timeit("chain20", chain, a, b, traffic_bytes=3 * fb)


# 4. scan of 50 adds (iteration overhead of lax.scan)
@jax.jit
def scanadd(x, y):
    def body(c, _):
        return c + y, None
    out, _ = jax.lax.scan(body, x, None, length=50)
    return out


timeit("scan50add", scanadd, a, b, reps=5, traffic_bytes=50 * 3 * fb)

# 5. 9-point stencil via rolls (read ~1 + write 1 if fused; rolls may copy)
@jax.jit
def stencil(x):
    s = x
    for sh in (-1, 1):
        s = s + jnp.roll(x, sh, 0) + jnp.roll(x, sh, 1)
    return s


timeit("stencil-roll", stencil, a, traffic_bytes=2 * fb)


# 6. stencil via pad+slice
@jax.jit
def stencil_slice(x):
    p = jnp.concatenate([x[-1:], x, x[:1]], 0)
    p = jnp.concatenate([p[:, -1:], p, p[:, :1]], 1)
    c = p[1:-1, 1:-1]
    s = c + p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]
    return s


timeit("stencil-slice", stencil_slice, a, traffic_bytes=2 * fb)

# 7. divide throughput: 20 chained divides
@jax.jit
def divchain(x, y):
    for _ in range(20):
        x = x / (y + x)
    return x


timeit("divchain20", divchain, a, b, traffic_bytes=3 * fb)
