"""Diagnose fixed per-iteration overhead: N, scan length, unroll."""
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, run, x, iters):
    out = run(x)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.sum(out))
    dt = time.perf_counter() - t0
    nbytes = x.size * 4
    print(f"[{name}] {dt*1e3:.2f} ms total, {dt/iters*1e3:.3f} ms/iter "
          f"-> {2*nbytes*iters/dt/1e9:.0f} GB/s", flush=True)


for N in (1024, 2048, 4096):
    a = jnp.ones((N, N), jnp.float32)
    for length, unroll in ((50, 1), (50, 4), (200, 1)):
        @jax.jit
        def run(x, length=length, unroll=unroll):
            def body(c, _):
                return c * 0.99 + 0.01, None
            out, _ = lax.scan(body, x, None, length=length, unroll=unroll)
            return out

        timeit(f"N={N} scan{length} unroll{unroll}", run, a, length)

    # python-unrolled chain in one jit (no scan machinery at all)
    @jax.jit
    def chain(x):
        for _ in range(50):
            x = x * 0.99 + 0.01
        return x

    timeit(f"N={N} chain50", chain, a, 50)
