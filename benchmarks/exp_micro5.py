"""Step timing after the divide-free WENO combine; plus flag probes."""
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build                              # noqa: E402

N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
model, state = build(N)


def step_delta(name, mk, lo=10, hi=60):
    f_lo = jax.jit(mk(lo))
    f_hi = jax.jit(mk(hi))
    s = f_lo(state)
    float(jnp.sum(s.h))
    t0 = time.perf_counter()
    s = f_lo(state)
    float(jnp.sum(s.h))
    t_lo = time.perf_counter() - t0
    s = f_hi(state)
    float(jnp.sum(s.h))
    t0 = time.perf_counter()
    s = f_hi(state)
    float(jnp.sum(s.h))
    t_hi = time.perf_counter() - t0
    per = (t_hi - t_lo) / (hi - lo)
    print(f"[{name}] {per*1e3:.3f} ms/step -> {N*N/per:.3e} pts/s", flush=True)
    return per


step_delta("step-roll-rational", lambda n: model.step_fn(0.001, n))
