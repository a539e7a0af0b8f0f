"""Tile-size sweep for the x-only fused RK3 step at bench size.

Usage: SWMHD_BENCH_N=2048 SWMHD_TILES=32,64,128,256 python benchmarks/exp_fused_tile.py
"""
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

from bench import build                                   # noqa: E402
from swmhd_tpu.ops.fused_step import fused_step_fn        # noqa: E402

N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
model, state = build(N)

for t in os.environ.get("SWMHD_TILES", "32,64,128,256").split(","):
    Tx = int(t)
    try:
        fn = jax.jit(fused_step_fn(model, dt=1e-3, n_steps=1, tile_x=Tx))
        t0 = time.perf_counter()
        out = fn(state)
        float(jnp.sum(out.h))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(out)
        float(jnp.sum(out.h))
        dt_run = (time.perf_counter() - t0) / 10
        print(f"[Tx={Tx:4d}] compile {t_compile:6.1f}s  "
              f"{dt_run*1e3:7.2f} ms/step  {N*N/dt_run:.3e} pts/s",
              flush=True)
    except Exception as e:
        print(f"[Tx={Tx:4d}] FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
