"""Round-2 perf experiment: roll-based XLA step vs halo-slab step on TPU."""
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

from bench import build                      # noqa: E402
from swmhd_tpu.profiling import benchmark_step, detect_hbm_peak  # noqa: E402
from swmhd_tpu.ops.slab_step import slab_step_fn                 # noqa: E402

N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
which = os.environ.get("WHICH", "both")
model, state = build(N)
dt = 0.001
steps = 10

print(f"devices: {jax.devices()}", flush=True)


def report(name, fn):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    lowered = jfn.lower(state)
    compiled = lowered.compile()
    print(f"[{name}] compile {time.perf_counter()-t0:.1f}s", flush=True)
    ca = compiled.cost_analysis()
    if ca:
        flops = ca.get("flops", 0.0)
        bytes_ = ca.get("bytes accessed", 0.0)
        print(f"[{name}] cost: {flops/steps:.3e} flops/step, "
              f"{bytes_/steps/1e9:.2f} GB/step "
              f"({bytes_/steps/N/N:.0f} B/pt)", flush=True)
    b = benchmark_step(jfn, state, steps, n_calls=5)
    print(f"[{name}] {b}", flush=True)
    return b


if which in ("both", "xla"):
    report("xla-roll", model.step_fn(dt, steps))
if which in ("both", "slab"):
    report("slab", slab_step_fn(model, dt, n_steps=steps))
