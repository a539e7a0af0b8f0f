"""Profile the RK3 step on TPU; dump per-op time breakdown."""
import glob
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
from swmhd_tpu import operators as op_mod            # noqa: E402
from jax import lax                                  # noqa: E402

N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
model, state = build(N)

R = 3


def make_hook():
    memo = {}

    def roll(a, r, axis):
        rr = ((r + a.shape[axis] // 2) % a.shape[axis]) - a.shape[axis] // 2
        if abs(rr) > R:
            return jnp.roll(a, r, axis)
        key = (id(a), axis)
        ent = memo.get(key)
        if ent is None or ent[0] is not a:
            n = a.shape[axis]
            lo = lax.slice_in_dim(a, n - R, n, axis=axis)
            hi = lax.slice_in_dim(a, 0, R, axis=axis)
            pad = lax.concatenate([lo, a, hi], dimension=axis)
            ent = (a, pad)
            memo[key] = ent
        pad = ent[1]
        start = R - rr
        return lax.slice_in_dim(pad, start, start + a.shape[axis], axis=axis)

    return roll


def hooked(n_steps):
    inner = model.step_fn(0.001, n_steps)

    def fn(s):
        prev = op_mod.set_roll_impl(make_hook())
        try:
            return inner(s)
        finally:
            op_mod.set_roll_impl(prev)
    return fn


step = jax.jit(hooked(20))
s = step(state)
float(jnp.sum(s.h))

logdir = "/tmp/swmhd_prof"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
s = step(state)
float(jnp.sum(s.h))
jax.profiler.stop_trace()

files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", files, flush=True)
if files:
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd
    data, _ = rtd.xspace_to_tool_data(files, "hlo_stats", {})
    out = "/tmp/swmhd_prof/hlo_stats.json"
    mode = "wb" if isinstance(data, bytes) else "w"
    with open(out, mode) as f:
        f.write(data)
    print("wrote", out)
