"""Experiment: pad-once-per-(array,axis) roll hook vs plain jnp.roll.

Each distinct base array that gets shifted along an axis is wrap-padded
once (1 copy); all its shifts become lax.slice reads of that pad (fusible,
no further copies). Intermediates keep their aligned (N, N) shapes —
unlike the full slab path, which telescoped every intermediate to odd
sizes and lost to relayouts.
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import build                              # noqa: E402
from swmhd_tpu import operators as op_mod            # noqa: E402

N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
model, state = build(N)
R = 3


def make_hook(axes):
    memo = {}

    def roll(a, r, axis):
        rr = ((r + a.shape[axis] // 2) % a.shape[axis]) - a.shape[axis] // 2
        if axis not in axes or abs(rr) > R:
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
        start = R - rr           # out[i] = a[i - r] = pad[i - r + R]
        return lax.slice_in_dim(pad, start, start + a.shape[axis], axis=axis)

    return roll


def step_delta(name, mk_fn, lo=10, hi=60):
    f_lo = jax.jit(mk_fn(lo))
    f_hi = jax.jit(mk_fn(hi))
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
    print(f"[{name:18s}] {per*1e3:7.3f} ms/step -> {N*N/per:.3e} pts/s",
          flush=True)


def hooked_step(n_steps, axes):
    inner = model.step_fn(0.001, n_steps)

    def fn(s):
        prev = op_mod.set_roll_impl(make_hook(axes))
        try:
            return inner(s)
        finally:
            op_mod.set_roll_impl(prev)
    return fn


step_delta("baseline-roll", lambda n: model.step_fn(0.001, n))
step_delta("pad-x", lambda n: hooked_step(n, (0,)))
step_delta("pad-y", lambda n: hooked_step(n, (1,)))
step_delta("pad-xy", lambda n: hooked_step(n, (0, 1)))
