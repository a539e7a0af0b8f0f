"""Honest per-iteration timing via scan-length differencing.

wall(call) = max(relay_latency, device_time) + eps, so time two scan
lengths and divide the delta by the iteration delta.
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

N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
fb = N * N * 4


def run_scan(body, x, length):
    @jax.jit
    def run(x):
        def b(c, _):
            return body(c), None
        out, _ = lax.scan(b, x, None, length=length)
        return out
    out = run(x)
    float(jnp.sum(out))     # warmup + compile
    t0 = time.perf_counter()
    out = run(x)
    float(jnp.sum(out))
    return time.perf_counter() - t0


def delta(name, body, traffic, lo=100, hi=600):
    a = jnp.ones((N, N), jnp.float32)
    t_lo = run_scan(body, a, lo)
    t_hi = run_scan(body, a, hi)
    per = (t_hi - t_lo) / (hi - lo)
    print(f"[{name}] {per*1e3:.4f} ms/iter -> {traffic/per/1e9:.0f} GB/s",
          flush=True)


delta("ewise", lambda x: x * 0.99 + 0.01, 2 * fb)
delta("xshift2", lambda x: 0.5 * (jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)),
      2 * fb)
delta("yshift2", lambda x: 0.5 * (jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)),
      2 * fb)


def weno_y(x):
    sh = lambda n: jnp.roll(x, -n, 1)
    cm3, cm2, cm1, c0, cp1 = sh(-3), sh(-2), sh(-1), x, sh(1)
    p0 = (2 * cm3 - 7 * cm2 + 11 * cm1) / 6
    p1 = (-cm2 + 5 * cm1 + 2 * c0) / 6
    p2 = (2 * cm1 + 5 * c0 - cp1) / 6
    b0 = (13 / 12) * (cm3 - 2 * cm2 + cm1) ** 2 + 0.25 * (cm3 - 4 * cm2 + 3 * cm1) ** 2
    b1 = (13 / 12) * (cm2 - 2 * cm1 + c0) ** 2 + 0.25 * (cm2 - c0) ** 2
    b2 = (13 / 12) * (cm1 - 2 * c0 + cp1) ** 2 + 0.25 * (3 * cm1 - 4 * c0 + cp1) ** 2
    a0 = 0.1 / (b0 + 1e-6) ** 2
    a1 = 0.6 / (b1 + 1e-6) ** 2
    a2 = 0.3 / (b2 + 1e-6) ** 2
    return (a0 * p0 + a1 * p1 + a2 * p2) / (a0 + a1 + a2)


delta("weno_y", weno_y, 2 * fb)


def weno_x(x):
    sh = lambda n: jnp.roll(x, -n, 0)
    cm3, cm2, cm1, c0, cp1 = sh(-3), sh(-2), sh(-1), x, sh(1)
    p0 = (2 * cm3 - 7 * cm2 + 11 * cm1) / 6
    p1 = (-cm2 + 5 * cm1 + 2 * c0) / 6
    p2 = (2 * cm1 + 5 * c0 - cp1) / 6
    b0 = (13 / 12) * (cm3 - 2 * cm2 + cm1) ** 2 + 0.25 * (cm3 - 4 * cm2 + 3 * cm1) ** 2
    b1 = (13 / 12) * (cm2 - 2 * cm1 + c0) ** 2 + 0.25 * (cm2 - c0) ** 2
    b2 = (13 / 12) * (cm1 - 2 * c0 + cp1) ** 2 + 0.25 * (3 * cm1 - 4 * c0 + cp1) ** 2
    a0 = 0.1 / (b0 + 1e-6) ** 2
    a1 = 0.6 / (b1 + 1e-6) ** 2
    a2 = 0.3 / (b2 + 1e-6) ** 2
    return (a0 * p0 + a1 * p1 + a2 * p2) / (a0 + a1 + a2)


delta("weno_x", weno_x, 2 * fb)

# the real thing: full RK3 step, both paths
from bench import build                              # noqa: E402

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


step_delta("step-roll", lambda n: model.step_fn(0.001, n))
