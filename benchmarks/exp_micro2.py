"""Isolate shift-direction cost inside scans (no dispatch overhead)."""
import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = 2048
a = jnp.ones((N, N), jnp.float32)
fb = N * N * 4
REPS = 50


def timeit(name, make_body, traffic, reps=REPS):
    @jax.jit
    def run(x):
        def body(c, _):
            return make_body(c), None
        out, _ = lax.scan(body, x, None, length=reps)
        return out

    out = run(a)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    out = run(a)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    print(f"[{name}] {dt*1e3:.3f} ms/iter -> {traffic/dt/1e9:.0f} GB/s",
          flush=True)


# baseline: pure elementwise
timeit("ewise3", lambda x: x * 0.99 + 0.01, 2 * fb)

# x-shift (sublane) 5-pt
timeit("xshift4", lambda x: 0.2 * (x + jnp.roll(x, 1, 0) + jnp.roll(x, -1, 0)
                                   + jnp.roll(x, 2, 0) + jnp.roll(x, -2, 0)),
       2 * fb)

# y-shift (lane) 5-pt
timeit("yshift4", lambda x: 0.2 * (x + jnp.roll(x, 1, 1) + jnp.roll(x, -1, 1)
                                   + jnp.roll(x, 2, 1) + jnp.roll(x, -2, 1)),
       2 * fb)

# pad+slice versions
def xslice(x):
    p = jnp.concatenate([x[-2:], x, x[:2]], 0)
    return 0.2 * (p[2:-2] + p[1:-3] + p[3:-1] + p[:-4] + p[4:])


def yslice(x):
    p = jnp.concatenate([x[:, -2:], x, x[:, :2]], 1)
    return 0.2 * (p[:, 2:-2] + p[:, 1:-3] + p[:, 3:-1] + p[:, :-4]
                  + p[:, 4:])


timeit("xslice4", xslice, 2 * fb)
timeit("yslice4", yslice, 2 * fb)


# a WENO5-like chain along y (the real workload shape)
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


timeit("weno_y", weno_y, 2 * fb)


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


timeit("weno_x", weno_x, 2 * fb)

# division cost probe: same graph without the divides
def weno_y_nodiv(x):
    sh = lambda n: jnp.roll(x, -n, 1)
    cm3, cm2, cm1, c0, cp1 = sh(-3), sh(-2), sh(-1), x, sh(1)
    p0 = (2 * cm3 - 7 * cm2 + 11 * cm1) * (1 / 6)
    p1 = (-cm2 + 5 * cm1 + 2 * c0) * (1 / 6)
    p2 = (2 * cm1 + 5 * c0 - cp1) * (1 / 6)
    b0 = (13 / 12) * (cm3 - 2 * cm2 + cm1) ** 2 + 0.25 * (cm3 - 4 * cm2 + 3 * cm1) ** 2
    b1 = (13 / 12) * (cm2 - 2 * cm1 + c0) ** 2 + 0.25 * (cm2 - c0) ** 2
    b2 = (13 / 12) * (cm1 - 2 * c0 + cp1) ** 2 + 0.25 * (3 * cm1 - 4 * c0 + cp1) ** 2
    a0 = 0.1 * (b0 + 1e-6) ** 2
    a1 = 0.6 * (b1 + 1e-6) ** 2
    a2 = 0.3 * (b2 + 1e-6) ** 2
    return (a0 * p0 + a1 * p1 + a2 * p2) * (a0 + a1 + a2)


timeit("weno_y_nodiv", weno_y_nodiv, 2 * fb)
