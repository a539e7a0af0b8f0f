"""Operator-convergence study + verification quivers — the analog of the
reference's test_jacobian.jl / test_formulations.jl / MHD_visualize.jl
scripts: evaluates both Lorentz-force formulations on a Gaussian magnetic
potential with h ≡ 1 against the analytic force (−4x, −4y)·exp(−2r²)
(test_formulations.jl:14-15), prints log-log convergence orders, and saves
the A/B-field and A/Lorentz-force quiver figures (MHD_visualize.jl:79-98).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from swmhd_tpu import Grid
from swmhd_tpu.physics.lorentz import (
    lorentz_force_jacobian, lorentz_force_divergence)

L = 10.0


def analytic(x, y):
    r2 = x**2 + y**2
    return -4 * x * jnp.exp(-2 * r2), -4 * y * jnp.exp(-2 * r2)


def errors(N):
    g = Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2),
                     dtype=jnp.float64)
    A = g.evaluate(lambda x, y: jnp.exp(-(x**2 + y**2)), "cc")
    h = jnp.ones(g.shape, g.dtype)
    out = {}
    fx, fy = lorentz_force_jacobian(A, h, g)
    ex = g.evaluate(lambda x, y: analytic(x, y)[0], "fc")
    ey = g.evaluate(lambda x, y: analytic(x, y)[1], "cf")
    out["jacobian"] = max(float(jnp.max(jnp.abs(fx - ex))),
                          float(jnp.max(jnp.abs(fy - ey))))
    fx, fy = lorentz_force_divergence(A, h, g)
    out["divergence"] = max(float(jnp.max(jnp.abs(fx - ex))),
                            float(jnp.max(jnp.abs(fy - ey))))
    return out


if __name__ == "__main__":
    ns = [64, 128, 256, 512]
    errs = {k: [] for k in ("jacobian", "divergence")}
    for N in ns:
        e = errors(N)
        for k, v in e.items():
            errs[k].append(v)
        print(f"N={N:4d}  jacobian={e['jacobian']:.3e}  "
              f"divergence={e['divergence']:.3e}")
    for k, es in errs.items():
        order = -np.polyfit(np.log10(ns), np.log10(es), 1)[0]
        print(f"{k}-form convergence order: {order:.2f}")

    # verification quivers (MHD_visualize.jl artifacts)
    from swmhd_tpu.viz import render_field_verification
    g = Grid.regular(128, 128, (-L / 2, L / 2), (-L / 2, L / 2),
                     dtype=jnp.float64)
    A = g.evaluate(lambda x, y: jnp.exp(-(x**2 + y**2)), "cc")
    made = render_field_verification(g, A, jnp.ones(g.shape), "A_verify")
    print("wrote:", *made)
