"""WENO-eps / weight-flavor sweep for the 128^2 two_Gaussians_low_B
energy-GAIN miss (r3 VERDICT item 1 continuation).

Budget attribution (r3_budget_any.py) shows the drift is entirely the
Lorentz-work vs induction-energy mismatch netting POSITIVE from t~3. At
128^2 the tracer's smoothness indicators are O((dx^2 A'')^2) ~ 1e-6,
i.e. comparable to _WENO_EPS=1e-6, which linearises the weights and
under-dissipates the A field relative to the reference's Oceananigans
WENO (eps=1e-8 era). This script reruns the scenario head (t<=T) under
{eps, flavor} variants and prints the SIGNED total-energy deviation
(reference functionals) every dtsample.

Usage: VARIANT=eps1e-8 T=30 python benchmarks/exp/r3_eps_sweep.py
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ["JAX_PLATFORMS"] = "cpu"

VARIANT = os.environ.get("VARIANT", "default")
if VARIANT.startswith("eps"):
    os.environ["SWMHD_WENO_EPS"] = VARIANT[3:]
elif VARIANT == "js":
    os.environ["SWMHD_WENO_WEIGHTS"] = "js"
elif VARIANT == "js_eps1e-8":
    os.environ["SWMHD_WENO_WEIGHTS"] = "js"
    os.environ["SWMHD_WENO_EPS"] = "1e-8"

import jax
# env vars are too late here (sitecustomize imports jax at interpreter
# start); jax.config is effective until backends initialize
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from swmhd_tpu import scenarios, diagnostics

SCEN = os.environ.get("SCENARIO", "128x128_two_Gaussians_low_B")
FORM = os.environ.get("FORM", "vector_invariant")
T = float(os.environ.get("T", "30"))

model, state, sc = scenarios.build(SCEN, FORM, dtype=jnp.float64)
h0 = state.h

@jax.jit
def report(st):
    return diagnostics.reference_energy_report(model, st, h0)

nchunk = 100
stepper = jax.jit(model.step_fn(sc.dt, nchunk))
r0 = {k: float(v) for k, v in report(state).items()}
E0 = r0["total_energy"]
print(f"{SCEN} {FORM} variant={VARIANT}  E0={E0:.6f} "
      f"(ME0={r0['magnetic_energy']:.5f} KE0={r0['kinetic_energy']:.5f})")
t = 0.0
nsteps = int(round(T / sc.dt / nchunk))
for i in range(nsteps):
    state = stepper(state)
    t += sc.dt * nchunk
    r = {k: float(v) for k, v in report(state).items()}
    print(f"t={t:5.1f} dev*100={100*(r['total_energy']-E0):+8.4f} "
          f"KE={r['kinetic_energy']:.5f} ME={r['magnetic_energy']:.5f}",
          flush=True)
