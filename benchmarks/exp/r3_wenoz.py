"""Test: reference's Oceananigans vintage uses WENO-Z weights (zweno default
true in the VelocityStencil era). Run 64^2 low_B_low_U with Z-weights in
_weno_combine (tau5=|b0-b2|, alpha=gamma*(1+(tau5/(beta+eps))^2)) and
measure dev with BOTH functional styles + trajectory anchors.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")  # env var alone is not honored (sitecustomize)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import swmhd_tpu.advection as adv

_G = adv._GAMMA
EPS = 1e-6

def zweno_combine(ps, betas, betas_external=None):
    b = betas_external if betas_external is not None else betas
    tau = jnp.abs(b[0] - b[2])
    a0 = _G[0] * (1.0 + (tau / (b[0] + EPS)) ** 2)
    a1 = _G[1] * (1.0 + (tau / (b[1] + EPS)) ** 2)
    a2 = _G[2] * (1.0 + (tau / (b[2] + EPS)) ** 2)
    return (a0 * ps[0] + a1 * ps[1] + a2 * ps[2]) / (a0 + a1 + a2)

adv._weno_combine = zweno_combine
# shallow_water imported it by name; patch there too
import swmhd_tpu.models.shallow_water as swm
swm._weno_combine = zweno_combine

from swmhd_tpu import scenarios, diagnostics
from swmhd_tpu import operators as op

model, state, sc = scenarios.build("64x64_low_B_low_U", "vector_invariant",
                                   dtype=jnp.float64)
g = model.grid
gam = model.A_background_gradient_y
h0 = state.h
gacc = model.gravitational_acceleration

def E_ours(st):
    ke = diagnostics.kinetic_energy(st.u, st.v, st.h, g)
    me = diagnostics.magnetic_energy(st.A, st.h, g, gam)
    pe = diagnostics.potential_energy(st.h, h0, gacc, g)
    return ke, me, pe

def E_ref(st):
    u, v, h, A = st.u, st.v, st.h, st.A
    ke = jnp.mean(0.5 * h * (u * u + v * v)) * g.Lx * g.Ly
    dyA = op.ddy_f(A, g) + gam
    dxA = op.ddx_f(A, g)
    me = jnp.mean(0.5 * (dyA * dyA + dxA * dxA) / h) * g.Lx * g.Ly
    pe = jnp.mean(0.5 * gacc * (h - h0) ** 2) * g.Lx * g.Ly
    return ke, me, pe

stepper = jax.jit(model.step_fn(sc.dt, 50))
eo0 = [float(x) for x in E_ours(state)]
er0 = [float(x) for x in E_ref(state)]
devs_o, devs_r = [], []
print(" t    E_ours_dev  E_ref_dev   KE_ref   ME_ref")
for i in range(30):
    state = stepper(state)
    eo = [float(x) for x in E_ours(state)]
    er = [float(x) for x in E_ref(state)]
    devs_o.append((sum(eo) - sum(eo0)) * 100)
    devs_r.append((sum(er) - sum(er0)) * 100)
    t = (i + 1) * 0.5
    if (i + 1) % 4 == 0 or i == 29:
        print(f"{t:5.1f} {devs_o[-1]:+9.3f} {devs_r[-1]:+9.3f} "
              f"{er[0]:.4f} {er[1]:.4f}")
print(f"dev_max ours-style={max(abs(d) for d in devs_o):.3f} "
      f"ref-style={max(abs(d) for d in devs_r):.3f}")
print(f"KE_end={er[0]:.4f} (ref 0.18) ME_end={er[1]:.4f} (ref 0.313)")
