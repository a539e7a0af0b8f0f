"""Does the energy-functional convention change dev_max?

Ours interpolates staggered quantities to centers; Oceananigans
AbstractOperations evaluate index-aligned (B_x = -dyA/h lives at (c,f) and
is squared there). For grid-scale A structure the interpolated form
undercounts ME. Rerun 64^2 low_B_low_U measuring BOTH conventions on the
SAME trajectory.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")  # env var alone is not honored (sitecustomize)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from swmhd_tpu import scenarios, diagnostics
from swmhd_tpu import operators as op

model, state, sc = scenarios.build("64x64_low_B_low_U", "vector_invariant",
                                   dtype=jnp.float64)
g = model.grid
gam = model.A_background_gradient_y
h0 = state.h
gacc = model.gravitational_acceleration


def E_ours(st):
    return (diagnostics.kinetic_energy(st.u, st.v, st.h, g)
            + diagnostics.magnetic_energy(st.A, st.h, g, gam)
            + diagnostics.potential_energy(st.h, h0, gacc, g))


def E_ref(st):
    # index-aligned, Oceananigans-AbstractOperations style
    u, v, h, A = st.u, st.v, st.h, st.A
    ke = jnp.mean(0.5 * h * (u * u + v * v)) * g.Lx * g.Ly
    dyA = op.ddy_f(A, g) + gam          # (c,f)
    dxA = op.ddx_f(A, g)                # (f,c)
    me = jnp.mean(0.5 * (dyA * dyA + dxA * dxA) / h) * g.Lx * g.Ly
    pe = jnp.mean(0.5 * gacc * (h - h0) ** 2) * g.Lx * g.Ly
    return ke + me + pe


stepper = jax.jit(model.step_fn(sc.dt, 50))
e_o = [float(E_ours(state))]
e_r = [float(E_ref(state))]
for i in range(30):
    state = stepper(state)
    e_o.append(float(E_ours(state)))
    e_r.append(float(E_ref(state)))
dev_o = max(abs(e - e_o[0]) * 100 for e in e_o)
dev_r = max(abs(e - e_r[0]) * 100 for e in e_r)
print(f"dev_max ours-style={dev_o:.3f}  reference-style={dev_r:.3f}")
print(f"E_ref(0)={e_r[0]:.4f} E_ref(end)={e_r[-1]:.4f}")
print(f"E_ours(0)={e_o[0]:.4f} E_ours(end)={e_o[-1]:.4f}")
