"""Term-by-term discrete energy budget, generalized to any vector-invariant
scenario (env SCENARIO, default 128x128_two_Gaussians_low_B).

P_term = < dE/d(state), G_term >  via jax.grad of the energy functional;
sum(P_term * dt) over the run attributes total-energy drift to individual
tendency terms. Used for the r3 investigation of the 128^2 two_Gaussians
low_B early-time energy GAIN (validation/series shows our total energy
growing ~linearly from t=0 while the reference plot is flat until t~28).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

from swmhd_tpu import scenarios, diagnostics
from swmhd_tpu import operators as op
from swmhd_tpu.advection import upwind_biased_product
from swmhd_tpu.physics.lorentz import lorentz_force_jacobian

SCEN = os.environ.get("SCENARIO", "128x128_two_Gaussians_low_B")
NCHUNK = int(os.environ.get("NCHUNK", "30"))
STEPS = int(os.environ.get("STEPS", "50"))

model, state, sc = scenarios.build(SCEN, "vector_invariant",
                                   dtype=jnp.float64)
g = model.grid
gamma_bg = model.A_background_gradient_y
h0 = state.h
gacc = model.gravitational_acceleration


def energy(u, v, h, A):
    return (diagnostics.kinetic_energy(u, v, h, g)
            + diagnostics.magnetic_energy(A, h, g, gamma_bg)
            + diagnostics.potential_energy(h, h0, gacc, g))


def terms(st):
    u, v, h, A = st.u, st.v, st.h, st.A
    Z = jnp.zeros_like(h)
    ms = model.mass_advection
    with op.pad_roll_scope():
        Uf = upwind_biased_product(u, ms.left_x_f(h, g), ms.right_x_f(h, g))
        Vf = upwind_biased_product(v, ms.left_y_f(h, g), ms.right_y_f(h, g))
        divU = op.ddx_c_flux(Uf, g) + op.ddy_c_flux(Vf, g)
        zeta = op.vorticity_ff(u, v, g)
        vort_u, vort_v = model._vorticity_flux(u, v, zeta, g)
        K = op.kinetic_energy_cc(u, v, g)
        grav_u = -op.ddx_f(K + gacc * h, g)
        grav_v = -op.ddy_f(K + gacc * h, g)
        cor_u = model.coriolis.tendency_u(v, g)
        cor_v = model.coriolis.tendency_v(u, g)
        ts = model.tracer_advection
        fx = upwind_biased_product(Uf, ts.left_x_f(A, g), ts.right_x_f(A, g))
        fy = upwind_biased_product(Vf, ts.left_y_f(A, g), ts.right_y_f(A, g))
        div_flux = op.ddx_c_flux(fx, g) + op.ddy_c_flux(fy, g)
        GA_adv = (A * divU - div_flux) / h
        GA_bg = -gamma_bg * op.iy_c(Vf, g) / h
        fu, fv = lorentz_force_jacobian(A, h, g, gamma_bg)
        def mw(a, b):
            return model._mask_walls(a, b)
        vort_u, vort_v = mw(vort_u, vort_v)
        grav_u, grav_v = mw(grav_u, grav_v)
        cor_u, cor_v = mw(cor_u, cor_v)
        fu, fv = mw(fu, fv)
    return {
        "vorticity_flux": (vort_u, vort_v, Z, Z),
        "ke_grad+gravity+mass": (grav_u, grav_v, -divU, Z),
        "coriolis": (cor_u, cor_v, Z, Z),
        "lorentz": (fu, fv, Z, Z),
        "tracer_advection": (Z, Z, Z, GA_adv),
        "tracer_background": (Z, Z, Z, GA_bg),
    }


dEdu = jax.grad(energy, argnums=(0, 1, 2, 3))


@jax.jit
def budget(st):
    gu, gv, gh, ga = dEdu(st.u, st.v, st.h, st.A)
    out = {}
    for name, (Gu, Gv, Gh, GA) in terms(st).items():
        out[name] = (jnp.vdot(gu, Gu) + jnp.vdot(gv, Gv)
                     + jnp.vdot(gh, Gh) + jnp.vdot(ga, GA))
    return out


stepper = jax.jit(model.step_fn(sc.dt, STEPS))
acc = {}
E_start = float(energy(state.u, state.v, state.h, state.A))
print(f"{SCEN}: {NCHUNK} chunks x {STEPS} steps, dt={sc.dt}")
print(" t     P_lorentz    P_induct     L+I mismatch  P_vort       P_grav+mass")
for i in range(NCHUNK):
    b = {k: float(v) for k, v in budget(state).items()}
    for k, val in b.items():
        acc[k] = acc.get(k, 0.0) + val * sc.dt * STEPS
    pL = b["lorentz"]
    pI = b["tracer_advection"] + b["tracer_background"]
    print(f"{i*sc.dt*STEPS:5.1f} {pL:+.3e} {pI:+.3e} {pL+pI:+.3e} "
          f"{b['vorticity_flux']:+.3e} {b['ke_grad+gravity+mass']:+.3e}")
    state = stepper(state)
E_end = float(energy(state.u, state.v, state.h, state.A))
print(f"E: {E_start:.6f} -> {E_end:.6f}  dE={E_end-E_start:+.2e} "
      f"(dev*100={abs(E_end-E_start)*100:.3f})")
tot = 0.0
for k, val in sorted(acc.items(), key=lambda kv: kv[1]):
    print(f"  {k:24s} integral {val:+.3e}")
    tot += val
print(f"  {'SUM (fwd-Euler approx)':24s} integral {tot:+.3e}")
