"""Bisect the 64^2 low_B_low_U energy-deviation miss (VERDICT r2 item 1b).

Hypothesis: the background-split (state.A = perturbation) changes WENO's
*nonlinear smoothness weights* relative to the reference, which advects the
full field A = -0.05y + A'. Candidates are affine (split exact for them);
betas are not. Variant 'rampbeta' computes tracer y-betas on the full field
(shift offsets +gamma*n*dy) -- algebraically identical to full-field WENO
advection with gradient-BC ghosts.
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")  # env var alone is not honored (sitecustomize)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from swmhd_tpu import scenarios, diagnostics
from swmhd_tpu.models import shallow_water as sw
from swmhd_tpu import advection as adv
from swmhd_tpu import operators as op


def run(name, formulation, variant, stop=15.0, N=64):
    model, state, sc = scenarios.build(f"{N}x{N}_{name}", formulation,
                                       dtype=jnp.float64)
    gamma = model.A_background_gradient_y
    g = model.grid

    if variant == "rampbeta":
        # patch _tracer_tendency's y-flux: betas from full field
        orig = sw.ShallowWaterModel._tracer_tendency
        def patched(self, A, h, Uf, Vf, divU):
            ts = self.tracer_advection
            gr = self.grid
            fx = adv.upwind_biased_product(
                Uf, ts.left_x_f(A, gr), ts.right_x_f(A, gr))
            shy = lambda a, n: op.shift_y(a, n, gr)
            step = gamma * gr.dy
            shy_ramp = lambda a, n: op.shift_y(a, n, gr) + n * step
            # face-form reconstruction of A at y-faces
            pl = adv.weno_candidates_left(A, shy)
            pr = adv.weno_candidates_right(A, shy)
            bl = adv.weno_betas_left(A, shy_ramp)
            br = adv.weno_betas_right(A, shy_ramp)
            Al = adv._weno_combine(pl, bl)
            Ar = adv._weno_combine(pr, br)
            # near-wall degradation as in weno5_left_y_f
            Al = adv._degrade_weno_y_f(Al, A, gr, left=True)
            Ar = adv._degrade_weno_y_f(Ar, A, gr, left=False)
            fy = adv.upwind_biased_product(Vf, Al, Ar)
            div_flux = op.ddx_c_flux(fx, gr) + op.ddy_c_flux(fy, gr)
            GA = (A * divU - div_flux) / h
            if gamma:
                GA = GA - gamma * op.iy_c(Vf, gr) / h
            return GA
        sw.ShallowWaterModel._tracer_tendency = patched

    h0 = state.h
    dt = sc.dt
    nsteps = int(round(stop / dt))
    chunk = 100
    stepper = jax.jit(model.step_fn(dt, chunk))
    E0 = None
    dev_max = 0.0
    rows = []
    t0 = time.time()
    for i in range(nsteps // chunk):
        state = stepper(state)
        rep = diagnostics.energy_report(model, state, h0)
        E = float(rep["total_energy"])
        if E0 is None and i == 0:
            # E0 from the *initial* state; recompute
            pass
        rows.append((float(state.clock.time), float(rep["kinetic_energy"]),
                     float(rep["magnetic_energy"]),
                     float(rep["potential_energy"]), E))
    # E0 from initial state
    model2, st0, _ = scenarios.build(f"{N}x{N}_{name}", formulation,
                                     dtype=jnp.float64)
    rep0 = diagnostics.energy_report(model2, st0, st0.h)
    E0 = float(rep0["total_energy"])
    dev = [abs(r[4] - E0) * 100 for r in rows]
    if variant == "rampbeta":
        sw.ShallowWaterModel._tracer_tendency = orig
    print(f"{formulation} {name} N={N} variant={variant}: "
          f"dev_max={max(dev):.3f} KE_end={rows[-1][1]:.4f} "
          f"ME_end={rows[-1][2]:.4f} ({time.time()-t0:.0f}s)")
    return max(dev), rows


if __name__ == "__main__":
    variants = sys.argv[1:] or ["base", "rampbeta"]
    for v in variants:
        run("low_B_low_U", "vector_invariant", v)
