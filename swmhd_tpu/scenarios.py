"""Named scenario registry.

Reproduces the 6 recorded reference scenarios — {64², 128²} ×
{two_Gaussians_low_B, two_Gaussians_high_B, low_B_low_U} — whose movies and
energy plots are the de-facto correctness baseline
(reference: simulation_runs/ and energy_plots/, SURVEY §2.1 C9), available in
both formulations, plus the two driver scripts' canonical configurations.

The reference scripts do not record these scenarios' ICs (only the two
driver configurations survive in code), so the ICs here are *pinned
quantitatively against the recorded artifacts* — see VALIDATION.md:

  - initial magnetic energy read off energy_plots/*.png matches the
    two-Gaussian dipole (divergence_sw_mhd.jl:33) at amplitude 0.1
    (low_B: ME₀ ≈ 0.0217 at 128²) and 0.5 (high_B: ME₀ ≈ 0.543);
  - initial kinetic energy is ZERO for both two_Gaussians scenarios
    (rest start) and 0.3927 for low_B_low_U — exactly the SWMHD_example
    vortex at U = 1;
  - the t=0.1 movie frames (simulation_runs/*.mp4) show low_B_low_U's
    magnetic potential as a *linear* ramp A = −0.05·y (uniform field;
    ME₀ = ½·(0.05)²·Lx·Ly = 0.125), matching the commented-out
    ``Aᵢ = -0.05*y`` (divergence_sw_mhd.jl:34) and implying a Bounded y
    topology with the commented-out −0.05 gradient BCs
    (SWMHD_example.jl:19) — a periodic wrap of the ramp would read
    ME₀ ≈ 3.9, not the recorded 0.125;
  - stop times = (movie frame count) × 0.1 (TimeInterval(0.1) output,
    SWMHD_example.jl:82): low_B → 70 (64² jac) / 60, high_B → 35,
    low_B_low_U → 15.

A scenario is pure data: grid size, physics params, ICs, Δt, stop time. Use
:func:`build` to get (model, state) for either formulation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp

from .grid import Grid
from .models.shallow_water import (
    ShallowWaterModel, VECTOR_INVARIANT, CONSERVATIVE)
from .physics.coriolis import FPlane
from .forcing import jacobian_lorentz_forcing, divergence_lorentz_forcing


@dataclasses.dataclass(frozen=True)
class Scenario:
    name: str
    N: int
    L: float = 10.0
    g: float = 9.81
    f: float = 1.0
    dt: float = 0.01
    stop_time: float = 30.0
    A0: Optional[Callable] = None
    u0: Optional[Callable] = None
    v0: Optional[Callable] = None
    h0: float = 1.0
    topology: tuple = ("periodic", "periodic")
    # static linear background γ·y for A (state.A holds the perturbation;
    # see ShallowWaterModel.A_background_gradient_y)
    A_bg_grad_y: float = 0.0
    description: str = ""


def _two_gaussians(amplitude):
    """A dipole of the divergence driver (divergence_sw_mhd.jl:33)."""
    def A0(x, y):
        return (amplitude * jnp.exp(-((x - 0.5) ** 2 + y ** 2))
                - amplitude * jnp.exp(-((x + 0.5) ** 2 + y ** 2)))
    return A0


def _vortex(U=5.0):
    """Velocity IC of the jacobian driver (SWMHD_example.jl:39-40)."""
    u0 = lambda x, y: U * y * jnp.exp(-(x ** 2 + y ** 2))
    v0 = lambda x, y: -U * x * jnp.exp(-(x ** 2 + y ** 2))
    return u0, v0


def _abs_y_A(slope=0.5):
    """A = 0.5|y| of the jacobian driver (SWMHD_example.jl:36)."""
    return lambda x, y: slope * jnp.abs(y)


_REGISTRY: Dict[str, Scenario] = {}


def register(s: Scenario):
    _REGISTRY[s.name] = s
    return s


for N in (64, 128):
    # Δt = 0.01 is the only recorded step size (SWMHD_example.jl:42); the
    # gravity-wave CFL at 128² is ~0.8 — stable for RK3, and matching the
    # reference's Δt keeps the energy-deviation envelopes comparable.
    dt = 0.01
    register(Scenario(
        name=f"{N}x{N}_two_Gaussians_low_B", N=N, dt=dt,
        A0=_two_gaussians(0.1), stop_time=70.0 if N == 64 else 60.0,
        description="rest start + weak Gaussian-dipole magnetic potential"))
    register(Scenario(
        name=f"{N}x{N}_two_Gaussians_high_B", N=N, dt=dt,
        A0=_two_gaussians(0.5), stop_time=35.0,
        description="rest start + strong Gaussian-dipole magnetic potential"))
    u0s, v0s = _vortex(1.0)
    register(Scenario(
        name=f"{N}x{N}_low_B_low_U", N=N, dt=dt,
        u0=u0s, v0=v0s, stop_time=15.0,
        topology=("periodic", "bounded"), A_bg_grad_y=-0.05,
        description="weak vortex + uniform field B = (0.05, 0), walls in y; "
                    "A = -0.05y carried as a static background so its wall "
                    "gradient BC (SWMHD_example.jl:19) is exact"))

# the two driver scripts verbatim
register(Scenario(
    name="adjustment_jacobian", N=64, A0=_abs_y_A(0.5),
    u0=_vortex(5.0)[0], v0=_vortex(5.0)[1], stop_time=30.0,
    description="SWMHD_example.jl canonical run (A = 0.5|y|)"))
register(Scenario(
    name="adjustment_divergence", N=64, A0=_two_gaussians(0.5),
    stop_time=45.0,
    description="divergence_sw_mhd.jl canonical run (dipole A, rest start)"))


def names():
    return sorted(_REGISTRY)


def get(name: str) -> Scenario:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown scenario {name!r}; available: {', '.join(names())}"
        ) from None


def build(name: str, formulation: str = VECTOR_INVARIANT,
          dtype=jnp.float32, **model_kwargs):
    """(model, state) for a named scenario in the requested formulation."""
    sc = get(name)
    grid = Grid.regular(sc.N, sc.N, (-sc.L / 2, sc.L / 2),
                        (-sc.L / 2, sc.L / 2), topology=sc.topology,
                        dtype=dtype)
    if formulation == VECTOR_INVARIANT:
        forcing = jacobian_lorentz_forcing(sc.A_bg_grad_y)
    else:
        forcing = divergence_lorentz_forcing(sc.A_bg_grad_y)
    model = ShallowWaterModel(
        grid=grid, formulation=formulation,
        gravitational_acceleration=sc.g, coriolis=FPlane(f=sc.f),
        forcing=forcing, A_background_gradient_y=sc.A_bg_grad_y,
        **model_kwargs)
    # conservative starts from rest unless the scenario gives velocities
    # (uh = u·h with h0 uniform)
    u0 = sc.u0
    v0 = sc.v0
    if formulation == CONSERVATIVE and u0 is not None:
        h0 = sc.h0
        u0 = (lambda f0: (lambda x, y: f0(x, y) * h0))(sc.u0)
        v0 = (lambda f0: (lambda x, y: f0(x, y) * h0))(sc.v0)
    state = model.initial_state(u=u0, v=v0, h=sc.h0, A=sc.A0)
    return model, state, sc
