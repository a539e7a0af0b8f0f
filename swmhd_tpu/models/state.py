"""State pytree for the shallow-water MHD model.

The analog of Oceananigans' `model.solution` + `model.tracers` + `model.clock`
(reference: jacobian_formulation/SWMHD_example.jl:50-57,67-69), designed as a
flat pytree of `jnp` arrays so it jits, shards, vmaps, and checkpoints
directly.

Field meaning depends on the model formulation:
  vector-invariant: ``u``/``v`` are velocities (reference prognostics u, v, h;
      SWMHD_example.jl:32,67)
  conservative:     ``u``/``v`` hold the transports uh, vh (reference
      prognostics uh, vh, h; divergence_sw_mhd.jl:30,63)
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["time", "iteration"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class Clock:
    time: jnp.ndarray
    iteration: jnp.ndarray

    @staticmethod
    def zero(dtype=jnp.float32) -> "Clock":
        return Clock(time=jnp.zeros((), dtype=dtype),
                     iteration=jnp.zeros((), dtype=jnp.int32))

    def tick(self, dt) -> "Clock":
        return Clock(time=self.time + dt, iteration=self.iteration + 1)


@partial(jax.tree_util.register_dataclass,
         data_fields=["h", "u", "v", "A", "clock"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class State:
    h: jnp.ndarray   # layer thickness at (c,c)
    u: jnp.ndarray   # u or uh at (f,c)
    v: jnp.ndarray   # v or vh at (c,f)
    A: jnp.ndarray   # magnetic potential tracer at (c,c)
    clock: Clock

    def replace(self, **kw) -> "State":
        return dataclasses.replace(self, **kw)

    @property
    def shape(self):
        return self.h.shape
