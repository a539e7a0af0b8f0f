"""r5: quantify the per-step shard_map re-entry cost of sharded
diagnostics (VERDICT r4 item 8 / weak #2).

`DomainDecomposition.step_fn` / `fused_step_fn` with `diagnostics=...`
scan one shard_map per step (diagnostics evaluate on the sharded GLOBAL
state between steps, XLA inserting the reduction collectives), while the
no-diagnostics path keeps the whole scan inside one shard_map. This
measures what the reference's every-iteration energy series
(SWMHD_example.jl:87-92) costs on a sharded run:

  - 8-virtual-CPU-device (2,4) mesh, and
  - the real TPU chip on a (1,1) mesh (SWMHD_TEST_TPU=1)

comparing per-step wall time of {no diag, diag} x {sharded, single-dev}.
The single-device column isolates the cost of computing the energies at
all; the sharded-over-single ratio isolates the shard_map re-entry.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
USE_TPU = os.environ.get("SWMHD_TEST_TPU", "0") == "1"
if not USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
import jax
if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from swmhd_tpu import diagnostics
from swmhd_tpu.parallel import DomainDecomposition, make_mesh


def bench(fn, state, reps=3):
    out = fn(state)
    s = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(s.h))  # relay-safe sync
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(state)
        s = out[0] if isinstance(out, tuple) else out
        float(jnp.sum(s.h))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n_dev = len(jax.devices())
    mesh_shape = (2, 4) if n_dev >= 8 else (1, 1)
    N = 256
    n_steps = 32
    dtype = jnp.float32 if USE_TPU else jnp.float64
    from swmhd_tpu import Grid, ShallowWaterModel, FPlane
    from swmhd_tpu import jacobian_lorentz_forcing
    g = Grid.regular(N, N, (-5, 5), (-5, 5), dtype=dtype)
    model = ShallowWaterModel(grid=g, coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -x * jnp.exp(-(x**2 + y**2)),
        h=1.0,
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2)))
    h0 = state.h
    dt = 0.002

    def diag(st):
        return diagnostics.energy_report(model, st, h0)

    rows = {}
    sd_plain = jax.jit(model.step_fn(dt, n_steps))
    sd_diag = jax.jit(model.step_fn(dt, n_steps, diagnostics=diag))
    rows["single_plain"] = bench(sd_plain, state)
    rows["single_diag"] = bench(sd_diag, state)

    mesh = make_mesh(shape=mesh_shape)
    dd = DomainDecomposition(model, mesh, halo=8)
    sh = dd.shard_state(state)
    rows["sharded_plain"] = bench(dd.step_fn(dt, n_steps), sh)
    rows["sharded_diag"] = bench(dd.step_fn(dt, n_steps, diagnostics=diag),
                                 sh)
    # a compute-free diagnostic isolates the pure per-step shard_map
    # re-entry cost from the energy computation itself
    rows["sharded_trivial"] = bench(
        dd.step_fn(dt, n_steps, diagnostics=lambda s: {"t": s.clock.time}),
        sh)

    print(f"backend={jax.default_backend()} mesh={mesh_shape} N={N} "
          f"steps={n_steps} dtype={np.dtype(dtype).name}")
    for k, v in rows.items():
        print(f"  {k:14s} {v*1e3/n_steps:8.2f} ms/step")
    for tag in ("single", "sharded"):
        over = rows[f"{tag}_diag"] / rows[f"{tag}_plain"] - 1
        print(f"  {tag}: diagnostics overhead {100*over:+.1f}%")
    reentry = rows["sharded_trivial"] / rows["sharded_plain"] - 1
    print(f"  sharded: pure re-entry overhead (trivial diag) "
          f"{100*reentry:+.1f}%")


if __name__ == "__main__":
    main()
