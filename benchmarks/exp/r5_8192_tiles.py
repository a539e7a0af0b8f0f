"""r5: tile-size sweep for the 8192^2 windowed-kernel rung.

The bench ladder shows 9.06e8 pts/s at 8192^2 vs 1.04e9 at 2048^2 (the
auto tile picks Tx=32 at every size). At Ny=8192 a (Tx+16)-row window is
1.5 MB/field — VMEM pressure and the 16-row halo recompute fraction
(16/(Tx+16)) move against each other with Tx, so sweep it.

Usage (TPU): python benchmarks/exp/r5_8192_tiles.py [N] [tiles...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
import jax
import jax.numpy as jnp

REPO = os.path.join(os.path.dirname(__file__), '..', '..')
cache = os.path.join(REPO, ".jax_tpu_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from swmhd_tpu import (Grid, ShallowWaterModel, FPlane,
                           jacobian_lorentz_forcing)
    from swmhd_tpu.ops.fused_step import fused_step_fn
    from swmhd_tpu.profiling import benchmark_step

    args = [a for a in sys.argv[1:]]
    N = int(args[0]) if args else 8192
    tiles = [int(t) for t in args[1:]] or [16, 32, 64]

    g = Grid.regular(N, N, (-5, 5), (-5, 5), dtype=jnp.float32)
    model = ShallowWaterModel(grid=g, coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -x * jnp.exp(-(x**2 + y**2)),
        h=1.0, A=lambda x, y: 0.1 * jnp.exp(-(x**2 + y**2)))

    steps = 5
    for T in tiles:
        t0 = time.time()
        try:
            fn = jax.jit(fused_step_fn(model, 1e-3, steps, tile_x=T))
            b = benchmark_step(fn, state, steps, n_calls=3)
            print(f"N={N} Tx={T:3d}: {b.points_per_s:.3e} pts/s "
                  f"(compile+bench {time.time()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"N={N} Tx={T:3d}: FAIL {type(e).__name__} "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
