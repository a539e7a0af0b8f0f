"""Headline benchmark: grid-points/s/chip for the SWMHD RK3 step.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

The reference publishes no wall-time numbers (BASELINE.md), so the honest
baseline is the hardware roofline. BASELINE.json's stencil target is
">= 80% of HBM bandwidth-of-light", but the fully-fused WENO5 SWMHD step
is COMPUTE-bound, not bandwidth-bound: it does ~3 kflop per point per
step against a 96 B/pt minimum traffic (arithmetic intensity ~30 flop/B,
far above the v5e's ~4.3 flop/B machine balance; derivation in
PERFORMANCE.md §roofline). The binding roofline is min(VPU-limit,
HBM-limit) points/s and ``vs_baseline`` is
achieved / (0.80 * binding_roofline) — 1.0 means the 80%-of-roofline
target is met. Both raw fractions are emitted, plus the round-1
comparability ratio achieved/1e7 (an order-of-magnitude estimate of a
reference-class single-CPU throughput, PERFORMANCE.md) as
``vs_reference_cpu_estimate``.

``flops_per_point`` is MEASURED at run time from XLA's cost analysis of
this build's own unfused step graph at 512² (flops/pt is size-independent
for periodic topology), so discretisation changes re-derive the roofline
denominator instead of inheriting a stale constant. Provenance caveat:
XLA counts the operations the current graph performs — redundant flops in
the discretisation inflate the apparent roofline fraction; the measured
value and the graph it came from are recorded alongside the metric.

Environment knobs:
  SWMHD_BENCH_N      grid size (default 2048)
  SWMHD_BENCH_FUSED  "0" -> force the unfused XLA path ("1" default on
                     TPU: the fused Pallas substage kernels, persistently
                     cached after first compile)
  SWMHD_BENCH_LADDER comma-separated extra sizes to bench and report in
                     a "ladder" field (e.g. "512,4096")
"""

import json
import os
import time

import jax
import jax.numpy as jnp

TARGET_FRACTION = 0.80  # of the binding roofline (BASELINE.json target)

# Round-1 comparability constant: order-of-magnitude single-CPU
# throughput of a reference-class (Oceananigans CPU) run, PERFORMANCE.md.
REFERENCE_CPU_POINTS_PER_S = 1e7

# Minimum HBM traffic: 3 substages x (read+write 4 prognostics) x 4 B.
BYTES_PER_POINT = 96.0

# Hand-derived scheme-minimal flop/pt of one RK3 step (f32 WENO-Z
# vector-invariant + jacobian Lorentz; derivation table in PERFORMANCE.md
# §"Analytic flop floor"). The roofline denominator is
# min(measured, analytic) — the more demanding of the two (VERDICT r3
# item 10 / advisor r2).
ANALYTIC_FLOPS_PER_POINT = 3274.0


def build(N=2048, dtype=jnp.float32):
    from swmhd_tpu import (
        Grid, ShallowWaterModel, FPlane, VECTOR_INVARIANT,
        jacobian_lorentz_forcing)

    grid = Grid.regular(N, N, (-5.0, 5.0), (-5.0, 5.0), dtype=dtype)
    model = ShallowWaterModel(
        grid=grid, formulation=VECTOR_INVARIANT,
        gravitational_acceleration=9.81, coriolis=FPlane(1.0),
        forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=1.0,
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    return model, state


def measure_flops_per_point(probe_N=512):
    """flops/point of ONE RK3 step, from XLA's cost analysis of the
    current unfused step graph (the same discretisation the fused kernel
    executes). Returns None if cost analysis is unavailable."""
    try:
        model, state = build(probe_N)
        lowered = jax.jit(model.step_fn(0.001, 1)).lower(state)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0]
        flops = float(cost["flops"])
        return flops / (probe_N * probe_N)
    except Exception:
        return None


def bench_one(N, use_fused, steps_per_call=None, n_calls=5):
    from swmhd_tpu.profiling import benchmark_step
    model, state = build(N)
    if steps_per_call is None:
        # Scale work per timed repetition to ~2e9 grid-point-steps
        # (~2 s at the ~1e9 pts/s device rate) so the axon relay's fixed
        # per-sync tail (~25 ms measured r4) biases the rate < ~2%. At
        # the r3 protocol (50 steps/rep) the tail understated 2048^2 by
        # ~11% and the 512^2 resident rung by ~3x (PERFORMANCE.md r4).
        target_pt_steps = 2e9
        steps_per_call = max(10, int(target_pt_steps / (N * N * n_calls)))
    if use_fused:
        from swmhd_tpu.ops.fused_step import (
            fused_step_fn, resident_step_fn, resident_vmem_bytes,
            _vmem_limit_bytes)
        # small grids: the whole-state-resident multi-step kernel (one
        # launch per call instead of 3 per step — the windowed kernel is
        # launch-bound below ~1024^2; VERDICT r3 item 4)
        limit = _vmem_limit_bytes() or 16 * 2 ** 20
        if resident_vmem_bytes(model) <= 0.85 * limit:
            step = jax.jit(resident_step_fn(model, 0.001, steps_per_call))
            path = "resident-pallas"
        else:
            step = jax.jit(fused_step_fn(model, 0.001, steps_per_call))
            path = "fused-pallas"
    else:
        step = jax.jit(model.step_fn(0.001, steps_per_call))
        path = "xla"
    b = benchmark_step(step, state, steps_per_call, n_calls=n_calls)
    return b, path


def main():
    from swmhd_tpu.profiling import detect_hbm_peak, detect_vpu_peak
    from swmhd_tpu.ops.fused_step import pallas_available

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_tpu_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = int(os.environ.get("SWMHD_BENCH_N", "2048"))
    default_fused = "1" if pallas_available() else "0"
    use_fused = os.environ.get("SWMHD_BENCH_FUSED", default_fused) == "1"

    bench, path = bench_one(N, use_fused)
    flops_measured = measure_flops_per_point()
    # the more demanding (smaller) denominator governs the roofline
    flops_pt = (min(flops_measured, ANALYTIC_FLOPS_PER_POINT)
                if flops_measured is not None
                else ANALYTIC_FLOPS_PER_POINT)

    hbm_peak, vpu_peak = detect_hbm_peak(), detect_vpu_peak()
    have_roofline = (hbm_peak is not None and vpu_peak is not None
                     and flops_pt is not None)
    if have_roofline:
        hbm_limit = hbm_peak * 1e9 / BYTES_PER_POINT       # pts/s
        vpu_limit = vpu_peak * 1e9 / flops_pt              # pts/s
        binding = "VPU compute" if vpu_limit < hbm_limit else "HBM bandwidth"
        roofline = min(hbm_limit, vpu_limit)
        metric = (f"grid-points/s/chip (SWMHD RK3 step, {N}^2 f32, WENO5-Z "
                  f"vector-invariant + jacobian Lorentz, {path} path; "
                  f"vs_baseline = achieved / (0.80 x binding roofline = "
                  f"{binding} limit at min(measured, analytic) = "
                  f"{flops_pt:.0f} flop/pt, AI "
                  f"{flops_pt / BYTES_PER_POINT:.1f} flop/B))")
    else:
        metric = (f"grid-points/s/chip (SWMHD RK3 step, {N}^2 f32, WENO5-Z "
                  f"vector-invariant + jacobian Lorentz, {path} path; "
                  f"no TPU roofline detectable on this backend — "
                  f"vs_baseline is null)")

    out = {
        "metric": metric,
        "value": round(bench.points_per_s, 1),
        "unit": "points/s",
    }
    if have_roofline:
        out["vs_baseline"] = round(
            bench.points_per_s / (TARGET_FRACTION * roofline), 4)
        out["fraction_of_roofline"] = round(bench.points_per_s / roofline, 4)
        out["binding_limit"] = binding
        out["hbm_fraction_of_light"] = round(
            bench.points_per_s / hbm_limit, 4)
        out["vpu_fraction_of_peak"] = round(
            bench.points_per_s / vpu_limit, 4)
        out["hbm_gbps_at_min_traffic"] = round(
            bench.points_per_s * BYTES_PER_POINT / 1e9, 1)
        if flops_measured is not None:
            out["flops_per_point_measured"] = round(flops_measured, 1)
        out["flops_per_point_analytic"] = ANALYTIC_FLOPS_PER_POINT
    else:  # non-TPU backend: no roofline to compare against
        out["vs_baseline"] = None
    out["vs_reference_cpu_estimate"] = round(
        bench.points_per_s / REFERENCE_CPU_POINTS_PER_S, 2)

    if bench.rel_spread is not None:
        out["rel_spread"] = round(bench.rel_spread, 4)

    # BASELINE config ladder (VERDICT r2 item 10): bench >=3 sizes by
    # default on TPU (512^2 and 4096^2 single-chip alongside the 2048^2
    # headline). SWMHD_BENCH_LADDER overrides; "" disables.
    # 128 joined in r5 when the resident kernel's lane gate relaxed —
    # the smallest recorded-scenario size now rides the fast path too
    default_ladder = "128,512,4096,8192" if have_roofline else ""
    ladder = os.environ.get("SWMHD_BENCH_LADDER", default_ladder)
    if ladder:
        out["ladder"] = {}
        for sz in ladder.split(","):
            sz = int(sz)
            b2, _ = bench_one(sz, use_fused)
            out["ladder"][str(sz)] = round(b2.points_per_s, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
