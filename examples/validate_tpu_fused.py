"""Real-TPU f32 validation of the PRODUCTION execution path (r5,
VERDICT r4 item 1: all 12 combos, through the EXACT stepper the CLI
ships).

Every committed correctness artifact through r3 came from the f64 CPU XLA
path, while production ships f32 on TPU through ``cli.py --fused``'s
path selection. r4 validated 6 of the 12 recorded scenario combos but
pinned the 128² rows to the *windowed* kernel while the CLI had moved to
the *resident* kernel at that size. This driver therefore:

  - selects the stepper by calling ``swmhd_tpu.cli.select_stepper``
    itself — the single source of truth — so each row's recorded
    ``path`` is the path a production run actually takes (since the
    r5 lane-alignment relaxation: the resident Pallas kernel at
    BOTH 64² and 128²);
  - runs ALL 12 scenario × formulation combos
    ({64²,128²} × {two_Gaussians_low_B, two_Gaussians_high_B,
    low_B_low_U} × {vector_invariant, conservative});
  - matches production dtype settings exactly (f32, x64 off — the CLI
    enables x64 only for --dtype float64; the f32 clock is drift-free
    by in-scan reconstruction, see models.state.time_dtype);
  - records the same every-iteration energy series (in-graph, reference
    functional convention) and checks the SAME anchors as the f64 CPU
    gate (examples/validation_anchors.py, transcribed from
    /root/reference/energy_plots/*.png).

The companion on-chip kernel-equality pin is
tests/test_fused.py::test_resident_windowed_xla_agree_at_128_on_tpu
(resident == windowed == XLA over 10 compiled steps at 128², both
shipped topologies), run with SWMHD_TEST_TPU=1.

f32 tolerance rationale: the anchors compare O(0.01..1)-scale energies
and a deviation envelope gated at 3x the recorded peak. The f32
trajectory differs from f64 at the WENO-weight roundoff level
(tests/test_advection.py::TestF32Weights pins the weights to ~1e-4 of
f64 in the decisive beta regime since the r4 eps fix), which accumulates
far below the 30% end-state / 3x-envelope gates.

Usage (on the TPU host):
    python examples/validate_tpu_fused.py [--only SUBSTR] [--merge]
Writes validation/tpu_r05/results.json + TPU_VALIDATION_r05.md.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from validation_anchors import REFERENCE, TOL, summarize, judge

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUTDIR = os.path.join(REPO, "validation", "tpu_r05")

CASES = [(f, f"{N}x{N}_{tag}")
         for N in (64, 128)
         for tag in ("two_Gaussians_low_B", "two_Gaussians_high_B",
                     "low_B_low_U")
         for f in ("vector_invariant", "conservative")]


def run_case(formulation, name, stop_time):
    from swmhd_tpu import scenarios, diagnostics, cli
    from swmhd_tpu.simulation import (Simulation, IterationInterval,
                                      Callback, progress_callback)
    from swmhd_tpu.io import ScalarSeriesWriter

    model, state, sc = scenarios.build(name, formulation,
                                       dtype=jnp.float32)
    h0 = state.h
    tag = f"{formulation}_{name}"
    csv = os.path.join(OUTDIR, "series", f"{tag}.csv")
    os.makedirs(os.path.dirname(csv), exist_ok=True)

    # THE production path selection (cli.select_stepper probes
    # compile-and-fall-back exactly as `--fused` does)
    stepper, state, path = cli.select_stepper(model, state, sc.dt)
    path = f"{path}-f32"

    sim = Simulation(model, dt=sc.dt, stop_time=stop_time,
                     stepper=stepper)
    sim.callbacks["progress"] = Callback(progress_callback(),
                                         IterationInterval(2000))

    def energies(model_, st):
        return diagnostics.reference_energy_report(model_, st, h0)

    sim.output_writers["energies"] = ScalarSeriesWriter(
        fn=energies, schedule=IterationInterval(1), path=csv)
    sim.run(state)
    return csv, path, sim.run_wall_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--merge", action="store_true",
                    help="just merge per-case JSONs into the report")
    args = ap.parse_args()

    # production parity: x64 OFF for f32 runs (the CLI enables x64 only
    # for --dtype float64 — Pallas kernels fail to trace under x64 on
    # this TPU stack, see cli.py; the f32 clock is drift-free by
    # reconstruction instead), persistent compile cache
    cache = os.path.join(REPO, ".jax_tpu_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    os.makedirs(OUTDIR, exist_ok=True)
    if not args.merge:
        for formulation, name in CASES:
            tag = f"{formulation}_{name}"
            if args.only and args.only not in tag:
                continue
            res_path = os.path.join(OUTDIR, f"{tag}.json")
            ref = REFERENCE[(formulation, name)]
            print(f"== {tag} (stop {ref['stop']})", flush=True)
            t0 = time.time()
            csv, path, wall = run_case(formulation, name, ref["stop"])
            got = summarize(csv)
            checks = judge(ref, got)
            result = {
                "formulation": formulation, "scenario": name,
                "path": path, "wall_s": round(wall, 1),
                "dtype": "float32",
                "backend": jax.default_backend(),
                "device": str(jax.devices()[0].device_kind),
                "reference": ref, "ours": got, "checks": checks,
                "pass": all(checks.values()),
            }
            with open(res_path, "w") as f:
                json.dump(result, f, indent=1)
            print(f"   {'PASS' if result['pass'] else 'FAIL'} "
                  f"({path}, {time.time() - t0:.0f}s)", flush=True)

    # merge
    results = []
    for formulation, name in CASES:
        p = os.path.join(OUTDIR, f"{formulation}_{name}.json")
        if os.path.exists(p):
            with open(p) as f:
                results.append(json.load(f))
    with open(os.path.join(OUTDIR, "results.json"), "w") as f:
        json.dump(results, f, indent=1)

    lines = [
        "# TPU_VALIDATION_r05 — f32 production-path scenario validation "
        "on real TPU hardware, all 12 combos",
        "",
        "VERDICT r4 item 1: every row below ran through the stepper "
        "`cli.py --fused` actually ships — selection by "
        "`swmhd_tpu.cli.select_stepper` itself (the resident Pallas "
        "kernel at both 64² and 128² since the r5 lane-alignment "
        "relaxation), f32 with x64 off exactly as the "
        "production CLI. Anchors and tolerances are unchanged from the "
        "f64 CPU gate (examples/validation_anchors.py, transcribed from "
        "/root/reference/energy_plots/*.png).",
        "",
        "Companion hardware evidence in validation/tpu_r05/:",
        "- `pytest_tpu_kernels.log` — the TPU-marked equality tests on "
        "the chip: the 128² resident==windowed==XLA 10-step pin and the "
        "64² resident==XLA pin, each for both shipped topologies "
        "(tests/test_fused.py::test_resident_windowed_xla_agree_at_128_"
        "on_tpu, ::test_resident_matches_xla_at_64_on_tpu).",
        "- `series/*.csv` — the full per-iteration energy series.",
        "",
        "| formulation | scenario | path | anchors | result |",
        "|---|---|---|---|---|",
    ]
    for r in results:
        ok = sum(1 for v in r["checks"].values() if v)
        lines.append(
            f"| {r['formulation']} | {r['scenario']} | {r['path']} | "
            f"{ok}/{len(r['checks'])} | "
            f"**{'PASS' if r['pass'] else 'FAIL'}** |")
    lines += ["", f"{sum(r['pass'] for r in results)}/{len(results)} "
              "cases pass on hardware.", ""]
    lines += ["## Per-case anchor values", ""]
    for r in results:
        lines.append(f"### {r['formulation']} / {r['scenario']} "
                     f"({r['path']}, {r['wall_s']}s wall, "
                     f"{r['device']})")
        lines.append("")
        lines.append("| anchor | reference | ours (f32 TPU) | ok |")
        lines.append("|---|---|---|---|")
        ref, got, checks = r["reference"], r["ours"], r["checks"]
        rows = [("me0", ref.get("me0"), got["me0"]),
                ("ke0", ref.get("ke0", 0.0), got["ke0"]),
                ("ke_end", ref.get("ke_end"), got["ke_end"]),
                ("me_end", ref.get("me_end"), got["me_end"]),
                ("dev_max", ref.get("dev_max"), got["dev_max"])]
        for k, rv, gv in rows:
            lines.append(f"| {k} | {rv:.4g} | {gv:.4g} | "
                         f"{'yes' if checks.get(k, True) else 'NO'} |")
        lines.append("")
    with open(os.path.join(REPO, "TPU_VALIDATION_r05.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote TPU_VALIDATION_r05.md "
          f"({sum(r['pass'] for r in results)}/{len(results)} pass)")


if __name__ == "__main__":
    main()
