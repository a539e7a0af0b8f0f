"""Profiling & throughput measurement (SURVEY §5 tracing/profiling).

The reference's only instrumentation is wall-clock deltas inside its
progress callback (jacobian_formulation/SWMHD_example.jl:45-63,96-100).
Here:

  - :func:`benchmark_step` — tunnel-safe steps/s / grid-points/s / achieved
    HBM-bandwidth measurement of any jitted ``state -> state`` (or
    ``state -> (state, aux)``) stepper. Synchronisation is via a device→host
    scalar pull because ``jax.block_until_ready`` can return early over
    remote-dispatch links (e.g. the axon TPU relay).
  - :func:`trace` — context manager around ``jax.profiler`` producing a
    Perfetto/XPlane dump for op-level analysis.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def _sync(state) -> float:
    """Force full device completion; returns a cheap checksum."""
    leaves = [l for l in jax.tree.leaves(state)
              if hasattr(l, "dtype") and jnp.issubdtype(l.dtype,
                                                        jnp.floating)]
    return float(sum(jnp.sum(l) for l in leaves[:1]))


@dataclasses.dataclass
class StepBenchmark:
    steps_per_s: float
    points_per_s: float
    wall_s: float
    n_steps: int
    grid_points: int
    hbm_gbps_estimate: Optional[float] = None
    hbm_fraction_of_light: Optional[float] = None
    # wall time of each full repetition (s); the headline numbers use the
    # fastest repetition. Syncing per CALL would bill one relay
    # device->host round trip (~25 ms on axon) to every call and
    # understate throughput ~30% at 2048^2, so each repetition syncs once
    # at the end and variance comes from repeating the whole loop.
    per_call_s: Optional[tuple] = None

    @property
    def rel_spread(self) -> Optional[float]:
        if not self.per_call_s or len(self.per_call_s) < 2:
            return None
        s = sorted(self.per_call_s)
        return (s[-1] - s[0]) / s[0] if s[0] > 0 else None

    def __str__(self):
        s = (f"{self.points_per_s:.3e} pts/s "
             f"({self.steps_per_s:.1f} steps/s, {self.n_steps} steps in "
             f"{self.wall_s:.3f}s)")
        if self.hbm_fraction_of_light is not None:
            s += (f"; est. HBM {self.hbm_gbps_estimate:.0f} GB/s = "
                  f"{100 * self.hbm_fraction_of_light:.1f}% of roofline")
        return s


# Minimum HBM traffic of one RK3 step under perfect per-substage fusion:
# 3 substages x (read 4 prognostics + write 4) field-sized transfers.
_MIN_FIELD_TRANSFERS_PER_STEP = 24

# Peak HBM bandwidth per chip (GB/s) for roofline fractions. Longest key
# wins so "v5 lite" (v5e, reported by axon as "TPU v5 lite0") is not
# swallowed by the bare "v5" (= v5p) entry.
HBM_PEAK_GBPS = {
    "v5e": 819.0, "v5lite": 819.0, "v5p": 2765.0, "v5": 2765.0,
    "v4": 1228.0, "v6e": 1640.0, "v6": 1640.0,
}

# Peak f32 VPU throughput per chip (Gflop/s). The fully-fused WENO5 SWMHD
# step is compute-bound (arithmetic intensity ~31 flops/byte at minimum
# HBM traffic >> the ~4.5 flops/byte machine balance), so the achievable
# ceiling is this roofline, not HBM bandwidth.
VPU_PEAK_GFLOPS = {
    "v5e": 3530.0, "v5lite": 3530.0, "v5p": 14700.0, "v5": 14700.0,
    "v4": 8600.0, "v6e": 7300.0, "v6": 7300.0,
}


def _detect(table) -> Optional[float]:
    try:
        kind = jax.devices()[0].device_kind.lower().replace(" ", "")
    except Exception:  # pragma: no cover
        return None
    for key in sorted(table, key=len, reverse=True):
        if key in kind:
            return table[key]
    return None


def detect_hbm_peak() -> Optional[float]:
    return _detect(HBM_PEAK_GBPS)


def detect_vpu_peak() -> Optional[float]:
    return _detect(VPU_PEAK_GFLOPS)


def benchmark_step(step_fn: Callable, state, n_steps_per_call: int,
                   n_calls: int = 5, grid_points: Optional[int] = None,
                   bytes_per_point: Optional[int] = None,
                   repeats: int = 2) -> StepBenchmark:
    """Measure a compiled stepper's throughput.

    ``step_fn`` advances ``n_steps_per_call`` RK3 steps per invocation and
    returns the new state (extra aux outputs are allowed). One warmup call
    triggers compilation and is excluded. The n_calls loop syncs once at
    the END (a per-call sync would bill a relay round trip to every call)
    and runs ``repeats`` times; the fastest repetition is the headline."""
    def advance(s):
        out = step_fn(s)
        return out[0] if isinstance(out, tuple) else out

    if grid_points is None:
        grid_points = int(state.h.size)
    state = advance(state)
    _sync(state)

    per_rep = []
    for _ in range(max(1, repeats)):
        s = state
        t0 = time.perf_counter()
        for _ in range(n_calls):
            s = advance(s)
        _sync(s)
        per_rep.append(time.perf_counter() - t0)
    wall = min(per_rep)

    n_steps = n_calls * n_steps_per_call
    steps_per_s = n_steps / wall
    points_per_s = grid_points * steps_per_s

    gbps = frac = None
    peak = detect_hbm_peak()
    if peak is not None:
        bpp = bytes_per_point or jnp.dtype(state.h.dtype).itemsize
        traffic = (_MIN_FIELD_TRANSFERS_PER_STEP * grid_points * bpp
                   * steps_per_s)
        gbps = traffic / 1e9
        frac = gbps / peak
    return StepBenchmark(steps_per_s=steps_per_s, points_per_s=points_per_s,
                         wall_s=wall, n_steps=n_steps,
                         grid_points=grid_points,
                         hbm_gbps_estimate=gbps,
                         hbm_fraction_of_light=frac,
                         per_call_s=tuple(per_rep))


@contextlib.contextmanager
def trace(logdir: str, host_tracer_level: int = 2):
    """``with trace("/tmp/prof"):`` — jax.profiler trace for Perfetto/
    TensorBoard; the TPU-native analog of the reference's time_ns deltas."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# -- halo-exchange / compute overlap measurement --------------------------------
#
# BASELINE names "halo-exchange overlapped with interior compute
# (overlap % tracked)"; this is the tracking implementation (VERDICT r3
# item 3): run the sharded step under jax.profiler, parse the Perfetto
# trace, and report what fraction of collective (halo-exchange) time is
# covered by concurrent compute. Works on the CPU fake-device mesh (CPU
# collectives appear as rendezvous events; the number is thread-level and
# only validates the tooling) and on real TPU traces (collective-permute
# events on the device lanes).

_COMM_MARKERS = ("collective-permute", "collective_permute", "ppermute",
                 "all-reduce", "all_reduce", "all-gather", "all_gather",
                 "reduce-scatter", "reduce_scatter", "all-to-all",
                 "rendezvous")
_NON_COMPUTE_PREFIXES = ("wait", "thunkexecutor", "end:", "invoke",
                         "execute", "run", "buffer", "transfer",
                         "allocate", "deallocate", "program", "enqueue",
                         "stream", "callback", "barrier", "infeed",
                         "outfeed")


def _classify(name: str):
    n = name.lower()
    if any(m in n for m in _COMM_MARKERS):
        return "comm"
    if n.startswith(_NON_COMPUTE_PREFIXES):
        return None
    return "compute"


def _merge(intervals):
    out = []
    for a, b in sorted(intervals):
        if out and a <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], b))
        else:
            out.append((a, b))
    return out


def _covered(span, cover):
    """Length of ``span`` ∩ union(cover); cover must be merged/sorted."""
    a, b = span
    tot = 0.0
    for c, d in cover:
        lo, hi = max(a, c), min(b, d)
        if lo < hi:
            tot += hi - lo
        if c >= b:
            break
    return tot


def parse_overlap(perfetto_json_gz: str) -> dict:
    """Overlap statistics from a Perfetto trace file (json.gz)."""
    import gzip
    import json as _json
    with gzip.open(perfetto_json_gz, "rt") as f:
        tr = _json.load(f)
    evs = tr["traceEvents"] if isinstance(tr, dict) else tr
    comm, compute = [], []
    for e in evs:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        kind = _classify(e.get("name", ""))
        if kind is None:
            continue
        span = (float(e["ts"]), float(e["ts"]) + float(e["dur"]))
        (comm if kind == "comm" else compute).append(span)
    comm_u = _merge(comm)
    comp_u = _merge(compute)
    comm_us = sum(b - a for a, b in comm_u)
    hidden_us = sum(_covered(s, comp_u) for s in comm_u)
    return {
        "comm_ms": comm_us / 1e3,
        "compute_ms": sum(b - a for a, b in comp_u) / 1e3,
        "hidden_ms": hidden_us / 1e3,
        "overlap_pct": (100.0 * hidden_us / comm_us) if comm_us else None,
        "n_comm_events": len(comm),
        "n_compute_events": len(compute),
    }


def measure_overlap(step_fn: Callable, state, logdir: Optional[str] = None
                    ) -> dict:
    """Run ``step_fn`` once under the profiler and return
    :func:`parse_overlap` stats of the resulting trace. The stepper is
    warmed up (compiled) first so the trace holds steady-state execution."""
    import glob
    import os
    import shutil
    import tempfile

    def advance(s):
        out = step_fn(s)
        return out[0] if isinstance(out, tuple) else out

    state = advance(state)
    _sync(state)
    tmp = logdir or tempfile.mkdtemp(prefix="swmhd_overlap_")
    try:
        jax.profiler.start_trace(tmp, create_perfetto_trace=True)
        try:
            s = advance(state)
            _sync(s)
        finally:
            jax.profiler.stop_trace()
        files = glob.glob(os.path.join(
            tmp, "**", "perfetto_trace.json.gz"), recursive=True)
        if not files:
            return {"overlap_pct": None, "error": "no perfetto trace"}
        return parse_overlap(max(files, key=os.path.getmtime))
    finally:
        if logdir is None:
            shutil.rmtree(tmp, ignore_errors=True)
