"""Compiler-schedule evidence for the halo-exchange overlap split (r5,
VERDICT r4 item 3).

Real multi-chip timing is impossible on this 1-chip host, but the claim
behind ``DomainDecomposition(overlap=True)`` — that splitting the
tendency into an interior part (no halo dependence) plus edge bands lets
XLA's latency-hiding scheduler run the ``collective-permute``s UNDER the
interior compute — is checkable without hardware: AOT-compile the
sharded step for an abstract 8-chip v5e topology
(jax.experimental.topologies), then parse the SCHEDULED HLO for what
actually sits between each ``collective-permute-start`` and its
``-done``. If the split works, starts are issued early and fusions
(interior tendency work) are scheduled inside the start..done span; if
not, the done follows its start with nothing overlappable between.

Outputs OVERLAP_r05.json:
  for overlap in (False, True):
    hlo:   schedule metrics from the v5e:2x4 AOT compile
           (pairs, pairs with compute inside the span, fused compute
           bytes inside spans, mean fusions per span)
    trace: the r4 Perfetto-trace metric (profiling.measure_overlap) on
           the 8-virtual-CPU-device mesh — tooling-validation numbers,
           kept for continuity with SCALING_r04.json

Usage: JAX_PLATFORMS=cpu python benchmarks/overlap_aot.py [--n 1024]
"""

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import jax.numpy as jnp
import numpy as np

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def build_model(N, dtype=jnp.float32):
    from swmhd_tpu import (Grid, ShallowWaterModel, FPlane,
                           VECTOR_INVARIANT, jacobian_lorentz_forcing)
    L = 10.0
    g = Grid.regular(N, N, (-L / 2, L / 2), (-L / 2, L / 2), dtype=dtype)
    model = ShallowWaterModel(grid=g, formulation=VECTOR_INVARIANT,
                              coriolis=FPlane(1.0),
                              forcing=jacobian_lorentz_forcing())
    state = model.initial_state(
        u=lambda x, y: 5 * y * jnp.exp(-(x**2 + y**2)),
        v=lambda x, y: -5 * x * jnp.exp(-(x**2 + y**2)),
        h=lambda x, y: 1.0 + 0.05 * jnp.exp(-(x**2 + y**2)),
        A=lambda x, y: 0.5 * jnp.exp(-((x - 0.5)**2 + y**2))
        - 0.5 * jnp.exp(-((x + 0.5)**2 + y**2)))
    return model, state


# -- scheduled-HLO parsing -------------------------------------------------------

_SHAPE = re.compile(r"(f32|bf16|f16|f64|s32|u32|s8|u8|pred)\[([\d,]*)\]")

# an instruction line: "  [ROOT ]%name = <type> opcode(operands...)".
# Types can carry arbitrary layout/tiling annotations, so the robust way
# to read the opcode is the LAST bare word before an opening paren that
# is not inside the type braces — matched here as " opcode(" with a
# known-opcode check instead of full type parsing.
_NAME = re.compile(r"^\s*(?:ROOT\s+)?%([\w.\-]+)\s*=")
_OPCODE = re.compile(r"[)}\]\s]([a-z][\w\-]*)\(")

_COMPUTE_OPS = {"fusion", "dot", "convolution", "reduce", "reduce-window",
                "sort", "rng", "cholesky", "triangular-solve"}


_SIZES = {"f64": 8, "f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
          "s8": 1, "u8": 1, "pred": 1}


def _out_bytes(type_region):
    """Total bytes of an instruction's OUTPUT type (tuple elements
    summed). Must be given only the type region between '=' and the
    opcode — operand/metadata text can also contain shape-like strings."""
    total = 0
    for m in _SHAPE.finditer(type_region):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _SIZES[dt]
    return total


def _parse_instruction(line):
    """(name, opcode, out_bytes) or None for non-instruction lines."""
    nm = _NAME.match(line)
    if not nm:
        return None
    rest = line[nm.end():]
    om = _OPCODE.search(" " + rest)
    if not om:
        return None
    # om.start() indexes into " " + rest: the type region is everything
    # before the opcode token
    return nm.group(1), om.group(1), _out_bytes(rest[:max(om.start() - 1,
                                                          0)])


def parse_schedule(hlo_text):
    """Walk every computation in SCHEDULED order; for each
    collective-permute start..done span, record the compute scheduled
    inside it."""
    pairs = []
    n_sync = 0   # synchronous collective-permute (no start/done split):
    # the scheduler decided NOT to overlap these — worth surfacing
    lines = hlo_text.splitlines()
    # computations are brace-delimited blocks; instruction order within a
    # block IS the schedule (the module is compiled with scheduling on)
    open_spans = {}   # start name -> {"ops": n, "bytes": b}
    for line in lines:
        parsed = _parse_instruction(line)
        if parsed is None:
            if line.strip().startswith("}"):
                open_spans.clear()  # spans do not cross computations
            continue
        name, op, nbytes = parsed
        if op == "collective-permute":
            n_sync += 1
        elif op == "collective-permute-start":
            open_spans[name] = {"ops": 0, "bytes": 0, "all_ops": 0}
        elif op == "collective-permute-done":
            # operand = the start instruction's name
            dep = re.search(r"collective-permute-done\(%([\w.\-]+)", line)
            key = dep.group(1) if dep else None
            span = open_spans.pop(key, None)
            if span is not None:
                pairs.append(span)
        else:
            for span in open_spans.values():
                span["all_ops"] += 1
                if op in _COMPUTE_OPS:
                    span["ops"] += 1
                    span["bytes"] += nbytes
    n = len(pairs)
    with_compute = sum(1 for p in pairs if p["ops"] > 0)
    return {
        "n_sync_permutes": n_sync,
        "n_permute_pairs": n,
        "n_pairs_with_compute_inside": with_compute,
        "pct_pairs_overlapped": round(100.0 * with_compute / n, 1) if n else None,
        "mean_compute_ops_per_span": round(
            sum(p["ops"] for p in pairs) / n, 2) if n else None,
        "total_compute_bytes_inside_spans": int(
            sum(p["bytes"] for p in pairs)),
    }


def aot_hlo_metrics(N, overlap, topology="v5e:2x4", mesh_shape=(2, 4)):
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from swmhd_tpu.parallel.decomposition import (DomainDecomposition,
                                                  AXIS_X, AXIS_Y)

    topo = topologies.get_topology_desc(topology, "tpu")
    devs = np.array(topo.devices).reshape(mesh_shape)
    mesh = Mesh(devs, (AXIS_X, AXIS_Y))
    model, _ = build_model(N)
    dd = DomainDecomposition(model, mesh, halo=8, overlap=overlap)
    fn = dd.step_fn(0.001, 1)

    sh_field = NamedSharding(mesh, P(AXIS_X, AXIS_Y))
    sh_scalar = NamedSharding(mesh, P())
    from swmhd_tpu.models.state import State, Clock
    field = jax.ShapeDtypeStruct((N, N), jnp.float32, sharding=sh_field)
    scalar = jax.ShapeDtypeStruct((), jnp.float32, sharding=sh_scalar)
    it = jax.ShapeDtypeStruct((), jnp.int32, sharding=sh_scalar)
    state = State(h=field, u=field, v=field, A=field,
                  clock=Clock(time=scalar, iteration=it))
    t0 = time.time()
    compiled = fn.lower(state).compile()
    compile_s = time.time() - t0
    txt = compiled.as_text()
    metrics = parse_schedule(txt)
    mem = compiled.memory_analysis()
    metrics.update(
        compile_s=round(compile_s, 1),
        topology=topology, grid=f"{N}x{N}", mesh=list(mesh_shape),
        temp_bytes_per_device=int(mem.temp_size_in_bytes),
        hlo_chars=len(txt),
    )
    return metrics, txt


def trace_metrics(N, overlap):
    """The r4 Perfetto metric on the 8-virtual-CPU mesh (continuity)."""
    from swmhd_tpu.parallel import DomainDecomposition, make_mesh
    from swmhd_tpu import profiling
    model, state = build_model(N)
    mesh = make_mesh(shape=(2, 4))
    dd = DomainDecomposition(model, mesh, halo=8, overlap=overlap)
    sharded = dd.shard_state(state)
    return profiling.measure_overlap(dd.step_fn(0.001, 4), sharded)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--dump-hlo", action="store_true",
                    help="write the scheduled HLO next to the JSON")
    args = ap.parse_args()

    out = {"grid": f"{args.n}x{args.n}",
           "note": ("HLO metrics: AOT-compiled for an abstract v5e:2x4 "
                    "topology; 'compute inside span' counts fusions the "
                    "latency-hiding scheduler placed between a "
                    "collective-permute-start and its -done — the "
                    "schedule-level definition of comm/compute overlap. "
                    "Trace metrics: CPU-mesh Perfetto numbers "
                    "(tooling validation only, as in SCALING_r04).")}
    for overlap in (False, True):
        key = f"overlap_{str(overlap).lower()}"
        print(f"== {key}: AOT v5e compile at {args.n}^2", flush=True)
        hlo_metrics, txt = aot_hlo_metrics(args.n, overlap)
        entry = {"hlo": hlo_metrics}
        if args.dump_hlo:
            p = os.path.join(REPO, f"validation/overlap_hlo_{key}.txt")
            with open(p, "w") as f:
                f.write(txt)
        if not args.no_trace:
            print(f"   trace on CPU mesh", flush=True)
            entry["trace"] = trace_metrics(min(args.n, 512), overlap)
        out[key] = entry
        print("   ", json.dumps(hlo_metrics), flush=True)

    with open(os.path.join(REPO, "OVERLAP_r05.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote OVERLAP_r05.json")


if __name__ == "__main__":
    main()
