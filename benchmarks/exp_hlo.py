"""Dump optimized-HLO op statistics for one RK3 step variant."""
import os
import sys
import collections
import re

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_tpu_cache"))

from bench import build                              # noqa: E402

N = int(os.environ.get("SWMHD_BENCH_N", "512"))
which = os.environ.get("WHICH", "xla")
model, state = build(N)

fn = model.step_fn(0.001, 1)  # (the slab variant was retired in r4)
compiled = jax.jit(fn).lower(state).compile()
hlo = compiled.as_text()

counts = collections.Counter()
fusion_sizes = []
for line in hlo.splitlines():
    m = re.match(r"\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*\S+\s+(\w+)\(", line)
    if m:
        counts[m.group(1)] += 1

print(f"== {which} N={N}: op counts ==")
for opname, c in counts.most_common(25):
    print(f"  {opname:24s} {c}")
print(f"total instructions: {sum(counts.values())}")

ca = compiled.cost_analysis()
for k in sorted(ca):
    if not k.startswith("utilization"):
        print(f"  cost[{k}] = {ca[k]:.4g}")
out = os.environ.get("HLO_OUT")
if out:
    with open(out, "w") as f:
        f.write(hlo)
    print("wrote", out)
