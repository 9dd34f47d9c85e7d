"""XLA's own cost accounting for one train step: bytes accessed, by op.

Lowers the shipped gru4rec step for the attached TPU, compiles, and prints
compiled.cost_analysis() totals plus the big-buffer ops from the optimized
HLO (anything touching a catalog-sized shape), to localize the gap between
measured ~1050us/step and the ~390us minimal-Adam-traffic floor.
"""

from __future__ import annotations

import collections
import re
import sys

import jax

sys.path.insert(0, ".")
from bench import build  # noqa: E402


def main():
    step, state, batch = build()
    jitted = jax.jit(step.raw, donate_argnums=(0,))
    lowered = jitted.lower(state, batch, step.aux)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    ba = ca.get("bytes accessed", float("nan"))
    print(f"bytes accessed (XLA): {ba/1e6:.1f} MB  -> {ba/649e9*1e6:.0f} us @649GB/s")
    for k in sorted(ca):
        if k.startswith("bytes accessed") and ca[k] > 1e6:
            print(f"  {k}: {ca[k]/1e6:.1f} MB")
    print(f"flops: {ca.get('flops', 0)/1e9:.2f} GFLOP")

    # big-shape ops in the optimized HLO
    hlo = compiled.as_text()
    pat = re.compile(r"f32\[(\d+),?(\d*)\]")
    counts = collections.Counter()
    for line in hlo.splitlines():
        line = line.strip()
        if "=" not in line or line.startswith("ROOT tuple"):
            continue
        m = pat.search(line.split("=", 1)[1][:40])
        if not m:
            continue
        d0 = int(m.group(1))
        d1 = int(m.group(2)) if m.group(2) else 1
        if d0 * d1 >= 4_000_000:  # catalog-sized (>= ~16MB fp32)
            op = line.split("=", 1)[1].strip().split(" ")[0].split("(")[0]
            # drop the shape from the op token
            op = re.sub(r"f32\[[^\]]*\]\S*", "", op).strip() or line.split()[2]
            counts[(op, (d0, d1))] += 1
    print("\ncatalog-sized result ops in optimized HLO:")
    for (op, shape), n in counts.most_common(40):
        print(f"  {n:3d} x {op:20s} {shape}")


if __name__ == "__main__":
    main()
