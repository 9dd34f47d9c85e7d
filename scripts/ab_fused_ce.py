"""Multi-window A/B: fused-CE vs dense gru4rec whole-step (VERDICT r2
weak-2 — resolve the fused-CE default with a measured decision).

Both arms are built once, then measured in ALTERNATING windows (fused,
dense, fused, dense, ...) inside one process, so slow drift in the shared
tunnel hits both arms equally. Prints per-window µs/step and the paired
ratio; the decision rule (documented in docs/performance.md): fused stays
default-on iff the median paired ratio (dense/fused) >= 1.0.

Run: python scripts/ab_fused_ce.py [--windows 5] [--model gru4rec]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--windows", type=int, default=5)
    ap.add_argument("--model", default="gru4rec")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    arms = {}
    for name, kw in (("fused", dict(fused_ce=True)), ("dense", dict(fused_ce=False))):
        arms[name] = bench.build(model=args.model, batch=args.batch, **kw)

    ratios = []
    for w in range(args.windows):
        us = {}
        for name in ("fused", "dense"):
            step, state, batch_d = arms[name]
            sps = bench.measure(step, state, batch_d)
            us[name] = 1e6 / sps
        ratios.append(us["dense"] / us["fused"])
        print(
            json.dumps(
                {
                    "window": w,
                    "fused_us": round(us["fused"], 1),
                    "dense_us": round(us["dense"], 1),
                    "dense_over_fused": round(ratios[-1], 3),
                }
            ),
            flush=True,
        )
    med = statistics.median(ratios)
    decision = "fused stays default-ON" if med >= 1.0 else "demote fused default"
    print(
        json.dumps(
            {
                "model": args.model,
                "median_dense_over_fused": round(med, 3),
                "windows": args.windows,
                "decision": decision,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
