"""Produce SCALING.md: the BASELINE.md scaling-efficiency record.

Two parts:

1. **Mesh scaling** (`parallel/scaling_bench.py`) over {1,2,4,8}-device
   meshes. On this image no multi-chip TPU is attached, so the mesh curve
   runs on the virtual-CPU backend (correctness-weighted: it validates the
   harness, the shardings and the report format; absolute numbers are CPU).
   Run the same script on a real slice to fill in TPU rows.
2. **Single-chip batch scaling** on the real TPU via bench.py's honest
   scan+readback measure (how far one v5e's throughput stretches with
   global batch — the intra-chip "data parallelism").

Usage: python scripts/run_scaling.py [--out SCALING.md]
(spawns a CPU subprocess for part 1; runs part 2 in-process on the TPU).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CPU_WORKER = r"""
import os, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
from ikea_recommender_tpu.core.mesh import MeshSpec
from ikea_recommender_tpu.parallel.scaling_bench import run_scaling_bench

pts = run_scaling_bench(
    model="smorl",
    per_device_batch=64,
    catalog=2048,  # CPU-sized catalog; shardings identical in structure
    mesh_specs=[MeshSpec(1, 1), MeshSpec(2, 1), MeshSpec(4, 1),
                MeshSpec(8, 1), MeshSpec(4, 2)],
    warmup=2,
    iters=8,
)
for p in pts:
    print("POINT " + json.dumps({
        "mesh": p.mesh, "global_batch": p.global_batch,
        "sessions_per_sec": round(p.sessions_per_sec, 1),
        "efficiency": round(p.efficiency, 3),
    }))
"""


def mesh_curve():
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", _CPU_WORKER], capture_output=True, text=True,
        env=env, timeout=1800,
    )
    if out.returncode != 0:
        raise RuntimeError(f"cpu scaling worker failed:\n{out.stdout}\n{out.stderr}")
    pts = []
    for line in out.stdout.splitlines():
        if line.startswith("POINT "):
            pts.append(json.loads(line[len("POINT "):]))
    return pts


def batch_curve():
    import bench

    rows = []
    for B in (128, 256, 512, 1024):
        step, state, batch_d = bench.build(batch=B)
        sps = bench.measure(step, state, batch_d)
        rows.append(
            {
                "batch": B,
                "us_per_step": round(1e6 / sps, 1),
                "sessions_per_sec": round(sps * B, 1),
            }
        )
        print("BATCH " + json.dumps(rows[-1]), file=sys.stderr)
    base = rows[0]["sessions_per_sec"]
    for r in rows:
        r["speedup_vs_b128"] = round(r["sessions_per_sec"] / base, 3)
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO, "SCALING.md"))
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    mesh_pts = mesh_curve()
    tpu_rows = [] if args.skip_tpu else batch_curve()

    lines = [
        "# SCALING — sessions/s and efficiency (BASELINE.md north star: ≥85%)",
        "",
        "## Mesh scaling (virtual 8-device CPU mesh — harness validation)",
        "",
        "SMORL double-Q step, per-device batch 64, catalog 2048. No multi-chip",
        "TPU is attached in this environment; these rows validate the harness,",
        "the (data, model) shardings and the efficiency accounting on the",
        "virtual CPU mesh. Re-run `scripts/run_scaling.py` on a real slice to",
        "record TPU rows (same code path).",
        "",
        "| mesh | global batch | sessions/s | efficiency vs 1-device |",
        "|---|---|---|---|",
    ]
    for p in mesh_pts:
        mesh = f"data={p['mesh'].get('data', 1)}, model={p['mesh'].get('model', 1)}"
        lines.append(
            f"| {mesh} | {p['global_batch']} | {p['sessions_per_sec']:,} "
            f"| {p['efficiency']:.3f} |"
        )
    if tpu_rows:
        lines += [
            "",
            "## Single-chip batch scaling (real v5e, honest scan+readback)",
            "",
            "GRU4Rec at the RetailRocket point. The per-step cost has a large",
            "batch-independent term (the ~254MB Adam stream), so throughput",
            "rises sub-linearly in batch: bigger global batches amortize the",
            "optimizer traffic.",
            "",
            "| global batch | µs/step | sessions/s | throughput vs b=128 |",
            "|---|---|---|---|",
        ]
        for r in tpu_rows:
            lines.append(
                f"| {r['batch']} | {r['us_per_step']:,} "
                f"| {r['sessions_per_sec']:,} | {r['speedup_vs_b128']:.2f}x |"
            )
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
