"""Pallas GRU scan vs XLA lax.scan across (H, T) — find the Pallas
kernel's winning regime (VERDICT r2 item 7).

Times the BACKBONE forward+backward in isolation (embedding gather + GRU
scan + final-hidden selection; the head would swamp the scan at large H)
with the honest in-jit-scan + readback differencing from bench.py, all
arms in one process on the real chip.

Run: python scripts/bench_gru_regime.py [--grid small]
Writes a markdown table to stdout (paste into docs/performance.md).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ikea_recommender_tpu.models.backbone import (  # noqa: E402
    BackboneConfig,
    apply_backbone,
    init_backbone,
)


def timed(fn, init, k1=4, k2=16, trials=3):
    """Seconds per fn application, fn chained through a lax.scan carry.

    Escalates the loop length until the K2-K1 compute delta dominates the
    tunnel's tens-of-ms latency jitter (same guard as bench.measure — an
    unguarded run once reported negative times for sub-ms configs)."""

    def loop(c, K):
        def body(c, _):
            return fn(c), None

        c, _ = jax.lax.scan(body, c, None, length=K)
        leaves = [
            x for x in jax.tree.leaves(c)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        ]
        return sum(
            x.reshape(-1)[:: max(1, x.size // 64)].astype(jnp.float32).sum()
            for x in leaves
        )

    def best(f):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(f(init))
            b = min(b, time.perf_counter() - t0)
        return b

    for _attempt in range(4):
        f1 = jax.jit(functools.partial(loop, K=k1))
        f2 = jax.jit(functools.partial(loop, K=k2))
        t1, t2 = best(f1), best(f2)
        per = (t2 - t1) / (k2 - k1)
        if per > 0 and t2 > 1.15 * t1:
            return per
        k2 *= 3
        trials += 1
    raise RuntimeError("compute delta never dominated tunnel noise")


def bench_point(B, T, H, impl, vocab=70852):
    cfg = BackboneConfig(
        num_items=vocab, embedding_dim=H, hidden_dim=H, scan_impl=impl
    )
    params = init_backbone(jax.random.key(0), cfg)
    rs = np.random.RandomState(0)
    states = jnp.asarray(rs.randint(0, vocab, (B, T)), jnp.int32)
    lens = jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32)

    def one(p):
        g = jax.grad(
            lambda pp: apply_backbone(pp, cfg, states, lens).sum()
        )(p)
        # chain grads into the carry so the scan cannot collapse
        return jax.tree.map(lambda a, b: a - 1e-12 * b, p, g)

    return timed(one, params)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", default="full", choices=["small", "full"])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--hs", type=int, nargs="*", default=None,
                    help="override the H list (e.g. --hs 512)")
    args = ap.parse_args()
    Hs = [64, 256] if args.grid == "small" else [64, 128, 256, 512]
    if args.hs:
        Hs = args.hs
    Ts = [10, 50] if args.grid == "small" else [10, 50, 200]

    print("| H | T | XLA scan µs | Pallas µs | Pallas/XLA |")
    print("|---|---|---|---|---|")
    for H in Hs:
        for T in Ts:
            us = {}
            for impl in ("xla", "pallas"):
                try:
                    us[impl] = bench_point(args.batch, T, H, impl) * 1e6
                except Exception as e:  # noqa: BLE001
                    us[impl] = float("nan")
                    print(f"<!-- {impl} H={H} T={T} failed: {e} -->",
                          file=sys.stderr)
            ratio = us["pallas"] / us["xla"] if us["xla"] else float("nan")
            print(f"| {H} | {T} | {us['xla']:.0f} | {us['pallas']:.0f} "
                  f"| {ratio:.2f} |", flush=True)


if __name__ == "__main__":
    main()
