"""Microbench: layout choice for the lazy-column Q-head Adam.

dW of the Q-heads touches only B of A columns per step; the lazy optimizer
must gather/update/scatter those columns' param + moment slices. Two
candidate layouts for the (K, F, A) head state:

- native  : gather/scatter along the MINOR (lane) axis of (K, F, A)
- transposed: moments stored (K, A, 2F); columns are sublane-major rows

This script measures, on the real chip with the honest scan+readback
protocol (bench.py rules, docs/performance.md), the per-step cost of:
  g_min  : take B columns from (K, F, A) minor axis
  s_min  : .at[:, :, ids].set of B columns into (K, F, A)
  g_row  : take B rows from (K, A, 2F)
  s_row  : .at[:, ids, :].set of B rows into (K, A, 2F)
  adamK  : dense fused Adam over (K, F, A) m/v/p (the stream lazy removes)
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

K, F, A, B = 3, 64, 70852, 256


def measure(step_fn, init, n1=4, n2=32, trials=3):
    """Honest per-step time: K steps in one jitted lax.scan + checksummed
    readback, two loop lengths differenced (cancels RTT + readback)."""

    def loop(n):
        @jax.jit
        def run(state):
            def body(c, _):
                return step_fn(c), 0.0

            out, _ = jax.lax.scan(body, state, None, length=n)
            return jax.tree.map(
                lambda x: jnp.sum(x.astype(jnp.float32) % 7.3), out
            )

        return run

    r1, r2 = loop(n1), loop(n2)
    state = init()
    float(jax.tree.leaves(r1(state))[0])  # compile+warm
    float(jax.tree.leaves(r2(state))[0])
    best = None
    for _ in range(trials):
        t0 = time.perf_counter()
        float(jax.tree.leaves(r1(state))[0])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jax.tree.leaves(r2(state))[0])
        t2 = time.perf_counter() - t0
        per = (t2 - t1) / (n2 - n1) * 1e6
        if per > 0 and t2 > 1.15 * t1 and (best is None or per < best):
            best = per
    return best


def main():
    rs = np.random.RandomState(0)
    ids0 = jnp.asarray(rs.randint(0, A, size=(B,)), jnp.int32)

    def fresh_ids(w):
        # data-dependent ids so scan iterations can't fuse/CSE
        h = jnp.sum(w) % 1.0
        return (ids0 + (h * 100).astype(jnp.int32)) % A

    wmin = jnp.asarray(rs.randn(K, F, A), jnp.float32)
    wrow = jnp.asarray(rs.randn(K, A, 2 * F), jnp.float32)
    cols = jnp.asarray(rs.randn(K, F, B), jnp.float32)
    rows = jnp.asarray(rs.randn(K, B, 2 * F), jnp.float32)

    res = {}

    def g_min(w):
        ids = fresh_ids(w)
        got = jnp.take(w, ids, axis=2)  # (K, F, B)
        return w + 1e-12 * jnp.sum(got)

    res["g_min"] = measure(g_min, lambda: wmin)

    def s_min(w):
        ids = fresh_ids(w)
        return w.at[:, :, ids].set(cols + jnp.sum(w[0, 0, :1]))

    res["s_min"] = measure(s_min, lambda: wmin)

    def g_row(w):
        ids = fresh_ids(w)
        got = jnp.take(w, ids, axis=1)  # (K, B, 2F)
        return w + 1e-12 * jnp.sum(got)

    res["g_row"] = measure(g_row, lambda: wrow)

    def s_row(w):
        ids = fresh_ids(w)
        return w.at[:, ids, :].set(rows + jnp.sum(w[0, :1, 0]))

    res["s_row"] = measure(s_row, lambda: wrow)

    def adamK(state):
        p, m, v = state
        g = p * 1e-6  # stand-in dense grad already in registers
        m2 = 0.9 * m + 0.1 * g
        v2 = 0.999 * v + 0.001 * g * g
        p2 = p - 0.01 * m2 / (jnp.sqrt(v2) + 1e-8)
        return p2, m2, v2

    res["adamK_dense"] = measure(
        adamK, lambda: (wmin, jnp.zeros_like(wmin), jnp.ones_like(wmin))
    )

    for k, v in res.items():
        print(f"{k:12s} {v if v is not None else float('nan'):10.1f} us/step")


if __name__ == "__main__":
    sys.exit(main())
