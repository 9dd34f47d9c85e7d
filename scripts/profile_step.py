"""Decompose the gru4rec train step's per-step time on the real chip.

Differencing full-step VARIANTS (each removes one traffic/compute term)
instead of measuring isolated segments: isolated segment bodies are
loop-invariant inside the timing scan, so XLA hoists or cross-iteration
fuses them and the measurement collapses (see bench.py docstring). The
full step is immune — each iteration's grads depend on the previous
params through matmuls and the GRU scan.

Variants (RetailRocket point unless noted: A=70852, B=256, T=10, E=H=64):

  adam fp32        — shipped default
  adam bf16 m/v    — m/v streams halved (~-72us expected @649GB/s)
  sgd              — no m/v at all (~-222us expected)
  T=1              — GRU scan reduced to one cell -> scan cost
  A=4096           — Adam/head traffic ~nil -> fixed overhead + GRU
  dense CE         — (B,A) logits materialized

Prints a table plus derived attributions.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, ".")
from bench import build, measure  # noqa: E402


def build_sgd(**kw):
    """build() but with plain SGD (no optimizer moments)."""
    import bench as B
    from unittest import mock

    sgd = lambda lr, mv_dtype=None: optax.sgd(lr)
    with mock.patch(
        "ikea_recommender_tpu.train.state.make_optimizer", side_effect=sgd
    ):
        # bench.build imports make_optimizer locally each call
        import ikea_recommender_tpu.train.state as st

        orig = st.make_optimizer
        st.make_optimizer = sgd
        try:
            out = B.build(**kw)
        finally:
            st.make_optimizer = orig
    # build() also calls make_optimizer directly
    return out


def main():
    rows = []

    def run(label, builder=build, **kw):
        step, state, batch = builder(**kw)
        sps = measure(step, state, batch)
        us = 1e6 / sps
        rows.append((label, us))
        print(f"{label:28s} {us:8.1f} us/step", flush=True)
        return us

    t_base = run("adam fp32 (default)")
    t_bf16 = run("adam bf16 m/v", mv_dtype="bfloat16")
    t_sgd = run("sgd (no moments)", builder=build_sgd)
    t_t1 = run("T=1 (scan cost probe)", state_len=1)
    t_small = run("A=4096 (head/adam ~nil)", catalog=4096)
    t_dense = run("dense CE", fused_ce=False)
    t_lazy = run("lazy emb adam", lazy=True)
    t_lazy16 = run("lazy emb + bf16 head m/v", lazy=True, mv_dtype="bfloat16")

    print()
    print(f"m/v halving saves        {t_base - t_bf16:8.1f} (model ~72)")
    print(f"m/v removal saves        {t_base - t_sgd:8.1f} (model ~222)")
    print(f"9 GRU cells cost         {t_base - t_t1:8.1f}")
    print(f"catalog 70852->4096 saves{t_base - t_small:8.1f} (model ~350)")
    print(f"dense-CE extra           {t_dense - t_base:8.1f}")
    print(f"lazy emb saves           {t_base - t_lazy:8.1f}")
    print(f"lazy+bf16 saves          {t_base - t_lazy16:8.1f}")


if __name__ == "__main__":
    main()
