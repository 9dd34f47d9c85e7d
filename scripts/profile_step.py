"""Decompose the gru4rec train step into its cost components on the real
chip (docs/performance.md "Remaining target": measured ~1050us/step vs the
~390us Adam-stream floor — find where the other ~600us goes).

Uses the honest scan+readback differencing methodology from bench.py on
each component in isolation:

- full step (fused CE / dense CE)
- value_and_grad only (no optimizer update)
- forward loss only (no backward)
- backbone features only (embedding gather + GRU scan)
- optimizer update only (grads chained through the scan carry so XLA
  cannot collapse iterations; the chain adds one g-tree write per step,
  which is modeled in the printed floor)

Run: JAX_PLATFORMS=tpu python scripts/profile_step.py
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import build  # noqa: E402


def timed_scan(fn, init, K1=4, K2=32, trials=4):
    """fn(carry) -> carry; returns seconds per iteration."""

    def loop(carry, K):
        def body(c, _):
            return fn(c), None

        c, _ = jax.lax.scan(body, carry, None, length=K)
        leaves = [x for x in jax.tree.leaves(c) if hasattr(x, "dtype")]
        return sum(
            x.reshape(-1)[:: max(1, x.size // 64)].astype(jnp.float32).sum()
            for x in leaves
            if jnp.issubdtype(x.dtype, jnp.floating)
        )

    f1 = jax.jit(lambda c: loop(c, K1))
    f2 = jax.jit(lambda c: loop(c, K2))

    def best(f):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(f(init))
            b = min(b, time.perf_counter() - t0)
        return b

    t1, t2 = best(f1), best(f2)
    return (t2 - t1) / (K2 - K1)


def main():
    import optax

    from ikea_recommender_tpu.models.families import (
        apply_features,
        apply_model,
        model_config_from_train,
    )
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.train.steps import _fused_sup_ce, _ce_loss

    batch = 256
    step, state, bd = build(batch=batch, fused_ce=True)
    mc = model_config_from_train(
        TrainConfig(model="gru4rec", batch_size=batch, embedding_size=64,
                    hidden_state_size=64, state_size=10, learning_rate=0.01,
                    fused_ce=True),
        DataConfig(num_items=70852),
    )
    opt = optax.adam(0.01)
    params = state.params
    opt_state = opt.init(params)

    rows = []

    def rec(name, sec):
        rows.append((name, sec * 1e6))
        print(json.dumps({"component": name, "us": round(sec * 1e6, 1)}),
              file=sys.stderr)

    # 1. full step (params+opt carried; matches bench.py within noise)
    def full(carry):
        s, b = carry
        s2, _ = step.raw(s, b, step.aux)
        return (s2, b)

    rec("full_step_fused", timed_scan(full, (state, bd)))

    # 2. value_and_grad only — carry params, add dp-scaled grads to keep the
    # chain data-dependent (adds one p read+write; tiny vs Adam stream)
    def loss_fused(p):
        h = apply_features(p, mc, bd["state"], bd["true_len"],
                           dropout_rng=jax.random.key(0), deterministic=True)
        return _fused_sup_ce(p, mc, h, bd["action"], bd["valid"])

    def vg_only(p):
        _, g = jax.value_and_grad(loss_fused)(p)
        return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)

    rec("value_and_grad_fused", timed_scan(vg_only, params))

    # 3. forward only
    def fwd_only(p):
        l = loss_fused(p)
        return jax.tree.map(lambda a: a + 1e-12 * l, p)

    rec("forward_fused", timed_scan(fwd_only, params))

    # 4. backbone features only
    def feat_only(p):
        h = apply_features(p, mc, bd["state"], bd["true_len"],
                           dropout_rng=jax.random.key(0), deterministic=True)
        s = h.astype(jnp.float32).sum()
        return jax.tree.map(lambda a: a + 1e-12 * s, p)

    rec("backbone_features", timed_scan(feat_only, params))

    # 5. Adam update only: carry (params, opt_state, grads); next grads = the
    # updates tree, so iterations stay dependency-chained (adds one
    # g-tree write per step ~ +36MB vs the in-step Adam).
    g0 = jax.tree.map(jnp.ones_like, params)

    def adam_only(carry):
        p, os_, g = carry
        u, os2 = opt.update(g, os_, p)
        p2 = optax.apply_updates(p, u)
        return (p2, os2, jax.tree.map(lambda x: x * 0.999, u))

    rec("adam_update_chained(+1 write)", timed_scan(adam_only, (params, opt_state, g0)))

    # 6. dense-CE comparison arms
    from dataclasses import replace as dc_replace

    mc_dense = dc_replace(mc, fused_ce=False)

    def loss_dense(p):
        out = apply_model(p, mc_dense, bd["state"], bd["true_len"],
                          dropout_rng=jax.random.key(0), deterministic=True)
        logits = out[0]
        return _ce_loss(logits, bd["action"], bd["valid"])

    def vg_dense(p):
        _, g = jax.value_and_grad(loss_dense)(p)
        return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)

    try:
        rec("value_and_grad_dense", timed_scan(vg_dense, params))
    except Exception as e:  # pragma: no cover
        print(f"dense arm failed: {e}", file=sys.stderr)

    print("\n| component | us |")
    print("|---|---|")
    for name, us in rows:
        print(f"| {name} | {us:,.1f} |")


if __name__ == "__main__":
    main()
