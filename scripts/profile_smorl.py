"""Decompose the SMORL fused train step on the real chip.

After the round-3 lean path (single-pass CE+top-k, (net0, net1) layout) the
whole step measures ~3.6ms at the RetailRocket point; the naive component
sum (3 backbone fwds + 1 bwd + kernels + Adam) predicts ~2ms. This script
measures each component in isolation with the honest scan+readback
differencing so the gap is attributable, not guessed at.

Run: python scripts/profile_smorl.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build  # noqa: E402


def timed_scan(fn, init, K1=4, K2=32, trials=4):
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

    def best(f):
        b = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(f(init))
            b = min(b, time.perf_counter() - t0)
        return b

    for _ in range(3):
        f1 = jax.jit(lambda c: loop(c, K1))
        f2 = jax.jit(lambda c: loop(c, K2))
        t1, t2 = best(f1), best(f2)
        per = (t2 - t1) / (K2 - K1)
        if per > 0 and t2 > 1.15 * t1:
            return per
        K2 *= 3
        trials += 1
    raise RuntimeError("unmeasurable")


def main():
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.models.families import (
        apply_features,
        model_config_from_train,
    )
    from ikea_recommender_tpu.ops.fused_argmax import (
        fused_weighted_multihead_argmax,
        multihead_row_logit,
    )
    from ikea_recommender_tpu.ops.fused_ce import fused_softmax_ce_topk

    batch = 256
    step, state, bd = build(model="smorl", batch=batch)
    mc = model_config_from_train(
        TrainConfig(model="smorl", batch_size=batch, embedding_size=64,
                    hidden_state_size=64, state_size=10, learning_rate=0.01,
                    fused_ce=True),
        DataConfig(num_items=70852),
    )
    p_main = state.params[0]
    w = jnp.ones((3,), jnp.float32)

    def rec(name, sec):
        print(json.dumps({"component": name, "us": round(sec * 1e6, 1)}))

    def full(carry):
        s, b = carry
        s2, _ = step.raw(s, b, step.aux)
        return (s2, b)

    rec("full_step", timed_scan(full, (state, bd)))

    def chain(p, scalar):
        return jax.tree.map(lambda a: a + 1e-12 * scalar, p)

    def feat_one(p):
        h = apply_features(p, mc, bd["state"], bd["true_len"])
        return chain(p, h.astype(jnp.float32).sum())

    rec("backbone_fwd_x1", timed_scan(feat_one, p_main))

    def ce_topk_fwd(p):
        h = jax.lax.stop_gradient(
            apply_features(p, mc, bd["state"], bd["true_len"])
        )
        ce, _ = fused_softmax_ce_topk(
            h.astype(jnp.float32), p["sup_head"]["kernel"],
            p["sup_head"]["bias"], bd["action"], 12, mc.action_dim, "high",
        )
        return chain(p, ce.sum())

    rec("ce_topk_fwd_only(+1fwd)", timed_scan(ce_topk_fwd, p_main))

    def ce_topk_grad(p):
        def loss(p):
            h = apply_features(p, mc, bd["state"], bd["true_len"])
            ce, _ = fused_softmax_ce_topk(
                h.astype(jnp.float32), p["sup_head"]["kernel"],
                p["sup_head"]["bias"], bd["action"], 12, mc.action_dim,
                "high",
            )
            return ce.mean()

        _, g = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)

    rec("ce_topk_value_and_grad", timed_scan(ce_topk_grad, p_main))

    def argmax_kernel(p):
        h = jax.lax.stop_gradient(
            apply_features(p, mc, bd["next_state"], bd["true_next_len"])
        )
        a = fused_weighted_multihead_argmax(
            h, p["q_heads"]["kernel"], p["q_heads"]["bias"], w,
            mc.action_dim, "high",
        )
        return chain(p, a.astype(jnp.float32).sum())

    rec("weighted_argmax(+1fwd)", timed_scan(argmax_kernel, p_main))

    def row_logits(p):
        h = jax.lax.stop_gradient(
            apply_features(p, mc, bd["state"], bd["true_len"])
        )
        q = multihead_row_logit(
            h, p["q_heads"]["kernel"], p["q_heads"]["bias"], bd["action"]
        )
        return chain(p, q.sum())

    rec("row_logit(+1fwd)", timed_scan(row_logits, p_main))

    import optax

    opt = optax.adam(0.01)
    os_ = opt.init(p_main)

    def adam_only(carry):
        p, o, g = carry
        u, o2 = opt.update(g, o, p)
        p2 = optax.apply_updates(p, u)
        return (p2, o2, jax.tree.map(lambda x: x * 0.999, u))

    g0 = jax.tree.map(jnp.ones_like, p_main)
    rec("adam_one_net(+chain)", timed_scan(adam_only, (p_main, os_, g0)))


if __name__ == "__main__":
    main()
