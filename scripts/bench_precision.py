"""A/B the head-matmul MXU precision on the real chip.

The step-decomposition profile (scripts/profile_step.py) showed the fused-CE
forward+backward at Precision.HIGHEST (6-pass fp32 emulation) is ~73% of the
gru4rec step. This measures value_and_grad of the fused CE loss at
highest/high/default, plus the full step at each, and prints max |loss delta|
on one batch so the numerics cost is visible next to the speed.

Run: python scripts/bench_precision.py
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import build, measure  # noqa: E402
from scripts.profile_step import timed_scan  # noqa: E402


def main():
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.models.families import (
        apply_features,
        model_config_from_train,
    )
    from ikea_recommender_tpu.ops.fused_ce import fused_softmax_ce
    from ikea_recommender_tpu.train.steps import _masked_mean

    batch = 256
    _, state, bd = build(batch=batch, fused_ce=True)
    mc = model_config_from_train(
        TrainConfig(model="gru4rec", batch_size=batch, embedding_size=64,
                    hidden_state_size=64, state_size=10, learning_rate=0.01,
                    fused_ce=True),
        DataConfig(num_items=70852),
    )
    params = state.params

    def loss_at(p, prec):
        h = apply_features(p, mc, bd["state"], bd["true_len"],
                           dropout_rng=jax.random.key(0), deterministic=True)
        head = p["sup_head"]
        per = fused_softmax_ce(
            h.astype(jnp.float32), head["kernel"], head["bias"],
            bd["action"], mc.action_dim, prec,
        )
        return _masked_mean(per, bd["valid"])

    ref_loss = float(jax.jit(lambda p: loss_at(p, "highest"))(params))
    for prec in ("highest", "high", "default"):
        def vg(p, prec=prec):
            _, g = jax.value_and_grad(lambda q: loss_at(q, prec))(p)
            return jax.tree.map(lambda a, b: a + 1e-12 * b, p, g)

        us = timed_scan(vg, params) * 1e6
        loss = float(jax.jit(lambda p: loss_at(p, prec))(params))
        print(json.dumps({
            "arm": f"value_and_grad/{prec}",
            "us": round(us, 1),
            "loss": loss,
            "loss_delta_vs_highest": loss - ref_loss,
        }))


if __name__ == "__main__":
    main()
