"""Benchmark: GRU4Rec train-step throughput at the RetailRocket operating
point (SURVEY.md §6: catalog 70852, state_len 10, emb/hidden 64, batch 256)
on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md) — vs_baseline
compares against the previous round's recorded result when present
(BENCH_r*.json), else 1.0.
"""

from __future__ import annotations

import glob
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(model="gru4rec", batch=256, catalog=70852, state_len=10,
          emb=64, hidden=64, compute_dtype="float32", scan_impl="pallas",
          fused_ce=True):
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.train.state import (
        make_double_q_state,
        make_optimizer,
        make_train_state,
    )
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

    train_cfg = TrainConfig(
        model=model,
        batch_size=batch,
        embedding_size=emb,
        hidden_state_size=hidden,
        state_size=state_len,
        learning_rate=0.01,
        compute_dtype=compute_dtype,
        fused_ce=fused_ce,
    )
    data_cfg = DataConfig(num_items=catalog)
    mc = model_config_from_train(train_cfg, data_cfg)
    if scan_impl != "xla":
        from dataclasses import replace

        mc = replace(mc, backbone=replace(mc.backbone, scan_impl=scan_impl))
    opt = make_optimizer(0.01)
    rl = RLStepConfig()
    rs = np.random.RandomState(0)
    aux = {}
    if model == "smorl":
        aux = {
            "div_embedding": jnp.asarray(
                rs.randn(catalog + 1, emb).astype(np.float32)
            ),
            "unpopular_mask": jnp.asarray(np.arange(catalog) % 10 == 0),
        }
    step = make_train_step(mc, opt, rl, **aux, donate=True)
    if model in ("sqn", "smorl"):
        state, _ = make_double_q_state(jax.random.key(0), mc, 0.01)
    else:
        state, _ = make_train_state(jax.random.key(0), mc, 0.01)
    batch_d = {
        "state": jnp.asarray(rs.randint(0, catalog, (batch, state_len)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, catalog, (batch,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(batch).astype(np.float32)),
        "next_state": jnp.asarray(
            rs.randint(0, catalog, (batch, state_len)), jnp.int32
        ),
        "true_len": jnp.asarray(rs.randint(1, state_len + 1, (batch,)), jnp.int32),
        "true_next_len": jnp.asarray(
            rs.randint(1, state_len + 1, (batch,)), jnp.int32
        ),
        "is_end": jnp.asarray(rs.rand(batch) < 0.2),
        "valid": jnp.ones((batch,), bool),
    }
    return step, state, batch_d


def measure(step, state, batch, warmup=10, iters=100, trials=5):
    """Best-of-trials steps/s: the attached TPU rides a shared tunnel with
    multi-x run-to-run noise; min-time is the standard robust estimator for
    a deterministic workload under additive interference."""
    for _ in range(warmup):
        state, m = step(state, batch)
    jax.block_until_ready((state, m))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, batch)
        jax.block_until_ready((state, m))
        best = min(best, (time.perf_counter() - t0) / iters)
    return 1.0 / best


def previous_round_value(metric: str):
    best = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(path))
            if rec.get("metric") == metric and rec.get("value"):
                best = rec["value"]
        except Exception:
            pass
    return best


def main():
    batch = 256
    step, state, batch_d = build(batch=batch)
    steps_per_sec = measure(step, state, batch_d)
    sessions_per_sec = steps_per_sec * batch
    metric = "gru4rec_train_sessions_per_sec"
    prev = previous_round_value(metric)
    vs = sessions_per_sec / prev if prev else 1.0
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(sessions_per_sec, 1),
                "unit": "sessions/s",
                "vs_baseline": round(vs, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
