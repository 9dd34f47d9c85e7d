"""Same-process A/B of the evaluation pass: dense (B, A) logits vs the
fused blockwise head+top-k+CE scan (ops/fused_topk.py), at the RetailRocket
operating point (A=70852, val batch 5000 — reference
``evaluate/eval_protocol.py:173-233`` is the hotspot being replaced).

Prints one JSON line per arm. Best-of-trials (the attached TPU tunnel has
multi-x run-to-run noise; only same-process comparisons are meaningful).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.eval.protocol import EvalProtocol
from ikea_recommender_tpu.models.families import init_model, model_config_from_train


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", type=int, default=70852)
    ap.add_argument("--rows", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=5000)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--arms", default="dense,fused")
    args = ap.parse_args()

    A, T = args.catalog, 10
    tc = TrainConfig(embedding_size=64, hidden_state_size=64, state_size=T)
    mc = model_config_from_train(tc, DataConfig(num_items=A))
    params = init_model(jax.random.key(0), mc)
    rs = np.random.RandomState(0)
    data = {
        "state": jnp.asarray(rs.randint(0, A, (args.rows, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (args.rows,)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (args.rows,)), jnp.int32),
    }
    kw = dict(
        topk_hr_ndcg=(10, 20),
        topk_cov=(1, 5, 10),
        topk_div=1,
        topk_nov=1,
        div_embedding=jnp.asarray(rs.randn(A + 1, 64).astype(np.float32)),
        unpopular_mask=jnp.asarray(np.arange(A) % 10 == 0),
    )

    results = {}
    for arm in args.arms.split(","):
        proto = EvalProtocol(mc, fused=(arm == "fused"), **kw)
        res = proto.evaluate_device(params, data, args.batch)  # compile+warm
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            res = proto.evaluate_device(params, data, args.batch)
            best = min(best, time.perf_counter() - t0)
        results[arm] = (best, res)
        print(
            json.dumps(
                {
                    "metric": f"eval_pass_{arm}_rows_per_sec",
                    "value": round(args.rows / best, 1),
                    "unit": "rows/s",
                    "pass_ms": round(best * 1e3, 2),
                    "hr10": round(float(res.hr[0]), 6),
                    "loss": round(float(res.loss), 4),
                }
            )
        )
    if len(results) == 2:
        d, f = results["dense"][0], results["fused"][0]
        # random params: HR ~ chance; the check is dense == fused semantics
        same = np.array_equal(results["dense"][1].hr, results["fused"][1].hr)
        print(json.dumps({"fused_speedup": round(d / f, 3), "hr_equal": bool(same)}))


if __name__ == "__main__":
    main()
