"""Decompose the in-loop vs microbench throughput gap (VERDICT r4 weak-4).

The r5 trainer instrumentation proved the gap lives in device execution
(`sync` = 99.3% of train wall-clock; idx build + uploads + dispatch <1% —
RESULTS.md). This A/B isolates the remaining suspects WITHIN one process on
the real chip, with bench.py's honest scan+readback methodology (the
checksum reads BOTH the train state and the metric accumulator — an
accumulator left out of the checksum gets dead-code-eliminated):

  A. bare train step (what bench.py / BENCH_DETAIL.md measure)
  B. the run_window body: train step + EvalProtocol._batch_update — the
     per-batch TRAIN-metric accumulation (top-20 over the full catalog +
     div/nov rewards + coverage scatter) the trainer runs on every batch,
     mirroring the reference's per-batch train metrics
     (reference trainGRU.py:385-395).

Run: python scripts/ab_inloop_accum.py [--family sqn] [--catalog 72475]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build  # noqa: E402  (the honest harness's step builder)


def _checksum_state(s):
    p = s.params[0] if isinstance(s.params, tuple) else s.params
    return p["backbone"]["embedding"].reshape(-1)[::8191].astype(jnp.float32).sum()


def _checksum_accum(acc):
    return sum(
        jnp.sum(jnp.asarray(x).astype(jnp.float32).reshape(-1)[::127])
        for x in jax.tree.leaves(acc)
    )


def _diff_measure(make_loop, run_args, k1=4, k2=32, trials=4):
    """Seconds per iteration via two loop lengths + readback differencing,
    escalating until compute dominates tunnel jitter (bench.measure)."""
    for _ in range(3):
        f1, f2 = make_loop(k1), make_loop(k2)

        def timed(fn):
            best = float("inf")
            for _t in range(trials):
                t0 = time.perf_counter()
                float(fn(*run_args))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = timed(f1), timed(f2)
        per = (t2 - t1) / (k2 - k1)
        if per > 0 and t2 > 1.15 * t1:
            return per
        k2 *= 3
        trials += 2
    raise RuntimeError(f"unmeasurable (t1={t1:.4f} t2={t2:.4f})")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", default="sqn")
    ap.add_argument("--catalog", type=int, default=72475)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--eval-precision", default=None,
                    choices=[None, "highest", "high", "default"],
                    help="MXU precision of the accumulation's head pass "
                         "(None = exact-fp32 parity default)")
    args = ap.parse_args()

    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.eval.protocol import EvalProtocol
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.run.trainer import _eval_params_list

    step, state, batch_d = build(
        model=args.family, batch=args.batch, catalog=args.catalog
    )

    tc = TrainConfig(
        model=args.family, batch_size=args.batch, embedding_size=64,
        hidden_state_size=64, state_size=10, learning_rate=0.01,
    )
    model_cfg = model_config_from_train(tc, DataConfig(num_items=args.catalog))
    rs = np.random.RandomState(0)
    protocol = EvalProtocol(
        model_cfg,
        topk_hr_ndcg=[10, 20],
        topk_cov=[1, 5, 10, 20],
        topk_div=1,
        topk_nov=1,
        div_embedding=jnp.asarray(
            rs.randn(args.catalog + 1, 64).astype(np.float32)
        ),
        unpopular_mask=jnp.asarray(np.arange(args.catalog) % 5 == 0),
        eval_precision=args.eval_precision,
    )

    # ---- arm A: bare step (state-only checksum) --------------------------
    def loop_a(K):
        def run(state, batch, aux):
            def body(s, _):
                s, _m = step.raw(s, batch, aux)
                return s, None

            s, _ = jax.lax.scan(body, state, None, length=K)
            return _checksum_state(s)

        return jax.jit(run)

    per_a = _diff_measure(loop_a, (state, batch_d, step.aux))

    # ---- arm B: step + train-metric accumulation, accum in the carry -----
    proto_aux = protocol._aux
    accum0 = protocol.init_accum()

    def loop_b(K):
        def run(state, accum, batch, aux, paux):
            def body(carry, _):
                s, acc = carry
                s, _m = step.raw(s, batch, aux)
                params = _eval_params_list(s, args.family)[0]
                acc = protocol._batch_update(
                    params, acc, batch["state"], batch["action"],
                    batch["true_len"], batch["valid"], paux, None,
                )
                return (s, acc), None

            (s, acc), _ = jax.lax.scan(
                body, (state, accum), None, length=K
            )
            # 1e-12 (NOT 0.0 — XLA would constant-fold the whole
            # accumulation away) keeps the accum data-dependency alive
            return _checksum_state(s) + 1e-12 * _checksum_accum(acc)

        return jax.jit(run)

    # fresh state so arm A's trained buffers don't alias donated memory
    _, state_b, _ = build(
        model=args.family, batch=args.batch, catalog=args.catalog
    )
    per_b = _diff_measure(
        loop_b, (state_b, accum0, batch_d, step.aux, proto_aux)
    )

    out = {
        "family": args.family,
        "catalog": args.catalog,
        "step_only_us": round(per_a * 1e6, 1),
        "step_plus_train_metrics_us": round(per_b * 1e6, 1),
        "step_only_sessions_per_sec": round(args.batch / per_a),
        "in_loop_body_sessions_per_sec": round(args.batch / per_b),
        "train_metrics_overhead_x": round(per_b / per_a, 2),
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
