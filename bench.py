"""Benchmark: GRU4Rec train-step throughput at the RetailRocket operating
point (SURVEY.md §6: catalog 70852, state_len 10, emb/hidden 64, batch 256)
on the attached TPU chip (v5e via the axon tunnel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``python bench.py --detail`` additionally rewrites BENCH_DETAIL.md with
per-family and kernel-on/off numbers.

MEASUREMENT METHODOLOGY (critical on this tunnel — docs/performance.md):
``block_until_ready`` on the axon backend returns before device execution
completes, so wall-clocking a stream of dispatches measures dispatch-queue
throughput, not compute. Round 1's recorded 2.44M sessions/s was exactly
that artifact (it implied 2.4TB/s of Adam traffic on an 0.82TB/s chip —
flagged in VERDICT r1). The honest protocol, used here:

- run K optimizer steps inside ONE jitted ``lax.scan`` (guaranteed
  sequential on device),
- force execution with a checksum readback that data-depends on the result,
- time two loop lengths and difference them, cancelling the ~26ms dispatch
  round-trip and the readback cost,
- best-of-trials against tunnel noise.

The reference publishes no throughput numbers (BASELINE.md) — vs_baseline
compares against the previous round's recorded result when present
(BENCH_r*.json), else 1.0. BENCH_r01.json predates this methodology fix;
the apparent ~10x drop vs r1 is the removal of a measurement artifact, not
a regression (BENCH_DETAIL.md).

HEADLINE ARM (r5): the headline measures ``preset: fast`` (bf16 head
matmuls + bf16 Adam moments), because r5's rehearsal-scale certification
campaign made it the production-recommended configuration: at catalog
~72k / 30 epochs it matched-or-beat the default arm's accuracy in every
tested family and pairing (gru4rec 0.4466 vs 0.4259 and the seed-1
re-pair 0.4469 vs 0.4230 val NDCG@10; smorl and sqn likewise —
RESULTS.md). Rounds 1-4 recorded the default (bf16x3 head + fp32 m/v)
arm, so BENCH_r05's vs_baseline mixes the arm change (~1.45x
within-process, BENCH_DETAIL.md) with tunnel drift (multi-10% across
windows — the r4 commit itself re-benched at 316.5k vs its 353.9k
artifact in the same afternoon). The default arm is still measured in
the same process and reported on stderr for the within-window A/B, and
in ``--detail``.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(model="gru4rec", batch=256, catalog=70852, state_len=10,
          emb=64, hidden=64, compute_dtype="float32", scan_impl="xla",
          fused_ce=True, mv_dtype=None, lazy=False, lazy_qh=False,
          head_precision="high"):
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.train.state import (
        make_double_q_state,
        make_lazy_double_q_state,
        make_lazy_sarm_state,
        make_lazy_train_state,
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
        head_precision=head_precision,
    )
    data_cfg = DataConfig(num_items=catalog)
    mc = model_config_from_train(train_cfg, data_cfg)
    if scan_impl != "xla":
        from dataclasses import replace

        mc = replace(mc, backbone=replace(mc.backbone, scan_impl=scan_impl))
    opt = make_optimizer(0.01, mv_dtype)
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
    step = make_train_step(
        mc, opt, rl, **aux, donate=True,
        lazy_embedding_lr=0.01 if lazy else None,
        lazy_qhead_lr=0.01 if lazy_qh else None,
    )
    if model in ("sqn", "smorl"):
        if lazy_qh or lazy:
            state, _ = make_lazy_double_q_state(
                jax.random.key(0), mc, 0.01, mv_dtype,
                lazy_emb=lazy, lazy_qh=lazy_qh,
            )
        else:
            state, _ = make_double_q_state(jax.random.key(0), mc, 0.01, mv_dtype)
    elif model == "sarm" and (lazy_qh or lazy):
        state, _ = make_lazy_sarm_state(
            jax.random.key(0), mc, 0.01, mv_dtype,
            lazy_emb=lazy, lazy_qh=lazy_qh,
        )
    elif lazy:
        state, _ = make_lazy_train_state(
            jax.random.key(0), mc, 0.01, mv_dtype
        )
    else:
        state, _ = make_train_state(jax.random.key(0), mc, 0.01, mv_dtype)
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


def _scan_loop(step, K):
    """K sequential optimizer steps in one program + checksum output."""

    def loop(state, batch, aux):
        def body(s, _):
            s, _m = step.raw(s, batch, aux)
            return s, None

        s, _ = jax.lax.scan(body, state, None, length=K)
        p = s.params[0] if isinstance(s.params, tuple) else s.params
        emb = p["backbone"]["embedding"]
        return emb.reshape(-1)[::8191].astype(jnp.float32).sum()

    return jax.jit(loop)


def _timed_readback(fn, *args, trials):
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        float(fn(*args))  # forces real device execution on the tunnel
        best = min(best, time.perf_counter() - t0)
    return best


def measure(step, state, batch, k1=4, k2=32, trials=4):
    """Honest steps/s via in-jit scan + readback differencing (see module
    docstring). Returns steps per second.

    Tunnel latency jitter is tens of ms; if the K2-K1 compute delta does not
    clearly dominate it (t2 not comfortably above t1, or a negative
    difference), the measurement is garbage — escalate the loop length until
    compute dominates rather than report noise (a run once produced a
    NEGATIVE µs/step this way)."""
    for _attempt in range(3):
        f1 = _scan_loop(step, k1)
        f2 = _scan_loop(step, k2)
        t1 = _timed_readback(f1, state, batch, step.aux, trials=trials)
        t2 = _timed_readback(f2, state, batch, step.aux, trials=trials)
        per_step = (t2 - t1) / (k2 - k1)
        if per_step > 0 and t2 > 1.15 * t1:
            return 1.0 / per_step
        k2 *= 3
        trials += 2
    raise RuntimeError(
        f"unmeasurable: compute delta never dominated tunnel noise "
        f"(last t1={t1:.4f}s t2={t2:.4f}s at k2={k2 // 3})"
    )


def previous_round_value(metric: str):
    best = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(path))
            rec = rec.get("parsed", rec)  # driver wraps the JSON line
            if rec.get("metric") == metric and rec.get("value"):
                best = rec["value"]
        except Exception:
            pass
    return best


def detail():
    """Per-family and kernel-on/off numbers -> BENCH_DETAIL.md (guards the
    fused-kernel wins; VERDICT r1 item 6). All arms in ONE process."""
    batch = 256
    rows = []
    arms = [
        ("gru4rec", dict(fused_ce=True), "fused CE, bf16x3 head (default)"),
        ("gru4rec", dict(head_precision="highest"), "fused CE, fp32 head"),
        ("gru4rec", dict(head_precision="default"), "fused CE, bf16 head"),
        ("gru4rec", dict(fused_ce=False), "dense CE"),
        ("gru4rec", dict(scan_impl="pallas"), "Pallas GRU scan (fused CE)"),
        ("gru4rec", dict(mv_dtype="bfloat16"), "bf16 Adam m/v (fused CE)"),
        ("gru4rec", dict(head_precision="default", mv_dtype="bfloat16"),
         "max-throughput (bf16 head + bf16 m/v)"),
        ("sqn", dict(fused_ce=True), "fused argmax+CE (default)"),
        ("sqn", dict(head_precision="highest"), "fused, fp32 head"),
        ("sqn", dict(fused_ce=False), "dense"),
        ("sqn", dict(lazy_qh=True), "lazy-column Q-head Adam"),
        ("sqn", dict(lazy_qh=True, mv_dtype="bfloat16",
                     head_precision="default"), "fast preset (lazy-qh arm)"),
        ("smorl", dict(fused_ce=True), "fused argmax (default)"),
        ("smorl", dict(head_precision="highest"), "fused, fp32 head"),
        ("smorl", dict(fused_ce=False), "dense"),
        ("smorl", dict(lazy_qh=True), "lazy-column Q-head Adam"),
        ("smorl", dict(lazy_qh=True, mv_dtype="bfloat16",
                       head_precision="default"), "fast preset (lazy-qh arm)"),
        ("sarm", dict(fused_ce=True), "fused CE+max (default)"),
        ("sarm", dict(head_precision="highest"), "fused, fp32 head"),
        ("sarm", dict(fused_ce=False), "dense"),
        ("sarm", dict(lazy_qh=True), "lazy-column Q-head Adam"),
        ("sarm", dict(lazy_qh=True, mv_dtype="bfloat16",
                      head_precision="default"), "fast preset (lazy-qh arm)"),
    ]
    for model, kw, label in arms:
        step, state, batch_d = build(model=model, batch=batch, **kw)
        sps = measure(step, state, batch_d)
        rows.append((model, label, sps * batch, 1e6 / sps))
        print(
            json.dumps(
                {
                    "model": model,
                    "arm": label,
                    "sessions_per_sec": round(sps * batch, 1),
                    "us_per_step": round(1e6 / sps, 1),
                }
            ),
            file=sys.stderr,
        )
    lines = [
        "## Generated full table (one process, one window)",
        "",
        "Single v5e chip via the axon tunnel; RetailRocket operating point",
        "(catalog 70852, batch 256, state_len 10, emb/hidden 64, fp32 params).",
        "All arms measured back-to-back in one process; tunnel noise means",
        "only within-table ratios are meaningful.",
        "",
        "| model | arm | sessions/s | µs/step |",
        "|---|---|---|---|",
    ]
    for model, label, sps, us in rows:
        lines.append(f"| {model} | {label} | {sps:,.0f} | {us:,.1f} |")
    # Replace only the generated section; the narrative notes above the
    # marker (drift analysis, within-process A/B records) are hand-written.
    path = os.path.join(os.path.dirname(__file__), "BENCH_DETAIL.md")
    marker = "<!-- generated-table -->"
    try:
        head = open(path).read().split(marker)[0].rstrip() + "\n\n"
    except FileNotFoundError:
        head = "# BENCH detail (honest scan+readback methodology — see bench.py)\n\n"
    with open(path, "w") as fh:
        fh.write(head + marker + "\n\n" + "\n".join(lines) + "\n")
    return rows


def main():
    if "--detail" in sys.argv:
        detail()
    batch = 256
    # r5 headline arm = the certified `fast` preset (see module docstring);
    # the default arm is measured in the SAME process for the within-window
    # ratio (the only cross-arm comparison the drifting tunnel supports).
    step, state, batch_d = build(
        batch=batch, head_precision="default", mv_dtype="bfloat16"
    )
    d_step, d_state, d_batch = build(batch=batch)
    # best-of-3 measurement windows: the shared tunnel drifts multi-10% on
    # minute scales, and the per-window best is the reproducible
    # chip-capability number (same rule as the roofline probes).
    steps_per_sec = max(measure(step, state, batch_d) for _ in range(3))
    default_sps = max(measure(d_step, d_state, d_batch) for _ in range(2))
    print(
        json.dumps(
            {
                "arm": "default (bf16x3 head + fp32 m/v) — same process",
                "sessions_per_sec": round(default_sps * batch, 1),
                "fast_vs_default": round(steps_per_sec / default_sps, 3),
            }
        ),
        file=sys.stderr,
    )
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
