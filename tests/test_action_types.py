"""Per-action-type HR/NDCG (metrics.action_type_names) — the old
generation's capability (reference old/sqn_evaluation_old.py +
old/logging_old.py), now reachable from the config end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.core.config import (
    Config,
    DataConfig,
    ExperimentConfig,
    MetricsConfig,
    TrainConfig,
)
from ikea_recommender_tpu.data.replay_buffer import EvalBuffer, ReplayBuffer
from ikea_recommender_tpu.data.synthetic import synthetic_buffers
from ikea_recommender_tpu.run.trainer import train

A = 24


def test_by_type_kernel_matches_reference_semantics():
    """Golden check vs the reference's masked-subset computation
    (old/sqn_evaluation_old.py:173-199): per-type sums == sums over the
    type's rows; total == sum over types."""
    from ikea_recommender_tpu.ops.ranking import (
        hr_ndcg_at_k,
        hr_ndcg_by_action_type,
    )

    rs = np.random.RandomState(0)
    B, n_act = 40, 30
    preds = jnp.asarray(rs.randn(B, n_act).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, n_act, (B,)))
    types = jnp.asarray(rs.randint(0, 2, (B,)))
    ks = (5, 10)

    hits, ndcg, counts = hr_ndcg_by_action_type(preds, labels, types, 2, ks)
    for t in (0, 1):
        mask = np.asarray(types) == t
        h_ref, n_ref = hr_ndcg_at_k(
            preds[mask], labels[np.asarray(mask)], ks
        )
        np.testing.assert_allclose(np.asarray(hits)[t], np.asarray(h_ref))
        np.testing.assert_allclose(np.asarray(ndcg)[t], np.asarray(n_ref), rtol=1e-6)
        assert int(counts[t]) == int(mask.sum())
    # total = sum over types = the standard kernel on the full batch
    h_all, n_all = hr_ndcg_at_k(preds, labels, ks)
    np.testing.assert_allclose(np.asarray(hits).sum(0), np.asarray(h_all))
    np.testing.assert_allclose(np.asarray(ndcg).sum(0), np.asarray(n_all), rtol=1e-6)


def _typed_buffers(seed=1):
    train_buf, _ = synthetic_buffers(num_sessions=80, num_items=A, state_len=5, seed=seed)
    _, val_buf = synthetic_buffers(num_sessions=30, num_items=A, state_len=5, seed=seed + 1)
    rs = np.random.RandomState(seed)
    train_buf.action_type = (rs.rand(len(train_buf)) < 0.3).astype(np.int32)
    val_buf.action_type = (rs.rand(len(val_buf)) < 0.3).astype(np.int32)
    return train_buf, val_buf


def test_e2e_by_type_logging(tmp_path):
    cfg = Config(
        experiment=ExperimentConfig(seed=0),
        data=DataConfig(num_items=A),
        train=TrainConfig(
            model="gru4rec",
            batch_size=16,
            val_batch_size=32,
            epochs=1,
            embedding_size=8,
            hidden_state_size=8,
            state_size=5,
            best_model_metric="Val_NDCG@10",
            eval_at=[1.0],
        ),
        metrics=MetricsConfig(
            topk_cov=[1, 5],
            topk_hr_ndcg=[5, 10],
            action_type_names=["click", "buy"],
        ),
        exp_dir=str(tmp_path),
    )
    train_buf, val_buf = _typed_buffers()
    out = train(cfg, train_buf=train_buf, val_buf=val_buf)
    log = out.logs[-1]
    for key in (
        "Val_HR@10[Click]", "Val_HR@10[Buy]", "Val_HR@10[Total]",
        "Val_NDCG@5[Click]", "Train_HR@10[Buy]",
    ):
        assert key in log, sorted(k for k in log if "[" in k)
    # [Total] equals the standard key
    np.testing.assert_allclose(log["Val_HR@10[Total]"], log["Val_HR@10"])
    # test metrics carry the suffixed keys too
    assert any("[Click]" in k for k in out.test_metrics)

    # weighted combination of per-type HRs reproduces the total
    n_click = sum(
        1 for t in val_buf.action_type if t == 0
    )
    n_buy = len(val_buf) - n_click
    mix = (
        log["Val_HR@10[Click]"] * n_click + log["Val_HR@10[Buy]"] * n_buy
    ) / len(val_buf)
    np.testing.assert_allclose(mix, log["Val_HR@10"], rtol=1e-6)


def test_buffer_roundtrip_with_action_type(tmp_path):
    train_buf, val_buf = _typed_buffers()
    p = tmp_path / "train.npz"
    train_buf.save_npz(str(p))
    back = ReplayBuffer(str(p))
    np.testing.assert_array_equal(back.action_type, train_buf.action_type)
    ev = EvalBuffer.from_replay_buffer(back)
    assert ev.action_type is not None
    pe = tmp_path / "val.npz"
    ev.save_npz(str(pe))
    np.testing.assert_array_equal(
        EvalBuffer(str(pe)).action_type, ev.action_type
    )


def test_jsonl_with_action_type_falls_back_to_pandas(tmp_path):
    # the native parser doesn't know action_type; the loader must return the
    # full column set via pandas rather than a silently-partial result
    import pandas as pd

    rs = np.random.RandomState(0)
    n = 20
    df = pd.DataFrame(
        {
            "state": [rs.randint(0, 9, 4).tolist() for _ in range(n)],
            "action": rs.randint(0, 9, n),
            "r_act": rs.rand(n),
            "next_state": [rs.randint(0, 9, 4).tolist() for _ in range(n)],
            "true_state_len": rs.randint(1, 5, n),
            "true_next_state_len": rs.randint(1, 5, n),
            "is_end": rs.rand(n) < 0.3,
            "action_type": rs.randint(0, 2, n),
        }
    )
    p = tmp_path / "buf.jsonl"
    p.write_text(df.to_json(orient="records", lines=True))
    buf = ReplayBuffer(str(p))
    np.testing.assert_array_equal(buf.action_type, df["action_type"].to_numpy())
