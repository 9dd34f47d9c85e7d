"""End-to-end training runs on synthetic data: every family learns, the
best-model tracker + test path work, resume restores state."""

import json
import os

import numpy as np
import pytest

from ikea_recommender_tpu.core.config import (
    Config,
    DataConfig,
    ExperimentConfig,
    MetricsConfig,
    TrainConfig,
)
from ikea_recommender_tpu.data.synthetic import synthetic_buffers
from ikea_recommender_tpu.run.trainer import train

A = 30


def _cfg(tmp_path, model="gru4rec", epochs=2, **train_kw):
    return Config(
        experiment=ExperimentConfig(seed=0, save_pretrained_embeddings=True),
        data=DataConfig(num_items=A),
        train=TrainConfig(
            model=model,
            batch_size=32,
            val_batch_size=64,
            epochs=epochs,
            learning_rate=0.01,
            embedding_size=16,
            hidden_state_size=16,
            state_size=6,
            best_model_metric="Val_NDCG@10",
            eval_at=[0.5, 1.0],
            q_weights=[1.0, 1.0, 1.0],
            **train_kw,
        ),
        metrics=MetricsConfig(
            topk_cov=[1, 5], topk_hr_ndcg=[5, 10], topk_div=1, topk_nov=1
        ),
        exp_dir=str(tmp_path),
    )


def _buffers():
    train_buf, _ = synthetic_buffers(
        num_sessions=150, num_items=A, state_len=6, seed=1
    )
    val_train, val_buf = synthetic_buffers(
        num_sessions=40, num_items=A, state_len=6, seed=2
    )
    return train_buf, val_buf


def test_gru4rec_learns_successor_process(tmp_path):
    cfg = _cfg(tmp_path)
    train_buf, val_buf = _buffers()
    out = train(cfg, train_buf=train_buf, val_buf=val_buf)
    # The successor process is learnable: NDCG@10 should clear chance easily.
    assert out.best_metric > 0.3
    first_hr = out.logs[0]["Val_HR@10"]
    last_hr = out.logs[-1]["Val_HR@10"]
    assert last_hr >= first_hr
    # artifacts
    assert os.path.exists(os.path.join(str(tmp_path), "best_model.npz"))
    assert os.path.exists(os.path.join(str(tmp_path), "test_metrics.json"))
    assert os.path.exists(os.path.join(str(tmp_path), "embedding_weights.npy"))
    emb = np.load(os.path.join(str(tmp_path), "embedding_weights.npy"))
    assert emb.shape == (A + 1, 16)
    # test metrics use Best_Val prefix when test==val
    assert any(k.startswith("Best_Val") for k in out.test_metrics)


@pytest.mark.parametrize("model", ["sqn", "smorl"])
def test_double_q_families_run_and_learn(tmp_path, model):
    cfg = _cfg(tmp_path, model=model, epochs=2)
    train_buf, val_buf = _buffers()
    rs = np.random.RandomState(0)
    div_emb = rs.randn(A + 1, 16).astype(np.float32)
    out = train(
        cfg,
        train_buf=train_buf,
        val_buf=val_buf,
        div_embedding=div_emb,
        unpopular=set(range(0, A, 3)),
    )
    assert out.best_metric > 0.2
    # Sec_ prefixed second-net metrics logged
    assert any(k.startswith("Sec_") for k in out.logs[-1])
    meta = json.load(open(os.path.join(str(tmp_path), "best_model.json")))
    assert meta["model_idx"] in (1, 2)


def test_smorl_without_div_embedding_warns_or_raises(tmp_path):
    """SMORL with no frozen diversity embedding has a dead third objective
    (div reward ≡ 0, r4 VERDICT missing-2). The trainer must be loud about
    it — warn by default, refuse under metrics.require_div_emb."""
    train_buf, val_buf = _buffers()
    cfg = _cfg(tmp_path / "warn", model="smorl", epochs=1)
    with pytest.warns(RuntimeWarning, match="no diversity embedding"):
        out = train(cfg, train_buf=train_buf, val_buf=val_buf,
                    unpopular=set(range(0, A, 3)))
    assert out.logs[-1]["Val_Div_Reward"] == 0.0  # the warned-about fact
    cfg2 = _cfg(tmp_path / "strict", model="smorl", epochs=1)
    cfg2.metrics.require_div_emb = True
    with pytest.raises(ValueError, match="no diversity embedding"):
        train(cfg2, train_buf=train_buf, val_buf=val_buf,
              unpopular=set(range(0, A, 3)))


def test_sqn_single_optimizer_runs_and_learns(tmp_path):
    """double_q_optimizers=1 (shared-Adam ablation arm) trains end-to-end
    through the trainer/config surface (experiments/Ablations/SQN-1optimizer)."""
    cfg = _cfg(tmp_path, model="sqn", epochs=2, double_q_optimizers=1)
    train_buf, val_buf = _buffers()
    out = train(cfg, train_buf=train_buf, val_buf=val_buf)
    assert out.best_metric > 0.2


def test_sarm_and_bidir_run(tmp_path):
    for model in ("sarm", "bidir_gru4rec"):
        cfg = _cfg(tmp_path, model=model, epochs=1)
        train_buf, val_buf = _buffers()
        out = train(cfg, train_buf=train_buf, val_buf=val_buf)
        assert np.isfinite(out.best_metric)


def test_resume_from_checkpoint(tmp_path):
    ckpt_dir = str(tmp_path / "ckpt")
    cfg = _cfg(tmp_path, epochs=1, checkpoint_dir=ckpt_dir)
    train_buf, val_buf = _buffers()
    out1 = train(cfg, train_buf=train_buf, val_buf=val_buf)
    # Second run resumes at epoch 1 and extends to 2 epochs.
    cfg2 = _cfg(tmp_path, epochs=2, checkpoint_dir=ckpt_dir, resume=True)
    out2 = train(cfg2, train_buf=train_buf, val_buf=val_buf)
    assert np.isfinite(out2.best_metric)
    # The best-model tracker rides in the checkpoint: the resumed run's
    # comparator starts at the leg-1 best, not -inf, so the whole-run best
    # can only improve monotonically across the interruption.
    assert out2.best_metric >= out1.best_metric
    # And a resumed run with NO further improvement still ships leg-1's
    # best params/metric (reference utils/save_best_model.py semantics).
    cfg3 = _cfg(tmp_path / "leg3", epochs=2, checkpoint_dir=ckpt_dir, resume=True)
    out3 = train(cfg3, train_buf=train_buf, val_buf=val_buf)
    assert out3.best_metric >= out2.best_metric
    if out3.best_epoch == out2.best_epoch:
        assert out3.best_metric == out2.best_metric


def test_resume_equals_uninterrupted_best(tmp_path):
    """Kill-and-resume (single-process): the resumed run reports the SAME
    whole-run best metric/epoch as an uninterrupted run — the r4 rehearsal
    bug (resume reset the tracker, shipping the final-epoch model instead
    of the whole-run best) stays fixed."""
    train_buf, val_buf = _buffers()
    # Uninterrupted 3-epoch run.
    cfg_full = _cfg(tmp_path / "full", epochs=3)
    out_full = train(cfg_full, train_buf=train_buf, val_buf=val_buf)
    # Interrupted: 2 epochs, then resume to 3.
    ckpt_dir = str(tmp_path / "ckpt")
    cfg_a = _cfg(tmp_path / "legA", epochs=2, checkpoint_dir=ckpt_dir)
    train(cfg_a, train_buf=train_buf, val_buf=val_buf)
    cfg_b = _cfg(tmp_path / "legB", epochs=3, checkpoint_dir=ckpt_dir, resume=True)
    out_b = train(cfg_b, train_buf=train_buf, val_buf=val_buf)
    np.testing.assert_allclose(out_b.best_metric, out_full.best_metric, rtol=1e-6)
    assert out_b.test_metrics == out_full.test_metrics


def test_raw_val_file_eval_path(tmp_path):
    """val_path may point at a RAW session file (reference
    evaluate/eval_dataset.py): the trainer windows it in memory and the
    metrics equal a run on the equivalent prebuilt eval buffer."""
    import pandas as pd

    from ikea_recommender_tpu.data.preprocessing import preprocess_val_data
    from ikea_recommender_tpu.data.replay_buffer import EvalBuffer

    train_buf, _ = _buffers()
    rs = np.random.RandomState(5)
    rows = []
    for s in range(30):
        for item in rs.randint(0, A, size=rs.randint(2, 8)):
            rows.append((s, int(item)))
    raw = pd.DataFrame(rows, columns=["session_id", "item_id"])
    raw_path = str(tmp_path / "raw_val.df")
    raw.to_pickle(raw_path)

    cfg_raw = _cfg(tmp_path / "raw", epochs=1)
    cfg_raw.data.val_path = raw_path
    out_raw = train(cfg_raw, train_buf=train_buf)

    win = preprocess_val_data(raw, padding_id=A, state_len=6, pad_pos="end")
    cfg_buf = _cfg(tmp_path / "buf", epochs=1)
    out_buf = train(
        cfg_buf, train_buf=train_buf, val_buf=EvalBuffer.from_dataframe(win)
    )
    assert out_raw.test_metrics == out_buf.test_metrics


def test_train_metrics_off_speed_lever(tmp_path):
    """metrics.train_metrics=false skips the per-batch train-metric
    accumulation: Train_* keys log 0, Val/Test metrics and the best-model
    selection are IDENTICAL (the accumulation never feeds the optimizer)."""
    train_buf, val_buf = _buffers()
    on = train(_cfg(tmp_path / "on", epochs=1), train_buf=train_buf, val_buf=val_buf)
    cfg_off = _cfg(tmp_path / "off", epochs=1)
    cfg_off.metrics.train_metrics = False
    off = train(cfg_off, train_buf=train_buf, val_buf=val_buf)
    assert off.logs[-1]["Train_HR@10"] == 0.0
    assert on.logs[-1]["Train_HR@10"] > 0.0
    for k in ("Val_HR@10", "Val_NDCG@10", "Supervised Train Loss"):
        np.testing.assert_allclose(off.logs[-1][k], on.logs[-1][k], rtol=1e-6)
    np.testing.assert_allclose(off.best_metric, on.best_metric, rtol=1e-6)
