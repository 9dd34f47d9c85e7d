"""bf16-moment Adam (optimizer_mv_dtype) vs fp32 Adam: single-step math is
near-identical (moments start at 0 and the first update is sign(g)-scaled),
and a full training run reaches the same quality on the synthetic process."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ikea_recommender_tpu.train.state import make_optimizer


def test_single_update_close_to_fp32_adam():
    rs = np.random.RandomState(0)
    params = {
        "w": jnp.asarray(rs.randn(32, 16).astype(np.float32)),
        "b": jnp.asarray(rs.randn(16).astype(np.float32)),
    }
    grads = jax.tree.map(lambda p: jnp.asarray(rs.randn(*p.shape), jnp.float32), params)

    ref = make_optimizer(0.01)
    got = make_optimizer(0.01, "bfloat16")
    ro, go = ref.init(params), got.init(params)
    for _ in range(5):
        ru, ro = ref.update(grads, ro, params)
        gu, go = got.update(grads, go, params)
    for k in params:
        np.testing.assert_allclose(
            np.asarray(gu[k]), np.asarray(ru[k]), rtol=2e-2, atol=2e-4
        )
    # moments really are stored in bf16
    mu = go[0].mu if isinstance(go, tuple) else go.mu
    assert mu["w"].dtype == jnp.bfloat16


def test_e2e_bf16_mv_reaches_same_quality(tmp_path):
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

    def cfg(exp_dir, mv):
        return Config(
            experiment=ExperimentConfig(seed=0),
            data=DataConfig(num_items=A),
            train=TrainConfig(
                model="gru4rec",
                batch_size=32,
                val_batch_size=64,
                epochs=2,
                learning_rate=0.01,
                embedding_size=16,
                hidden_state_size=16,
                state_size=6,
                best_model_metric="Val_NDCG@10",
                eval_at=[1.0],
                optimizer_mv_dtype=mv,
            ),
            metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5, 10]),
            exp_dir=str(exp_dir),
        )

    train_buf, _ = synthetic_buffers(num_sessions=150, num_items=A, state_len=6, seed=1)
    _, val_buf = synthetic_buffers(num_sessions=40, num_items=A, state_len=6, seed=2)
    ref = train(cfg(tmp_path / "fp32", None), train_buf=train_buf, val_buf=val_buf)
    got = train(cfg(tmp_path / "bf16", "bfloat16"), train_buf=train_buf, val_buf=val_buf)
    assert got.best_metric > 0.3
    np.testing.assert_allclose(got.best_metric, ref.best_metric, atol=0.05)


def test_fast_preset_certified_vs_fp32(tmp_path):
    """The documented max-throughput preset (train.preset: "fast" = bf16
    head matmuls + bf16 Adam moments, fused kernels on) must reach the same
    e2e quality as the fp32 arm on the synthetic process — the accuracy gate
    behind calling it a supported preset (docs/performance.md)."""
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

    def cfg(exp_dir, preset):
        return Config(
            experiment=ExperimentConfig(seed=0),
            data=DataConfig(num_items=A),
            train=TrainConfig(
                model="gru4rec",
                batch_size=32,
                val_batch_size=64,
                epochs=2,
                learning_rate=0.01,
                embedding_size=16,
                hidden_state_size=16,
                state_size=6,
                best_model_metric="Val_NDCG@10",
                eval_at=[1.0],
                preset=preset,
                fused_ce_min_actions=0,  # force the fused path on a toy catalog
            ),
            metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5, 10]),
            exp_dir=str(exp_dir),
        )

    fast_cfg = cfg(tmp_path / "fast", "fast")
    assert fast_cfg.train.head_precision == "default"
    assert fast_cfg.train.optimizer_mv_dtype == "bfloat16"
    ref_cfg = cfg(tmp_path / "ref", "reference")
    assert ref_cfg.train.head_precision == "highest"
    assert ref_cfg.train.optimizer_mv_dtype is None

    train_buf, _ = synthetic_buffers(num_sessions=150, num_items=A, state_len=6, seed=1)
    _, val_buf = synthetic_buffers(num_sessions=40, num_items=A, state_len=6, seed=2)
    ref = train(ref_cfg, train_buf=train_buf, val_buf=val_buf)
    got = train(fast_cfg, train_buf=train_buf, val_buf=val_buf)
    assert got.best_metric > 0.3
    np.testing.assert_allclose(got.best_metric, ref.best_metric, atol=0.05)


def test_preset_does_not_override_explicit_fields():
    from ikea_recommender_tpu.core.config import TrainConfig

    t = TrainConfig(preset="fast", head_precision="highest")
    assert t.head_precision == "highest"
    assert t.optimizer_mv_dtype == "bfloat16"
