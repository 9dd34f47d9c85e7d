"""Lazy-column Q-head Adam (TrainConfig.qhead_optimizer='lazy_adam').

Parity contract with dense Adam:

- step 1 from identical init is EXACT for every parameter (all moments are
  zero, so dense Adam's untouched columns receive a zero update);
- any number of steps is exact while every action column is touched every
  step (then "lazy" and "dense" decay schedules coincide);
- the divergence is precisely the documented lazy semantics: a column's
  momentum is frozen while untouched (dense lets it ring down) — asserted
  explicitly, and gated e2e: a full synthetic training run must reach the
  same quality as dense Adam for each Q family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.models.families import model_config_from_train
from ikea_recommender_tpu.train.state import (
    make_double_q_state,
    make_lazy_double_q_state,
    make_lazy_sarm_state,
    make_optimizer,
    make_train_state,
)
from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

A = 12
B, T = 16, 5
LR = 0.05


def _toy_batch(seed=0, cover_all=False):
    rs = np.random.RandomState(seed)
    action = (
        np.arange(B) % A if cover_all else rs.randint(0, A, size=(B,))
    )
    return {
        "state": jnp.asarray(rs.randint(0, A, size=(B, T)), jnp.int32),
        "action": jnp.asarray(action, jnp.int32),
        "reward": jnp.asarray(rs.rand(B).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, A, size=(B, T)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, size=(B,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, T + 1, size=(B,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(B) < 0.2),
        "valid": jnp.ones((B,), bool),
    }


def _mc(model):
    train = TrainConfig(
        model=model,
        embedding_size=8,
        hidden_state_size=8,
        learning_rate=LR,
        state_size=T,
        fused_ce_min_actions=0,  # force the fused path at the toy catalog
    )
    return model_config_from_train(train, DataConfig(num_items=A))


def _aux(model):
    if model != "smorl":
        return {}
    rs = np.random.RandomState(7)
    return {
        "div_embedding": 0.1 * jnp.asarray(rs.randn(A + 1, 8), jnp.float32),
        "unpopular_mask": jnp.asarray(np.arange(A) % 3 == 0),
    }


def _make_pair(model):
    """(dense (state, step), lazy (state, step), mc) from the same init key."""
    mc = _mc(model)
    opt = make_optimizer(LR)
    rl = RLStepConfig(gamma=0.5, alpha=1.0)
    aux = _aux(model)
    key = jax.random.key(3)
    if model == "sarm":
        s_dense, _ = make_train_state(key, mc, LR)
        s_lazy, _ = make_lazy_sarm_state(key, mc, LR, lazy_qh=True)
    else:
        s_dense, _ = make_double_q_state(key, mc, LR)
        s_lazy, _ = make_lazy_double_q_state(key, mc, LR, lazy_qh=True)
    step_dense = make_train_step(mc, opt, rl, **aux, donate=False)
    step_lazy = make_train_step(
        mc, opt, rl, **aux, lazy_qhead_lr=LR, donate=False
    )
    return (s_dense, step_dense), (s_lazy, step_lazy), mc


def _assert_trees_close(a, b, mc=None, atol=1e-5):
    # not bit-exact: the dense arm forms dW via the bf16-split one-hot
    # matmul (~24-bit accuracy) where the lazy arm updates columns directly.
    # The lazy tree stores the q-head ACTION-MAJOR — canonicalize first.
    from ikea_recommender_tpu.models.families import canonicalize_qheads

    if mc is not None:
        canon = lambda t: canonicalize_qheads(t, mc)
        if isinstance(a, tuple):
            a, b = tuple(map(canon, a)), tuple(map(canon, b))
        else:
            a, b = canon(a), canon(b)
    fa, ta = jax.tree.flatten(a)
    fb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol)


@pytest.mark.parametrize("model", ["sqn", "smorl", "sarm"])
def test_first_step_exact_vs_dense(model):
    (sd, stepd), (sl, stepl), mc = _make_pair(model)
    batch = _toy_batch()
    sd2, md = stepd(sd, batch)
    sl2, ml = stepl(sl, batch)
    np.testing.assert_allclose(float(md["sup_loss"]), float(ml["sup_loss"]), atol=1e-5)
    np.testing.assert_allclose(float(md["q_loss"]), float(ml["q_loss"]), atol=1e-5)
    _assert_trees_close(sd2.params, sl2.params, mc)


@pytest.mark.parametrize("model", ["sqn", "smorl", "sarm"])
def test_multi_step_exact_when_all_columns_touched(model):
    (sd, stepd), (sl, stepl), mc = _make_pair(model)
    for i in range(6):
        batch = _toy_batch(seed=i, cover_all=True)
        sd, md = stepd(sd, batch)
        sl, ml = stepl(sl, batch)
    np.testing.assert_allclose(
        float(md["sup_loss"]), float(ml["sup_loss"]), atol=1e-4
    )
    _assert_trees_close(sd.params, sl.params, mc, atol=5e-5)


def test_untouched_columns_hold_still():
    """The documented lazy semantics: a touched column builds momentum;
    once the batch stops touching it, the lazy path freezes it while dense
    Adam would keep moving it under that momentum."""
    _, (sl, stepl), _mc2 = _make_pair("smorl")
    touch3 = dict(_toy_batch(seed=1), action=jnp.full((B,), 3, jnp.int32))
    touch5 = dict(_toy_batch(seed=2), action=jnp.full((B,), 5, jnp.int32))
    for _ in range(3):
        sl, _ = stepl(sl, touch3)
    k_before = np.stack(
        [np.asarray(p["q_heads"]["kernel_am"]) for p in sl.params]
    )
    sl, _ = stepl(sl, touch5)
    k_after = np.stack(
        [np.asarray(p["q_heads"]["kernel_am"]) for p in sl.params]
    )
    # action row 3 (touched before, with live momentum) is now frozen
    np.testing.assert_array_equal(k_before[:, 3], k_after[:, 3])
    # action row 5 moved on whichever net was selected
    assert not np.array_equal(k_before[:, 5], k_after[:, 5])


@pytest.mark.parametrize("model", ["sqn", "smorl", "sarm"])
def test_e2e_trainer_lazy_qh_reaches_dense_quality(model, tmp_path):
    from ikea_recommender_tpu.core.config import (
        Config,
        ExperimentConfig,
        MetricsConfig,
    )
    from ikea_recommender_tpu.data.synthetic import synthetic_buffers
    from ikea_recommender_tpu.run.trainer import train

    AA = 30

    def cfg(exp_dir, qh_opt):
        return Config(
            experiment=ExperimentConfig(seed=0),
            data=DataConfig(num_items=AA),
            train=TrainConfig(
                model=model,
                batch_size=32,
                val_batch_size=64,
                epochs=2,
                learning_rate=0.01,
                embedding_size=16,
                hidden_state_size=16,
                state_size=6,
                gamma=0.5,
                sarm_gamma=0.5,
                q_weights=[1.0, 1.0, 1.0],
                best_model_metric="Val_NDCG@10",
                eval_at=[1.0],
                fused_ce_min_actions=0,
                qhead_optimizer=qh_opt,
            ),
            metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5, 10]),
            exp_dir=str(exp_dir),
        )

    train_buf, _ = synthetic_buffers(num_sessions=150, num_items=AA, state_len=6, seed=1)
    _, val_buf = synthetic_buffers(num_sessions=40, num_items=AA, state_len=6, seed=2)
    rs = np.random.RandomState(0)
    kw = dict(
        train_buf=train_buf,
        val_buf=val_buf,
        div_embedding=rs.randn(AA + 1, 16).astype(np.float32),
        unpopular=set(range(0, AA, 3)),
    )
    ref = train(cfg(tmp_path / "dense", None), **kw)
    got = train(cfg(tmp_path / "lazy", "lazy_adam"), **kw)
    # SMORL trades accuracy for div/nov by design (3-objective loss) —
    # the gate is "same quality as dense", plus a learned-something floor.
    # SARM's self-bootstrapped targets make it seed-noisy at this toy scale
    # (dense-vs-dense across seeds spans 0.42-0.67 here), so its closeness
    # gate is the dense seed spread, not run-to-run exactness.
    assert got.best_metric > (0.15 if model == "smorl" else 0.3)
    atol = 0.15 if model == "sarm" else 0.05
    np.testing.assert_allclose(got.best_metric, ref.best_metric, atol=atol)


@pytest.mark.parametrize("model", ["sqn", "smorl", "sarm"])
def test_fast_preset_certified_q_families(model, tmp_path):
    """VERDICT r3 item 6: the ``fast`` preset (bf16 head + bf16 Adam m/v +
    lazy-column Q-head Adam) is accuracy-gated for every Q family — same
    quality as the fp32 dense arm on the synthetic process, within the
    per-family tolerance of the lazy e2e gate."""
    from ikea_recommender_tpu.core.config import (
        Config,
        ExperimentConfig,
        MetricsConfig,
    )
    from ikea_recommender_tpu.data.synthetic import synthetic_buffers
    from ikea_recommender_tpu.run.trainer import train

    AA = 30

    def cfg(exp_dir, preset):
        return Config(
            experiment=ExperimentConfig(seed=0),
            data=DataConfig(num_items=AA),
            train=TrainConfig(
                model=model,
                batch_size=32,
                val_batch_size=64,
                epochs=2,
                learning_rate=0.01,
                embedding_size=16,
                hidden_state_size=16,
                state_size=6,
                gamma=0.5,
                sarm_gamma=0.5,
                q_weights=[1.0, 1.0, 1.0],
                best_model_metric="Val_NDCG@10",
                eval_at=[1.0],
                fused_ce_min_actions=0,
                preset=preset,
            ),
            metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5, 10]),
            exp_dir=str(exp_dir),
        )

    fast_cfg = cfg(tmp_path / "fast", "fast")
    assert fast_cfg.train.qhead_optimizer == "lazy_adam"  # preset wiring
    train_buf, _ = synthetic_buffers(num_sessions=150, num_items=AA, state_len=6, seed=1)
    _, val_buf = synthetic_buffers(num_sessions=40, num_items=AA, state_len=6, seed=2)
    rs = np.random.RandomState(0)
    kw = dict(
        train_buf=train_buf,
        val_buf=val_buf,
        div_embedding=rs.randn(AA + 1, 16).astype(np.float32),
        unpopular=set(range(0, AA, 3)),
    )
    ref = train(cfg(tmp_path / "fp32", None), **kw)
    got = train(fast_cfg, **kw)
    assert got.best_metric > (0.15 if model == "smorl" else 0.3)
    atol = 0.15 if model == "sarm" else 0.05
    np.testing.assert_allclose(got.best_metric, ref.best_metric, atol=atol)


def test_e2e_trainer_lazy_embedding_q_family(tmp_path):
    """The round-3 gru4rec-only optimizer fence is lifted: a Q family runs
    with optimizer='lazy_adam' (sparse-row embedding) end to end."""
    from ikea_recommender_tpu.core.config import (
        Config,
        ExperimentConfig,
        MetricsConfig,
    )
    from ikea_recommender_tpu.data.synthetic import synthetic_buffers
    from ikea_recommender_tpu.run.trainer import train

    AA = 30
    cfgv = Config(
        experiment=ExperimentConfig(seed=0),
        data=DataConfig(num_items=AA),
        train=TrainConfig(
            model="sqn",
            batch_size=32,
            val_batch_size=64,
            epochs=2,
            learning_rate=0.01,
            embedding_size=16,
            hidden_state_size=16,
            state_size=6,
            best_model_metric="Val_NDCG@10",
            eval_at=[1.0],
            fused_ce_min_actions=0,
            optimizer="lazy_adam",
            qhead_optimizer="lazy_adam",
        ),
        metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5, 10]),
        exp_dir=str(tmp_path),
    )
    train_buf, _ = synthetic_buffers(num_sessions=150, num_items=AA, state_len=6, seed=1)
    _, val_buf = synthetic_buffers(num_sessions=40, num_items=AA, state_len=6, seed=2)
    out = train(cfgv, train_buf=train_buf, val_buf=val_buf)
    assert out.best_metric > 0.3
