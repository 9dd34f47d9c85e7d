"""Lazy embedding Adam: exactness vs dense Adam on touched rows."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ikea_recommender_tpu.train.lazy_adam import (
    EmbAdamState,
    dedupe_row_grads,
    emb_adam_update,
    init_emb_adam,
)


def _dense_adam_steps(emb, dense_grads, lr=0.01):
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    st = opt.init(emb)
    for g in dense_grads:
        u, st = opt.update(g, st, emb)
        emb = optax.apply_updates(emb, u)
    return emb


def test_dedupe_sums_duplicates():
    ids = jnp.asarray([3, 1, 3, 3, 1, 7], jnp.int32)
    g = jnp.arange(12, dtype=jnp.float32).reshape(6, 2)
    upd_ids, upd_g = dedupe_row_grads(ids, g, sentinel=100)
    out = {}
    for i, gi in zip(np.asarray(upd_ids), np.asarray(upd_g)):
        if i != 100:
            out[int(i)] = gi
    np.testing.assert_allclose(out[1], g[1] + g[4])
    np.testing.assert_allclose(out[3], g[0] + g[2] + g[3])
    np.testing.assert_allclose(out[7], g[5])
    assert int((np.asarray(upd_ids) == 100).sum()) == 3  # duplicate slots


def test_matches_dense_adam_when_all_rows_touched():
    """When every row is touched every step, lazy == dense Adam exactly."""
    V, E = 6, 4
    rs = np.random.RandomState(0)
    emb0 = jnp.asarray(rs.randn(V, E).astype(np.float32))
    # duplicate some ids so the segment-sum path is exercised
    ids = jnp.asarray([0, 1, 2, 3, 4, 5, 2, 4], jnp.int32)
    steps = 3
    row_grads = [jnp.asarray(rs.randn(8, E).astype(np.float32)) for _ in range(steps)]

    dense_grads = []
    for g in row_grads:
        d = jnp.zeros((V, E)).at[ids].add(g)
        dense_grads.append(d)
    want = _dense_adam_steps(emb0, dense_grads)

    emb, st = emb0, init_emb_adam(emb0)
    for t, g in enumerate(row_grads):
        emb, st = emb_adam_update(
            emb, st, ids, g, jnp.asarray(t, jnp.int32), lr=0.01
        )
    np.testing.assert_allclose(np.asarray(emb), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_untouched_rows_and_frozen_row_stay_put():
    V, E = 8, 3
    rs = np.random.RandomState(1)
    emb0 = jnp.asarray(rs.randn(V, E).astype(np.float32))
    ids = jnp.asarray([1, 2, 7, 2], jnp.int32)  # 7 is the frozen pad row
    g = jnp.asarray(rs.randn(4, E).astype(np.float32))
    emb, st = emb_adam_update(
        emb0, init_emb_adam(emb0), ids, g, jnp.asarray(0, jnp.int32),
        lr=0.1, frozen_row=7,
    )
    for r in (0, 3, 4, 5, 6, 7):
        np.testing.assert_array_equal(np.asarray(emb[r]), np.asarray(emb0[r]))
        assert np.all(np.asarray(st.m[r]) == 0.0)
    for r in (1, 2):
        assert not np.allclose(np.asarray(emb[r]), np.asarray(emb0[r]))


def test_jit_and_grad_shapes():
    V, E, N = 32, 4, 10
    rs = np.random.RandomState(2)
    emb = jnp.asarray(rs.randn(V, E).astype(np.float32))
    f = jax.jit(
        lambda e, s, i, g, t: emb_adam_update(e, s, i, g, t, lr=0.01)
    )
    ids = jnp.asarray(rs.randint(0, V, N), jnp.int32)
    g = jnp.asarray(rs.randn(N, E).astype(np.float32))
    e2, st2 = f(emb, init_emb_adam(emb), ids, g, jnp.asarray(0, jnp.int32))
    assert e2.shape == (V, E) and st2.m.shape == (V, E)


def test_lazy_ce_step_matches_dense_when_all_rows_touched():
    """With a batch covering every vocab row each step (incl. the pad row,
    trainable), lazy Adam == dense Adam => identical params after steps."""
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.train.state import (
        make_lazy_train_state,
        make_train_state,
        make_optimizer,
    )
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

    A, T = 7, 4  # tiny vocab; batch covers all 8 rows (incl pad id=7)
    B = 16
    tc = TrainConfig(
        model="gru4rec", embedding_size=4, hidden_state_size=4, state_size=T,
        train_padding_embed=True, fused_ce=False,
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A))
    opt = make_optimizer(0.01)
    rl = RLStepConfig()

    rs = np.random.RandomState(0)
    def batch():
        s = rs.randint(0, A + 1, (B, T))  # include pad row 7 as an input id
        s[0, :] = np.arange(T)            # ensure coverage determinism aside
        for r in range(A + 1):
            s[r % B, r % T] = r           # every row appears
        return {
            "state": jnp.asarray(s, jnp.int32),
            "action": jnp.asarray(rs.randint(0, A, B), jnp.int32),
            "reward": jnp.zeros((B,), jnp.float32),
            "next_state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
            "true_len": jnp.full((B,), T, jnp.int32),
            "true_next_len": jnp.full((B,), T, jnp.int32),
            "is_end": jnp.zeros((B,), bool),
            "valid": jnp.ones((B,), bool),
        }

    dense_state, _ = make_train_state(jax.random.key(0), mc, 0.01)
    lazy_state, _ = make_lazy_train_state(jax.random.key(0), mc, 0.01)
    jax.tree.map(
        np.testing.assert_array_equal, dense_state.params, lazy_state.params
    )
    dense_step = make_train_step(mc, opt, rl, donate=False)
    lazy_step = make_train_step(mc, opt, rl, lazy_embedding_lr=0.01, donate=False)

    batches = [batch() for _ in range(3)]
    for b in batches:
        dense_state, dm = dense_step(dense_state, b)
        lazy_state, lm = lazy_step(lazy_state, b)
        np.testing.assert_allclose(
            float(dm["sup_loss"]), float(lm["sup_loss"]), rtol=1e-5
        )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        dense_state.params, lazy_state.params,
    )


def test_lazy_trainer_end_to_end(tmp_path):
    """Full trainer run with optimizer='lazy_adam' learns the synthetic
    process about as well as dense Adam."""
    from ikea_recommender_tpu.core.config import (
        Config, DataConfig, ExperimentConfig, MetricsConfig, TrainConfig,
    )
    from ikea_recommender_tpu.data.synthetic import synthetic_buffers
    from ikea_recommender_tpu.run.trainer import train

    A = 30
    train_buf, _ = synthetic_buffers(num_sessions=150, num_items=A, state_len=6, seed=1)
    _, val_buf = synthetic_buffers(num_sessions=40, num_items=A, state_len=6, seed=2)

    def run(optimizer):
        cfg = Config(
            experiment=ExperimentConfig(seed=0),
            data=DataConfig(num_items=A),
            train=TrainConfig(
                model="gru4rec", batch_size=32, val_batch_size=64, epochs=2,
                learning_rate=0.01, embedding_size=16, hidden_state_size=16,
                state_size=6, best_model_metric="Val_NDCG@10",
                eval_at=[1.0], optimizer=optimizer,
            ),
            metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5, 10],
                                  topk_div=1, topk_nov=1),
            exp_dir=str(tmp_path / optimizer),
        )
        out = train(cfg, train_buf=train_buf, val_buf=val_buf, test_buf=val_buf)
        return next(v for k, v in out.test_metrics.items() if "HR@10" in k)

    hr_lazy = run("lazy_adam")
    hr_dense = run("adam")
    assert hr_lazy > 0.3
    assert abs(hr_lazy - hr_dense) < 0.15


def test_lazy_resume_from_checkpoint(tmp_path):
    """Orbax resume round-trips the lazy opt_state layout
    ({'rest': adam, 'emb': EmbAdamState})."""
    from ikea_recommender_tpu.core.config import (
        Config, DataConfig, ExperimentConfig, MetricsConfig, TrainConfig,
    )
    from ikea_recommender_tpu.data.synthetic import synthetic_buffers
    from ikea_recommender_tpu.run.trainer import train

    A = 20
    train_buf, _ = synthetic_buffers(num_sessions=60, num_items=A, state_len=5, seed=3)
    _, val_buf = synthetic_buffers(num_sessions=20, num_items=A, state_len=5, seed=4)

    def cfg(epochs, resume):
        return Config(
            experiment=ExperimentConfig(seed=0),
            data=DataConfig(num_items=A),
            train=TrainConfig(
                model="gru4rec", batch_size=16, val_batch_size=32,
                epochs=epochs, learning_rate=0.01, embedding_size=8,
                hidden_state_size=8, state_size=5,
                best_model_metric="Val_NDCG@5", eval_at=[1.0],
                optimizer="lazy_adam",
                checkpoint_dir=str(tmp_path / "ckpt"), resume=resume,
            ),
            metrics=MetricsConfig(topk_cov=[1], topk_hr_ndcg=[5],
                                  topk_div=1, topk_nov=1),
            exp_dir=str(tmp_path),
        )

    train(cfg(1, False), train_buf=train_buf, val_buf=val_buf)
    out = train(cfg(2, True), train_buf=train_buf, val_buf=val_buf)
    assert np.isfinite(out.best_metric)


def test_lazy_adam_trains_on_mesh():
    """Lazy embedding Adam under a (data, model) mesh — its own payoff
    regime (model-sharded tables; the round-2 trainer refused this). The
    mesh trajectory must match the single-device lazy trajectory."""
    import numpy as np
    from dataclasses import replace as dc_replace

    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.core.mesh import DATA_AXIS, MeshSpec, make_mesh
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.parallel.sharding import shard_state
    from ikea_recommender_tpu.train.state import make_lazy_train_state, make_optimizer
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

    A, B, T = 57, 16, 5
    mesh = make_mesh(MeshSpec(data=2, model=4))
    tc = TrainConfig(model="gru4rec", embedding_size=8, hidden_state_size=8,
                     state_size=T, optimizer="lazy_adam")
    mc = model_config_from_train(tc, DataConfig(num_items=A), align=4)
    opt = make_optimizer(0.05)
    state, _ = make_lazy_train_state(jax.random.key(0), mc, 0.05)
    rs = np.random.RandomState(3)
    batch = {
        "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(B).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(B) < 0.2),
        "valid": jnp.ones((B,), bool),
    }
    plain = make_train_step(mc, opt, RLStepConfig(), lazy_embedding_lr=0.05,
                            donate=False)
    s1, m1 = plain(state, batch)

    sharded_step = make_train_step(mc, opt, RLStepConfig(),
                                   lazy_embedding_lr=0.05, donate=False,
                                   jit=False, mesh=mesh, data_axis=DATA_AXIS)
    s_sh = shard_state(state, mesh)
    # the mv moments must actually land row-sharded on the model axis
    from ikea_recommender_tpu.core.mesh import MODEL_AXIS
    assert MODEL_AXIS in tuple(s_sh.opt_state["emb"].mv.sharding.spec)
    s2, m2 = jax.jit(sharded_step.raw)(s_sh, batch, sharded_step.aux)

    np.testing.assert_allclose(float(m1["sup_loss"]), float(m2["sup_loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["backbone"]["embedding"]),
        np.asarray(s2.params["backbone"]["embedding"]),
        atol=2e-5,
    )
