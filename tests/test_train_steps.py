"""Train-step regression tests: every family's jitted step runs, updates only
the selected network (double-Q), respects grad masks, and decreases loss on a
toy buffer — coverage the reference lacks entirely (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.models.families import model_config_from_train
from ikea_recommender_tpu.train.state import (
    make_double_q_state,
    make_optimizer,
    make_train_state,
)
from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

A = 12  # action dim == num items
B, T = 16, 5


def _toy_batch(seed=0):
    rs = np.random.RandomState(seed)
    return {
        "state": jnp.asarray(rs.randint(0, A, size=(B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, size=(B,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(B).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, A, size=(B, T)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, size=(B,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, T + 1, size=(B,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(B) < 0.2),
        "valid": jnp.ones((B,), bool),
    }


def _cfgs(model: str, **kw):
    train = TrainConfig(
        model=model,
        embedding_size=8,
        hidden_state_size=8,
        learning_rate=0.05,
        state_size=T,
        **kw,
    )
    data = DataConfig(num_items=A)
    return train, data


def _make(model: str, **kw):
    train, data = _cfgs(model, **kw)
    mc = model_config_from_train(train, data)
    opt = make_optimizer(train.learning_rate)
    rl = RLStepConfig(gamma=train.gamma, alpha=train.alpha)
    aux = {}
    if model == "smorl":
        aux = {
            "div_embedding": 0.1
            * jnp.asarray(np.random.RandomState(7).randn(A + 1, 8), jnp.float32),
            "unpopular_mask": jnp.asarray(np.arange(A) % 3 == 0),
        }
    step = make_train_step(mc, opt, rl, **aux, donate=False)
    return mc, opt, step


@pytest.mark.parametrize("model", ["gru4rec", "bidir_gru4rec", "sarm"])
def test_single_net_loss_decreases(model):
    mc, opt, step = _make(model)
    state, _ = make_train_state(jax.random.key(0), mc, 0.05)
    batch = _toy_batch()
    first = None
    for i in range(30):
        state, m = step(state, batch)
        if first is None:
            first = float(m["sup_loss"])
    assert float(m["sup_loss"]) < first


@pytest.mark.parametrize("model", ["sqn", "smorl"])
def test_double_q_loss_decreases(model):
    mc, opt, step = _make(model)
    state, _ = make_double_q_state(jax.random.key(0), mc, 0.05)
    batch = _toy_batch()
    first = None
    for i in range(40):
        state, m = step(state, batch)
        if first is None:
            first = float(m["sup_loss"])
    assert float(m["sup_loss"]) < first
    assert np.isfinite(float(m["q_loss"]))


def _emb_pair(state):
    """(2, V, E) view of both double-Q nets' embedding tables."""
    return np.stack(
        [np.asarray(state.params[i]["backbone"]["embedding"]) for i in (0, 1)]
    )


def test_double_q_updates_only_selected_net():
    mc, opt, step = _make("sqn")
    state, _ = make_double_q_state(jax.random.key(3), mc, 0.05)
    before = _emb_pair(state)
    state2, _ = step(state, _toy_batch())
    after = _emb_pair(state2)
    changed = [not np.allclose(before[i], after[i]) for i in range(2)]
    assert sum(changed) == 1  # exactly one of the two nets moved


def test_double_q_single_optimizer_shares_adam_across_nets():
    """double_q_optimizers=1: one Adam over the stacked nets. The
    non-selected net sees zero grads — unchanged while its momentum is
    still zero, but once it has trained at least once it moves on EVERY
    subsequent step (torch one-Adam-over-chained-params semantics), and
    the shared bias-correction count advances every step."""
    train, data = _cfgs("sqn", double_q_optimizers=1)
    mc = model_config_from_train(train, data)
    opt = make_optimizer(train.learning_rate)
    rl = RLStepConfig(
        gamma=train.gamma, alpha=train.alpha, single_optimizer=True
    )
    step = make_train_step(mc, opt, rl, donate=False)
    state, _ = make_double_q_state(
        jax.random.key(5), mc, 0.05, single_optimizer=True
    )
    batch = _toy_batch()
    n_steps = 8
    emb = [_emb_pair(state)]
    for _ in range(n_steps):
        state, m = step(state, batch)
        emb.append(_emb_pair(state))
    moved = np.array(
        [
            [not np.allclose(emb[t][i], emb[t + 1][i]) for i in (0, 1)]
            for t in range(n_steps)
        ]
    )
    # Shared count: scalar (not stacked), incremented every step.
    adam = state.opt_state[0]
    assert adam.count.shape == ()
    assert int(adam.count) == n_steps
    # Both nets trained at least once over 8 coin flips.
    first_move = [int(np.argmax(moved[:, i])) for i in (0, 1)]
    assert moved[:, 0].any() and moved[:, 1].any()
    # After a net first moves, shared-Adam momentum moves it every step.
    for i in (0, 1):
        assert moved[first_move[i]:, i].all()
    assert np.isfinite(float(m["sup_loss"])) and np.isfinite(float(m["q_loss"]))


def test_double_q_alternation_is_random_but_covers_both():
    mc, opt, step = _make("sqn")
    state, _ = make_double_q_state(jax.random.key(4), mc, 0.05)
    batch = _toy_batch()
    start = _emb_pair(state)
    for _ in range(10):
        state, _ = step(state, batch)
    end = _emb_pair(state)
    # Over 10 coin flips both nets should have been selected at least once.
    assert not np.allclose(start[0], end[0])
    assert not np.allclose(start[1], end[1])


def test_frozen_pad_embedding_stays_zero():
    mc, opt, step = _make("gru4rec", train_padding_embed=False, use_packed_seq=False)
    state, _ = make_train_state(jax.random.key(5), mc, 0.05)
    pad = mc.backbone.padding_idx
    for _ in range(3):
        state, _ = step(state, _toy_batch())
    np.testing.assert_allclose(
        np.asarray(state.params["backbone"]["embedding"][pad]), 0.0
    )


def test_valid_mask_excludes_padded_rows_from_loss():
    mc, opt, step = _make("gru4rec")
    state, _ = make_train_state(jax.random.key(6), mc, 0.05)
    batch = _toy_batch()
    # Same batch but with half the rows invalidated and their data corrupted:
    corrupted = dict(batch)
    corrupted["valid"] = jnp.asarray(np.arange(B) < B // 2)
    corrupted["action"] = batch["action"].at[B // 2 :].set(0)
    s1, m1 = step(state, batch)
    # metrics on valid-masked batch must equal metrics on just its valid half
    half = {
        k: (v[: B // 2] if v.ndim >= 1 and v.shape[0] == B else v)
        for k, v in batch.items()
    }
    mc2, opt2, step2 = _make("gru4rec")
    s2, m2 = step2(state, corrupted)
    s3, m3 = step2(state, half)
    np.testing.assert_allclose(float(m2["sup_loss"]), float(m3["sup_loss"]), rtol=1e-5)


def test_compat_boot_len_flag_changes_result():
    train, data = _cfgs("sqn")
    mc = model_config_from_train(train, data)
    opt = make_optimizer(0.05)
    batch = _toy_batch()
    state, _ = make_double_q_state(jax.random.key(8), mc, 0.05)
    step_fixed = make_train_step(mc, opt, RLStepConfig(), donate=False)
    step_compat = make_train_step(
        mc, opt, RLStepConfig(compat_boot_len_bug=True), donate=False
    )
    _, m_fixed = step_fixed(state, batch)
    _, m_compat = step_compat(state, batch)
    assert float(m_fixed["q_loss"]) != float(m_compat["q_loss"])


def test_compat_div_len_flag_changes_result():
    """Quirk 3 (smorl_gru.py:298-305): reference computes the online
    diversity reward at true_next_len over s; the compat flag reproduces it,
    the default uses true_len."""
    train, data = _cfgs("smorl")
    mc = model_config_from_train(train, data)
    opt = make_optimizer(0.05)
    rs = np.random.RandomState(7)
    aux = {
        "div_embedding": 0.1 * jnp.asarray(rs.randn(A + 1, 8), jnp.float32),
        "unpopular_mask": jnp.asarray(np.arange(A) % 3 == 0),
    }
    batch = _toy_batch()
    # lengths must differ for the flag to matter
    assert not np.array_equal(
        np.asarray(batch["true_len"]), np.asarray(batch["true_next_len"])
    )
    state, _ = make_double_q_state(jax.random.key(9), mc, 0.05)
    step_fixed = make_train_step(mc, opt, RLStepConfig(), **aux, donate=False)
    step_compat = make_train_step(
        mc, opt, RLStepConfig(compat_div_len_bug=True), **aux, donate=False
    )
    _, m_fixed = step_fixed(state, batch)
    _, m_compat = step_compat(state, batch)
    assert float(m_fixed["q_loss"]) != float(m_compat["q_loss"])
