"""End-to-end check of the on-device eval protocol against a pure-numpy
re-implementation of the reference semantics (host sets, vectorized rank
scan, mean-of-batch-means loss)."""

import jax
import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.data.replay_buffer import EvalBuffer, eval_batches
from ikea_recommender_tpu.eval.protocol import EvalProtocol
from ikea_recommender_tpu.models.families import (
    apply_model,
    init_model,
    model_config_from_train,
)

A, B, T, N = 15, 8, 4, 27  # N not divisible by B -> padded tail batch


def _setup():
    train = TrainConfig(model="gru4rec", embedding_size=6, hidden_state_size=6, state_size=T)
    data = DataConfig(num_items=A)
    mc = model_config_from_train(train, data)
    params = init_model(jax.random.key(0), mc)
    rs = np.random.RandomState(0)
    buf = EvalBuffer(
        state=rs.randint(0, A, size=(N, T)),
        action=rs.randint(0, A, size=(N,)),
        true_len=rs.randint(1, T + 1, size=(N,)),
    )
    return mc, params, buf


def _numpy_reference(mc, params, buf, topk_hr, topk_cov, unpop, div_emb):
    """Reference-semantics metrics in numpy (per batch of B, tail smaller)."""
    loss_sum, hr = 0.0, np.zeros(len(topk_hr))
    ndcg = np.zeros(len(topk_hr))
    reps = np.zeros(len(topk_hr))
    div_sum = nov_sum = 0.0
    covered = {k: set() for k in topk_cov}
    n_batches = 0
    for lo in range(0, len(buf), B):
        s = buf.state[lo : lo + B]
        a = buf.action[lo : lo + B]
        ln = buf.true_len[lo : lo + B]
        outs = apply_model(params, mc, jnp.asarray(s), jnp.asarray(ln))
        preds = np.asarray(outs[0])
        # CE (mean per batch)
        logz = preds - preds.max(axis=1, keepdims=True)
        logsoft = logz - np.log(np.exp(logz).sum(axis=1, keepdims=True))
        loss_sum += -logsoft[np.arange(len(a)), a].mean()
        n_batches += 1
        order = np.argsort(-preds, axis=1, kind="stable")
        for i, k in enumerate(topk_hr):
            topk = order[:, :k]
            match = topk == a[:, None]
            hit = match.any(1)
            rank = np.where(hit, match.argmax(1) + 1, 0)
            hr[i] += hit.sum()
            ndcg[i] += np.where(hit, 1 / np.log2(rank + 1), 0).sum()
            reps[i] += (s[:, :, None] == topk[:, None, :]).sum()
        for k in topk_cov:
            covered[k] |= set(order[:, :k].flatten().tolist())
        # diversity (top-1) + novelty (top-1)
        top1 = order[:, 0]
        last = s[np.arange(len(a)), np.clip(ln - 1, 0, T - 1)]
        e_l, e_p = div_emb[last], div_emb[top1]
        cos = (e_l * e_p).sum(1) / np.maximum(
            np.linalg.norm(e_l, axis=1) * np.linalg.norm(e_p, axis=1), 1e-6
        )
        div_sum += (1 - cos).sum()
        nov_sum += np.isin(top1, list(unpop)).sum()
    n = len(buf)
    return {
        "loss": loss_sum / n_batches,
        "hr": hr / n,
        "ndcg": ndcg / n,
        "reps": reps / n,
        "div": div_sum / n,
        "nov": nov_sum / n,
        "coverage": {
            k: (len(covered[k] & unpop) / len(unpop), len(covered[k]) / A)
            for k in topk_cov
        },
    }


def test_protocol_matches_numpy_reference():
    mc, params, buf = _setup()
    topk_hr, topk_cov = (1, 5, 10), (1, 5)
    unpop = {0, 2, 4, 6, 8}
    rs = np.random.RandomState(3)
    div_emb = rs.randn(A + 1, 6).astype(np.float32)

    from ikea_recommender_tpu.data.item_frequency import unpopular_mask

    proto = EvalProtocol(
        mc,
        topk_hr_ndcg=topk_hr,
        topk_cov=topk_cov,
        div_embedding=jnp.asarray(div_emb),
        unpopular_mask=jnp.asarray(unpopular_mask(unpop, A)),
    )
    res = proto.evaluate(params, buf, batch_size=B)
    ref = _numpy_reference(mc, params, buf, topk_hr, topk_cov, unpop, div_emb)

    np.testing.assert_allclose(res.loss, ref["loss"], rtol=1e-4)
    np.testing.assert_allclose(res.hr, ref["hr"], rtol=1e-6)
    np.testing.assert_allclose(res.ndcg, ref["ndcg"], rtol=1e-4)
    np.testing.assert_allclose(res.reps, ref["reps"], rtol=1e-6)
    np.testing.assert_allclose(res.div_rew, ref["div"], rtol=1e-4)
    np.testing.assert_allclose(res.nov_rew, ref["nov"], rtol=1e-5)
    for k in topk_cov:
        np.testing.assert_allclose(res.coverage[k], ref["coverage"][k], rtol=1e-6)


def test_protocol_head_idx_selects_q_head():
    train = TrainConfig(model="sqn", embedding_size=6, hidden_state_size=6, state_size=T)
    data = DataConfig(num_items=A)
    mc = model_config_from_train(train, data)
    params = init_model(jax.random.key(1), mc)
    rs = np.random.RandomState(1)
    buf = EvalBuffer(
        state=rs.randint(0, A, size=(10, T)),
        action=rs.randint(0, A, size=(10,)),
        true_len=rs.randint(1, T + 1, size=(10,)),
    )
    r0 = EvalProtocol(mc, topk_hr_ndcg=(5,), topk_cov=(1,), head_idx=0).evaluate(
        params, buf, batch_size=5
    )
    r1 = EvalProtocol(mc, topk_hr_ndcg=(5,), topk_cov=(1,), head_idx=1).evaluate(
        params, buf, batch_size=5
    )
    assert not np.allclose(r0.loss, r1.loss)
