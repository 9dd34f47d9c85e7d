"""Golden values for novelty / repetition / diversity kernels (derived from
the reference's test_novelty.py / test_repetions.py / test_diversity.py)."""

import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.data.item_frequency import unpopular_mask
from ikea_recommender_tpu.ops.rewards import (
    diversity_rewards,
    get_last_action,
    novelty_rewards,
    repetition_counts,
)


def test_novelty_rewards():
    preds = jnp.array([[100.0, 50, 0, 0, 0], [100.0, -10, 10, 0, 0]])
    mask = jnp.asarray(unpopular_mask({0, 1, 10, 11, 12, 13}, 5))
    res_1 = novelty_rewards(preds, mask, reward=2.0, topk=1)
    np.testing.assert_allclose(res_1, [2.0, 2.0])
    res_2 = novelty_rewards(preds, mask, reward=2.0, topk=2)
    np.testing.assert_allclose(res_2, [2.0, 1.0])


def test_repetition_counts():
    s = jnp.array([[1, 1, 2, 2, 3, 4], [1, 2, 3, 4, 5, 6], [1, 1, 2, 2, 3, 4]])
    preds = jnp.array(
        [[0.0, 11, 10, 5, 5], [0.0, 11, 10, 9, 8], [9.0, 8, 7, 10, -10]]
    )
    res = repetition_counts(s, preds, top_k=[1, 2, 5])
    np.testing.assert_allclose(res[0] / 3, 1.3333333, rtol=1e-5)
    np.testing.assert_allclose(res[1] / 3, 2.3333333, rtol=1e-5)
    np.testing.assert_allclose(res[2] / 3, 5.3333333, rtol=1e-5)


def test_get_last_action_padding_positions():
    s_end = jnp.array([[7, 8, 0, 0], [5, 0, 0, 0]])
    lens = jnp.array([2, 1])
    np.testing.assert_array_equal(get_last_action(s_end, lens, "end"), [8, 5])
    s_beg = jnp.array([[0, 0, 7, 8], [0, 0, 0, 5]])
    np.testing.assert_array_equal(get_last_action(s_beg, lens, "beg"), [8, 5])


def test_diversity_rewards_orthogonal_and_identical():
    # Embedding: id0 = e_x, id1 = e_y (orthogonal), id2 = e_x (identical to 0)
    emb = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 0.0]])
    s = jnp.array([[0, 3], [0, 3]])
    lens = jnp.array([1, 1])
    # preds pick top-1 = action 1 (orthogonal) for row 0 -> sim 0 -> reward 1
    # and top-1 = action 2 (identical) for row 1 -> sim 1 -> reward 0
    preds = jnp.array([[0.0, 10.0, 1.0, -5.0], [0.0, 1.0, 10.0, -5.0]])
    rew = diversity_rewards(
        s, preds, lens, padding_pos="end", topk=1, div_embedding=emb
    )
    np.testing.assert_allclose(rew, [1.0, 0.0], atol=1e-5)


def test_diversity_rewards_topk_mean_and_remap():
    emb = jnp.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, 0.0]])
    s = jnp.array([[0, 3]])
    lens = jnp.array([1])
    # top-2 preds: output ids 0,1; remap output->input: 0->1 (orth), 1->2 (opposite)
    preds = jnp.array([[10.0, 9.0, 0.0, -1.0]])
    out_to_in = jnp.array([1, 2, 3, 0])
    rew = diversity_rewards(
        s, preds, lens, "end", topk=2, div_embedding=emb, out_to_in=out_to_in
    )
    # sims: cos(e0, e1)=0, cos(e0, e2)=-1 -> mean=-0.5 -> reward 1.5
    np.testing.assert_allclose(rew, [1.5], atol=1e-5)
