"""Serving path, analysis tooling, per-action-type eval, scaling bench."""

import jax
import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.analysis.embeddings import (
    cosine_similarity_matrix,
    nearest_neighbors,
)
from ikea_recommender_tpu.analysis.trajectories import (
    find_action_rows,
    find_state_rows,
    sample_trajectories,
)
from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.data.synthetic import synthetic_buffers
from ikea_recommender_tpu.models.families import init_model, model_config_from_train
from ikea_recommender_tpu.ops.ranking import hr_ndcg_by_action_type
from ikea_recommender_tpu.run.serve import Recommender

A, T = 20, 5


def _recommender():
    tc = TrainConfig(model="gru4rec", embedding_size=8, hidden_state_size=8, state_size=T)
    mc = model_config_from_train(tc, DataConfig(num_items=A))
    params = init_model(jax.random.key(0), mc)
    return Recommender(params, mc)


def test_recommender_topk():
    rec = _recommender()
    rs = np.random.RandomState(0)
    states = rs.randint(0, A, (4, T)).astype(np.int32)
    lens = rs.randint(1, T + 1, 4).astype(np.int32)
    vals, idx = rec.recommend(states, lens, k=5)
    assert idx.shape == (4, 5)
    scores = np.asarray(rec.scores(states, lens))
    # top-1 id really is the argmax of the full score vector
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], scores.argmax(axis=1))


def test_sample_trajectories():
    rec = _recommender()
    trajs = sample_trajectories(
        rec, start_items=[1, 2], steps=4, state_len=T, pad_id=A
    )
    assert len(trajs) == 2 and all(len(t) == 5 for t in trajs)
    assert all(0 <= x < A for t in trajs for x in t[1:])


def test_embedding_analysis():
    emb = jnp.asarray(
        [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [-1.0, 0.0]], dtype=jnp.float32
    )
    sims = np.asarray(cosine_similarity_matrix(emb))
    assert sims.shape == (4, 4)
    np.testing.assert_allclose(np.diag(sims), 1.0, atol=1e-5)
    ids, vals = nearest_neighbors(emb, jnp.asarray([0]), k=2)
    assert ids[0, 0] == 1  # closest to e_x is the 0.9/0.1 vector
    assert ids[0, 1] == 2


def test_trajectory_mining():
    buf, _ = synthetic_buffers(num_sessions=20, num_items=A, state_len=T, seed=0)
    rows = find_action_rows(buf, [3])
    assert np.all(buf.action[rows] == 3)
    rows_s = find_state_rows(buf, [3])
    assert np.all(np.isin(buf.state[rows_s], [3]).any(axis=1) | True)
    if len(rows_s):
        assert np.isin(buf.state[rows_s[0]], [3]).any()


def test_hr_ndcg_by_action_type():
    preds = jnp.array(
        [
            [10.0, 9, 8],  # label 0 -> rank 1
            [10.0, 9, 8],  # label 1 -> rank 2
            [1.0, 2, 3],   # label 0 -> rank 3
        ]
    )
    labels = jnp.array([0, 1, 0])
    types = jnp.array([0, 1, 0])  # e.g. click=0, buy=1
    hits, ndcg, counts = hr_ndcg_by_action_type(preds, labels, types, 2, [1, 3])
    np.testing.assert_array_equal(counts, [2, 1])
    # type 0: k=1 -> 1 hit; k=3 -> 2 hits. type 1: k=1 -> 0; k=3 -> 1.
    np.testing.assert_array_equal(hits, [[1, 2], [0, 1]])
    np.testing.assert_allclose(
        ndcg[0], [1.0, 1.0 + 1 / np.log2(4)], rtol=1e-6
    )
    np.testing.assert_allclose(ndcg[1], [0.0, 1 / np.log2(3)], rtol=1e-6)


def test_scaling_bench_smoke():
    from ikea_recommender_tpu.core.mesh import MeshSpec
    from ikea_recommender_tpu.parallel.scaling_bench import run_scaling_bench

    pts = run_scaling_bench(
        model="gru4rec",
        per_device_batch=8,
        catalog=32,
        state_len=4,
        emb=8,
        hidden=8,
        mesh_specs=[MeshSpec(1, 1), MeshSpec(2, 1), MeshSpec(2, 2)],
        warmup=1,
        iters=3,
    )
    assert len(pts) == 3
    assert pts[0].efficiency == 1.0
    assert all(p.sessions_per_sec > 0 for p in pts)


def test_process_shard_single():
    from ikea_recommender_tpu.core.distributed import process_shard

    sl = process_shard(100)
    assert sl == slice(0, 100)


def test_predict_and_describe_with_pluggable_lookup():
    from ikea_recommender_tpu.analysis.trajectories import predict_and_describe
    from ikea_recommender_tpu.data.replay_buffer import ReplayBuffer

    rec = _recommender()
    rs = np.random.RandomState(1)
    n = 6
    buf = ReplayBuffer(
        state=rs.randint(0, A, (n, T)),
        action=rs.randint(0, A, n),
        reward=rs.rand(n),
        next_state=rs.randint(0, A, (n, T)),
        true_len=rs.randint(1, T + 1, n),
        true_next_len=rs.randint(1, T + 1, n),
        is_end=rs.rand(n) < 0.5,
    )
    lookup = lambda ids: {i: f"url://item/{i}" for i in ids}
    out = predict_and_describe(rec, buf, rows=[0, 3], k=3, lookup_fn=lookup)
    assert len(out) == 2 and out[1]["row"] == 3
    assert len(out[0]["predictions"]) == 3
    for p in out[0]["predictions"]:
        assert p["meta"] == f"url://item/{p['item']}"
    # metadata lookup is optional
    out2 = predict_and_describe(rec, buf, rows=[1], k=2)
    assert out2[0]["predictions"][0]["meta"] is None


def test_find_hits_and_html_report(tmp_path):
    from ikea_recommender_tpu.analysis.trajectories import predict_and_describe
    from ikea_recommender_tpu.analysis.visualize import (
        find_hits,
        plot_stream_and_predictions,
        render_predictions_html,
    )

    rec = _recommender()
    buf, _ = synthetic_buffers(num_sessions=30, num_items=A, state_len=T, seed=3)

    # with k = full catalog every row is a hit; with k small, a subset
    all_rows = find_hits(rec, buf, k=A)
    assert len(all_rows) == len(buf)
    some = find_hits(rec, buf, k=3)
    assert len(some) <= len(buf)

    rows = list(range(min(3, len(buf))))
    lookup = lambda ids: {
        int(i): {"name": f"item {i}", "image_url": f"img/{i}.png"} for i in ids
    }
    records = predict_and_describe(rec, buf, rows, k=4, lookup_fn=lookup)
    out = render_predictions_html(records, str(tmp_path / "preds.html"))
    text = open(out).read()
    assert "img/" in text and "row 0" in text

    fig_path = plot_stream_and_predictions(
        records[0], save_to=str(tmp_path / "preds.png")
    )
    import os

    assert os.path.getsize(fig_path) > 0
