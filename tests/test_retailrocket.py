"""RetailRocket protocol dry run: synth events -> ETL -> buffers -> one
paper-operating-point training epoch, end-to-end through
scripts/retailrocket.py (the real-data run needs the Kaggle dataset —
see RESULTS.md "RetailRocket parity status")."""

import argparse
import importlib.util
import json
import os
import sys

import pandas as pd
import pytest

_spec = importlib.util.spec_from_file_location(
    "retailrocket",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "retailrocket.py"),
)
rr = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(rr)


@pytest.fixture(scope="module")
def protocol_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("rr")
    events = str(root / "events.csv")
    data = str(root / "data")
    bufs = str(root / "buffers")
    rr.synth(argparse.Namespace(
        out=events, num_sessions=250, num_items=200, seed=0
    ))
    rr.etl(argparse.Namespace(
        events=events, out=data, click_events=["view"],
        buy_events=["transaction", "addtocart"], min_item_count=3,
        min_session_len=3, sample_sessions=0, seed=0,
    ))
    rr.buffers(argparse.Namespace(
        data=data, out=bufs, state_len=10, pad_pos="end",
        unpopular_quantile=0.4,
    ))
    return root, events, data, bufs


def test_etl_output_schema_and_filters(protocol_dirs):
    _, _, data, _ = protocol_dirs
    train = pd.read_pickle(os.path.join(data, "sampled_train.df"))
    assert list(train.columns) == ["session_id", "item_id", "is_buy", "reward"]
    meta = json.load(open(os.path.join(data, "item_map.json")))
    # dense re-tokenization: ids are exactly 0..N-1
    assert train["item_id"].max() < meta["num_items"]
    assert train["item_id"].min() >= 0
    # OGPaper rewards
    assert set(train["reward"].unique()) <= {rr.REWARD_BUY, rr.REWARD_CLICK}
    assert (train.loc[train["is_buy"] == 1, "reward"] == rr.REWARD_BUY).all()
    # fixpoint filters held: every session >= 3 events, every item >= 3 uses
    assert train.groupby("session_id").size().min() >= 3 or len(train) == 0
    full = pd.concat(
        [pd.read_pickle(os.path.join(data, f"sampled_{s}.df"))
         for s in ("train", "val", "test")]
    )
    assert full["item_id"].value_counts().min() >= 3


def test_buffer_artifacts(protocol_dirs):
    _, _, _, bufs = protocol_dirs
    for f in ("replay_buffer.npz", "val_buffer.npz", "test_buffer.npz",
              "unpopular_items.json", "meta.json"):
        assert os.path.exists(os.path.join(bufs, f)), f


def test_paper_point_trains(protocol_dirs, tmp_path):
    root, _, _, bufs = protocol_dirs
    out = str(tmp_path / "gru4rec_run")
    rr.run(argparse.Namespace(
        buffers=bufs, family="gru4rec", epochs=1, seed=0, out=out
    ))
    metrics = json.load(open(os.path.join(out, "test_metrics.json")))
    assert any("NDCG@10" in k for k in metrics)
    # the gru4rec leg is the embedding-pretraining phase of the SMORL chain
    # (reference trainGRU.py:411-415): it must export its embedding matrix
    emb_path = os.path.join(out, "embedding_weights.npy")
    assert os.path.exists(emb_path)

    # smorl leg: auto-discovers the sibling gru4rec export and trains with a
    # REAL (nonzero) diversity reward — the r4 rehearsal silently ran with
    # div ≡ 0 (VERDICT r4 missing-2); the protocol now refuses that.
    smorl_out = str(tmp_path / "smorl_run")
    rr.run(argparse.Namespace(
        buffers=bufs, family="smorl", epochs=1, seed=0, out=smorl_out
    ))
    summary = json.load(open(os.path.join(smorl_out, "run_summary.json")))
    test_metrics = json.load(
        open(os.path.join(smorl_out, "test_metrics.json"))
    )
    div_keys = [k for k in test_metrics if "Div_Reward" in k]
    assert div_keys and any(test_metrics[k] != 0.0 for k in div_keys), (
        test_metrics, summary.get("family"),
    )


def test_smorl_without_pretrained_embeddings_refuses(protocol_dirs, tmp_path):
    _, _, _, bufs = protocol_dirs
    with pytest.raises(SystemExit, match="diversity embedding"):
        rr.run(argparse.Namespace(
            buffers=bufs, family="smorl", epochs=1, seed=0,
            out=str(tmp_path / "isolated" / "smorl_run"),
        ))
