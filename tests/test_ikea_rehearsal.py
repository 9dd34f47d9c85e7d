"""IKEA-flavor rehearsal protocol dry run (scripts/ikea_rehearsal.py):
GA-schema synthetic events -> dual tokenizers -> data/ikea.py k-step
preprocessing -> buffers -> gru4rec embedding leg -> SMORL with the
frozen-embedding chain and real (nonzero) diversity rewards."""

import argparse
import importlib.util
import json
import os

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "ikea_rehearsal",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "ikea_rehearsal.py"),
)
ir = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(ir)


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ikea")
    data = str(root / "data")
    bufs = str(root / "buffers")
    ir.synth(argparse.Namespace(
        out=data, sessions=1500, products=400, insp=80, seed=0
    ))
    ir.buffers(argparse.Namespace(
        data=data, out=bufs, state_len=8, future_steps=3,
        unpopular_quantile=0.4,
    ))
    return root, data, bufs


def test_buffer_artifacts_and_vocab_contract(pipeline_dirs):
    _, _, bufs = pipeline_dirs
    meta = json.load(open(os.path.join(bufs, "meta.json")))
    # dual-vocab contract: output head strictly smaller than input vocab
    assert meta["num_actions"] < meta["num_items"]
    assert meta["num_items"] == 480 and meta["num_actions"] == 80
    buf = np.load(os.path.join(bufs, "replay_buffer.npz"))
    assert buf["action"].max() < meta["num_actions"]
    assert buf["state"].max() <= meta["padding_id"]
    # k-step cumulated returns: click (1.0) + following view rewards (0.1)
    # produce non-unit reward values
    assert len(np.unique(np.round(buf["r_act"], 3))) > 1


def test_gru4rec_then_smorl_chain(pipeline_dirs, tmp_path):
    _, _, bufs = pipeline_dirs
    g_out = str(tmp_path / "gru4rec_run")
    ir.run(argparse.Namespace(
        buffers=bufs, family="gru4rec", epochs=1, seed=0, out=g_out
    ))
    assert os.path.exists(os.path.join(g_out, "embedding_weights.npy"))
    s_out = str(tmp_path / "smorl_run")
    ir.run(argparse.Namespace(
        buffers=bufs, family="smorl", epochs=1, seed=0, out=s_out
    ))
    tm = json.load(open(os.path.join(s_out, "test_metrics.json")))
    div = [v for k, v in tm.items() if "Div_Reward" in k]
    assert div and any(v != 0.0 for v in div)
