"""Native JSON-lines buffer parser vs the pandas reference path."""

import json

import numpy as np
import pandas as pd
import pytest

from ikea_recommender_tpu.data import native
from ikea_recommender_tpu.data.replay_buffer import ReplayBuffer, _TRAIN_COLS


def _make_df(n=500, state_len=10, seed=0):
    rs = np.random.RandomState(seed)
    return pd.DataFrame(
        {
            "state": [rs.randint(0, 100, state_len).tolist() for _ in range(n)],
            "action": rs.randint(0, 100, n),
            "r_act": rs.rand(n).astype(np.float64).round(4),
            "next_state": [
                rs.randint(0, 100, state_len).tolist() for _ in range(n)
            ],
            "true_state_len": rs.randint(1, state_len + 1, n),
            "true_next_state_len": rs.randint(1, state_len + 1, n),
            "is_end": rs.rand(n) < 0.3,
        }
    )


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_matches_pandas():
    df = _make_df()
    raw = df.to_json(orient="records", lines=True).encode()
    got = native.parse_jsonl_buffer(raw, _TRAIN_COLS)
    assert set(got) == set(df.columns)  # _TRAIN_COLS minus optional cols
    for c in df.columns:
        want = (
            np.asarray(df[c].tolist())
            if c in ("state", "next_state")
            else df[c].to_numpy()
        )
        if c == "r_act":
            np.testing.assert_allclose(got[c], want, rtol=1e-6)
        else:
            np.testing.assert_array_equal(got[c], want, err_msg=c)


@needs_native
def test_native_eval_subset_and_unknown_keys():
    df = _make_df(50)[["state", "action", "true_state_len"]]
    df["extra"] = "ignore me {}[],:"
    raw = df.to_json(orient="records", lines=True).encode()
    got = native.parse_jsonl_buffer(raw, _TRAIN_COLS)
    assert set(got) == {"state", "action", "true_state_len"}
    np.testing.assert_array_equal(got["action"], df["action"].to_numpy())


@needs_native
def test_native_malformed_row_raises():
    raw = b'{"state":[1,2],"action":3}\n{"state":[1,2,"x"],"action":4}\n'
    with pytest.raises(ValueError, match="row 1"):
        native.parse_jsonl_buffer(raw, _TRAIN_COLS)


@needs_native
def test_native_missing_key_raises():
    # Row 1 omits a column row 0 had: must be a loud error, never silent
    # uninitialized memory in that row's slot.
    raw = (
        b'{"state":[1,2],"action":3,"r_act":0.5}\n'
        b'{"state":[4,5],"action":6}\n'
    )
    with pytest.raises(ValueError, match="row 1: missing key r_act"):
        native.parse_jsonl_buffer(raw, _TRAIN_COLS)


@needs_native
def test_native_ragged_array_raises():
    # Shorter-than-first-row arrays must be rejected: zero-padding would
    # silently substitute item id 0 (a real item) for the pad id.
    raw = b'{"state":[1,2,3],"action":1}\n{"state":[4,5],"action":2}\n'
    with pytest.raises(ValueError, match="row 1: array has 2"):
        native.parse_jsonl_buffer(raw, _TRAIN_COLS)


@needs_native
def test_native_leading_blank_lines():
    raw = b'\n  \n{"state":[1,2],"action":3}\n'
    got = native.parse_jsonl_buffer(raw, _TRAIN_COLS)
    assert got is not None
    np.testing.assert_array_equal(got["state"], [[1, 2]])


@needs_native
def test_replay_buffer_jsonl_roundtrip(tmp_path):
    df = _make_df(200, state_len=5)
    p = tmp_path / "buf.jsonl"
    p.write_text(df.to_json(orient="records", lines=True))
    buf = ReplayBuffer(str(p))
    assert len(buf) == 200
    np.testing.assert_array_equal(buf.state, np.asarray(df["state"].tolist()))
    np.testing.assert_array_equal(buf.is_end, df["is_end"].to_numpy())
    # empty / whitespace lines are skipped
    p.write_text(df.to_json(orient="records", lines=True) + "\n\n  \n")
    assert len(ReplayBuffer(str(p))) == 200


@needs_native
def test_native_bool_as_int_and_whitespace():
    rows = [
        '{ "state" : [ 1 , 2 ] , "action" : 7 , "r_act" : 1.5 , '
        '"next_state":[3,4], "true_state_len": 2, "true_next_state_len": 2, '
        '"is_end" : 1 }',
        '{"is_end":false,"state":[5,6],"action":8,"r_act":-2e-1,'
        '"next_state":[7,8],"true_state_len":1,"true_next_state_len":2}',
    ]
    got = native.parse_jsonl_buffer("\n".join(rows).encode(), _TRAIN_COLS)
    np.testing.assert_array_equal(got["is_end"], [True, False])
    np.testing.assert_array_equal(got["state"], [[1, 2], [5, 6]])
    np.testing.assert_allclose(got["r_act"], [1.5, -0.2], rtol=1e-6)
    assert got["action"].tolist() == [7, 8]
