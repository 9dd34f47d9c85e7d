"""IKEA-generation preprocessing: inspiration-click semantics, dual
tokenizers, n-step futures. Hand-computed expectations."""

import numpy as np
import pandas as pd
import pytest

from ikea_recommender_tpu.data.ikea import (
    add_reward_simple,
    mark_last_inspiration_click,
    prepare_for_replay_buffer,
    prepare_sessions,
    preprocess_train_data,
    to_eval_frame,
)
from ikea_recommender_tpu.data.tokenizer import Tokenizer

REWARDS = {"click_inspiration": 1.0, "select_content": 1.0, "add_to_cart": 5.0}

# One session: views extend history, only inspiration clicks become samples.
EVENTS = [
    ("A", "p1", "view_item"),
    ("A", "i1", "click_inspiration"),
    ("A", "p2", "view_item"),
    ("A", "p2", "add_to_cart"),
    ("A", "i2", "click_inspiration"),
    ("A", "p3", "view_item"),
    ("B", "i1", "select_content"),
    ("B", "p1", "view_item"),
]


def _frame():
    df = pd.DataFrame(EVENTS, columns=["sessionID", "item_id", "action_type"])
    df["market"] = "de"
    return add_reward_simple(df, REWARDS)


def _toks():
    inp = Tokenizer(["p1", "p2", "p3", "i1", "i2"], unknown=True)
    out = Tokenizer(["i1", "i2"], unknown=True)
    market = Tokenizer(["de", "se"])
    return inp, out, market


def test_mark_last_inspiration_click():
    df = _frame()
    is_end = mark_last_inspiration_click(df)
    # session A: last inspiration click is row 4 (i2); B: row 6 (i1)
    np.testing.assert_array_equal(
        is_end, [False, False, False, False, True, False, True, False]
    )


def test_no_inspiration_session_has_no_end():
    df = pd.DataFrame(
        [("X", "p1", "view_item"), ("X", "p2", "view_item")],
        columns=["sessionID", "item_id", "action_type"],
    )
    np.testing.assert_array_equal(mark_last_inspiration_click(df), [False, False])


def test_preprocess_filters_and_remaps_actions():
    inp, out, market = _toks()
    buf = preprocess_train_data(
        _frame(),
        padding_id=inp.pad_idx,
        state_len=3,
        tokenizer_market=market,
        tokenizer_input=inp,
        tokenizer_output=out,
    )
    # Only the 3 inspiration rows survive.
    assert len(buf) == 3
    # actions are OUTPUT-vocab tokens: i1 -> 0, i2 -> 1
    np.testing.assert_array_equal(buf["action"].to_numpy(), [0, 1, 0])
    # rewards: plain per-event mapping (future_steps=1)
    np.testing.assert_array_equal(buf["r_act"].to_numpy(), [1.0, 1.0, 1.0])
    # is_end: i2 row ends A, i1 row ends B
    np.testing.assert_array_equal(buf["is_end"].to_numpy(), [False, True, True])
    # A's i1 state: one event before (p1 -> input token 0), padded
    np.testing.assert_array_equal(buf["state"].iloc[0], [0, inp.pad_idx, inp.pad_idx])
    # A's i2 state: history ...p2(view), p2(cart), preceded by i1:
    # events before i2: p1, i1, p2, p2 -> last 3: [i1, p2, p2] = [3, 1, 1]
    np.testing.assert_array_equal(buf["state"].iloc[1], [3, 1, 1])
    # true lens: pad counting; first state has 1 real, i2 state full (3)
    np.testing.assert_array_equal(buf["true_state_len"].to_numpy(), [1, 3, 1])
    # next lens: A/i1 -> [p1, i1, pad] = 2; A/i2 full = 3; B/i1 -> [i1] = 1
    np.testing.assert_array_equal(buf["true_next_state_len"].to_numpy(), [2, 3, 1])


def test_nstep_all_rewards_and_next_state():
    inp, out, market = _toks()
    buf = preprocess_train_data(
        _frame(),
        padding_id=inp.pad_idx,
        state_len=3,
        tokenizer_market=market,
        tokenizer_input=inp,
        tokenizer_output=out,
        future_steps_next_state="all",
    )
    # A/i1: followed by non-insp rows (p2 view, p2 cart) before i2:
    # reward = 1 + 0 + 5 = 6. A/i2: followed only by p3 view: 1 + 0 = 1.
    # B/i1: followed by p1 view: 1 + 0 = 1.
    np.testing.assert_allclose(buf["r_act"].to_numpy(), [6.0, 1.0, 1.0])
    # A/i1's next_state jumps to A/i2's state [i1, p2, p2] = [3, 1, 1]
    np.testing.assert_array_equal(buf["next_state"].iloc[0], [3, 1, 1])
    # last insp row of each session keeps its own next_state
    # A/i2 next_state: last3 of (p1,i1,p2,p2,i2) = [p2, p2, i2] = [1, 1, 4]
    np.testing.assert_array_equal(buf["next_state"].iloc[1], [1, 1, 4])


def test_nstep_two_rewards():
    inp, out, market = _toks()
    buf = preprocess_train_data(
        _frame(),
        padding_id=inp.pad_idx,
        state_len=3,
        tokenizer_market=market,
        tokenizer_input=inp,
        tokenizer_output=out,
        future_steps_next_state=2,
    )
    # reward = own + immediately next event's reward:
    # A/i1: 1 + 0(view p2) = 1; A/i2: 1 + 0(view p3) = 1; B/i1: 1 + 0 = 1
    np.testing.assert_allclose(buf["r_act"].to_numpy(), [1.0, 1.0, 1.0])


def test_nstep_three_cumulated_rewards():
    """k=3: reward = own + next TWO events' rewards, truncated at the
    session end (the true k-step return; the reference raises
    NotImplementedError for k>2)."""
    inp, out, market = _toks()
    buf = preprocess_train_data(
        _frame(),
        padding_id=inp.pad_idx,
        state_len=3,
        tokenizer_market=market,
        tokenizer_input=inp,
        tokenizer_output=out,
        future_steps_next_state=3,
    )
    # events A: view p1, i1(r=1), view p2(0), cart p2(5), i2(r=1), view p3(0)
    # A/i1: 1 + 0 + 5 = 6; A/i2: 1 + 0 (+ session end) = 1
    # events B: i1(r=1), view p1(0) -> 1 + 0 = 1
    np.testing.assert_allclose(buf["r_act"].to_numpy(), [6.0, 1.0, 1.0])
    # A/i1 next_state jumps 3 events ahead: last3 of (p1,i1,p2,p2) = [i1,p2,p2]
    np.testing.assert_array_equal(
        buf["next_state"].iloc[0],
        [inp.stoi("i1"), inp.stoi("p2"), inp.stoi("p2")],
    )


def test_prepare_sessions_composite_ids():
    records = [
        {
            "market": "de",
            "fullVisitorId": "v1",
            "start_time_ms": 100,
            "events": [
                {"item_id": "p1", "action": "view_item", "timestamp_ms": 1},
                {"item_id": "i1", "action": "click_inspiration", "timestamp_ms": 2},
            ],
        },
        {
            "market": "de",
            "fullVisitorId": "v2",
            "start_time_ms": 200,
            "events": [{"item_id": "p2", "action": "view_item", "timestamp_ms": 3}],
        },
    ]
    df = prepare_sessions(records, session_prefix="0_")
    assert df.sessionID.nunique() == 2
    assert set(df.columns) >= {"sessionID", "item_id", "action_type", "market"}
    assert df.sessionID.iloc[0].startswith("0_")


def test_prepare_for_replay_buffer_dedup_and_cols():
    df = _frame()
    df["timestamp_ms"] = 0
    df2 = pd.concat([df, df.iloc[[0]]])  # duplicate row
    out = prepare_for_replay_buffer(df2)
    assert list(out.columns) == ["sessionID", "item_id", "action_type", "market", "reward"]
    assert len(out) == len(df.drop_duplicates())


def test_eval_frame():
    inp, out, market = _toks()
    buf = preprocess_train_data(
        _frame(), padding_id=inp.pad_idx, state_len=3,
        tokenizer_market=market, tokenizer_input=inp, tokenizer_output=out,
    )
    ev = to_eval_frame(buf)
    assert list(ev.columns) == ["state", "action", "true_state_len"]
