"""Golden-value tests of the session windowing pipeline.

The session data and expected windows re-state the behavioral spec exercised
by the reference's ``test/test_preprocessing.py`` (same sessions, same
expectations for both padding positions, rewards, lengths, is_end).
"""

import numpy as np
import pandas as pd
import pytest

from ikea_recommender_tpu.data.preprocessing import (
    map_rewards,
    preprocess_train_data,
    preprocess_train_data_incl_act_rew,
    preprocess_val_data,
    window_sessions,
)

PAD = 999
L = 3

# Three sessions: items per session, action types per event.
SESSIONS = {
    "s1": ([1, 2, 3, 4], [0, 0, 0, 1]),
    "s2": ([6, 7, 8, 9, 10, 11], [0, 0, 1, 0, 0, 0]),
    "s3": ([100, 101], [1, 1]),
}


def _frame():
    rows = []
    for sid, (items, types) in SESSIONS.items():
        for it, ty in zip(items, types):
            rows.append({"SessionID": sid, "Item": it, "ActionType": ty})
    return pd.DataFrame(rows)


TRUTH_STATE_END = np.array(
    [
        [999, 999, 999], [1, 999, 999], [1, 2, 999], [1, 2, 3],
        [999, 999, 999], [6, 999, 999], [6, 7, 999], [6, 7, 8],
        [7, 8, 9], [8, 9, 10],
        [999, 999, 999], [100, 999, 999],
    ]
)
TRUTH_STATE_BEG = np.array(
    [
        [999, 999, 999], [999, 999, 1], [999, 1, 2], [1, 2, 3],
        [999, 999, 999], [999, 999, 6], [999, 6, 7], [6, 7, 8],
        [7, 8, 9], [8, 9, 10],
        [999, 999, 999], [999, 999, 100],
    ]
)
TRUTH_NEXT_END = np.array(
    [
        [1, 999, 999], [1, 2, 999], [1, 2, 3], [2, 3, 4],
        [6, 999, 999], [6, 7, 999], [6, 7, 8], [7, 8, 9],
        [8, 9, 10], [9, 10, 11],
        [100, 999, 999], [100, 101, 999],
    ]
)
TRUTH_NEXT_BEG = np.array(
    [
        [999, 999, 1], [999, 1, 2], [1, 2, 3], [2, 3, 4],
        [999, 999, 6], [999, 6, 7], [6, 7, 8], [7, 8, 9],
        [8, 9, 10], [9, 10, 11],
        [999, 999, 100], [999, 100, 101],
    ]
)
TRUE_REWS = [10, 10, 10, 50, 10, 10, 50, 10, 10, 10, 50, 50]
TRUE_ACT = [1, 2, 3, 4, 6, 7, 8, 9, 10, 11, 100, 101]
TRUE_LENS = [1, 1, 2, 3, 1, 1, 2, 3, 3, 3, 1, 1]
TRUE_NEXT_LENS = [1, 2, 3, 3, 1, 2, 3, 3, 3, 3, 1, 2]
TRUE_IS_END = [0, 0, 0, 1, 0, 0, 0, 0, 0, 1, 0, 1]


@pytest.mark.parametrize(
    "pad_pos,truth_s,truth_ns",
    [("end", TRUTH_STATE_END, TRUTH_NEXT_END), ("beg", TRUTH_STATE_BEG, TRUTH_NEXT_BEG)],
)
def test_window_sessions_golden(pad_pos, truth_s, truth_ns):
    df = _frame()
    win = window_sessions(
        items=df["Item"].to_numpy(),
        session_ids=df["SessionID"].to_numpy(),
        state_len=L,
        pad_id=PAD,
        pad_pos=pad_pos,
    )
    np.testing.assert_array_equal(win.state, truth_s)
    np.testing.assert_array_equal(win.next_state, truth_ns)
    np.testing.assert_array_equal(win.action, TRUE_ACT)
    np.testing.assert_array_equal(win.true_state_len, TRUE_LENS)
    np.testing.assert_array_equal(win.true_next_state_len, TRUE_NEXT_LENS)
    np.testing.assert_array_equal(win.is_end, np.array(TRUE_IS_END, dtype=bool))


def test_window_sessions_interleaved_rows():
    """Sessions need not be contiguous; group order within session governs."""
    items = np.array([1, 6, 2, 7, 3, 8])
    sids = np.array(["a", "b", "a", "b", "a", "b"])
    win = window_sessions(items, sids, state_len=2, pad_id=0, pad_pos="end")
    np.testing.assert_array_equal(
        win.state, [[0, 0], [0, 0], [1, 0], [6, 0], [1, 2], [6, 7]]
    )
    np.testing.assert_array_equal(win.is_end, [False, False, False, False, True, True])


def test_preprocess_incl_act_rew_dataframe():
    df = _frame()
    out = preprocess_train_data_incl_act_rew(
        df,
        padding_id=PAD,
        state_len=L,
        incl_reward=True,
        action_to_reward_dict={0: 10, 1: 50},
        pad_pos="end",
        action_type_name="ActionType",
        session_id_name="SessionID",
        action_name="Item",
    )
    np.testing.assert_array_equal(np.array(out["state"].tolist()), TRUTH_STATE_END)
    np.testing.assert_array_equal(out["reward"].to_numpy(), TRUE_REWS)
    np.testing.assert_array_equal(out["action"].to_numpy(), TRUE_ACT)
    np.testing.assert_array_equal(out["true_state_len"].to_numpy(), TRUE_LENS)
    np.testing.assert_array_equal(out["true_next_state_len"].to_numpy(), TRUE_NEXT_LENS)


def test_preprocess_train_and_val():
    df = _frame().rename(columns={"SessionID": "session_id", "Item": "item_id"})
    df["reward"] = map_rewards(df["ActionType"].to_numpy(), {0: 10, 1: 50})
    tr = preprocess_train_data(df, padding_id=PAD, state_len=L)
    assert list(tr.columns) == [
        "state", "action", "r_act", "next_state",
        "true_state_len", "true_next_state_len", "is_end",
    ]
    np.testing.assert_array_equal(tr["r_act"].to_numpy(), TRUE_REWS)
    va = preprocess_val_data(df, padding_id=PAD, state_len=L)
    assert list(va.columns) == ["state", "action", "true_state_len"]
    np.testing.assert_array_equal(va["true_state_len"].to_numpy(), TRUE_LENS)


def test_long_session_truncation():
    """States truncate to the last state_len events (the reference's only
    'long-context mechanism')."""
    items = np.arange(100)
    sids = np.zeros(100, dtype=int)
    win = window_sessions(items, sids, state_len=5, pad_id=-1, pad_pos="end")
    np.testing.assert_array_equal(win.state[-1], [94, 95, 96, 97, 98])
    assert win.true_state_len.max() == 5
