"""Replay-buffer trajectory mining (reference
``ikea/results/result_analysis.py:12-72``): find the buffer rows whose
state/action involve given items, and sample model rollouts."""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ikea_recommender_tpu.data.replay_buffer import ReplayBuffer


def find_action_rows(buf: ReplayBuffer, item_ids: Sequence[int]) -> np.ndarray:
    """Row indices whose action is one of `item_ids`."""
    return np.flatnonzero(np.isin(buf.action, np.asarray(item_ids)))


def find_state_rows(buf: ReplayBuffer, item_ids: Sequence[int]) -> np.ndarray:
    """Row indices whose state contains any of `item_ids`."""
    return np.flatnonzero(np.isin(buf.state, np.asarray(item_ids)).any(axis=1))


def sample_trajectories(
    recommender,
    start_items: Sequence[int],
    steps: int,
    state_len: int,
    pad_id: int,
    top_preds_to_show: int = 3,
    rng: Optional[np.random.Generator] = None,
) -> List[List[int]]:
    """Simulate customers who pick one of the model's top predictions at
    each step (reference ``repetitiveness.py:6-18``'s unfinished
    simulate_trajectories, completed). Returns item-id trajectories."""
    rng = rng or np.random.default_rng(0)
    trajectories = []
    for start in start_items:
        history = [int(start)]
        for _ in range(steps):
            window = history[-state_len:]
            state = np.full((1, state_len), pad_id, dtype=np.int32)
            state[0, : len(window)] = window
            lens = np.asarray([max(len(window), 1)], dtype=np.int32)
            _, idx = recommender.recommend(state, lens, k=top_preds_to_show)
            pick = int(np.asarray(idx)[0, rng.integers(top_preds_to_show)])
            history.append(pick)
        trajectories.append(history)
    return trajectories
