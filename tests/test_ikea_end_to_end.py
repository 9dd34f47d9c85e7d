"""IKEA-flavor end-to-end: raw session events -> dual tokenizers -> IKEA
preprocessing -> replay buffers -> SMORL training with the output->input
remap -> eval metrics.

This is the reference's production path (ikea/training/trainSMORL.py over
buffers from ikea/data_utils/preprocessing.py): the INPUT vocabulary covers
all interactions (products + inspiration images), the OUTPUT head only the
inspiration images, and every metric comparing predictions to state content
goes through the output->input token remap.
"""

import numpy as np
import pandas as pd
import pytest

from ikea_recommender_tpu.core.config import (
    Config,
    DataConfig,
    ExperimentConfig,
    MetricsConfig,
    TrainConfig,
)
from ikea_recommender_tpu.data.ikea import preprocess_train_data, to_eval_frame
from ikea_recommender_tpu.data.replay_buffer import EvalBuffer, ReplayBuffer
from ikea_recommender_tpu.data.tokenizer import Tokenizer
from ikea_recommender_tpu.run.trainer import train

N_PRODUCTS, N_INSP = 20, 10
STATE_LEN = 6


def _raw_events(n_sessions=120, seed=0):
    """Synthetic GA-like event log: product views interleaved with
    inspiration clicks; inspiration image i tends to follow product i % 2."""
    rs = np.random.RandomState(seed)
    rows = []
    for s in range(n_sessions):
        length = rs.randint(4, 10)
        for _ in range(length):
            if rs.rand() < 0.55:
                rows.append((f"s{s}", f"prod_{rs.randint(N_PRODUCTS)}",
                             "view_product", 0.0))
            else:
                prev_prod = next(
                    (r[1] for r in reversed(rows)
                     if r[0] == f"s{s}" and r[2] == "view_product"), "prod_0",
                )
                base = int(prev_prod.split("_")[1]) % N_INSP
                insp = base if rs.rand() < 0.7 else rs.randint(N_INSP)
                rows.append((f"s{s}", f"insp_{insp}", "click_inspiration", 1.0))
    return pd.DataFrame(rows, columns=["sessionID", "item_id", "action_type", "reward"])


def _tokenizers():
    input_tok = Tokenizer(
        [f"prod_{i}" for i in range(N_PRODUCTS)]
        + [f"insp_{i}" for i in range(N_INSP)]
    )
    output_tok = Tokenizer([f"insp_{i}" for i in range(N_INSP)])
    return input_tok, output_tok


def test_ikea_dual_vocab_pipeline_and_training(tmp_path):
    input_tok, output_tok = _tokenizers()
    num_items = len(input_tok) - 1  # pad occupies the extra row
    num_actions = len(output_tok) - 1
    assert num_actions < num_items

    df = _raw_events()
    buf_frame = preprocess_train_data(
        df,
        padding_id=input_tok.pad_idx,
        state_len=STATE_LEN,
        tokenizer_market=None,
        tokenizer_input=input_tok,
        tokenizer_output=output_tok,
    )
    # contract: actions in the OUTPUT vocab, states in the INPUT vocab
    assert buf_frame["action"].max() < num_actions
    assert np.stack(buf_frame["state"]).max() <= input_tok.pad_idx
    assert buf_frame["true_state_len"].min() >= 1
    # only inspiration clicks became samples
    assert len(buf_frame) == (df["action_type"] == "click_inspiration").sum()
    # every session's last inspiration click is an episode end
    assert buf_frame["is_end"].sum() > 0

    train_buf = ReplayBuffer.from_dataframe(buf_frame)
    val_buf = EvalBuffer.from_dataframe(to_eval_frame(buf_frame))

    cfg = Config(
        experiment=ExperimentConfig(seed=0),
        data=DataConfig(num_items=num_items, num_actions=num_actions),
        train=TrainConfig(
            model="smorl",
            batch_size=32,
            val_batch_size=64,
            epochs=2,
            learning_rate=0.01,
            embedding_size=8,
            hidden_state_size=8,
            state_size=STATE_LEN,
            best_model_metric="Val_NDCG@5",
            eval_at=[1.0],
            q_weights=[1.0, 1.0, 1.0],
            padding_id=input_tok.pad_idx,
        ),
        metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5], topk_div=1,
                              topk_nov=1),
        exp_dir=str(tmp_path),
    )
    rs = np.random.RandomState(0)
    outcome = train(
        cfg,
        train_buf=train_buf,
        val_buf=val_buf,
        test_buf=val_buf,
        div_embedding=rs.randn(num_items + 1, 8).astype(np.float32),
        unpopular={0, 1, 2},
        input_tokenizer=input_tok,
        output_tokenizer=output_tok,
    )
    test_metrics = outcome.test_metrics
    hr = next(v for k, v in test_metrics.items() if "HR@5" in k)
    assert np.isfinite(hr) and 0.0 <= hr <= 1.0
    # the successor structure is learnable: better than the 1/num_actions prior
    assert hr > 1.0 / num_actions
