"""Spot-run mirrored experiment configs through the CLI on synthetic data.

Validates the experiment mirror (scripts/gen_experiment_mirror.py): picks
representative configs from the mirrored classes, stages synthetic data in
their schema (RetailRocket flavor with click/buy action types; IKEA flavor
with dual tokenizers), rewrites ONLY data paths / vocab sizes / epoch count
into a run copy, and executes ``python -m ikea_recommender_tpu.run.cli``.

Usage: python scripts/spot_run_experiments.py [config.yaml ...]
Default picks ONE config from every mirrored class directory (16 classes),
spanning the axes: beg/end padding, packed sequences, single/double-Q Adam,
action-type metrics, SMORL alpha/q_weights overrides, IKEA dual-tokenizer
data, 2-layer 128-wide bidirectional GRU, and the SARM template.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ikea_recommender_tpu.data.ikea import preprocess_train_data, to_eval_frame
from ikea_recommender_tpu.data.item_frequency import save_unpopular_items
from ikea_recommender_tpu.data.preprocessing import window_sessions
from ikea_recommender_tpu.data.replay_buffer import EvalBuffer, ReplayBuffer
from ikea_recommender_tpu.data.split import train_test_split_ids
from ikea_recommender_tpu.data.synthetic import synthetic_sessions
from ikea_recommender_tpu.data.tokenizer import Tokenizer

DEFAULTS = [  # one per mirrored class directory
    "experiments/Ablations/SQN-action-types/SQN-action-types.yaml",
    "experiments/IKEA/Hyperparameter-Tuning/SMORL-lr-001-sd2-alpha5-133-divnovfirst/SMORL-lr-001-sd2-alpha5-133-divnovfirst.yaml",
    "experiments/IKEA/State-Length-Exp/BidirGRU-s20-d035-128-onelayer-twoGRUlay/BidirGRU-s20-d035-128-onelayer-twoGRUlay.yaml",
    "experiments/IKEA/Test-Runs/SQN-Test1-lr001-sd1/SQN-Test1-lr001-sd1.yaml",
    "experiments/IKEA/final_experiments/SMORL-paper/SMORL-paper.yaml",
    "experiments/IKEA/first_runs/IKEA_GRU_right_tokenizer_smallerBS/IKEA_GRU_right_tokenizer_smallerBS.yaml",
    "experiments/IKEA/templates/exp_adam_QSLATE-tester-64/exp_adam_QSLATE-tester-64.yaml",
    "experiments/RetailRocket-Comparison/GRU4Rec_paper/GRU4Rec_paper.yaml",
    "experiments/paper/GRU4Rec/GRU_opt3_packed/GRU_opt3_packed.yaml",
    "experiments/paper/RetailRocket-Comparison-Val/paper_SMORL/paper_SMORL.yaml",
    "experiments/paper/SMORL-RetailRocket/SMORL_GRU_front_train_pad/SMORL_GRU_front_train_pad.yaml",
    "experiments/paper/SMORL-SQN-Exps/SQN-SMORL-Rew1/SQN-SMORL-Rew1.yaml",
    "experiments/paper/SQN_RetailRocket_NoCV/SQN_GRU_paper_opt3_packed/SQN_GRU_paper_opt3_packed.yaml",
    "experiments/paper/SQN_RetailRocket_NoCV_2/SQN_GRU_paper_replica_trainable/SQN_GRU_paper_replica_trainable.yaml",
    "experiments/paper/SQN_RetailRocket_NoCV_final/SQN_GRU_paper_opt2_front/SQN_GRU_paper_opt2_front.yaml",
    "experiments/paper/playing/play_around/play_around.yaml",
]

RR_ITEMS = 500


def stage_retailrocket(out: str, pad_pos: str, state_len: int) -> None:
    os.makedirs(out, exist_ok=True)
    items, sids = synthetic_sessions(
        num_sessions=800, num_items=RR_ITEMS, mean_len=8, seed=11
    )
    tr, va, _te = train_test_split_ids(sids, seed=118)

    def build(mask):
        win = window_sessions(
            items[mask], sids[mask], state_len, pad_id=RR_ITEMS, pad_pos=pad_pos
        )
        rs = np.random.RandomState(3)
        # click/buy action types with the reference's 0.2/1.0 reward map
        types = (rs.rand(len(win)) < 0.25).astype(np.int32)
        buf = ReplayBuffer(
            state=win.state,
            action=win.action,
            reward=np.where(types == 1, 1.0, 0.2).astype(np.float32),
            next_state=win.next_state,
            true_len=win.true_state_len,
            true_next_len=win.true_next_state_len,
            is_end=win.is_end,
        )
        buf.action_type = types
        return buf

    build(tr).save_npz(os.path.join(out, "replay_buffer.npz"))
    EvalBuffer.from_replay_buffer(build(va)).save_npz(
        os.path.join(out, "eval_buffer.npz")
    )
    save_unpopular_items(items, os.path.join(out, "unpopular_items.json"), 0.9)
    rs = np.random.RandomState(0)
    np.save(
        os.path.join(out, "OG_embeddings.npy"),
        rs.randn(RR_ITEMS + 1, 64).astype(np.float32),
    )


def stage_ikea(out: str, state_len: int) -> None:
    import pandas as pd

    os.makedirs(out, exist_ok=True)
    n_prod, n_insp = 120, 60
    rs = np.random.RandomState(5)
    rows = []
    for s in range(400):
        for _ in range(rs.randint(4, 10)):
            if rs.rand() < 0.5:
                rows.append((f"s{s}", f"prod_{rs.randint(n_prod)}",
                             "view_product", 0.0))
            else:
                rows.append((f"s{s}", f"insp_{rs.randint(n_insp)}",
                             "click_inspiration", 1.0))
    df = pd.DataFrame(
        rows, columns=["sessionID", "item_id", "action_type", "reward"]
    )
    input_tok = Tokenizer(
        [f"prod_{i}" for i in range(n_prod)]
        + [f"insp_{i}" for i in range(n_insp)]
    )
    output_tok = Tokenizer([f"insp_{i}" for i in range(n_insp)])
    input_tok.save_to_file(os.path.join(out, "input_tokenizer.json"))
    output_tok.save_to_file(os.path.join(out, "output_tokenizer.json"))
    Tokenizer(["se", "de"]).save_to_file(
        os.path.join(out, "market_tokenizer.json")
    )
    frame = preprocess_train_data(
        df,
        padding_id=input_tok.pad_idx,
        state_len=state_len,
        tokenizer_market=None,
        tokenizer_input=input_tok,
        tokenizer_output=output_tok,
    )
    n = len(frame)
    tr = frame.iloc[: int(0.8 * n)]
    va = frame.iloc[int(0.8 * n):]
    ReplayBuffer.from_dataframe(tr).save_npz(
        os.path.join(out, "replay_buffer_train.npz")
    )
    EvalBuffer.from_dataframe(to_eval_frame(va)).save_npz(
        os.path.join(out, "replay_buffer_val.npz")
    )
    save_unpopular_items(
        frame["action"].to_numpy(),
        os.path.join(out, "unpopular_images.json"),
        0.9,
    )
    num_items = len(input_tok) - 1
    np.save(
        os.path.join(out, "embedding_weights.npy"),
        np.random.RandomState(1).randn(num_items + 1, 64).astype(np.float32),
    )


def make_run_copy(src: str, spot_root: str) -> str:
    with open(src) as fh:
        cfg = yaml.safe_load(fh)
    name = cfg["exp_name"]
    train = cfg["train"]
    data = cfg["data"]
    metrics = cfg["metrics"]
    ikea_flavor = bool(data.get("input_tokenizer"))
    state_len = int(train.get("state_size", 10))
    if ikea_flavor:
        d = os.path.join(spot_root, f"ikea_s{state_len}")
        if not os.path.exists(os.path.join(d, "replay_buffer_train.npz")):
            stage_ikea(d, state_len)
        data.update(
            train_path=f"{d}/replay_buffer_train.npz",
            val_path=f"{d}/replay_buffer_val.npz",
            test_path=f"{d}/replay_buffer_val.npz",
            input_tokenizer=f"{d}/input_tokenizer.json",
            output_tokenizer=f"{d}/output_tokenizer.json",
            market_tokenizer=f"{d}/market_tokenizer.json",
            num_items=0,
            num_actions=0,
        )
        metrics["unpopular_actions_path"] = f"{d}/unpopular_images.json"
        metrics["div_emb_dir"] = f"{d}/embedding_weights.npy"
    else:
        pad = train.get("padding_position", "end")
        d = os.path.join(spot_root, f"rr_{pad}_s{state_len}")
        if not os.path.exists(os.path.join(d, "replay_buffer.npz")):
            stage_retailrocket(d, pad, state_len)
        data.update(
            train_path=f"{d}/replay_buffer.npz",
            val_path=f"{d}/eval_buffer.npz",
            test_path=f"{d}/eval_buffer.npz",
            num_items=RR_ITEMS,
        )
        train["padding_id"] = RR_ITEMS
        metrics["unpopular_actions_path"] = f"{d}/unpopular_items.json"
        metrics["div_emb_dir"] = f"{d}/OG_embeddings.npy"
    train["epochs"] = 1
    train["val_batch_size"] = min(512, int(train.get("val_batch_size", 512)))
    run_dir = os.path.join(spot_root, "runs", name)
    os.makedirs(run_dir, exist_ok=True)
    dst = os.path.join(run_dir, f"{name}.yaml")
    with open(dst, "w") as fh:
        fh.write(
            f"# spot-run copy of {src} (synthetic data, epochs clamped to 1)\n"
            + yaml.safe_dump(cfg, sort_keys=False)
        )
    return dst


def main(argv) -> int:
    platform = None
    if argv and argv[0].startswith("--platform="):
        platform = argv[0].split("=", 1)[1]
        argv = argv[1:]
    configs = argv or DEFAULTS
    spot_root = os.path.join(REPO, "data", "spot")
    env = dict(os.environ)
    if platform:
        env["IKEA_PLATFORM"] = platform  # run/cli.py backend override
    failures = []
    for src in configs:
        dst = make_run_copy(os.path.join(REPO, src), spot_root)
        print(f"=== spot-run {src}", flush=True)
        res = subprocess.run(
            [sys.executable, "-m", "ikea_recommender_tpu.run.cli", "-f", dst],
            cwd=REPO,
            env=env,
        )
        if res.returncode != 0:
            failures.append(src)
    if failures:
        print("FAILED:", *failures, sep="\n  ")
        return 1
    print(f"all {len(configs)} spot-runs passed")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
