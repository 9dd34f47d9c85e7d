"""Build replay buffers from a raw session file (RetailRocket-style).

Mirrors the reference's buffer-build CLIs
(``scripts/general/replay_buffer_SMORL_from_file.py``: pad id 70852,
state_len 10) but emits the framework's columnar .npz format.

Usage:
  python scripts/build_replay_buffer.py -f sessions.df -o out/ \
      --padding-id 70852 --state-len 10 [--eval]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ikea_recommender_tpu.data.preprocessing import (
    preprocess_train_data,
    preprocess_val_data,
)
from ikea_recommender_tpu.data.replay_buffer import EvalBuffer, ReplayBuffer


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-f", "--file", required=True, help="raw session file (pickle/csv/jsonl)")
    p.add_argument("-o", "--out", required=True, help="output directory")
    p.add_argument("--padding-id", type=int, default=70852)
    p.add_argument("--state-len", type=int, default=10)
    p.add_argument("--pad-pos", default="end", choices=["end", "beg"])
    p.add_argument("--session-col", default="session_id")
    p.add_argument("--item-col", default="item_id")
    p.add_argument("--reward-col", default="reward")
    p.add_argument("--eval", action="store_true", help="build an eval buffer instead")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.eval:
        df = preprocess_val_data(
            args.file,
            padding_id=args.padding_id,
            state_len=args.state_len,
            pad_pos=args.pad_pos,
            session_id_name=args.session_col,
            action_name=args.item_col,
        )
        out = os.path.join(args.out, "eval_buffer.npz")
        EvalBuffer.from_dataframe(df).save_npz(out)
    else:
        df = preprocess_train_data(
            args.file,
            padding_id=args.padding_id,
            state_len=args.state_len,
            pad_pos=args.pad_pos,
            session_id_name=args.session_col,
            action_name=args.item_col,
            reward_name=args.reward_col,
        )
        out = os.path.join(args.out, "replay_buffer.npz")
        ReplayBuffer.from_dataframe(df).save_npz(out)
    print(f"wrote {len(df)} rows -> {out}")


if __name__ == "__main__":
    main()
