"""IKEA-flavor full-scale dress rehearsal: GA-schema synthetic sessions at
realistic size -> dual tokenizers -> data/ikea.py preprocessing (n-step
returns, inspiration-click episode ends, output->input remap) -> product
trainer (gru4rec embedding-pretraining leg, then SMORL).

The r4 rehearsal certified the RetailRocket flavor at scale; this one
certifies the IKEA generation (reference ikea/data_utils/preprocessing.py:
294-487 + ikea/training/trainSMORL.py:20-481): INPUT vocabulary spans all
interactions (products + inspiration images, ~100k+10k), the OUTPUT head
only the inspiration images (~10k), metrics remap through the
output->input table, rewards are k-step cumulated returns.

Protocol:
    python scripts/ikea_rehearsal.py synth   --out /tmp/ikea --sessions 300000
    python scripts/ikea_rehearsal.py buffers --data /tmp/ikea --out /tmp/ikea/buffers
    python scripts/ikea_rehearsal.py run --buffers /tmp/ikea/buffers \
        --family gru4rec --epochs 8 --out /tmp/ikea/runs/gru4rec
    python scripts/ikea_rehearsal.py run --buffers /tmp/ikea/buffers \
        --family smorl --epochs 8 --lr 0.01 --out /tmp/ikea/runs/smorl

The smorl leg needs ``--lr 0.01``: at the IKEA yaml's default 0.0005 the
3-objective Q-gradient keeps the supervised head at chance level for the
whole run (RESULTS.md r5 "scale-exposed finding").
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE_LEN = 10
REWARD_VIEW = 0.1
REWARD_CLICK = 1.0


def synth(args) -> None:
    """Vectorized GA-like event log: product views interleaved with
    inspiration clicks whose identity follows the last viewed product
    (learnable successor structure), Zipf-skewed product popularity."""
    import pandas as pd

    rs = np.random.default_rng(args.seed)
    S, P, I = args.sessions, args.products, args.insp
    lengths = rs.integers(5, 13, S)
    sess = np.repeat(np.arange(S, dtype=np.int64), lengths)
    E = len(sess)
    starts = np.zeros(E, bool)
    starts[np.concatenate([[0], np.cumsum(lengths)[:-1]])] = True
    is_insp = (rs.random(E) < 0.35) & ~starts  # sessions open with a view

    # product views: skewed popularity (u^3 concentrates near 0)
    prod = np.minimum((rs.random(E) ** 3 * P).astype(np.int64), P - 1)
    # forward-fill the index of the last product-view event; global
    # maximum.accumulate is session-safe because every session STARTS with
    # a product view whose index exceeds all previous sessions'
    pidx = np.where(~is_insp, np.arange(E), -1)
    prev_prod = prod[np.maximum.accumulate(pidx)]
    insp = np.where(
        rs.random(E) < 0.7, prev_prod % I, rs.integers(0, I, E)
    )

    item = np.where(
        is_insp,
        np.char.add("insp_", insp.astype(str)),
        np.char.add("prod_", prod.astype(str)),
    )
    df = pd.DataFrame(
        {
            "sessionID": sess,
            "item_id": item,
            "action_type": np.where(
                is_insp, "click_inspiration", "view_product"
            ),
            "reward": np.where(is_insp, REWARD_CLICK, REWARD_VIEW),
        }
    )
    os.makedirs(args.out, exist_ok=True)
    df.to_pickle(os.path.join(args.out, "events.df"))
    meta = {
        "sessions": int(S),
        "events": int(E),
        "products": int(P),
        "insp": int(I),
        "insp_clicks": int(is_insp.sum()),
    }
    with open(os.path.join(args.out, "synth_meta.json"), "w") as fh:
        json.dump(meta, fh, indent=2)
    print(f"[synth] {meta}")


def buffers(args) -> None:
    import pandas as pd

    from ikea_recommender_tpu.data.ikea import (
        preprocess_train_data,
        to_eval_frame,
    )
    from ikea_recommender_tpu.data.replay_buffer import (
        EvalBuffer,
        ReplayBuffer,
    )
    from ikea_recommender_tpu.data.tokenizer import Tokenizer

    t0 = time.perf_counter()
    df = pd.read_pickle(os.path.join(args.data, "events.df"))
    meta = json.load(open(os.path.join(args.data, "synth_meta.json")))
    P, I = meta["products"], meta["insp"]

    input_tok = Tokenizer(
        [f"prod_{i}" for i in range(P)] + [f"insp_{i}" for i in range(I)]
    )
    output_tok = Tokenizer([f"insp_{i}" for i in range(I)])

    # session split: 96/2/2 train/val/test
    m = df["sessionID"].to_numpy() % 50
    splits = {"train": df[m >= 2], "val": df[m == 0], "test": df[m == 1]}
    os.makedirs(args.out, exist_ok=True)
    counts = {}
    for name, part in splits.items():
        frame = preprocess_train_data(
            part,
            padding_id=input_tok.pad_idx,
            state_len=args.state_len,
            tokenizer_market=None,
            tokenizer_input=input_tok,
            tokenizer_output=output_tok,
            future_steps_next_state=args.future_steps,
        )
        counts[name] = len(frame)
        if name == "train":
            ReplayBuffer.from_dataframe(frame).save_npz(
                os.path.join(args.out, "replay_buffer.npz")
            )
            # unpopular output items: bottom quantile by train frequency
            freq = np.bincount(
                frame["action"].to_numpy(), minlength=len(output_tok) - 1
            )
            order = np.argsort(freq)
            cut = int(len(order) * args.unpopular_quantile)
            unpop = sorted(int(a) for a in order[:cut])
            with open(os.path.join(args.out, "unpopular_items.json"), "w") as fh:
                json.dump(unpop, fh)
        else:
            EvalBuffer.from_dataframe(to_eval_frame(frame)).save_npz(
                os.path.join(args.out, f"{name}_buffer.npz")
            )
    input_tok.save_to_file(os.path.join(args.out, "input_tokenizer.json"))
    output_tok.save_to_file(os.path.join(args.out, "output_tokenizer.json"))
    with open(os.path.join(args.out, "meta.json"), "w") as fh:
        json.dump(
            {
                "num_items": len(input_tok) - 1,
                "num_actions": len(output_tok) - 1,
                "padding_id": input_tok.pad_idx,
                "state_len": args.state_len,
                "future_steps": args.future_steps,
                "windows": counts,
            },
            fh,
            indent=2,
        )
    print(
        f"[buffers] windows={counts} input_vocab={len(input_tok)-1} "
        f"output_vocab={len(output_tok)-1} ({time.perf_counter()-t0:.1f}s)"
    )


def run(args) -> None:
    preset = getattr(args, "preset", None)
    from ikea_recommender_tpu.core.config import (
        Config,
        DataConfig,
        ExperimentConfig,
        MetricsConfig,
        TrainConfig,
    )
    from ikea_recommender_tpu.run.trainer import train

    meta = json.load(open(os.path.join(args.buffers, "meta.json")))
    os.makedirs(args.out, exist_ok=True)

    div_emb_path = getattr(args, "div_emb", None)
    if args.family == "smorl" and not div_emb_path:
        parent = os.path.dirname(os.path.abspath(args.out))
        cands = sorted(
            glob.glob(os.path.join(parent, "*", "embedding_weights.npy"))
        )
        cands = [c for c in cands if "gru4rec" in c.lower()] or cands
        if not cands:
            raise SystemExit(
                "[run] smorl needs the gru4rec leg's embedding_weights.npy "
                "(run --family gru4rec first) or --div-emb"
            )
        div_emb_path = cands[0]
        print(f"[run] smorl: diversity embedding {div_emb_path}")

    cfg = Config(
        experiment=ExperimentConfig(
            exp_class="IKEA-Rehearsal",
            exp_name=f"{args.family}_rehearsal",
            seed=args.seed,
            save_pretrained_embeddings=(args.family == "gru4rec"),
        ),
        data=DataConfig(
            num_items=meta["num_items"],
            num_actions=meta["num_actions"],
            train_path=os.path.join(args.buffers, "replay_buffer.npz"),
            val_path=os.path.join(args.buffers, "val_buffer.npz"),
            test_path=os.path.join(args.buffers, "test_buffer.npz"),
            input_tokenizer=os.path.join(args.buffers, "input_tokenizer.json"),
            output_tokenizer=os.path.join(
                args.buffers, "output_tokenizer.json"
            ),
        ),
        # the IKEA-final operating point (reference experiments/IKEA/
        # final_experiments/SMORL-paper.yaml:22-51: batch 256, val batch
        # 5000, emb/hidden 64, lr 0.0005, gamma 0.5, 8 epochs, eval at 4
        # points/epoch, HR/NDCG ks {1,6,12}, Val_NDCG@12 selection)
        train=TrainConfig(
            model=args.family,
            batch_size=256,
            val_batch_size=5000,
            epochs=args.epochs,
            learning_rate=getattr(args, "lr", 0.0005),
            embedding_size=64,
            hidden_state_size=64,
            state_size=meta["state_len"],
            gamma=0.5,
            alpha=getattr(args, "alpha", 1.0),
            q_weights=[1.0, 1.0, 1.0],
            best_model_metric="Val_NDCG@12",
            eval_at=[0.25, 0.5, 0.75, 1.0],
            padding_id=meta["padding_id"],
            preset=preset,
            checkpoint_dir=(
                os.path.join(args.out, "ckpt")
                if getattr(args, "checkpoint", False)
                else None
            ),
            resume=bool(getattr(args, "checkpoint", False)),
        ),
        metrics=MetricsConfig(
            topk_hr_ndcg=[1, 6, 12],
            topk_cov=[1, 5, 10, 20],
            topk_div=1,
            div_emb_dir=div_emb_path,
            require_div_emb=(args.family == "smorl"),
            unpopular_actions_path=os.path.join(
                args.buffers, "unpopular_items.json"
            ),
        ),
        exp_dir=args.out,
    )
    out = train(cfg, progress=True)
    keys = [k for k in out.test_metrics if "HR" in k or "NDCG" in k]
    print("[run] headline:",
          {k: round(out.test_metrics[k], 4) for k in sorted(keys)})
    print(f"[run] best {cfg.train.best_model_metric}={out.best_metric:.4f} "
          f"@ eval point {out.best_epoch}")
    print(f"[run] in-loop throughput: "
          f"{out.throughput_sessions_per_sec:,.0f} sessions/s")
    with open(os.path.join(args.out, "run_summary.json"), "w") as fh:
        json.dump(
            {
                "family": args.family,
                "epochs": args.epochs,
                "best_metric": out.best_metric,
                "best_epoch": out.best_epoch,
                "test_metrics": out.test_metrics,
                "train_sessions_per_sec": out.throughput_sessions_per_sec,
                "timing": out.timing,
                "div_emb": div_emb_path,
                "preset": preset,
                "logs": out.logs,
            },
            fh,
            indent=2,
        )


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("synth")
    s.add_argument("--out", required=True)
    s.add_argument("--sessions", type=int, default=300_000)
    s.add_argument("--products", type=int, default=100_000)
    s.add_argument("--insp", type=int, default=10_000)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=synth)

    b = sub.add_parser("buffers")
    b.add_argument("--data", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--state-len", type=int, default=STATE_LEN)
    b.add_argument("--future-steps", default=3,
                   type=lambda v: v if v == "all" else int(v),
                   help="k-step cumulated returns ('all' or int >= 2; "
                        "1 = plain next-step)")
    b.add_argument("--unpopular-quantile", type=float, default=0.4)
    b.set_defaults(fn=buffers)

    r = sub.add_parser("run")
    r.add_argument("--buffers", required=True)
    r.add_argument("--family", default="gru4rec",
                   choices=["gru4rec", "sqn", "smorl", "sarm"])
    r.add_argument("--epochs", type=int, default=8)
    r.add_argument("--lr", type=float, default=0.0005,
                   help="IKEA-final default (SMORL-paper.yaml:25). For "
                        "smorl use 0.01: at 0.0005 the 3-objective "
                        "Q-gradient keeps the supervised head at chance "
                        "(RESULTS.md r5)")
    r.add_argument("--alpha", type=float, default=1.0,
                   help="Q-loss weight; 0 = pure supervised bisect arm")
    r.add_argument("--preset", default=None, choices=["fast", "reference"])
    r.add_argument("--checkpoint", action="store_true")
    r.add_argument("--div-emb", default=None)
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--out", required=True)
    r.set_defaults(fn=run)

    args = p.parse_args()
    from ikea_recommender_tpu.utils.invocation import record_invocation

    # every subcommand's --out here is a directory
    out = getattr(args, "out", None)
    if out:
        record_invocation(args, out)
    args.fn(args)


if __name__ == "__main__":
    main()
