"""RetailRocket accuracy-parity protocol: raw events.csv -> sampled session
files -> replay buffers -> paper-operating-point training runs.

The reference replicates Xin et al. (SIGIR 2020, "Self-Supervised
Reinforcement Learning for Recommender Systems") on RetailRocket: its
buffer recipe consumes "sampled training data" pickles with columns
``session_id / item_id / is_buy / reward``
(``/root/reference/scripts/general/replay_buffer_SMORL_from_file.py:37-43``,
pad id 70852 = catalog size, state_len 10) and trains at batch 256,
emb/hidden 64, lr 0.01, gamma 0.5
(``experiments/RetailRocket-Comparison-Test/GRU4Rec_paper/GRU4Rec_paper.yaml:19-38``).
The upstream ETL producing those sampled files is NOT in the reference
snapshot (it is Xin et al.'s released preprocessing); this script
re-implements it from the paper's description with every filter exposed:

- events.csv columns: timestamp, visitorid, event, itemid, transactionid
  (Kaggle dataset "retailrocket/ecommerce-dataset").
- sequences = per-visitor event streams sorted by time ("session" = user
  sequence in the paper's RetailRocket setup);
- ``--buy-events`` decide which event types count as purchases (is_buy=1),
  every kept event else is a click (default: transaction + addtocart);
- drop items with < ``--min-item-count`` interactions and sessions shorter
  than ``--min-session-len`` (paper: both 3), iterated to a fixpoint;
- item ids densely re-tokenized 0..N-1; **the paper's catalog lands at
  70,852 items** — the ETL prints the achieved count and warns when it
  differs (the padding id must then be the achieved count, not 70852);
- rewards: buy 1.0, click 0.2 (the reference's buffer name
  ``replay_buffer_end_OGPaperRew.df`` = "original paper rewards");
- seeded session-level 80/10/10 split (+ optional ``--sample-sessions``).

Subcommands:

  etl      events.csv -> sampled_{train,val,test}.df + item_map.json
  synth    schema-identical SYNTHETIC events (for dry runs on machines
           that cannot stage the dataset — this environment has no
           network egress; see RESULTS.md "RetailRocket parity status")
  buffers  sampled_*.df -> train replay buffer + val/test eval buffers
           (+ unpopular-item set for the novelty/coverage metrics)
  run      train one family at the paper operating point and print the
           final test HR@k/NDCG@k

Full protocol on a machine with the dataset:

  kaggle datasets download retailrocket/ecommerce-dataset  # or manual DL
  python scripts/retailrocket.py etl --events events.csv --out rr/
  python scripts/retailrocket.py buffers --data rr/ --out rr/buffers
  python scripts/retailrocket.py run --buffers rr/buffers --family sqn \
      --out experiments/RetailRocket-Comparison/sqn_paper_run
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REWARD_BUY = 1.0
REWARD_CLICK = 0.2
PAPER_CATALOG = 70852
STATE_LEN = 10


# ---------------------------------------------------------------------------
# etl
# ---------------------------------------------------------------------------


def etl(args) -> None:
    df = pd.read_csv(args.events)
    need = {"timestamp", "visitorid", "event", "itemid"}
    missing = need - set(df.columns)
    if missing:
        raise SystemExit(f"events file lacks columns {sorted(missing)}")
    keep = set(args.click_events) | set(args.buy_events)
    df = df[df["event"].isin(keep)].copy()
    df["is_buy"] = df["event"].isin(set(args.buy_events)).astype(np.int64)
    df = df.sort_values(["visitorid", "timestamp"], kind="stable")

    # iterate item-count / session-length filters to a joint fixpoint
    while True:
        n0 = len(df)
        item_counts = df["itemid"].value_counts()
        df = df[df["itemid"].isin(item_counts[item_counts >= args.min_item_count].index)]
        sess_len = df.groupby("visitorid")["itemid"].transform("size")
        df = df[sess_len >= args.min_session_len]
        if len(df) == n0:
            break

    items = np.sort(df["itemid"].unique())
    n_items = len(items)
    print(f"[etl] {len(df)} events, {df['visitorid'].nunique()} sessions, "
          f"{n_items} items ({int(df['is_buy'].sum())} buys)")
    if n_items != PAPER_CATALOG:
        print(f"[etl] WARNING: catalog {n_items} != paper's {PAPER_CATALOG}; "
              f"use --padding-id {n_items} downstream")
    item_map = {int(o): i for i, o in enumerate(items)}
    df["item_id"] = df["itemid"].map(item_map).astype(np.int64)
    df = df.rename(columns={"visitorid": "session_id"})
    df["reward"] = np.where(df["is_buy"] == 1, REWARD_BUY, REWARD_CLICK)

    rng = np.random.default_rng(args.seed)
    sessions = df["session_id"].unique()
    rng.shuffle(sessions)
    if args.sample_sessions and args.sample_sessions < len(sessions):
        sessions = sessions[: args.sample_sessions]
        df = df[df["session_id"].isin(set(sessions.tolist()))]
    n = len(sessions)
    cut1, cut2 = int(n * 0.8), int(n * 0.9)
    parts = {
        "train": set(sessions[:cut1].tolist()),
        "val": set(sessions[cut1:cut2].tolist()),
        "test": set(sessions[cut2:].tolist()),
    }
    os.makedirs(args.out, exist_ok=True)
    cols = ["session_id", "item_id", "is_buy", "reward"]
    for name, ids in parts.items():
        part = df[df["session_id"].isin(ids)][cols].reset_index(drop=True)
        path = os.path.join(args.out, f"sampled_{name}.df")
        part.to_pickle(path)
        print(f"[etl] {path}: {len(part)} events, {len(ids)} sessions")
    with open(os.path.join(args.out, "item_map.json"), "w") as fh:
        json.dump({"num_items": n_items,
                   "padding_id": n_items,
                   "item_map": {str(k): v for k, v in item_map.items()}}, fh)


# ---------------------------------------------------------------------------
# synth — schema-identical synthetic events for dry runs
# ---------------------------------------------------------------------------


def synth(args) -> None:
    """Markov-process sessions written in the exact events.csv schema, so
    the WHOLE protocol (etl -> buffers -> run) executes end-to-end without
    the real dataset."""
    rng = np.random.default_rng(args.seed)
    n_items = args.num_items
    # popularity-skewed successor process (same generator family as
    # data/synthetic.py, emitted as raw events)
    pop = rng.zipf(1.3, size=n_items * 3) % n_items
    succ = rng.integers(0, n_items, size=(n_items, 4))
    rows = []
    t = 1_400_000_000_000
    for s in range(args.num_sessions):
        length = int(rng.integers(3, 15))
        item = int(pop[rng.integers(len(pop))])
        visitor = 10_000 + s
        for _ in range(length):
            event = "transaction" if rng.random() < 0.05 else (
                "addtocart" if rng.random() < 0.05 else "view")
            rows.append((t, visitor, event, 100_000 + item,
                         np.nan if event != "transaction" else s))
            t += int(rng.integers(1_000, 600_000))
            item = (int(succ[item, rng.integers(4)])
                    if rng.random() < 0.7 else int(pop[rng.integers(len(pop))]))
    df = pd.DataFrame(
        rows, columns=["timestamp", "visitorid", "event", "itemid", "transactionid"]
    )
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    df.to_csv(args.out, index=False)
    print(f"[synth] wrote {args.out}: {len(df)} events, "
          f"{df['visitorid'].nunique()} sessions")


# ---------------------------------------------------------------------------
# buffers
# ---------------------------------------------------------------------------


def buffers(args) -> None:
    from ikea_recommender_tpu.data.item_frequency import get_low_frequency_items
    from ikea_recommender_tpu.data.preprocessing import (
        preprocess_train_data,
        preprocess_val_data,
    )
    from ikea_recommender_tpu.data.replay_buffer import EvalBuffer, ReplayBuffer

    meta = json.load(open(os.path.join(args.data, "item_map.json")))
    pad = meta["padding_id"]
    os.makedirs(args.out, exist_ok=True)

    train_df = preprocess_train_data(
        os.path.join(args.data, "sampled_train.df"),
        padding_id=pad,
        state_len=args.state_len,
        pad_pos=args.pad_pos,
        session_id_name="session_id",
        action_name="item_id",
        reward_name="reward",
    )
    ReplayBuffer.from_dataframe(train_df).save_npz(
        os.path.join(args.out, "replay_buffer.npz")
    )
    for split in ("val", "test"):
        df = preprocess_val_data(
            os.path.join(args.data, f"sampled_{split}.df"),
            padding_id=pad,
            state_len=args.state_len,
            pad_pos=args.pad_pos,
            session_id_name="session_id",
            action_name="item_id",
        )
        EvalBuffer.from_dataframe(df).save_npz(
            os.path.join(args.out, f"{split}_buffer.npz")
        )
    # unpopular set over the TRAIN interactions (novelty/coverage metrics)
    train_raw = pd.read_pickle(os.path.join(args.data, "sampled_train.df"))
    unpop = get_low_frequency_items(
        train_raw["item_id"], quantile=args.unpopular_quantile
    )
    with open(os.path.join(args.out, "unpopular_items.json"), "w") as fh:
        json.dump(sorted(int(i) for i in unpop), fh)
    with open(os.path.join(args.out, "meta.json"), "w") as fh:
        json.dump({"num_items": meta["num_items"],
                   "padding_id": pad,
                   "state_len": args.state_len}, fh)
    print(f"[buffers] wrote buffers for catalog {meta['num_items']} -> {args.out}")


# ---------------------------------------------------------------------------
# run — the paper operating point
# ---------------------------------------------------------------------------


def run(args) -> None:
    # optional knobs (the dry-run test builds a bare Namespace)
    preset = getattr(args, "preset", None)
    checkpoint = getattr(args, "checkpoint", False)
    from ikea_recommender_tpu.core.config import (
        Config,
        DataConfig,
        ExperimentConfig,
        MetricsConfig,
        TrainConfig,
    )
    from ikea_recommender_tpu.run.trainer import train

    meta = json.load(open(os.path.join(args.buffers, "meta.json")))
    A = meta["num_items"]
    os.makedirs(args.out, exist_ok=True)

    # The frozen diversity-embedding chain (reference two-phase protocol:
    # trainGRU.py:411-415 exports the GRU4Rec embedding matrix, SMORL loads
    # it frozen via metrics.div_emb_dir — SMORL_paper.yaml:41). The gru4rec
    # leg exports embedding_weights.npy to its --out; the smorl leg consumes
    # --div-emb (or auto-discovers a sibling gru4rec run's export).
    div_emb_path = getattr(args, "div_emb", None)
    if args.family == "smorl" and not div_emb_path:
        parent = os.path.dirname(os.path.abspath(args.out))
        candidates = sorted(
            glob.glob(os.path.join(parent, "*", "embedding_weights.npy"))
        ) + sorted(glob.glob(os.path.join(parent, "embedding_weights.npy")))
        pretrained = [c for c in candidates if "gru4rec" in c.lower()] or candidates
        if pretrained:
            div_emb_path = pretrained[0]
            print(f"[run] smorl: auto-discovered diversity embedding "
                  f"{div_emb_path}")
        else:
            raise SystemExit(
                "[run] smorl needs a frozen diversity embedding: run the "
                "gru4rec leg first (it exports embedding_weights.npy to its "
                "--out) or pass --div-emb explicitly. Without it the "
                "diversity reward is identically 0 (dead third objective)."
            )
    cfg = Config(
        experiment=ExperimentConfig(
            exp_class="RetailRocket-Comparison", exp_name=f"{args.family}_paper",
            seed=args.seed,
            # gru4rec is the embedding-pretraining leg of the chain
            save_pretrained_embeddings=(args.family == "gru4rec"),
        ),
        data=DataConfig(
            num_items=A,
            train_path=os.path.join(args.buffers, "replay_buffer.npz"),
            val_path=os.path.join(args.buffers, "val_buffer.npz"),
            test_path=os.path.join(args.buffers, "test_buffer.npz"),
        ),
        # the paper operating point (GRU4Rec_paper.yaml:19-38)
        train=TrainConfig(
            model=args.family,
            batch_size=256,
            val_batch_size=2000,
            epochs=args.epochs,
            learning_rate=0.01,
            embedding_size=64,
            hidden_state_size=64,
            state_size=meta["state_len"],
            gamma=0.5,
            alpha=1.0,
            q_weights=[1.0, 1.0, 1.0],
            best_model_metric="Val_NDCG@10",
            eval_at=[1.0],
            preset=preset,
            checkpoint_dir=(os.path.join(args.out, "ckpt")
                            if checkpoint else None),
            resume=checkpoint,
        ),
        metrics=MetricsConfig(
            topk_hr_ndcg=[10, 20],
            # reference ks (SMORL_paper.yaml:45); r4 drifted to [10, 20]
            topk_cov=[1, 5, 10, 20],
            topk_div=1,
            div_emb_dir=div_emb_path,
            require_div_emb=(args.family == "smorl"),
            train_metrics=not getattr(args, "no_train_metrics", False),
            unpopular_actions_path=os.path.join(
                args.buffers, "unpopular_items.json"
            ),
        ),
        exp_dir=args.out,
    )
    out = train(cfg, progress=True)
    print(json.dumps(out.test_metrics, indent=2))
    keys = [k for k in out.test_metrics if "HR" in k or "NDCG" in k]
    print("[run] headline:",
          {k: round(out.test_metrics[k], 4) for k in sorted(keys)})
    print(f"[run] best {cfg.train.best_model_metric}={out.best_metric:.4f} "
          f"@ eval point {out.best_epoch}")
    print(f"[run] in-loop throughput: "
          f"{out.throughput_sessions_per_sec:,.0f} sessions/s "
          f"(train windows only, device wall-clock)")
    with open(os.path.join(args.out, "run_summary.json"), "w") as fh:
        json.dump({
            "family": args.family,
            "epochs": args.epochs,
            "best_metric": out.best_metric,
            "best_epoch": out.best_epoch,
            "test_metrics": out.test_metrics,
            "train_sessions_per_sec": out.throughput_sessions_per_sec,
            "timing": out.timing,  # idx_build/dispatch/sync/eval breakdown
            "div_emb": div_emb_path,
            "preset": preset,
            "logs": out.logs,  # per-eval-point metric curves
        }, fh, indent=2)


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("etl")
    e.add_argument("--events", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--click-events", nargs="+", default=["view"])
    e.add_argument("--buy-events", nargs="+",
                   default=["transaction", "addtocart"])
    e.add_argument("--min-item-count", type=int, default=3)
    e.add_argument("--min-session-len", type=int, default=3)
    e.add_argument("--sample-sessions", type=int, default=0,
                   help="keep only N randomly chosen sessions (0 = all)")
    e.add_argument("--seed", type=int, default=0)
    e.set_defaults(fn=etl)

    s = sub.add_parser("synth")
    s.add_argument("--out", required=True, help="synthetic events.csv path")
    s.add_argument("--num-sessions", type=int, default=400)
    s.add_argument("--num-items", type=int, default=300)
    s.add_argument("--seed", type=int, default=0)
    s.set_defaults(fn=synth)

    b = sub.add_parser("buffers")
    b.add_argument("--data", required=True, help="etl output dir")
    b.add_argument("--out", required=True)
    b.add_argument("--state-len", type=int, default=STATE_LEN)
    b.add_argument("--pad-pos", default="end", choices=["end", "beg"])
    b.add_argument("--unpopular-quantile", type=float, default=0.4)
    b.set_defaults(fn=buffers)

    r = sub.add_parser("run")
    r.add_argument("--buffers", required=True)
    r.add_argument("--family", default="gru4rec",
                   choices=["gru4rec", "bidir_gru4rec", "sqn", "smorl", "sarm"])
    r.add_argument("--epochs", type=int, default=30)
    r.add_argument("--preset", default=None, choices=["fast", "reference"],
                   help="numerics preset (docs/performance.md); None = default arm")
    r.add_argument("--checkpoint", action="store_true",
                   help="epoch checkpoints + resume under <out>/ckpt (retry-safe "
                        "long runs on a flaky link)")
    r.add_argument("--seed", type=int, default=0)
    r.add_argument("--no-train-metrics", action="store_true",
                   help="skip per-batch train-metric accumulation "
                        "(metrics.train_metrics=false — ~6x in-loop at the "
                        "paper catalog; Train_* keys log 0)")
    r.add_argument("--div-emb", default=None,
                   help="frozen diversity-embedding export for smorl "
                        "(embedding_weights.npy from a gru4rec leg); "
                        "auto-discovered next to --out when omitted")
    r.add_argument("--out", required=True)
    r.set_defaults(fn=run)

    args = p.parse_args()
    from ikea_recommender_tpu.utils.invocation import record_invocation

    # synth's --out is a FILE (events.csv); every other subcommand's is a
    # directory — stated per-subcommand, not guessed from the path shape.
    out = getattr(args, "out", None)
    if out:
        record_invocation(
            args,
            os.path.dirname(os.path.abspath(out)) if args.cmd == "synth"
            else out,
        )
    args.fn(args)


if __name__ == "__main__":
    main()
