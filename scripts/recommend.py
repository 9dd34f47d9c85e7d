#!/usr/bin/env python
"""Batch inference CLI: best-model checkpoint -> top-k recommendations.

The reference has no serving path at all (training jobs end at a test-set
evaluation); this drives run/serve.Recommender from the artifacts a training
run leaves in its experiment directory.

Usage:
  python scripts/recommend.py -f <experiment.yaml> \
      --input sessions.jsonl --k 10 [--output preds.jsonl]

Input: JSON-lines, each row {"state": [item ids...]} (raw, unpadded; most
recent last; optionally "id" echoed through). Output: one JSON line per row
with top-k action ids and scores. With tokenizers configured, "state" may
hold item STRINGS and predictions are emitted as strings.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ikea_recommender_tpu.core.config import load_experiment_config
from ikea_recommender_tpu.data.tokenizer import Tokenizer
from ikea_recommender_tpu.models.families import init_model, model_config_from_train
from ikea_recommender_tpu.run.checkpoints import load_params_npz
from ikea_recommender_tpu.run.serve import Recommender


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", "--config", required=True, help="experiment YAML")
    ap.add_argument("--checkpoint", default=None,
                    help="params .npz (default: <exp_dir>/best_model.npz)")
    ap.add_argument("--input", required=True, help="JSON-lines session file")
    ap.add_argument("--output", default=None, help="output path (default stdout)")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=512)
    args = ap.parse_args(argv)

    cfg = load_experiment_config(args.config)
    mc = model_config_from_train(cfg.train, cfg.data)
    template = init_model(jax.random.key(0), mc)
    ckpt = args.checkpoint or f"{cfg.exp_dir}/best_model.npz"
    params = load_params_npz(template, ckpt)
    rec = Recommender(params, mc, head_idx=cfg.train.head_idx)

    in_tok = out_tok = None
    if cfg.data.input_tokenizer:
        in_tok = Tokenizer.from_file(cfg.data.input_tokenizer)
    if cfg.data.output_tokenizer:
        out_tok = Tokenizer.from_file(cfg.data.output_tokenizer)

    T = cfg.train.state_size
    pad_id = cfg.padding_id
    rows = [json.loads(l) for l in open(args.input) if l.strip()]
    out_f = open(args.output, "w") if args.output else sys.stdout

    for lo in range(0, len(rows), args.batch_size):
        chunk = rows[lo : lo + args.batch_size]
        B = len(chunk)
        states = np.full((B, T), pad_id, dtype=np.int32)
        lens = np.ones((B,), dtype=np.int32)
        for i, row in enumerate(chunk):
            if "state" not in row:
                raise SystemExit(
                    f"error: input row {lo + i} has no 'state' key: {row}"
                )
            items = row["state"][-T:]  # truncate to the last T events
            if in_tok is not None and items and isinstance(items[0], str):
                items = [in_tok.stoi(s) for s in items]
            if items:
                if cfg.train.padding_position == "end":
                    states[i, : len(items)] = items
                else:
                    states[i, T - len(items):] = items
                lens[i] = len(items)
        scores, idx = rec.recommend(states, lens, k=args.k)
        scores, idx = np.asarray(scores), np.asarray(idx)
        for i, row in enumerate(chunk):
            preds = idx[i].tolist()
            if out_tok is not None:
                preds = [out_tok.itos(int(p)) for p in preds]
            rec_out = {
                "predictions": preds,
                "scores": [round(float(s), 6) for s in scores[i]],
            }
            if "id" in row:
                rec_out["id"] = row["id"]
            out_f.write(json.dumps(rec_out) + "\n")
    if args.output:
        out_f.close()


if __name__ == "__main__":
    main()
