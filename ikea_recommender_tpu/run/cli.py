"""CLI driver: ``python -m ikea_recommender_tpu.run.cli -f experiment.yaml``.

Replaces the reference's per-model driver scripts
(``scripts/paper/{gru4rec,sqn_gru,smorl_gru}_train.py``): one driver, the
model family comes from the config. The config file's directory becomes the
experiment output dir (reference ``smorl_gru_train.py:20``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

if os.environ.get("IKEA_PLATFORM"):
    # Explicit backend override (e.g. CI spot-runs on CPU while a TPU job
    # holds the chip). Must flip jax's lazy backend config BEFORE first use;
    # plain JAX_PLATFORMS is pinned by the axon sitecustomize at startup.
    import jax

    jax.config.update("jax_platforms", os.environ["IKEA_PLATFORM"])

from ikea_recommender_tpu.core.config import load_experiment_config
from ikea_recommender_tpu.run.logging_sinks import make_log_sinks
from ikea_recommender_tpu.run.trainer import train


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "-f",
        "--file",
        dest="filename",
        metavar="FILE",
        required=True,
        help="experiment definition YAML",
    )
    parser.add_argument(
        "--progress", action="store_true", help="print per-eval-point progress"
    )
    return parser


def main(argv=None) -> int:
    args = get_parser().parse_args(argv)
    cfg = load_experiment_config(args.filename)
    log_fn, close_fn = make_log_sinks(cfg)
    try:
        outcome = train(cfg, log_fn=log_fn, progress=args.progress)
    finally:
        close_fn()
    print(json.dumps(outcome.test_metrics, indent=2))
    print(
        f"best {cfg.train.best_model_metric}={outcome.best_metric:.5f} "
        f"@ eval point {outcome.best_epoch}; "
        f"{outcome.throughput_sessions_per_sec:.0f} sessions/s"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
