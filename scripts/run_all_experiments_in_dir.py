"""Directory-sweep experiment runner.

Replaces the reference's bash YAML parser + nohup loop
(``scripts/general/run_all_experiments_in_dir.sh:4-60``): for every YAML in
the given directory, create ``experiments/<exp_class>/<exp_name>/``, move
the config there, and run training. Failures are logged and the sweep
continues.

Usage: python scripts/run_all_experiments_in_dir.py CONFIG_DIR [--root experiments]
"""

import argparse
import os
import shutil
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml

from ikea_recommender_tpu.core.config import config_from_dict
from ikea_recommender_tpu.run.logging_sinks import make_log_sinks
from ikea_recommender_tpu.run.trainer import train


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("config_dir")
    p.add_argument("--root", default="experiments")
    args = p.parse_args()

    yamls = sorted(
        f for f in os.listdir(args.config_dir) if f.endswith((".yaml", ".yml"))
    )
    if not yamls:
        print(f"no YAML configs in {args.config_dir}")
        return 1

    failures = []
    for name in yamls:
        src = os.path.join(args.config_dir, name)
        with open(src) as fh:
            raw = yaml.safe_load(fh) or {}
        exp_class = raw.get("exp_class", "default")
        exp_name = raw.get("exp_name", os.path.splitext(name)[0])
        exp_dir = os.path.join(args.root, exp_class, exp_name)
        os.makedirs(exp_dir, exist_ok=True)
        dst = os.path.join(exp_dir, name)
        if os.path.abspath(src) != os.path.abspath(dst):
            shutil.move(src, dst)
        cfg = config_from_dict(raw, exp_dir=exp_dir)
        print(f"=== {exp_class}/{exp_name} ===")
        log_fn, close_fn = make_log_sinks(cfg)
        try:
            outcome = train(cfg, log_fn=log_fn, progress=True)
            print(
                f"    best {cfg.train.best_model_metric}="
                f"{outcome.best_metric:.5f}"
            )
        except Exception:
            traceback.print_exc()
            failures.append(exp_name)
        finally:
            close_fn()
    if failures:
        print(f"FAILED: {failures}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
