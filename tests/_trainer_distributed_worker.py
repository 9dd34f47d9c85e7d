"""Worker for the 2-process TRAINER test: runs the full product training
path (run.trainer.train) under jax.distributed with the process-sharded
data pipeline, and prints the resulting metrics as a RESULT line.

Usage: python _trainer_distributed_worker.py <coordinator> <nprocs> <pid>
           [epochs] [ckpt_dir] [resume] [exp_dir]

The optional args drive the multi-process checkpoint/resume test: a phase-1
run (epochs=1, ckpt_dir) checkpoints after its epoch, a phase-2 run
(epochs=2, same ckpt_dir, resume=1) restores and finishes — its final
metrics must match an uninterrupted 2-epoch run.
"""

import json
import os
import sys

coordinator, nprocs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
EPOCHS = int(sys.argv[4]) if len(sys.argv) > 4 else 1
CKPT_DIR = sys.argv[5] if len(sys.argv) > 5 and sys.argv[5] else None
RESUME = bool(int(sys.argv[6])) if len(sys.argv) > 6 else False
EXP_DIR = sys.argv[7] if len(sys.argv) > 7 and sys.argv[7] else None

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=nprocs, process_id=pid
)

import tempfile  # noqa: E402

from ikea_recommender_tpu.core.config import (  # noqa: E402
    Config,
    DataConfig,
    ExperimentConfig,
    MetricsConfig,
    ParallelConfig,
    TrainConfig,
)
from ikea_recommender_tpu.data.synthetic import synthetic_buffers  # noqa: E402
from ikea_recommender_tpu.run.trainer import train  # noqa: E402


def build_config(tmp: str, epochs: int = 1, ckpt_dir=None, resume=False) -> Config:
    return Config(
        experiment=ExperimentConfig(seed=0),
        data=DataConfig(num_items=32),
        train=TrainConfig(
            model="sqn",
            batch_size=8,
            val_batch_size=8,
            epochs=epochs,
            learning_rate=0.01,
            embedding_size=8,
            hidden_state_size=8,
            state_size=6,
            best_model_metric="Val_NDCG@10",
            eval_at=[1.0],
            checkpoint_dir=ckpt_dir,
            resume=resume,
        ),
        metrics=MetricsConfig(topk_cov=[1, 5], topk_hr_ndcg=[5, 10]),
        parallel=ParallelConfig(data=4, model=1, process_sharded=True),
        exp_dir=tmp,
    )


def main() -> None:
    # every process builds the same deterministic buffers; the trainer's
    # process-sharded loader uploads only this process's rows
    train_buf, _ = synthetic_buffers(
        num_sessions=30, num_items=32, state_len=6, seed=1
    )
    _, val_buf = synthetic_buffers(
        num_sessions=10, num_items=32, state_len=6, seed=2
    )
    with tempfile.TemporaryDirectory() as tmp:
        out = train(
            build_config(EXP_DIR or tmp, EPOCHS, CKPT_DIR, RESUME),
            train_buf=train_buf,
            val_buf=val_buf,
        )
        last_val = out.logs[-1].get("Val_NDCG@10", -1.0) if out.logs else -1.0
        print(
            "RESULT "
            + json.dumps(
                {
                    "pid": pid,
                    "best": float(out.best_metric),
                    "test_ndcg": float(
                        out.test_metrics.get("Best_Val_NDCG@10", -1.0)
                    ),
                    "pretrain_hr": float(
                        out.pretrain_metrics.get("Pretrain_Val_HR@10", -1.0)
                    ),
                    "last_val_ndcg": float(last_val),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
