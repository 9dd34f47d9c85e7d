"""Worker for tests/test_distributed.py: one process of an N-process
jax.distributed run. Exercises core/distributed.py end-to-end — runtime
init, per-process data sharding, host-local -> global batch assembly — then
runs ONE mesh-sharded gru4rec train step and prints a JSON result line.

Launched as: python _distributed_worker.py <coordinator> <n_procs> <pid>
(2 virtual CPU devices per process). All env/jax setup happens inside
main() so IMPORTING this module (the test imports make_global_batch) has
no side effects on the importing process's backend.
"""

import json
import os
import sys


def make_global_batch(n, A, T):
    """The full deterministic dataset every process agrees on."""
    import numpy as np

    rs = np.random.RandomState(0)
    return {
        "state": rs.randint(0, A, (n, T)).astype(np.int32),
        "action": rs.randint(0, A, (n,)).astype(np.int32),
        "reward": rs.rand(n).astype(np.float32),
        "next_state": rs.randint(0, A, (n, T)).astype(np.int32),
        "true_len": rs.randint(1, T + 1, (n,)).astype(np.int32),
        "true_next_len": rs.randint(1, T + 1, (n,)).astype(np.int32),
        "is_end": rs.rand(n) < 0.3,
        "valid": np.ones((n,), bool),
    }


def main():
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from ikea_recommender_tpu.core import distributed
    from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh

    coordinator, n_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    distributed.initialize(coordinator, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()

    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.parallel.sharding import (
        init_sharded_state,
        make_sharded_train_step,
    )
    from ikea_recommender_tpu.train.state import make_optimizer, make_train_state
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

    n_dev = len(jax.devices())
    mesh = make_mesh(MeshSpec(data=n_dev // 2, model=2))

    A, T, B = 24, 5, 16
    tc = TrainConfig(
        model="gru4rec", embedding_size=8, hidden_state_size=8, state_size=T
    )
    mc = model_config_from_train(tc, DataConfig(num_items=A), align=2)
    opt = make_optimizer(0.01)
    # jit-init with out_shardings: device_put cannot target other processes'
    # devices, a global jitted init can.
    init_fn = lambda: make_train_state(jax.random.key(0), mc, 0.01)[0]
    state = init_sharded_state(init_fn, mesh)
    state_template = jax.eval_shape(init_fn)

    # Per-process slice of the batch -> global sharded arrays. The batch is
    # sharded on the data axis; mesh device order makes the data-axis row
    # blocks line up with process_shard's contiguous block partitioning.
    full = make_global_batch(B, A, T)
    sl = distributed.process_shard(B)
    local = {k: v[sl] for k, v in full.items()}
    batch = distributed.host_local_batch_to_global(local, mesh)

    raw = make_train_step(mc, opt, RLStepConfig(), jit=False)
    step = make_sharded_train_step(raw, mesh, state_template, batch)
    new_state, metrics = step(state, batch)
    jax.block_until_ready(new_state)

    emb = np.asarray(
        jax.jit(
            lambda p: p["backbone"]["embedding"].astype(np.float32).sum()
        )(new_state.params)
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "sup_loss": float(metrics["sup_loss"]),
                "emb_sum": float(emb),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
