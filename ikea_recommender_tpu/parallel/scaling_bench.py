"""Scaling-efficiency benchmark harness (BASELINE.md north star:
>= 85% sessions/s scaling efficiency at 1 chip / 1 host / N hosts).

Measures the full double-Q SMORL (or any family) train step over
(data, model) meshes of increasing size and reports sessions/s + efficiency
vs linear scaling from the smallest mesh. Runs identically on real TPU
slices and on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) for CI.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh
from ikea_recommender_tpu.models.families import model_config_from_train
from ikea_recommender_tpu.parallel.sharding import make_sharded_train_step, shard_state
from ikea_recommender_tpu.train.state import (
    make_double_q_state,
    make_optimizer,
    make_train_state,
)
from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step


@dataclass
class ScalePoint:
    mesh: Dict[str, int]
    global_batch: int
    steps_per_sec: float
    sessions_per_sec: float
    efficiency: float  # vs linear scaling from the first point
    # Host cores actually consumed during the timed loop (process CPU time /
    # wall time). On a virtual CPU mesh this exposes the physical-core
    # ceiling: N virtual devices on C cores cannot scale past C no matter
    # how good the shardings are.
    cores_used: float = 0.0


def _make_batch(rs, B, T, A):
    return {
        "state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, A, (B,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(B).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, A, (B, T)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, T + 1, (B,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(B) < 0.2),
        "valid": jnp.ones((B,), bool),
    }


def run_scaling_bench(
    model: str = "smorl",
    per_device_batch: int = 256,
    catalog: int = 70852,
    state_len: int = 10,
    emb: int = 64,
    hidden: int = 64,
    mesh_specs: Optional[List[MeshSpec]] = None,
    warmup: int = 3,
    iters: int = 20,
) -> List[ScalePoint]:
    n_dev = len(jax.devices())
    if mesh_specs is None:
        mesh_specs = []
        d = 1
        while d <= n_dev:
            mesh_specs.append(MeshSpec(data=d, model=1))
            d *= 2
        if n_dev >= 2:
            mesh_specs.append(MeshSpec(data=n_dev // 2, model=2))

    results: List[ScalePoint] = []
    base_rate = None
    for spec in mesh_specs:
        if spec.num_devices > n_dev:
            continue
        mesh = make_mesh(spec)
        B = per_device_batch * spec.data
        align = max(spec.model, 1)
        train_cfg = TrainConfig(
            model=model,
            embedding_size=emb,
            hidden_state_size=hidden,
            state_size=state_len,
        )
        data_cfg = DataConfig(num_items=catalog)
        mc = model_config_from_train(train_cfg, data_cfg, align=align)
        opt = make_optimizer(0.01)
        rl = RLStepConfig()
        rs = np.random.RandomState(0)
        aux = {}
        if model == "smorl":
            aux = {
                "div_embedding": jnp.asarray(
                    rs.randn(catalog + 1, emb).astype(np.float32)
                ),
                "unpopular_mask": jnp.asarray(np.arange(catalog) % 10 == 0),
            }
        step = make_train_step(mc, opt, rl, **aux, jit=False)
        if model in ("sqn", "smorl"):
            state, _ = make_double_q_state(jax.random.key(0), mc, 0.01)
        else:
            state, _ = make_train_state(jax.random.key(0), mc, 0.01)
        batch = _make_batch(rs, B, state_len, catalog)
        sharded = make_sharded_train_step(step, mesh, state, batch)
        state = shard_state(state, mesh)

        for _ in range(warmup):
            state, m = sharded(state, batch)
        jax.block_until_ready(m)
        t0 = time.perf_counter()
        c0 = time.process_time()
        for _ in range(iters):
            state, m = sharded(state, batch)
        jax.block_until_ready(m)
        dt = time.perf_counter() - t0
        cores = (time.process_time() - c0) / dt
        steps_per_sec = iters / dt
        sessions = steps_per_sec * B
        if base_rate is None:
            base_rate = sessions / spec.num_devices
        eff = sessions / (base_rate * spec.num_devices)
        results.append(
            ScalePoint(
                mesh=dict(mesh.shape),
                global_batch=B,
                steps_per_sec=steps_per_sec,
                sessions_per_sec=sessions,
                efficiency=eff,
                cores_used=cores,
            )
        )
    return results


if __name__ == "__main__":
    pts = run_scaling_bench()
    for p in pts:
        print(
            json.dumps(
                {
                    "mesh": p.mesh,
                    "global_batch": p.global_batch,
                    "sessions_per_sec": round(p.sessions_per_sec, 1),
                    "efficiency": round(p.efficiency, 3),
                }
            )
        )
