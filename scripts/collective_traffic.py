"""Per-step COLLECTIVE traffic, by op, for mesh configs at the RetailRocket
operating point — the analytical scaling evidence for SCALING.md.

Multi-host runs cannot be measured in this environment (one real chip; the
2-core host makes virtual-mesh wall-clock uninterpretable — SCALING.md), so
this script extracts what CAN be proven without hardware: the exact
collective payloads XLA inserts into the compiled sharded train step. It
builds the product sharded step (the same wiring run/trainer.py uses) on a
virtual CPU mesh for data x model configurations, compiles, and sums every
collective's payload bytes from the optimized HLO.

This turns the O(B) claim of parallel/q_kernels.py:24-26 (per-step
collective payloads independent of catalog size A) into a checked number,
and yields a first-order efficiency model:

    eff ~= T_comp / (T_comp + T_comm),   T_comm = bytes / (ICI bw)

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
         python scripts/collective_traffic.py
"""

from __future__ import annotations

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize pins JAX_PLATFORMS=axon at interpreter startup;
# the backend is lazy, so flip it before first use (same pattern as
# __graft_entry__.dryrun_multichip)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "collective-permute",
    "all-to-all",
)
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1, "f16": 2,
                "s64": 8, "u64": 8, "f64": 8, "u8": 1, "s8": 1}
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


_COLL_RE = re.compile(
    r"=\s+(.+?)\s+(" + "|".join(COLLECTIVES) + r")(?:-start)?[\.\d]*\("
)


def _shape_bytes(shape_spec: str) -> int:
    """Total bytes of a (possibly tuple) HLO shape spec, e.g.
    ``(f32[70853,64]{1,0}, f32[192]{0})`` or ``f32[256,64]{1,0}``."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_spec):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_bytes(compiled) -> dict:
    out = {}
    for line in compiled.as_text().splitlines():
        s = line.strip()
        if "=" not in s:
            continue
        m = _COLL_RE.search(s)
        if m:
            op = m.group(2)
            out[op] = out.get(op, 0) + _shape_bytes(m.group(1))
    return out


def build_sharded(model: str, data: int, model_par: int, catalog=70852,
                  batch=256, state_len=10, emb=64, lazy_qh=False,
                  lazy_emb=False):
    from ikea_recommender_tpu.core.config import DataConfig, TrainConfig
    from ikea_recommender_tpu.core.mesh import MeshSpec, make_mesh, DATA_AXIS
    from ikea_recommender_tpu.models.families import model_config_from_train
    from ikea_recommender_tpu.parallel.sharding import (
        batch_sharding_tree,
        shard_state,
        state_shardings,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ikea_recommender_tpu.train.state import (
        make_double_q_state,
        make_optimizer,
        make_train_state,
    )
    from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step

    mesh = make_mesh(
        MeshSpec(data=data, model=model_par),
        devices=jax.devices()[: data * model_par],
    )
    tc = TrainConfig(
        model=model, batch_size=batch, embedding_size=emb,
        hidden_state_size=emb, state_size=state_len, learning_rate=0.01,
        fused_ce_min_actions=0,
    )
    dc = DataConfig(num_items=catalog)
    mc = model_config_from_train(tc, dc, align=model_par)
    opt = make_optimizer(0.01)
    rs = np.random.RandomState(0)
    aux = {}
    if model == "smorl":
        aux = {
            "div_embedding": jnp.asarray(
                rs.randn(catalog + 1, emb).astype(np.float32)
            ),
            "unpopular_mask": jnp.asarray(np.arange(mc.padded_action_dim) % 10 == 0),
        }
    raw = make_train_step(
        mc, opt, RLStepConfig(), **aux, jit=False,
        mesh=mesh, data_axis=DATA_AXIS,
        lazy_qhead_lr=(0.01 if lazy_qh else None),
        lazy_embedding_lr=(0.01 if lazy_emb else None),
    )
    if model in ("sqn", "smorl"):
        if lazy_qh or lazy_emb:
            from ikea_recommender_tpu.train.state import (
                make_lazy_double_q_state,
            )

            state, _ = make_lazy_double_q_state(
                jax.random.key(0), mc, 0.01,
                lazy_qh=lazy_qh, lazy_emb=lazy_emb,
            )
        else:
            state, _ = make_double_q_state(jax.random.key(0), mc, 0.01)
    elif lazy_emb:
        from ikea_recommender_tpu.train.state import make_lazy_train_state

        state, _ = make_lazy_train_state(jax.random.key(0), mc, 0.01)
    else:
        state, _ = make_train_state(jax.random.key(0), mc, 0.01)
    batch_d = {
        "state": jnp.asarray(rs.randint(0, catalog, (batch, state_len)), jnp.int32),
        "action": jnp.asarray(rs.randint(0, catalog, (batch,)), jnp.int32),
        "reward": jnp.asarray(rs.rand(batch).astype(np.float32)),
        "next_state": jnp.asarray(rs.randint(0, catalog, (batch, state_len)), jnp.int32),
        "true_len": jnp.asarray(rs.randint(1, state_len + 1, (batch,)), jnp.int32),
        "true_next_len": jnp.asarray(rs.randint(1, state_len + 1, (batch,)), jnp.int32),
        "is_end": jnp.asarray(rs.rand(batch) < 0.2),
        "valid": jnp.ones((batch,), bool),
    }
    st_sh = state_shardings(state, mesh)
    b_sh = batch_sharding_tree(batch_d, mesh)
    rep = NamedSharding(mesh, P())
    aux_sh = jax.tree.map(lambda _: rep, raw.aux)
    out_sh = (st_sh, jax.tree.map(lambda _: rep, {"sup_loss": 0.0, "q_loss": 0.0}))
    jitted = jax.jit(
        raw.raw, in_shardings=(st_sh, b_sh, aux_sh), out_shardings=out_sh,
        donate_argnums=(0,),
    )
    sharded = shard_state(state, mesh)
    compiled = jitted.lower(sharded, batch_d, raw.aux).compile()
    return compiled


def main():
    rows = []
    # (family, lazy_qh, lazy_emb): dense baselines, the fast-preset arm
    # (lazy_qh), and the full sparse-sync arm (lazy emb + qh)
    arms = [
        ("gru4rec", False, False), ("gru4rec", False, True),
        ("smorl", False, False), ("sqn", True, False),
        ("smorl", True, False), ("sqn", True, True), ("smorl", True, True),
    ]
    for model, lazy_qh, lazy_emb in arms:
        for data, model_par in [(2, 1), (4, 1), (8, 1), (1, 2), (2, 2),
                                (4, 2), (2, 4)]:
            if data * model_par > len(jax.devices()):
                continue
            compiled = build_sharded(
                model, data, model_par, lazy_qh=lazy_qh, lazy_emb=lazy_emb
            )
            cb = collective_bytes(compiled)
            total = sum(cb.values())
            rows.append((model, lazy_qh, lazy_emb, data, model_par, cb, total))
            by_op = {k: round(v / 1e6, 3) for k, v in cb.items()}
            tag = ("+lazy_qh" if lazy_qh else "") + (
                "+lazy_emb" if lazy_emb else ""
            )
            print(
                f"{model}{tag} data={data} model={model_par}: "
                f"{total/1e6:.3f} MB/step  {by_op}",
                flush=True,
            )
    return rows


if __name__ == "__main__":
    main()
