"""Sharding rules: how the recommender maps onto a (data, model) mesh.

The reference is single-GPU; this layer is the new scaling capability
(SURVEY.md §2 #35-38, BASELINE.json north star):

- batch dim     -> ``data`` axis (pure DP; XLA all-reduces gradients on ICI);
- embedding     -> rows (vocab dim) sharded on ``model``: the (V+1, E) table
                   is the largest tensor (70k x 64 on RetailRocket, millions
                   of rows at IKEA scale). Lookups become XLA-generated
                   collective gathers over ICI;
- output heads  -> action dim sharded on ``model``: logits (B, A) are
                   computed shard-local; softmax-CE and top-k over the
                   catalog run shard-local + a small collective
                   (see ``parallel/topk.py`` for the explicit shard_map
                   kernels);
- GRU weights   -> replicated (tiny: H=64 -> ~100KB).

Everything is expressed as ``NamedSharding`` annotations; ``jit`` with
in/out shardings lets XLA insert the collectives (the scaling-book recipe:
pick a mesh, annotate, let XLA do the rest).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ikea_recommender_tpu.core.mesh import DATA_AXIS, MODEL_AXIS


def _spec_for(path_keys, leaf, mesh: Mesh, lazy_qh: bool = False) -> P:
    """PartitionSpec for one parameter leaf, by name + rank.

    Handles both single nets and double-Q (net0, net1) pairs — the tuple
    index rides in ``path_keys`` and every leaf keeps its per-net rank.
    """
    name = path_keys[-1] if path_keys else ""
    joined = "/".join(path_keys)
    rank = np.ndim(leaf)
    shape = np.shape(leaf)
    n_model = mesh.shape[MODEL_AXIS]

    def guarded(spec):
        """Drop sharding on any dim the leaf's size doesn't divide by —
        un-padded models fall back to replication for that leaf."""
        entries = list(spec)
        for d, axis in enumerate(entries):
            if axis is not None and shape[d] % n_model != 0:
                entries[d] = None
        return P(*entries)

    if n_model <= 1:
        return P()
    if "embedding" in joined:
        # (V+1, E): shard vocab rows.
        return guarded([None] * (rank - 2) + [MODEL_AXIS, None])
    if name == "mv" and "emb" in joined:
        # lazy-Adam packed (V+1, 2E) embedding moments: rows follow the table
        return guarded([None] * (rank - 2) + [MODEL_AXIS, None])
    if lazy_qh and ("q_head" in joined or "q_heads" in joined):
        # lazy ACTION-MAJOR layout (train/lazy_adam.py): the whole Q-head
        # (kernel_am + bias + packed moments) stays REPLICATED — its
        # per-step sparse-row update makes replication the cheap choice
        # (parallel/q_kernels.py dp islands), and the dp island kernels
        # read the full kernel per device.
        return P()
    if "sup_head" in joined or "q_head" in joined or "q_heads" in joined:
        if name in ("kernel", "bias"):
            # trailing dim is the action dim in every head layout
            return guarded([None] * (rank - 1) + [MODEL_AXIS])
    return P()  # GRU weights + optimizer scalars: replicated


def state_shardings(state: Any, mesh: Mesh) -> Any:
    """NamedSharding tree matching a TrainState/DoubleQState.

    Optimizer-state leaves mirror their parameter's sharding automatically:
    adam's mu/nu have identical shapes and names (optax keeps the param tree
    structure), so the same name+rank rule applies.
    """

    def _k(p):
        # DictKey -> .key, GetAttrKey (dataclass fields) -> .name,
        # SequenceKey (tuples) -> .idx
        for attr in ("key", "name", "idx"):
            if hasattr(p, attr):
                return str(getattr(p, attr))
        return str(p)

    # Detect the lazy action-major Q-head layout once for the whole tree:
    # its leaves ("kernel_am") and its sibling "bias" must stay replicated,
    # and "bias" alone cannot be told apart from the canonical layout.
    lazy_qh = any(
        any(_k(p) == "kernel_am" for p in path)
        for path, _ in jax.tree_util.tree_flatten_with_path(state)[0]
    )

    def one(path, leaf):
        keys = [_k(p) for p in path]
        if np.ndim(leaf) == 0 or (hasattr(leaf, "dtype") and "key" in str(leaf.dtype)):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, _spec_for(keys, leaf, mesh, lazy_qh))

    return jax.tree_util.tree_map_with_path(one, state)


def batch_sharding_tree(batch: Any, mesh: Mesh) -> Any:
    """Batch dict: every array sharded on its leading (batch) dim."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda _: sh, batch)


def shard_state(state: Any, mesh: Mesh) -> Any:
    return jax.device_put(state, state_shardings(state, mesh))


def init_sharded_state(init_fn: Callable[[], Any], mesh: Mesh) -> Any:
    """Build a train state born with mesh shardings: jit the initializer
    with explicit out_shardings. This is the MULTI-PROCESS-safe path —
    ``device_put`` of host arrays can only target this process's devices,
    while a jitted global computation can produce arrays spanning every
    process (each process runs the same deterministic init program)."""
    shapes = jax.eval_shape(init_fn)
    return jax.jit(init_fn, out_shardings=state_shardings(shapes, mesh))()


def make_sharded_train_step(
    step,
    mesh: Mesh,
    state_template: Any,
    batch_template: Any,
) -> Callable:
    """jit a TrainStep's raw fn with explicit in/out shardings over the mesh.

    ``step`` is a ``train.steps.TrainStep`` (its aux arrays ride along as a
    replicated jit argument — never closure constants, see TrainStep).
    """
    st_sh = state_shardings(state_template, mesh)
    b_sh = batch_sharding_tree(batch_template, mesh)
    rep = NamedSharding(mesh, P())
    aux_sh = jax.tree.map(lambda _: rep, step.aux)
    out_sh = (st_sh, jax.tree.map(lambda _: rep, {"sup_loss": 0.0, "q_loss": 0.0}))
    jitted = jax.jit(
        step.raw,
        in_shardings=(st_sh, b_sh, aux_sh),
        out_shardings=out_sh,
        donate_argnums=(0,),
    )
    return lambda state, batch: jitted(state, batch, step.aux)


def sharded_fused_ce_raw_step(model_cfg, opt, mesh: Mesh) -> Callable:
    """Raw ``(state, batch, aux) -> (state, metrics)`` gru4rec/bidir CE step
    whose supervised CE goes through the SHARDED flash-CE kernel
    (parallel/fused_ce.py) instead of XLA-partitioned dense logits:
    backbone auto-partitioned, head columns on the model axis, per-shard
    logits never materialize. Requires the model built with
    ``align = mesh model-axis size``. Jit it yourself (the trainer's window
    runner scans it; ``make_sharded_fused_ce_train_step`` jits it with
    explicit shardings)."""
    import jax.numpy as jnp
    import optax

    from ikea_recommender_tpu.models.families import apply_features
    from ikea_recommender_tpu.models.backbone import embedding_grad_mask
    from ikea_recommender_tpu.parallel.fused_ce import sharded_fused_softmax_ce

    if model_cfg.padded_action_dim % mesh.shape[MODEL_AXIS]:
        raise ValueError(
            "padded action dim must divide the model axis — build the model "
            "with model_config_from_train(..., align=n_model)"
        )

    def raw(state, batch, aux):
        rng = jax.random.fold_in(state.rng, state.step)

        def loss_fn(params):
            h = apply_features(
                params,
                model_cfg,
                batch["state"],
                batch["true_len"],
                dropout_rng=rng,
                deterministic=(model_cfg.backbone.dropout == 0.0),
            )
            head = params["sup_head"]
            per = sharded_fused_softmax_ce(
                h.astype(jnp.float32),
                head["kernel"],
                head["bias"],
                batch["action"],
                mesh,
                model_cfg.action_dim,
                data_axis=DATA_AXIS,
                precision=model_cfg.head_precision,
            )
            w = batch["valid"].astype(per.dtype)
            return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        mask = embedding_grad_mask(model_cfg.backbone)
        if mask is not None:
            bb = dict(grads["backbone"])
            bb["embedding"] = bb["embedding"] * mask
            grads = dict(grads, backbone=bb)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        return new_state, {"sup_loss": loss, "q_loss": jnp.zeros_like(loss)}

    return raw


def make_sharded_fused_ce_train_step(
    model_cfg,
    opt,
    mesh: Mesh,
    state_template: Any,
    batch_template: Any,
) -> Callable:
    """jit ``sharded_fused_ce_raw_step`` with explicit in/out shardings.

    Returns ``step(state, batch) -> (state, metrics)`` operating on
    mesh-sharded arrays (use ``shard_state`` first).
    """
    raw = sharded_fused_ce_raw_step(model_cfg, opt, mesh)
    st_sh = state_shardings(state_template, mesh)
    b_sh = batch_sharding_tree(batch_template, mesh)
    rep = NamedSharding(mesh, P())
    out_sh = (st_sh, {"sup_loss": rep, "q_loss": rep})
    jitted = jax.jit(
        lambda state, batch: raw(state, batch, {}),
        in_shardings=(st_sh, b_sh),
        out_shardings=out_sh,
        donate_argnums=(0,),
    )
    return jitted
