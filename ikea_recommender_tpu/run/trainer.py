"""Unified training orchestration.

One engine parameterized by model family replaces the reference's five
near-identical ~450-line trainer templates
(``ikea/training/trainGRU.py:22-415``, ``trainSQN.py``, ``trainSMORL.py``,
``trainBidirGRU.py``, ``trainSARM.py``). Semantics preserved:

- fractional-epoch evaluation: ``eval_at=[0.25, 0.5, 0.75, 1]`` ->
  ``eval_idx = [int(n_batches * p)]``, triggered when ``n_batch + 1`` is in
  the set (``trainGRU.py:154-155, 239``);
- per-batch train metrics with the post-step params (the reference's
  ``update_train_metrics`` extra forward), windows reset after each eval;
- double-Q families evaluate BOTH networks, log the second with a ``Sec_``
  prefix, and checkpoint whichever wins the watched metric
  (``trainSMORL.py:278-391``);
- end of run: reload the best params, evaluate on the test set (which may be
  the val set — ``real_test`` flips the metric prefix), optionally export the
  item-embedding matrix for the frozen-diversity-embedding workflow
  (``trainGRU.py:411-415``).

Upgrades over the reference: full-state orbax checkpoints with epoch-level
resume; a metrics container instead of positional tuples (quirk 6); the
SMORL trainer actually runs (the reference's has unrunnable API skew); and
mesh-sharded training/eval straight from the config (``parallel:`` section —
batch on the ``data`` axis, embedding rows + head columns on ``model``,
collectives inserted by XLA; the reference is single-GPU).
"""

from __future__ import annotations

import json
import os
import time
import warnings
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ikea_recommender_tpu.core.config import Config
from ikea_recommender_tpu.core.mesh import DATA_AXIS, MeshSpec, make_mesh
from ikea_recommender_tpu.data.item_frequency import (
    load_unpopular_items,
    unpopular_mask as build_unpopular_mask,
)
from ikea_recommender_tpu.data.replay_buffer import (
    EvalBuffer,
    ReplayBuffer,
    load_eval_source,
    num_batches,
)
from ikea_recommender_tpu.data.tokenizer import Tokenizer, build_output_to_input_table
from ikea_recommender_tpu.eval.protocol import EvalProtocol
from ikea_recommender_tpu.models.families import model_config_from_train
from ikea_recommender_tpu.run.checkpoints import BestModelTracker, CheckpointManager
from ikea_recommender_tpu.train.state import (
    make_double_q_state,
    make_optimizer,
    make_train_state,
    select_net,
)
from ikea_recommender_tpu.train.steps import RLStepConfig, make_train_step
from ikea_recommender_tpu.utils.logging_dicts import (
    get_logging_dict_by_type,
    get_logging_dict_test,
    get_logging_dict_train,
)

DOUBLE_Q_FAMILIES = ("sqn", "smorl")


def load_div_embedding(path: str) -> np.ndarray:
    """Frozen pretrained diversity embedding: .npy/.npz (native) or .pt
    (reference's torch export)."""
    if path.endswith(".npy"):
        return np.load(path)
    if path.endswith(".npz"):
        data = np.load(path)
        return data["embedding"] if "embedding" in data else data[data.files[0]]
    import torch

    return np.asarray(torch.load(path, map_location="cpu", weights_only=True))


@dataclass
class TrainOutcome:
    best_metric: float
    best_epoch: Optional[int]
    test_metrics: Dict[str, float]
    logs: List[Dict[str, float]] = field(default_factory=list)
    best_params: Any = None
    throughput_sessions_per_sec: float = 0.0
    pretrain_metrics: Dict[str, float] = field(default_factory=dict)
    # Wall-clock attribution of the train loop (seconds, whole run):
    # idx_build (host index-matrix construction), dispatch (run_window call
    # returns — includes the idx upload), sync (device_get at window end —
    # device execution + any queue/tunnel stall), eval (validation passes).
    timing: Dict[str, float] = field(default_factory=dict)


def _eval_params_list(state, family):
    """Networks to evaluate: [net1] or [net1, net2] for double-Q. The
    (net0, net1) tuple layout makes this a zero-copy unpack (the stacked
    layout paid a jitted gather — and a retrace — per eval point here)."""
    if family in DOUBLE_Q_FAMILIES:
        return [state.params[0], state.params[1]]
    return [state.params]


def _device_train_data(buf: ReplayBuffer) -> Dict[str, jnp.ndarray]:
    """Ship the whole replay buffer to device HBM once (the reference
    re-ships every batch from host). RetailRocket scale is ~120MB."""
    data = {
        "state": jnp.asarray(buf.state),
        "action": jnp.asarray(buf.action),
        "reward": jnp.asarray(buf.reward),
        "next_state": jnp.asarray(buf.next_state),
        "true_len": jnp.asarray(buf.true_len),
        "true_next_len": jnp.asarray(buf.true_next_len),
        "is_end": jnp.asarray(buf.is_end),
    }
    if getattr(buf, "action_type", None) is not None:
        data["action_type"] = jnp.asarray(buf.action_type)
    return data


def _window_index_matrices(perm: np.ndarray, batch_size: int):
    """Shuffled row permutation -> (idx (n_b, B), valid (n_b, B)); the tail
    batch is padded with row 0 and masked."""
    n = len(perm)
    n_b = -(-n // batch_size)
    idx = np.zeros((n_b, batch_size), dtype=np.int32)
    valid = np.zeros((n_b, batch_size), dtype=bool)
    for i in range(n_b):
        take = perm[i * batch_size : (i + 1) * batch_size]
        idx[i, : len(take)] = take
        valid[i, : len(take)] = True
    return idx, valid


# ---------------------------------------------------------------------------
# process-sharded data path (multi-host; ParallelConfig.process_sharded)
# ---------------------------------------------------------------------------


def _device_train_data_process_sharded(buf: ReplayBuffer, mesh):
    """Each process uploads ONLY its rows: the buffer's row space is padded
    to ``D * per`` (D = data-axis size), split into contiguous per-shard
    blocks in device order, and assembled into one global row-sharded array
    (``jax.make_array_from_process_local_data`` — no cross-host traffic).
    Returns (data dict, per-shard rows ``per``, real row count ``n``)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    D = mesh.shape[DATA_AXIS]
    n = len(buf)
    per = -(-n // D)
    n_pad = per * D
    n_proc = jax.process_count()
    if D % n_proc:
        raise ValueError(
            f"data axis ({D}) must divide evenly across {n_proc} processes"
        )
    rows_pp = n_pad // n_proc
    lo = jax.process_index() * rows_pp
    sh = NamedSharding(mesh, P(DATA_AXIS))

    def shard_one(col):
        col = np.asarray(col)
        local = np.zeros((rows_pp,) + col.shape[1:], col.dtype)
        take_hi = min(lo + rows_pp, n)
        if take_hi > lo:
            local[: take_hi - lo] = col[lo:take_hi]
        return jax.make_array_from_process_local_data(sh, local)

    cols = {
        "state": buf.state,
        "action": buf.action,
        "reward": buf.reward,
        "next_state": buf.next_state,
        "true_len": buf.true_len,
        "true_next_len": buf.true_next_len,
        "is_end": buf.is_end,
    }
    if getattr(buf, "action_type", None) is not None:
        cols["action_type"] = buf.action_type
    return {k: shard_one(v) for k, v in cols.items()}, per, n


def _replicated_global(data_np, mesh):
    """Host arrays -> fully-replicated global device arrays (multi-host
    safe: every process holds the full copy, so P() local == global)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return {
        k: jax.make_array_from_process_local_data(rep, np.asarray(v))
        for k, v in data_np.items()
    }


def _replicate_params(params, mesh):
    """Sharded param tree -> fully-replicated global arrays (addressable on
    every process, so host code can read them)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.jit(
        lambda p: p, out_shardings=jax.tree.map(lambda _: rep, params)
    )(params)


def _sharded_index_matrices(rng, n: int, per: int, D: int, batch_size: int):
    """Per-data-shard epoch sampling: shard d permutes ITS ``per`` rows
    (global rows [d*per, (d+1)*per)); each scanned batch takes B/D rows
    from every shard, so the gather never crosses shards. Rows past the
    real count ``n`` (block padding) are invalid.
    -> (idx (n_b, D, B/D) SHARD-LOCAL row ids, valid (n_b, D, B/D))."""
    Bd = batch_size // D
    n_b = -(-per // Bd)
    idx = np.zeros((n_b, D, Bd), dtype=np.int32)
    valid = np.zeros((n_b, D, Bd), dtype=bool)
    for d in range(D):
        perm = rng.permutation(per).astype(np.int32)
        for i in range(n_b):
            take = perm[i * Bd : (i + 1) * Bd]
            idx[i, d, : len(take)] = take
            valid[i, d, : len(take)] = (d * per + take) < n
    return idx, valid


def _shard_gather(data, idx, mesh):
    """Gather one batch from the row-sharded buffer with SHARD-LOCAL ids:
    each data shard indexes only its own rows (idx row d is local to shard
    d), so the gather is collective-free."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    def local(d, i):
        return {k: v[i[0]] for k, v in d.items()}

    return shard_map(
        local,
        mesh=mesh,
        check_vma=False,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
    )(data, idx)


def _constrain_batch(batch, mesh):
    """Pin every batch array's leading (batch) dim to the ``data`` axis —
    this is what makes the window runner data-parallel under a mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(DATA_AXIS))
    return {k: jax.lax.with_sharding_constraint(v, sh) for k, v in batch.items()}


def _constrain_replicated(tree, mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, rep), tree)


def _make_window_runner(step, protocol, family, mesh=None, process_sharded=False,
                        train_metrics=True):
    """One jitted dispatch per eval WINDOW: lax.scan over batches, each
    iteration gathering its batch from the device-resident buffer, running
    the optimizer step, and accumulating train metrics + loss sums. Host
    work per window: one (n_b, B) int32 index upload.

    With a mesh, each scanned batch is constrained to the ``data`` axis and
    the scalar/metric carries to replicated; parameter shardings ride in on
    the (committed, mesh-sharded) state argument and XLA partitions the
    step + metric computations accordingly."""

    def run(state, accum, losses, data, idx_mat, valid_mat, step_aux, proto_aux):
        def body(carry, xs):
            state, accum, losses = carry
            idx, valid = xs
            if process_sharded:
                # idx (D, B/D) shard-local; collective-free per-shard gather
                batch = _shard_gather(data, idx, mesh)
                batch["valid"] = valid.reshape(-1)
            else:
                batch = {k: jnp.take(v, idx, axis=0) for k, v in data.items()}
                batch["valid"] = valid
            if mesh is not None:
                batch = _constrain_batch(batch, mesh)
            new_state, metrics = step.raw(state, batch, step_aux)
            if train_metrics:
                params = (
                    select_net(new_state.params, 0)
                    if family in DOUBLE_Q_FAMILIES
                    else new_state.params
                )
                new_accum = protocol._batch_update(
                    params,
                    accum,
                    batch["state"],
                    batch["action"],
                    batch["true_len"],
                    batch["valid"],
                    proto_aux,
                    batch.get("action_type"),
                )
            else:
                # metrics.train_metrics=false: skip the per-batch full-
                # catalog top-k accumulation (a production speed lever —
                # core/config.py); Train_* keys finalize to 0
                new_accum = accum
            new_losses = {
                "sup": losses["sup"] + metrics["sup_loss"],
                "q": losses["q"] + metrics["q_loss"],
                "n": losses["n"] + 1,
            }
            return (new_state, new_accum, new_losses), None

        (state, accum, losses), _ = jax.lax.scan(
            body, (state, accum, losses), (idx_mat, valid_mat)
        )
        if mesh is not None:
            accum = _constrain_replicated(accum, mesh)
            losses = _constrain_replicated(losses, mesh)
        return state, accum, losses

    jitted = jax.jit(run, donate_argnums=(0, 1, 2))

    def call(state, accum, losses, data, idx_mat, valid_mat):
        return jitted(
            state,
            accum,
            losses,
            data,
            jnp.asarray(idx_mat),
            jnp.asarray(valid_mat),
            step.aux,
            protocol._aux,
        )

    return call


def _zero_losses():
    return {
        "sup": jnp.zeros(()),
        "q": jnp.zeros(()),
        "n": jnp.zeros((), jnp.int32),
    }


def train(
    cfg: Config,
    *,
    train_buf: Optional[ReplayBuffer] = None,
    val_buf: Optional[EvalBuffer] = None,
    test_buf: Optional[EvalBuffer] = None,
    div_embedding: Optional[np.ndarray] = None,
    unpopular: Optional[set] = None,
    input_tokenizer: Optional[Tokenizer] = None,
    output_tokenizer: Optional[Tokenizer] = None,
    log_fn: Optional[Callable[[Dict[str, float], int], None]] = None,
    progress: bool = False,
) -> TrainOutcome:
    t_cfg, d_cfg, m_cfg, p_cfg = cfg.train, cfg.data, cfg.metrics, cfg.parallel
    family = t_cfg.model

    # ---- device mesh ------------------------------------------------------
    mesh = None
    if p_cfg.enabled:
        n_dev = len(jax.devices())
        if p_cfg.num_devices > n_dev:
            raise ValueError(
                f"parallel config needs {p_cfg.num_devices} devices, "
                f"{n_dev} visible"
            )
        if t_cfg.batch_size % p_cfg.data or t_cfg.val_batch_size % p_cfg.data:
            raise ValueError(
                "batch_size and val_batch_size must divide the data axis "
                f"({p_cfg.data})"
            )
        mesh = make_mesh(MeshSpec(data=p_cfg.data, model=p_cfg.model))
    elif p_cfg.sharded_ce:
        raise ValueError("sharded_ce requires a multi-device mesh")

    # ---- data -----------------------------------------------------------
    if train_buf is None:
        train_buf = ReplayBuffer(d_cfg.train_path)
    _eval_src = dict(
        padding_id=cfg.padding_id,
        state_len=t_cfg.state_size,
        pad_pos=t_cfg.padding_position,
        session_col=d_cfg.session_col,
        item_col=d_cfg.item_col,
    )
    if val_buf is None:
        # prebuilt buffer OR raw session file windowed in memory
        # (reference evaluate/eval_dataset.py)
        val_buf = load_eval_source(d_cfg.val_path, **_eval_src)
    real_test = bool(d_cfg.test_path) and d_cfg.test_path != d_cfg.val_path
    if test_buf is None:
        test_buf = (
            load_eval_source(d_cfg.test_path, **_eval_src) if real_test else val_buf
        )

    if input_tokenizer is None and d_cfg.input_tokenizer:
        input_tokenizer = Tokenizer.from_file(d_cfg.input_tokenizer)
    if output_tokenizer is None and d_cfg.output_tokenizer:
        output_tokenizer = Tokenizer.from_file(d_cfg.output_tokenizer)
    out_to_in = None
    if input_tokenizer is not None and output_tokenizer is not None:
        out_to_in = jnp.asarray(
            build_output_to_input_table(input_tokenizer, output_tokenizer)
        )
    # IKEA configs may leave vocab sizes at 0 and carry tokenizers instead
    # (reference trainGRU.py:27-28,114-116: num_items = len(input vocab),
    # num_actions = len(output vocab), pad excluded).
    if d_cfg.num_items == 0 and input_tokenizer is not None:
        d_cfg.num_items = len(input_tokenizer) - 1
    if d_cfg.num_actions == 0:
        d_cfg.num_actions = (
            len(output_tokenizer) - 1
            if output_tokenizer is not None
            else d_cfg.num_items
        )

    if unpopular is None and m_cfg.unpopular_actions_path:
        unpopular = load_unpopular_items(m_cfg.unpopular_actions_path)
    unpop_mask = jnp.asarray(
        build_unpopular_mask(unpopular or set(), d_cfg.num_actions)
    )

    if div_embedding is None and m_cfg.div_emb_dir:
        div_embedding = load_div_embedding(m_cfg.div_emb_dir)
    if div_embedding is None and family == "smorl":
        # Without a frozen pretrained embedding the cosine similarity is
        # identically 1 and the diversity reward identically 0 — the third
        # SMORL objective silently trains against zeros. The reference's
        # protocol is two-phase: a GRU4Rec run exports its embedding matrix
        # (reference trainGRU.py:411-415) and SMORL loads it frozen via
        # metrics.div_emb_dir (SMORL_paper.yaml:41). Refuse to hide that.
        msg = (
            "SMORL run has no diversity embedding (metrics.div_emb_dir unset "
            "and no div_embedding passed): the diversity reward will be "
            "identically 0 and the diversity Q-head trains against zeros. "
            "Export embeddings from a GRU4Rec run "
            "(experiment.save_pretrained_embeddings: true -> "
            "embedding_weights.npy) and set metrics.div_emb_dir."
        )
        if m_cfg.require_div_emb:
            raise ValueError(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
        if jax.process_index() == 0:
            print(f"[trainer] WARNING: {msg}")
    div_emb = (
        jnp.asarray(div_embedding)
        if div_embedding is not None
        else jnp.ones((d_cfg.num_items + 1, 1))
    )

    # ---- model / step / protocol ---------------------------------------
    # Under a mesh: pad vocab rows / action dims to the model-axis multiple.
    # The fused kernels stay ON — XLA cannot partition a Pallas custom
    # call, so the steps run the ACTION-SHARDED variants (per-shard kernels
    # under shard_map + O(B) collective merges, parallel/{fused_ce,
    # q_kernels}.py) whenever a mesh is passed (round-2 disabled all fused
    # kernels here and Q-families paid dense (B, K, A) logits on a mesh).
    model_cfg = model_config_from_train(
        t_cfg, d_cfg, align=(p_cfg.model if mesh is not None else 1)
    )
    opt = make_optimizer(t_cfg.learning_rate, t_cfg.optimizer_mv_dtype)
    rl = RLStepConfig(
        gamma=t_cfg.gamma,
        alpha=t_cfg.alpha,
        q_weights=tuple(t_cfg.q_weights),
        topk_div=m_cfg.topk_div,
        topk_nov=m_cfg.topk_nov,
        nov_rew_sig=m_cfg.nov_rew_sig,
        padding_pos=t_cfg.padding_position,
        compat_boot_len_bug=t_cfg.compat_boot_len_bug,
        compat_div_len_bug=t_cfg.compat_div_len_bug,
        sarm_gamma=t_cfg.sarm_gamma,
        single_optimizer=(t_cfg.double_q_optimizers == 1),
    )
    if t_cfg.double_q_optimizers not in (1, 2):
        raise ValueError(
            f"double_q_optimizers must be 1 or 2, got {t_cfg.double_q_optimizers}"
        )
    key = jax.random.key(cfg.seed)
    lazy = t_cfg.optimizer == "lazy_adam"
    if t_cfg.optimizer not in ("adam", "lazy_adam"):
        raise ValueError(f"unknown optimizer {t_cfg.optimizer!r}")
    if t_cfg.qhead_optimizer not in (None, "adam", "lazy_adam"):
        raise ValueError(f"unknown qhead_optimizer {t_cfg.qhead_optimizer!r}")
    # a no-op for families without Q heads (the fast preset sets it
    # unconditionally — core/config.py)
    lazy_qh = t_cfg.qhead_optimizer == "lazy_adam" and family in (
        "sqn", "smorl", "sarm",
    )
    if lazy_qh:
        # Preconditions of the lazy action-major Q-head path. When the
        # setting came from `preset: fast` (not an explicit user choice),
        # an unmet precondition falls back to dense Adam with a log line
        # instead of raising — a preset must not crash configs that worked
        # without it (ADVICE r4).
        blocker = None
        if t_cfg.double_q_optimizers == 1:
            blocker = "double_q_optimizers=1 (lazy optimizers need 2)"
        elif not model_cfg.fused_ce:
            blocker = (
                "the fused train path resolved off (fused_ce=False or "
                "catalog under fused_ce_min_actions)"
            )
        elif family == "sqn" and t_cfg.head_idx not in (0,):
            # eval_head would need the canonical (F, A) q-head kernel; the
            # lazy state stores action-major (train/lazy_adam.py)
            blocker = "head_idx != 0"
        elif mesh is not None and family == "sarm":
            # SARM's lazy layout splits off a densely-updated head 0 whose
            # full-catalog CE grad would lose its action sharding under the
            # replicated-lazy scheme — dense sharded Adam stays the mesh arm
            blocker = "sarm on a mesh (head-0 dense split)"
        elif mesh is not None and jax.process_count() > 1:
            blocker = "multi-process mesh (lazy-qh is single-process for now)"
        if blocker is not None:
            if getattr(t_cfg, "qhead_from_preset", False):
                if jax.process_index() == 0:
                    print(
                        f"[trainer] {blocker}: preset-fast qhead_optimizer "
                        "falls back to dense Adam"
                    )
                lazy_qh = False
            else:
                raise ValueError(
                    f"qhead_optimizer='lazy_adam' unsupported here: {blocker}"
                )
    if lazy and family not in ("gru4rec", "bidir_gru4rec"):
        if mesh is not None and (
            family == "sarm" or jax.process_count() > 1
        ):
            raise ValueError(
                "optimizer='lazy_adam' on a mesh supports sqn/smorl "
                "single-process only (sarm: head0-dense split)"
            )
        if t_cfg.double_q_optimizers == 1:
            raise ValueError("lazy optimizers need double_q_optimizers=2")
    multiprocess = jax.process_count() > 1
    proc_sharded = (
        p_cfg.process_sharded
        if p_cfg.process_sharded is not None
        else multiprocess
    )
    if proc_sharded and mesh is None:
        raise ValueError("process_sharded requires a multi-device mesh")

    def _build_state():
        if family in DOUBLE_Q_FAMILIES:
            if lazy or lazy_qh:
                from ikea_recommender_tpu.train.state import (
                    make_lazy_double_q_state,
                )

                return make_lazy_double_q_state(
                    key,
                    model_cfg,
                    t_cfg.learning_rate,
                    t_cfg.optimizer_mv_dtype,
                    lazy_emb=lazy,
                    lazy_qh=lazy_qh,
                )[0]
            return make_double_q_state(
                key,
                model_cfg,
                t_cfg.learning_rate,
                t_cfg.optimizer_mv_dtype,
                single_optimizer=(t_cfg.double_q_optimizers == 1),
            )[0]
        if family == "sarm" and (lazy or lazy_qh):
            from ikea_recommender_tpu.train.state import make_lazy_sarm_state

            return make_lazy_sarm_state(
                key,
                model_cfg,
                t_cfg.learning_rate,
                t_cfg.optimizer_mv_dtype,
                lazy_emb=lazy,
                lazy_qh=lazy_qh,
            )[0]
        if lazy:
            from ikea_recommender_tpu.train.state import make_lazy_train_state

            return make_lazy_train_state(
                key, model_cfg, t_cfg.learning_rate, t_cfg.optimizer_mv_dtype
            )[0]
        return make_train_state(
            key, model_cfg, t_cfg.learning_rate, t_cfg.optimizer_mv_dtype
        )[0]

    if multiprocess:
        # multi-host-safe init: every process runs the same deterministic
        # jitted initializer with mesh out-shardings (device_put of host
        # arrays cannot produce cross-process global arrays).
        from ikea_recommender_tpu.parallel.sharding import init_sharded_state

        state = init_sharded_state(_build_state, mesh)
    else:
        state = _build_state()
    if p_cfg.sharded_ce:
        if family not in ("gru4rec", "bidir_gru4rec"):
            raise ValueError("sharded_ce supports gru4rec/bidir_gru4rec only")
        from ikea_recommender_tpu.parallel.sharding import (
            sharded_fused_ce_raw_step,
        )
        from ikea_recommender_tpu.train.steps import TrainStep

        step_fn = TrainStep(
            sharded_fused_ce_raw_step(model_cfg, opt, mesh), aux={}, jit=False
        )
    else:
        step_fn = make_train_step(
            model_cfg,
            opt,
            rl,
            div_embedding=div_emb,
            unpopular_mask=unpop_mask,
            out_to_in=out_to_in,
            lazy_embedding_lr=t_cfg.learning_rate if lazy else None,
            lazy_qhead_lr=t_cfg.learning_rate if lazy_qh else None,
            donate=True,
            mesh=mesh,
            data_axis=(DATA_AXIS if mesh is not None else None),
        )

    protocol = EvalProtocol(
        model_cfg,
        topk_hr_ndcg=m_cfg.topk_hr_ndcg,
        topk_cov=m_cfg.topk_cov,
        topk_div=m_cfg.topk_div,
        topk_nov=m_cfg.topk_nov,
        nov_rew_sig=m_cfg.nov_rew_sig,
        padding_pos=t_cfg.padding_position,
        div_embedding=div_emb,
        unpopular_mask=unpop_mask,
        out_to_in=out_to_in,
        head_idx=t_cfg.head_idx,
        mesh=mesh,
        fused=m_cfg.fused_eval,
        type_names=m_cfg.action_type_names,
        eval_precision=m_cfg.eval_precision,
    )

    tracker = BestModelTracker(
        cfg.exp_dir,
        metric_name=t_cfg.best_model_metric,
        mode=t_cfg.best_model_mode,
        write_files=(jax.process_index() == 0),
    )
    dims = {
        "hidden_dim": t_cfg.hidden_state_size,
        "item_num": d_cfg.num_items,
        "action_dim": d_cfg.num_actions,
        "state_size": t_cfg.state_size,
        "embedding_dim": t_cfg.embedding_size,
    }

    ckpt_mngr = None
    start_epoch = 0
    best_live = None  # in-memory copy of the whole-run best params
    # The checkpoint payload carries the best-model tracker alongside the
    # train state so a resume cannot change which model ships: without it
    # the comparator restarts at ±inf and the final test eval may pick a
    # later, worse model (this bit a real run — RESULTS.md r4 sqn row).
    def _ckpt_payload(st, best):
        return {
            "train": st,
            "best_meta": {
                "metric": np.asarray(tracker.best, np.float32),
                "epoch": np.asarray(
                    -1 if tracker.best_epoch is None else tracker.best_epoch,
                    np.int32,
                ),
                "model_idx": np.asarray(tracker.best_model_idx or 0, np.int32),
                "has": np.asarray(0 if best is None else 1, np.int32),
            },
            # placeholder (current net-0 params) when no best exists yet
            "best_params": (
                best if best is not None else _eval_params_list(st, family)[0]
            ),
        }

    if t_cfg.checkpoint_dir:
        # orbax is multi-host native: every process calls save/restore; the
        # manager coordinates via jax.distributed barriers and each process
        # writes its addressable shards (a shared checkpoint path — NFS or
        # object store — is assumed, as in any orbax multi-host deployment).
        ckpt_mngr = CheckpointManager(t_cfg.checkpoint_dir)
        if t_cfg.resume:
            restored = ckpt_mngr.restore(_ckpt_payload(state, None))
            if restored is not None:
                state = restored["train"]
                bm = jax.device_get(restored["best_meta"])
                if int(bm["has"]):
                    best_live = restored["best_params"]
                    tracker.restore(
                        float(bm["metric"]),
                        int(bm["epoch"]),
                        int(bm["model_idx"]),
                        params=best_live,
                        dims=dims,
                    )
                start_epoch = int(ckpt_mngr.latest_step())
                if jax.process_index() == 0:
                    print(
                        f"[resume] restored checkpoint, continuing at epoch "
                        f"{start_epoch} (best {tracker.metric_name}="
                        f"{tracker.best:.5f})"
                    )

    if mesh is not None and not multiprocess:
        from ikea_recommender_tpu.parallel.sharding import shard_state

        state = shard_state(state, mesh)

    # ---- device-resident data + window runner ---------------------------
    shard_rows = None  # (per-shard rows, real rows) under process_sharded
    if proc_sharded:
        # each process uploads only its rows; epoch sampling is per-shard
        train_data, per_rows, n_real = _device_train_data_process_sharded(
            train_buf, mesh
        )
        shard_rows = (per_rows, n_real)
        val_np = {k: np.asarray(v) for k, v in
                  EvalProtocol.device_eval_data(val_buf).items()}
        val_data = _replicated_global(val_np, mesh)
        if real_test:
            test_np = {k: np.asarray(v) for k, v in
                       EvalProtocol.device_eval_data(test_buf).items()}
            test_data = _replicated_global(test_np, mesh)
        else:
            test_data = val_data
    else:
        train_data = _device_train_data(train_buf)
        val_data = EvalProtocol.device_eval_data(val_buf)
        test_data = (
            EvalProtocol.device_eval_data(test_buf) if real_test else val_data
        )
        if mesh is not None:
            # single-process mesh: buffers live replicated on the mesh
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            train_data = jax.device_put(train_data, rep)
            val_data = jax.device_put(val_data, rep)
            if real_test:
                test_data = jax.device_put(test_data, rep)
            else:
                test_data = val_data
    run_window = _make_window_runner(
        step_fn, protocol, family, mesh=mesh, process_sharded=proc_sharded,
        train_metrics=m_cfg.train_metrics,
    )

    # ---- warmup eval (reference does one pre-training eval; logged here
    # under Pretrain_ keys rather than discarded) --------------------------
    warmup_res = protocol.evaluate_device(
        _eval_params_list(state, family)[0], val_data, t_cfg.val_batch_size
    )
    pretrain_metrics = get_logging_dict_test(
        warmup_res,
        topk_hr_ndcg=m_cfg.topk_hr_ndcg,
        topk_cov=m_cfg.topk_cov,
        prefix="Pretrain_",
        name="Val",
    )
    if log_fn is not None:
        log_fn(pretrain_metrics, 0)

    if proc_sharded:
        D = mesh.shape[DATA_AXIS]
        n_b = -(-shard_rows[0] // (t_cfg.batch_size // D))
    else:
        n_b = num_batches(len(train_buf), t_cfg.batch_size)
    boundaries = sorted({int(n_b * p) for p in t_cfg.eval_at} - {0})

    logs: List[Dict[str, float]] = []
    log_counter = 0
    total_sessions = 0
    train_time = 0.0
    timing = {"idx_build": 0.0, "dispatch": 0.0, "sync": 0.0, "eval": 0.0}

    for epoch in range(start_epoch, t_cfg.epochs):
        t_idx = time.perf_counter()
        rng = np.random.default_rng(cfg.seed * 100_003 + epoch)
        if proc_sharded:
            idx_all, valid_all = _sharded_index_matrices(
                rng,
                shard_rows[1],
                shard_rows[0],
                mesh.shape[DATA_AXIS],
                t_cfg.batch_size,
            )
        else:
            idx_all, valid_all = _window_index_matrices(
                rng.permutation(len(train_buf)).astype(np.int32),
                t_cfg.batch_size,
            )
        timing["idx_build"] += time.perf_counter() - t_idx
        train_accum = protocol.init_accum()
        losses = _zero_losses()

        # Train/eval spans: one per boundary, plus a train-only tail if the
        # last eval point is before the epoch end.
        spans = [(lo, hi, True) for lo, hi in zip([0] + boundaries, boundaries)]
        if boundaries and boundaries[-1] < n_b:
            spans.append((boundaries[-1], n_b, False))
        for span_i, (lo, hi, do_eval) in enumerate(spans):
            profiling = (
                t_cfg.profile_dir is not None and epoch == start_epoch and span_i == 0
            )
            if profiling:
                jax.profiler.start_trace(t_cfg.profile_dir)
            if hi > lo:
                t0 = time.perf_counter()
                # One scanned dispatch per <= max_window_batches chunk of the
                # window (bounds single-program execution time — see
                # TrainConfig.max_window_batches); chunks share at most two
                # compiled shapes (full + tail).
                mwb = max(int(t_cfg.max_window_batches), 1)
                for c0 in range(lo, hi, mwb):
                    c1 = min(c0 + mwb, hi)
                    state, train_accum, losses = run_window(
                        state,
                        train_accum,
                        losses,
                        train_data,
                        idx_all[c0:c1],
                        valid_all[c0:c1],
                    )
                t_disp = time.perf_counter()
                timing["dispatch"] += t_disp - t0
                win = jax.device_get(losses)  # window loss sums (sync)
                timing["sync"] += time.perf_counter() - t_disp
                train_time += time.perf_counter() - t0
                total_sessions += int(valid_all[lo:hi].sum())
            if profiling:
                jax.profiler.stop_trace()
            if not do_eval:
                continue

            n_win = max(int(win["n"]), 1)
            t_ev = time.perf_counter()
            train_res = protocol.finalize(train_accum)
            nets = _eval_params_list(state, family)
            val_results = [
                protocol.evaluate_device(p, val_data, t_cfg.val_batch_size)
                for p in nets
            ]
            timing["eval"] += time.perf_counter() - t_ev
            q_included = family != "gru4rec" and family != "bidir_gru4rec"
            log_dict = get_logging_dict_train(
                train_sup_loss=float(win["sup"]) / n_win,
                train_q_loss=float(win["q"]) / n_win,
                train_res=train_res,
                val_res=val_results[0],
                topk_hr_ndcg=m_cfg.topk_hr_ndcg,
                topk_cov=m_cfg.topk_cov,
                q_included=q_included,
            )
            if len(val_results) > 1:
                log_dict.update(
                    get_logging_dict_train(
                        train_sup_loss=0.0,
                        train_q_loss=None,
                        train_res=train_res,
                        val_res=val_results[1],
                        topk_hr_ndcg=m_cfg.topk_hr_ndcg,
                        topk_cov=m_cfg.topk_cov,
                        q_included=False,
                        prefix="Sec_",
                    )
                )
            if m_cfg.action_type_names:
                log_dict.update(
                    get_logging_dict_by_type(
                        train_res, m_cfg.topk_hr_ndcg, name="Train"
                    )
                )
                log_dict.update(
                    get_logging_dict_by_type(
                        val_results[0], m_cfg.topk_hr_ndcg, name="Val"
                    )
                )

            # Best-model bookkeeping: double-Q saves the winning net.
            metric_name = tracker.metric_name
            candidates = [(log_dict.get(metric_name, -np.inf), 1, nets[0])]
            if len(nets) > 1:
                candidates.append(
                    (log_dict.get(f"Sec_{metric_name}", -np.inf), 2, nets[1])
                )
            value, model_idx, winner = max(candidates, key=lambda c: c[0])
            if multiprocess:
                # model-sharded leaves are not process-addressable: gather
                # a replicated copy (every process) so process 0 can write
                # it and ALL processes keep the live best for the final
                # test eval (no shared filesystem assumed).
                winner = _replicate_params(winner, mesh)
            if tracker(
                value, epoch=log_counter, params=winner,
                model_idx=model_idx, dims=dims,
            ):
                # Keep a live copy in every mode: it rides in the epoch
                # checkpoint (resume keeps the whole-run best) and serves
                # the final test eval. Copy: `winner` aliases state buffers
                # that the next donated window invalidates (multiprocess
                # `_replicate_params` already produced a fresh copy).
                best_live = (
                    winner if multiprocess else jax.tree.map(jnp.copy, winner)
                )

            logs.append(log_dict)
            if log_fn is not None:
                log_fn(log_dict, log_counter)
            if progress:
                print(
                    f"epoch {epoch+1} batch {hi}/{n_b} "
                    f"{metric_name}={value:.5f} (best {tracker.best:.5f})"
                )
            log_counter += 1
            # reset the training window (reference trainGRU.py:385-395)
            train_accum = protocol.init_accum()
            losses = _zero_losses()

        if ckpt_mngr is not None:
            ckpt_mngr.save(epoch + 1, _ckpt_payload(state, best_live))

    # ---- test with the reloaded best model ------------------------------
    template = _eval_params_list(state, family)[0]
    if best_live is not None:
        best_params = best_live
    elif multiprocess:
        best_params = _replicate_params(template, mesh)
    elif os.path.exists(tracker.params_path):
        best_params = tracker.load_best(template)
    else:
        best_params = template
    test_res = protocol.evaluate_device(best_params, test_data, t_cfg.val_batch_size)
    test_metrics = get_logging_dict_test(
        test_res,
        topk_hr_ndcg=m_cfg.topk_hr_ndcg,
        topk_cov=m_cfg.topk_cov,
        real_test=real_test,
    )
    if m_cfg.action_type_names:
        test_metrics.update(
            get_logging_dict_by_type(
                test_res,
                m_cfg.topk_hr_ndcg,
                name="Test" if real_test else "Best_Val",
            )
        )
    if log_fn is not None:
        log_fn(test_metrics, log_counter)
    if jax.process_index() == 0:
        with open(os.path.join(cfg.exp_dir, "test_metrics.json"), "w") as fh:
            json.dump(test_metrics, fh, indent=2)

    if cfg.experiment.save_pretrained_embeddings and jax.process_index() == 0:
        np.save(
            os.path.join(cfg.exp_dir, "embedding_weights.npy"),
            np.asarray(best_params["backbone"]["embedding"]),
        )

    throughput = total_sessions / train_time if train_time > 0 else 0.0
    return TrainOutcome(
        best_metric=float(tracker.best),
        best_epoch=tracker.best_epoch,
        test_metrics=test_metrics,
        logs=logs,
        best_params=best_params,
        throughput_sessions_per_sec=throughput,
        pretrain_metrics=pretrain_metrics,
        timing=dict(timing),
    )
