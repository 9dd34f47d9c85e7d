"""Jitted train steps for every model family.

One fused XLA program per optimizer step (the reference pays 3 eager
forwards + host sync per step — ``sqn_gru.py:183-252``):

- ``gru4rec`` / ``bidir_gru4rec`` — supervised CE step
  (reference ``models/GRU4Rec/model.py:131-158``).
- ``sqn`` — double-Q TD + CE (reference ``sqn_gru.py:183-252``).
- ``smorl`` — multi-objective double-Q with K reward heads and ONLINE
  diversity/novelty rewards computed inside the step on device
  (reference ``smorl_gru.py:233-330``). Canonical semantics: K=3 with
  r = [r_acc, r_div, r_nov] (the reference's 3-head net / 2-head reward
  mismatch — quirk 1 — cannot run; config num_q_heads=2 reproduces the
  2-reward shape with a 2-head net).
- ``sarm`` — 5 self-bootstrapped Q heads + CE on head 0
  (reference ``sarm.py:116-152``).

Correctness deviations (flags in TrainConfig restore reference behavior):
- bootstrap forward uses true_next_len (quirk 2: compat_boot_len_bug);
- diversity reward length uses true_len (quirk 3: compat_div_len_bug);
- SARM Q targets are masked at episode ends (the reference computes the
  is_end mask but never applies it to its per-head losses).

Batches carry a ``valid`` mask (padded fixed-shape tail batches); all means
are masked means, so metric values match the reference's variable-size
batches exactly.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ikea_recommender_tpu.models.backbone import embedding_grad_mask
from ikea_recommender_tpu.models.families import (
    ModelConfig,
    apply_features,
    apply_model,
    mask_pad_logits,
)
from ikea_recommender_tpu.models.heads import linear_apply
from ikea_recommender_tpu.ops.fused_argmax import (
    fused_linear_argmax,
    fused_weighted_multihead_argmax,
    multihead_row_logit,
    row_logit,
)
from ikea_recommender_tpu.ops.fused_ce import fused_softmax_ce
from ikea_recommender_tpu.ops.ranking import topk_indices
from ikea_recommender_tpu.ops.rewards import diversity_from_topk, novelty_from_topk
from ikea_recommender_tpu.ops.rl import (
    gather_from_3d,
    get_max_action,
    get_weighted_q_target,
    weighted_q_loss,
)
from ikea_recommender_tpu.train.lazy_adam import (
    emb_adam_update,
    gather_qhead_rows,
    q_from_rows,
    qhead_row_adam_update,
    sort_batch_ids,
)
from ikea_recommender_tpu.train.state import (
    DoubleQState,
    TrainState,
    merge_embedding,
    split_embedding,
    split_qhead,
)


@dataclass(frozen=True)
class RLStepConfig:
    """Static RL hyperparameters baked into the jitted step."""

    gamma: float = 0.5
    alpha: float = 1.0
    q_weights: Tuple[float, ...] = (1.0, 1.0, 1.0)
    topk_div: int = 1
    topk_nov: int = 1
    nov_rew_sig: float = 1.0
    padding_pos: str = "end"
    compat_boot_len_bug: bool = False
    compat_div_len_bug: bool = False
    sarm_gamma: float = 0.99  # hardcoded in the reference (sarm.py:112)
    # One shared Adam over BOTH double-Q nets instead of one per net —
    # the reference's 1-vs-2-optimizer ablation axis (experiments named
    # ``*_2_optimizers`` under experiments/paper/SQN_RetailRocket_NoCV_final/;
    # the live trainer is the 2-optimizer shape, sqn_gru.py:172-179).
    single_optimizer: bool = False


def _masked_mean(x: jax.Array, valid: jax.Array) -> jax.Array:
    w = valid.astype(x.dtype)
    return jnp.sum(x * w) / jnp.maximum(jnp.sum(w), 1.0)


def _ce_loss(logits: jax.Array, labels: jax.Array, valid: jax.Array) -> jax.Array:
    per = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return _masked_mean(per, valid)


def _fused_sup_ce(
    params: Dict, cfg: ModelConfig, h: jax.Array, labels: jax.Array, valid: jax.Array,
    mesh=None, data_axis=None,
) -> jax.Array:
    """Supervised CE through the fused Pallas kernel — the (B, A) sup logits
    never hit HBM (ops/fused_ce.py). Exact same masked-mean semantics as
    ``_ce_loss`` over ``mask_pad_logits``-masked logits. With a mesh the
    column-sharded variant runs (parallel/fused_ce.py: per-shard kernels +
    O(B) logsumexp/label-logit merge)."""
    head = params["sup_head"]
    if mesh is not None:
        from ikea_recommender_tpu.parallel.fused_ce import (
            sharded_fused_softmax_ce,
        )

        per = sharded_fused_softmax_ce(
            h.astype(jnp.float32),
            head["kernel"],
            head["bias"],
            labels,
            mesh,
            cfg.action_dim,
            data_axis,
            cfg.head_precision,
        )
        return _masked_mean(per, valid)
    per = fused_softmax_ce(
        h.astype(jnp.float32),
        head["kernel"],
        head["bias"],
        labels,
        cfg.action_dim,
        cfg.head_precision,
    )
    return _masked_mean(per, valid)


def _apply_grad_mask(grads: Dict, model_cfg: ModelConfig) -> Dict:
    mask = embedding_grad_mask(model_cfg.backbone)
    if mask is None:
        return grads
    new_bb = dict(grads["backbone"])
    new_bb["embedding"] = new_bb["embedding"] * mask
    out = dict(grads)
    out["backbone"] = new_bb
    return out


# ---------------------------------------------------------------------------
# Supervised CE step (GRU4Rec / BidirGRU4Rec)
# ---------------------------------------------------------------------------


def ce_train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    mesh=None,
    data_axis=None,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    rng = jax.random.fold_in(state.rng, state.step)

    def loss_fn(params):
        if model_cfg.fused_ce:
            h = apply_features(
                params,
                model_cfg,
                batch["state"],
                batch["true_len"],
                dropout_rng=rng,
                deterministic=(model_cfg.backbone.dropout == 0.0),
            )
            return _fused_sup_ce(
                params, model_cfg, h, batch["action"], batch["valid"],
                mesh, data_axis,
            )
        (logits, *_rest) = apply_model(
            params,
            model_cfg,
            batch["state"],
            batch["true_len"],
            dropout_rng=rng,
            deterministic=(model_cfg.backbone.dropout == 0.0),
        )
        return _ce_loss(logits, batch["action"], batch["valid"])

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    grads = _apply_grad_mask(grads, model_cfg)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        params=new_params, opt_state=new_opt, step=state.step + 1
    )
    return new_state, {"sup_loss": loss, "q_loss": jnp.zeros_like(loss)}


def ce_train_step_lazy(
    state: TrainState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    lr: float,
    mesh=None,
    data_axis=None,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """CE step with lazy embedding Adam (TrainConfig.optimizer='lazy_adam'):
    the table gather runs outside autodiff so the embedding cotangent stays
    (B*T, E); only touched rows' param/m/v are read or written. Dense Adam
    owns the rest of the tree. See train/lazy_adam.py for semantics."""
    rng = jax.random.fold_in(state.rng, state.step)
    emb, rest = split_embedding(state.params)
    x_emb = emb[batch["state"]]  # (B, T, E) — the only table read

    def loss_fn(rest_params, x_emb):
        params = merge_embedding(rest_params, emb)  # emb unused under embeds
        h = apply_features(
            params,
            model_cfg,
            batch["state"],
            batch["true_len"],
            dropout_rng=rng,
            deterministic=(model_cfg.backbone.dropout == 0.0),
            inputs_embeds=x_emb,
        )
        if model_cfg.fused_ce:
            return _fused_sup_ce(
                params, model_cfg, h, batch["action"], batch["valid"],
                mesh, data_axis,
            )
        logits = mask_pad_logits(
            model_cfg, linear_apply(params["sup_head"], h)
        )
        return _ce_loss(logits, batch["action"], batch["valid"])

    (loss, (g_rest, g_rows)) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
        rest, x_emb
    )
    updates, new_rest_opt = opt.update(g_rest, state.opt_state["rest"], rest)
    new_rest = optax.apply_updates(rest, updates)
    frozen = (
        None
        if model_cfg.backbone.train_pad_embed
        else model_cfg.backbone.padding_idx
    )
    new_emb, new_emb_opt = emb_adam_update(
        emb,
        state.opt_state["emb"],
        batch["state"].reshape(-1),
        g_rows.reshape(-1, g_rows.shape[-1]),
        state.step,
        lr=lr,
        frozen_row=frozen,
    )
    new_state = state.replace(
        params=merge_embedding(new_rest, new_emb),
        opt_state={"rest": new_rest_opt, "emb": new_emb_opt},
        step=state.step + 1,
    )
    return new_state, {"sup_loss": loss, "q_loss": jnp.zeros_like(loss)}


# ---------------------------------------------------------------------------
# SQN double-Q step
# ---------------------------------------------------------------------------


def _double_q_run(
    state: DoubleQState,
    idx: jax.Array,
    loss_builder: Callable,
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
) -> Tuple[DoubleQState, Tuple[jax.Array, jax.Array]]:
    """One double-Q step: ``lax.cond(idx == 0, step<main=0>, step<main=1>)``
    over the (net0, net1) param/opt TUPLES.

    Each branch references its main/boot trees directly — no indexed
    gather or scatter anywhere, so the untouched net's params and Adam
    moments pass through the cond as aliased identities (the donated
    buffers are reused in place). Earlier rounds stored the pair stacked
    (2, ...) and paid ~4.3ms/step in copies + layout conversions at the
    RetailRocket SMORL point (device trace, docs/performance.md); the
    branch-duplicated forward costs nothing at runtime (one branch
    executes) and only ~2x the (cached) compile.

    Optimizer shapes (``TrainConfig.double_q_optimizers``):

    - two optimizers (default; the live reference ``sqn_gru.py:172-179``):
      each net owns an independent Adam state; only the selected net's
      params and moments move this step.
    - one optimizer: a single Adam over the (net0, net1) pair — torch's
      one-Adam-over-chained-params. The non-selected net receives zero
      grads but still moves under its accumulated momentum, and the shared
      bias-correction count advances every step. The reference's
      1-vs-2-optimizer ablation axis
      (``experiments/paper/SQN_RetailRocket_NoCV_final/*_2_optimizers``).

    ``loss_builder(p_main, p_boot) -> (total, (sup_loss, q_loss))``.
    """

    def branch(main_i: int):
        def br(state: DoubleQState):
            p_main = state.params[main_i]
            p_boot = state.params[1 - main_i]
            (_, aux), grads = jax.value_and_grad(
                lambda p: loss_builder(p, p_boot), has_aux=True
            )(p_main)
            grads = _apply_grad_mask(grads, model_cfg)
            if rl.single_optimizer:
                zeros = jax.tree.map(jnp.zeros_like, p_boot)
                pair_grads = (grads, zeros) if main_i == 0 else (zeros, grads)
                updates, new_opt = opt.update(
                    pair_grads, state.opt_state, state.params
                )
                new_params = optax.apply_updates(state.params, updates)
            else:
                updates, new_o = opt.update(
                    grads, state.opt_state[main_i], p_main
                )
                new_p = optax.apply_updates(p_main, updates)
                if main_i == 0:
                    new_params = (new_p, state.params[1])
                    new_opt = (new_o, state.opt_state[1])
                else:
                    new_params = (state.params[0], new_p)
                    new_opt = (state.opt_state[0], new_o)
            return (
                state.replace(
                    params=new_params, opt_state=new_opt, step=state.step + 1
                ),
                aux,
            )

        return br

    return jax.lax.cond(idx == 0, branch(0), branch(1), state)


# ---------------------------------------------------------------------------
# Lazy-optimizer machinery (sparse-row embedding Adam and/or sparse-COLUMN
# Q-head Adam — train/lazy_adam.py; opt-in via TrainConfig.optimizer /
# TrainConfig.qhead_optimizer)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class LazyCfg:
    """Which parts of the tree take the lazy treatment (and at what lr —
    the manual sparse updates cannot read it from the optax chain)."""

    emb_lr: Optional[float] = None  # lazy-row embedding Adam
    qh_lr: Optional[float] = None  # lazy-column Q-head Adam

    @property
    def on(self) -> bool:
        return self.emb_lr is not None or self.qh_lr is not None


def _lazy_double_q_run(
    state: DoubleQState,
    idx: jax.Array,
    batch: Dict[str, jax.Array],
    family: str,
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    lazy: LazyCfg,
    loss_builder: Callable,
) -> Tuple[DoubleQState, Tuple[jax.Array, jax.Array]]:
    """Double-Q runner for the lazy optimizer paths.

    The large lazily-updated buffers (embedding table + row moments, Q-head
    kernel/bias + column moments) must NOT flow through the double-Q
    ``lax.cond``: XLA's conditional copy insertion materializes full copies
    of large buffers a branch passes through or scatters into (measured:
    +220us/step at the RetailRocket SMORL point, HLO showed ~1GB of pure
    copies). So:

    - the cond carries ONLY the dense "rest" trees + their Adam states +
      per-net counts; it computes the selected net's loss, grads, and dense
      update, and surfaces the SMALL sparse cotangents ((K, F, B) columns,
      (B*T, E) rows);
    - both nets' sparse updates run OUTSIDE the cond, predicated on the
      coin: the unselected net's scatter writes back its own gathered
      values (identity write of B columns / B*T rows, ~20us) and its
      moments/count are passed through unchanged.

    ``loss_builder(diff, ctx) -> (total, (sup_loss, q_loss))`` where ctx
    carries {main_i, p_boot, emb, qh_full, aux} (all closure-read inside
    the cond; read-only operands do not trigger the copy pathology)."""
    qh_key = "q_head" if family == "sqn" else "q_heads"
    p0, p1 = state.params
    o0, o1 = state.opt_state

    parts = []  # (rest, emb, qh) per net
    for p in (p0, p1):
        rest = p
        emb = qh = None
        if lazy.emb_lr is not None:
            emb, rest = split_embedding(rest)
        if lazy.qh_lr is not None:
            qh, rest = split_qhead(rest, family)
        parts.append((rest, emb, qh))

    aux: Dict[str, jax.Array] = {}
    cols = x_embs = None
    K = model_cfg.num_q_heads if family == "smorl" else 1
    if lazy.qh_lr is not None:
        sids, inv = sort_batch_ids(batch["action"])
        aux["sids"], aux["inv"] = sids, inv
        cols = [
            gather_qhead_rows(qh["kernel_am"], qh["bias"], sids, K)
            for (_r, _e, qh) in parts
        ]
    if lazy.emb_lr is not None:
        x_embs = [
            jnp.take(e, batch["state"], axis=0) for (_r, e, _q) in parts
        ]

    def branch(main_i: int):
        def br(operand):
            rests, ros, counts = operand
            rest_main = rests[main_i]
            diff = {"rest": rest_main}
            if lazy.emb_lr is not None:
                diff["x_emb"] = x_embs[main_i]
            if lazy.qh_lr is not None:
                diff["w_rows"], diff["b_cols"] = cols[main_i]
            ctx = {
                "main_i": main_i,
                "p_boot": (p0, p1)[1 - main_i],
                "emb": parts[main_i][1],
                "qh_full": (
                    parts[main_i][2]
                    if lazy.qh_lr is not None
                    else (p0, p1)[main_i][qh_key]
                ),
                "aux": aux,
            }
            (_, aux_losses), grads = jax.value_and_grad(
                loss_builder, has_aux=True
            )(diff, ctx)
            g_rest = grads["rest"]
            if lazy.emb_lr is None:
                g_rest = _apply_grad_mask(g_rest, model_cfg)
            updates, new_ro = opt.update(
                {"rest": g_rest}, ros[main_i], {"rest": rest_main}
            )
            new_rest = optax.apply_updates({"rest": rest_main}, updates)["rest"]
            if main_i == 0:
                out = ((new_rest, rests[1]), (new_ro, ros[1]),
                       (counts[0] + 1, counts[1]))
            else:
                out = ((rests[0], new_rest), (ros[0], new_ro),
                       (counts[0], counts[1] + 1))
            sparse_g = (
                grads.get("w_rows", jnp.zeros(())),
                grads.get("b_cols", jnp.zeros(())),
                grads.get("x_emb", jnp.zeros(())),
            )
            return out + (sparse_g, aux_losses)

        return br

    operand = (
        (parts[0][0], parts[1][0]),
        (o0["rest"], o1["rest"]),
        (o0["count"], o1["count"]),
    )
    rests, ros, counts, (g_w, g_b, g_x), aux_losses = jax.lax.cond(
        idx == 0, branch(0), branch(1), operand
    )

    frozen = (
        None
        if model_cfg.backbone.train_pad_embed
        else model_cfg.backbone.padding_idx
    )
    new_params, new_opts = [], []
    for i in (0, 1):
        sel = idx == i
        old_cnt = (o0, o1)[i]["count"]  # pre-update count for bias correction
        p_i = dict(rests[i])
        o_i = {"rest": ros[i], "count": counts[i]}
        if lazy.emb_lr is not None:
            new_emb, new_est = emb_adam_update(
                parts[i][1],
                (o0, o1)[i]["emb"],
                batch["state"].reshape(-1),
                g_x.reshape(-1, g_x.shape[-1]),
                old_cnt,
                lr=lazy.emb_lr,
                frozen_row=frozen,
                selected=sel,
            )
            p_i = merge_embedding(p_i, new_emb)
            o_i["emb"] = new_est
        if lazy.qh_lr is not None:
            new_k, new_bf, new_qst = qhead_row_adam_update(
                parts[i][2]["kernel_am"],
                parts[i][2]["bias"],
                (o0, o1)[i]["qh"],
                aux["sids"],
                g_w,
                g_b,
                old_cnt,
                lazy.qh_lr,
                w_rows=cols[i][0],
                b_cols=cols[i][1],
                selected=sel,
            )
            p_i[qh_key] = {"kernel_am": new_k, "bias": new_bf}
            o_i["qh"] = new_qst
        new_params.append(p_i)
        new_opts.append(o_i)

    new_state = state.replace(
        params=(new_params[0], new_params[1]),
        opt_state=(new_opts[0], new_opts[1]),
        step=state.step + 1,
    )
    return new_state, aux_losses


def _lazy_diff_parts(p, family, model_cfg, lazy, batch):
    """Split one net's params for the lazy paths.

    Returns (diff, qh, emb, aux) where ``diff`` is the pytree handed to
    value_and_grad: the dense-Adam'd remainder under "rest", plus the
    OUTSIDE-autodiff gathers whose cotangents drive the sparse updates —
    "x_emb" (B, T, E) embedding rows and "w_cols"/"b_cols" (K, F, B)/(K, B)
    SORTED Q-head action columns (sorted minor-axis gathers are ~10x the
    speed of unsorted — scripts/bench_col_scatter.py)."""
    rest = p
    emb = qh = None
    aux = {}
    if lazy.emb_lr is not None:
        emb, rest = split_embedding(rest)
    if lazy.qh_lr is not None:
        qh, rest = split_qhead(rest, family)
    diff = {"rest": rest}
    if lazy.emb_lr is not None:
        diff["x_emb"] = jnp.take(emb, batch["state"], axis=0)
    if lazy.qh_lr is not None:
        sids, inv = sort_batch_ids(batch["action"])
        aux["sids"], aux["inv"] = sids, inv
        if family == "sarm":
            diff["h0"] = {
                "kernel": qh["kernel0"], "bias": qh["bias0"]
            }
            w_rows, b_cols = gather_qhead_rows(
                qh["kernel_am"], qh["bias_rest"], sids,
                qh["bias_rest"].shape[0],
            )
        else:
            w_rows, b_cols = gather_qhead_rows(
                qh["kernel_am"], qh["bias"], sids, qh["bias"].shape[0]
            )
        diff["w_rows"], diff["b_cols"] = w_rows, b_cols
    return diff, qh, emb, aux


def _dense_part(diff):
    """The sub-tree the dense optax Adam owns (matches the ``rest`` state
    initialized by train.state's lazy builders)."""
    return {k: diff[k] for k in ("rest", "h0") if k in diff}


def _q_from_rows(h, diff, aux):
    """(B, K) Q at the batch actions from the pre-gathered SORTED action
    rows (inverse-permuted back to batch order inside autodiff — the
    cotangent lands on the sorted rows, ready for the segment-sum
    dedupe)."""
    rows = jnp.take(diff["w_rows"], aux["inv"], axis=0)  # (B, K, F)
    b_cols = jnp.take(diff["b_cols"], aux["inv"], axis=1)  # (K, B)
    return q_from_rows(h, rows, b_cols)


def _lazy_apply_updates(
    p, diff, grads, qh, emb, aux, opt_state, opt, family, model_cfg, lazy, step,
    batch,
):
    """Dense-Adam the ``rest`` tree, sparse-update the embedding rows and/or
    Q-head columns, and reassemble the full param tree + opt state.

    ``step`` is unused for the sparse bias corrections — those use the
    PER-NET update count carried in the lazy opt state (matches dense
    double-Q Adam, whose count advances only when its net is selected)."""
    del step
    cnt = opt_state["count"]
    dense_g = _dense_part(grads)
    if lazy.emb_lr is None:
        dense_g = {**dense_g, "rest": _apply_grad_mask(dense_g["rest"], model_cfg)}
    updates, new_rest_opt = opt.update(
        dense_g, opt_state["rest"], _dense_part(diff)
    )
    new_dense = optax.apply_updates(_dense_part(diff), updates)
    new_p = dict(new_dense["rest"])
    new_opt = {"rest": new_rest_opt, "count": cnt + 1}

    if lazy.emb_lr is not None:
        frozen = (
            None
            if model_cfg.backbone.train_pad_embed
            else model_cfg.backbone.padding_idx
        )
        new_emb, new_emb_state = emb_adam_update(
            emb,
            opt_state["emb"],
            batch["state"].reshape(-1),
            grads["x_emb"].reshape(-1, grads["x_emb"].shape[-1]),
            cnt,
            lr=lazy.emb_lr,
            frozen_row=frozen,
        )
        new_p = merge_embedding(new_p, new_emb)
        new_opt["emb"] = new_emb_state

    if lazy.qh_lr is not None:
        key = "q_head" if family == "sqn" else "q_heads"
        if family == "sarm":
            new_k, new_b, new_qh_state = qhead_row_adam_update(
                qh["kernel_am"],
                qh["bias_rest"],
                opt_state["qh"],
                aux["sids"],
                grads["w_rows"],
                grads["b_cols"],
                cnt,
                lazy.qh_lr,
                w_rows=diff["w_rows"],
                b_cols=diff["b_cols"],
            )
            new_p[key] = {
                "kernel0": new_dense["h0"]["kernel"],
                "bias0": new_dense["h0"]["bias"],
                "kernel_am": new_k,
                "bias_rest": new_b,
            }
        else:
            new_k, new_b, new_qh_state = qhead_row_adam_update(
                qh["kernel_am"],
                qh["bias"],
                opt_state["qh"],
                aux["sids"],
                grads["w_rows"],
                grads["b_cols"],
                cnt,
                lazy.qh_lr,
                w_rows=diff["w_rows"],
                b_cols=diff["b_cols"],
            )
            new_p[key] = {"kernel_am": new_k, "bias": new_b}
        new_opt["qh"] = new_qh_state
    return new_p, new_opt


def sqn_train_step(
    state: DoubleQState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
    mesh=None,
    data_axis=None,
) -> Tuple[DoubleQState, Dict[str, jax.Array]]:
    rng = jax.random.fold_in(state.rng, state.step)
    idx = jax.random.bernoulli(rng).astype(jnp.int32)  # main net this step

    boot_len = batch["true_len"] if rl.compat_boot_len_bug else batch["true_next_len"]
    not_end = 1.0 - batch["is_end"].astype(jnp.float32)

    def loss_builder(p_main, params_boot):
        if model_cfg.fused_ce:
            # Lean path: no (B, A) logits materialize anywhere — fused CE
            # for the sup head, row gather-dots for the Q values, and the
            # blockwise argmax kernel for the target action
            # (ops/fused_argmax.py; with a mesh, the action-sharded
            # variants in parallel/q_kernels.py — same kernels per shard,
            # O(B) collective merges).
            h = apply_features(p_main, model_cfg, batch["state"], batch["true_len"])
            sup_loss_f = _fused_sup_ce(
                p_main, model_cfg, h, batch["action"], batch["valid"],
                mesh, data_axis,
            )
            qh = p_main["q_head"]
            h_next = jax.lax.stop_gradient(
                apply_features(
                    p_main, model_cfg, batch["next_state"], batch["true_next_len"]
                )
            )
            qb = params_boot["q_head"]
            h_next_boot = apply_features(
                params_boot, model_cfg, batch["next_state"], boot_len
            )
            if mesh is not None:
                from ikea_recommender_tpu.parallel.q_kernels import (
                    sharded_linear_argmax,
                    sharded_row_logit,
                )

                q = sharded_row_logit(
                    h, qh["kernel"], qh["bias"], batch["action"],
                    mesh, data_axis,
                )
                max_a_next = sharded_linear_argmax(
                    h_next, qh["kernel"], qh["bias"], model_cfg.action_dim,
                    mesh, data_axis, model_cfg.head_precision,
                )
                q_next_boot = jax.lax.stop_gradient(
                    sharded_row_logit(
                        h_next_boot, qb["kernel"], qb["bias"], max_a_next,
                        mesh, data_axis,
                    )
                )
            else:
                q = row_logit(h, qh["kernel"], qh["bias"], batch["action"])
                max_a_next = fused_linear_argmax(
                    h_next, qh["kernel"], qh["bias"], model_cfg.action_dim,
                    model_cfg.head_precision,
                )
                q_next_boot = jax.lax.stop_gradient(
                    row_logit(h_next_boot, qb["kernel"], qb["bias"], max_a_next)
                )
        else:
            sup, q_out = apply_model(
                p_main, model_cfg, batch["state"], batch["true_len"]
            )
            sup_loss_f = _ce_loss(sup, batch["action"], batch["valid"])
            q = jnp.take_along_axis(
                q_out, batch["action"][:, None], axis=1
            ).squeeze(1)

            # target: r + γ Q_boot(s', argmax_a Q_main(s', a)), zeroed at ends
            _, q_next = apply_model(
                p_main, model_cfg, batch["next_state"], batch["true_next_len"]
            )
            q_next = jax.lax.stop_gradient(q_next)
            max_a_next = jnp.argmax(q_next, axis=1)
            _, q_next_boot_all = apply_model(
                params_boot, model_cfg, batch["next_state"], boot_len
            )
            q_next_boot = jnp.take_along_axis(
                jax.lax.stop_gradient(q_next_boot_all), max_a_next[:, None], axis=1
            ).squeeze(1)
        q_next_boot = q_next_boot * not_end

        td = batch["reward"] + rl.gamma * q_next_boot - q
        q_loss = _masked_mean(td**2, batch["valid"])
        return q_loss + sup_loss_f, (sup_loss_f, q_loss)

    new_state, (sup_loss, q_loss) = _double_q_run(
        state, idx, loss_builder, model_cfg, opt, rl
    )
    return new_state, {"sup_loss": sup_loss, "q_loss": q_loss}


def sqn_train_step_lazy(
    state: DoubleQState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
    lazy: LazyCfg,
    mesh=None,
    data_axis=None,
) -> Tuple[DoubleQState, Dict[str, jax.Array]]:
    """SQN step with lazy embedding rows and/or lazy Q-head columns (see
    ``sqn_train_step`` for semantics — the loss is identical, only the
    parameter/optimizer plumbing differs). With a mesh the action-major
    Q-head stays REPLICATED (parallel/q_kernels.py dp islands): the only
    data-parallel exchange for it is the O(B) cotangent-row gather GSPMD
    inserts at the sparse update — not a dense (F, A) grad all-reduce."""
    rng = jax.random.fold_in(state.rng, state.step)
    idx = jax.random.bernoulli(rng).astype(jnp.int32)
    boot_len = batch["true_len"] if rl.compat_boot_len_bug else batch["true_next_len"]
    not_end = 1.0 - batch["is_end"].astype(jnp.float32)

    def loss_builder(diff, ctx):
        # under lazy_emb the table is split out of the diff tree; the
        # (stop-gradient) next-state forwards read it from the closure
        p_feat = (
            merge_embedding(diff["rest"], ctx["emb"])
            if lazy.emb_lr is not None
            else diff["rest"]
        )
        h = apply_features(
            diff["rest"], model_cfg, batch["state"], batch["true_len"],
            inputs_embeds=diff.get("x_emb"),
        ) if lazy.emb_lr is not None else apply_features(
            p_feat, model_cfg, batch["state"], batch["true_len"]
        )
        sup_loss_f = _fused_sup_ce(
            p_feat, model_cfg, h, batch["action"], batch["valid"],
            mesh, data_axis,
        )
        if lazy.qh_lr is not None:
            q = _q_from_rows(h, diff, ctx["aux"])[:, 0]
        else:
            q = row_logit(
                h, diff["rest"]["q_head"]["kernel"],
                diff["rest"]["q_head"]["bias"], batch["action"],
            )
        qh_full = ctx["qh_full"]
        h_next = jax.lax.stop_gradient(
            apply_features(
                p_feat, model_cfg, batch["next_state"],
                batch["true_next_len"],
            )
        )
        p_boot = ctx["p_boot"]
        qb = p_boot["q_head"]
        h_next_boot = apply_features(
            p_boot, model_cfg, batch["next_state"], boot_len
        )
        if lazy.qh_lr is not None:
            if mesh is not None:
                from ikea_recommender_tpu.parallel.q_kernels import (
                    dp_linear_argmax_am,
                )

                max_a_next = dp_linear_argmax_am(
                    h_next, qh_full["kernel_am"], qh_full["bias"],
                    model_cfg.action_dim, mesh, data_axis,
                    model_cfg.head_precision,
                )
            else:
                max_a_next = fused_linear_argmax(
                    h_next, qh_full["kernel_am"], qh_full["bias"],
                    model_cfg.action_dim, model_cfg.head_precision,
                    action_major=True,
                )
            q_next_boot = jax.lax.stop_gradient(
                q_from_rows(
                    h_next_boot,
                    *gather_qhead_rows(
                        qb["kernel_am"], qb["bias"], max_a_next, 1
                    ),
                )[:, 0]
            ) * not_end
        else:
            max_a_next = fused_linear_argmax(
                h_next, qh_full["kernel"], qh_full["bias"],
                model_cfg.action_dim, model_cfg.head_precision,
            )
            q_next_boot = jax.lax.stop_gradient(
                row_logit(h_next_boot, qb["kernel"], qb["bias"], max_a_next)
            ) * not_end
        td = batch["reward"] + rl.gamma * q_next_boot - q
        q_loss = _masked_mean(td**2, batch["valid"])
        return q_loss + sup_loss_f, (sup_loss_f, q_loss)

    new_state, (sup_loss, q_loss) = _lazy_double_q_run(
        state, idx, batch, "sqn", model_cfg, opt, lazy, loss_builder
    )
    return new_state, {"sup_loss": sup_loss, "q_loss": q_loss}


# ---------------------------------------------------------------------------
# SMORL multi-objective double-Q step
# ---------------------------------------------------------------------------


def smorl_train_step(
    state: DoubleQState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
    div_embedding: jax.Array,  # (V_in, E) frozen pretrained embedding
    unpopular_mask: jax.Array,  # (A,) bool
    out_to_in: Optional[jax.Array] = None,  # (A,) output->input remap
    mesh=None,
    data_axis=None,
) -> Tuple[DoubleQState, Dict[str, jax.Array]]:
    rng = jax.random.fold_in(state.rng, state.step)
    idx = jax.random.bernoulli(rng).astype(jnp.int32)

    K = model_cfg.num_q_heads
    w = jnp.asarray(rl.q_weights[:K], dtype=jnp.float32)
    boot_len = batch["true_len"] if rl.compat_boot_len_bug else batch["true_next_len"]
    div_len = batch["true_next_len"] if rl.compat_div_len_bug else batch["true_len"]
    not_end = 1.0 - batch["is_end"].astype(jnp.float32)

    # top-k width the online rewards need from the sup head (0 for K=1)
    k_need = max(rl.topk_div if K >= 2 else 0, rl.topk_nov if K >= 3 else 0)

    def loss_builder(p_main, params_boot):
        if model_cfg.fused_ce:
            # Lean path: NOTHING dense materializes — ONE blockwise pass
            # for the sup CE + online-reward top-k (fused_softmax_ce_topk),
            # row gather-dots for the Q values and the weighted-argmax
            # kernel for the target action (ops/fused_argmax.py).
            h = apply_features(p_main, model_cfg, batch["state"], batch["true_len"])
            sh = p_main["sup_head"]
            top_i = None
            if k_need:
                # ONE blockwise pass yields the sup CE (with grad) AND the
                # online-reward top-k — previously two separate passes over
                # the same (B, A) logits (fused-CE fwd + top-k scan). The
                # mesh variant runs the same single pass per shard with
                # O(B*k) merges (parallel/fused_ce.py, r4 — closed the r3
                # two-pass gap).
                if mesh is not None:
                    from ikea_recommender_tpu.parallel.fused_ce import (
                        sharded_fused_softmax_ce_topk,
                    )

                    per_ce, top_i = sharded_fused_softmax_ce_topk(
                        h.astype(jnp.float32), sh["kernel"], sh["bias"],
                        batch["action"], k_need, mesh, model_cfg.action_dim,
                        data_axis, model_cfg.head_precision,
                    )
                else:
                    from ikea_recommender_tpu.ops.fused_ce import (
                        fused_softmax_ce_topk,
                    )

                    per_ce, top_i = fused_softmax_ce_topk(
                        h.astype(jnp.float32), sh["kernel"], sh["bias"],
                        batch["action"], k_need, model_cfg.action_dim,
                        model_cfg.head_precision,
                    )
                sup_loss = _masked_mean(per_ce, batch["valid"])
            else:
                sup_loss = _fused_sup_ce(
                    p_main, model_cfg, h, batch["action"], batch["valid"],
                    mesh, data_axis,
                )
            qh = p_main["q_heads"]
            h_next = jax.lax.stop_gradient(
                apply_features(
                    p_main, model_cfg, batch["next_state"], batch["true_next_len"]
                )
            )
            qb = params_boot["q_heads"]
            h_next_boot = apply_features(
                params_boot, model_cfg, batch["next_state"], boot_len
            )
            if mesh is not None:
                from ikea_recommender_tpu.parallel.q_kernels import (
                    sharded_multihead_row_logit,
                    sharded_weighted_multihead_argmax,
                )

                q = sharded_multihead_row_logit(
                    h, qh["kernel"], qh["bias"], batch["action"],
                    mesh, data_axis,
                )  # (B, K)
                max_a_next = sharded_weighted_multihead_argmax(
                    h_next, qh["kernel"], qh["bias"], w,
                    model_cfg.action_dim, mesh, data_axis,
                    model_cfg.head_precision,
                )
                q_next_boot = jax.lax.stop_gradient(
                    sharded_multihead_row_logit(
                        h_next_boot, qb["kernel"], qb["bias"], max_a_next,
                        mesh, data_axis,
                    )
                )  # (B, K)
            else:
                q = multihead_row_logit(
                    h, qh["kernel"], qh["bias"], batch["action"]
                )  # (B, K)
                max_a_next = fused_weighted_multihead_argmax(
                    h_next, qh["kernel"], qh["bias"], w, model_cfg.action_dim,
                    model_cfg.head_precision,
                )
                q_next_boot = jax.lax.stop_gradient(
                    multihead_row_logit(
                        h_next_boot, qb["kernel"], qb["bias"], max_a_next
                    )
                )  # (B, K)
        else:
            sup, q_all = apply_model(
                p_main, model_cfg, batch["state"], batch["true_len"]
            )
            sup_loss = _ce_loss(sup, batch["action"], batch["valid"])
            top_i = (
                topk_indices(jax.lax.stop_gradient(sup), k_need)
                if k_need
                else None
            )
            q = gather_from_3d(q_all, batch["action"])  # (B, K)

            # Bootstrapped target (no grad): a* maximizes the WEIGHTED head
            # sum of the main net on s' (smorl_gru.py:278-295).
            _, q_out_next = apply_model(
                p_main, model_cfg, batch["next_state"], batch["true_next_len"]
            )
            q_out_next = jax.lax.stop_gradient(q_out_next)
            max_a_next = get_max_action(get_weighted_q_target(q_out_next, w))
            _, q_out_next_boot = apply_model(
                params_boot, model_cfg, batch["next_state"], boot_len
            )
            q_next_boot = gather_from_3d(
                jax.lax.stop_gradient(q_out_next_boot), max_a_next
            )  # (B, K)
        q_next_boot = q_next_boot * not_end[:, None]

        # Online rewards from the supervised head's top-k predictions (no
        # grad). Both rewards slice one shared (B, k_need) top-k: a sorted
        # top-k's first k' columns ARE the top-k' (lax.top_k sorts
        # descending, lower index first on ties).
        rewards = [batch["reward"]]
        if K >= 2:
            rewards.append(
                diversity_from_topk(
                    batch["state"],
                    top_i[:, : rl.topk_div],
                    div_len,
                    rl.padding_pos,
                    div_embedding,
                    out_to_in=out_to_in,
                )
            )
        if K >= 3:
            rewards.append(
                novelty_from_topk(
                    top_i[:, : rl.topk_nov], unpopular_mask, rl.nov_rew_sig
                )
            )
        r = jnp.stack(rewards, axis=1).astype(jnp.float32)  # (B, K)

        td = (r + rl.gamma * q_next_boot - q) ** 2  # (B, K)
        q_loss = _masked_mean(weighted_q_loss(td, w), batch["valid"])
        total = sup_loss + rl.alpha * q_loss
        return total, (sup_loss, q_loss)

    new_state, (sup_loss, q_loss) = _double_q_run(
        state, idx, loss_builder, model_cfg, opt, rl
    )
    return new_state, {"sup_loss": sup_loss, "q_loss": q_loss}


def smorl_train_step_lazy(
    state: DoubleQState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
    lazy: LazyCfg,
    div_embedding: jax.Array,
    unpopular_mask: jax.Array,
    out_to_in: Optional[jax.Array] = None,
    mesh=None,
    data_axis=None,
) -> Tuple[DoubleQState, Dict[str, jax.Array]]:
    """SMORL step with lazy embedding rows and/or lazy Q-head columns
    (loss semantics identical to ``smorl_train_step``). With a mesh the
    action-major Q-heads stay replicated (see ``sqn_train_step_lazy``);
    the sup-head CE+topk keeps the action-SHARDED single pass."""
    rng = jax.random.fold_in(state.rng, state.step)
    idx = jax.random.bernoulli(rng).astype(jnp.int32)

    K = model_cfg.num_q_heads
    w = jnp.asarray(rl.q_weights[:K], dtype=jnp.float32)
    boot_len = batch["true_len"] if rl.compat_boot_len_bug else batch["true_next_len"]
    div_len = batch["true_next_len"] if rl.compat_div_len_bug else batch["true_len"]
    not_end = 1.0 - batch["is_end"].astype(jnp.float32)
    k_need = max(rl.topk_div if K >= 2 else 0, rl.topk_nov if K >= 3 else 0)

    def loss_builder(diff, ctx):
        p_feat = (
            merge_embedding(diff["rest"], ctx["emb"])
            if lazy.emb_lr is not None
            else diff["rest"]
        )
        h = apply_features(
            diff["rest"], model_cfg, batch["state"], batch["true_len"],
            inputs_embeds=diff.get("x_emb"),
        ) if lazy.emb_lr is not None else apply_features(
            p_feat, model_cfg, batch["state"], batch["true_len"]
        )
        sh = diff["rest"]["sup_head"]
        top_i = None
        if k_need:
            if mesh is not None:
                from ikea_recommender_tpu.parallel.fused_ce import (
                    sharded_fused_softmax_ce_topk,
                )

                per_ce, top_i = sharded_fused_softmax_ce_topk(
                    h.astype(jnp.float32), sh["kernel"], sh["bias"],
                    batch["action"], k_need, mesh, model_cfg.action_dim,
                    data_axis, model_cfg.head_precision,
                )
            else:
                from ikea_recommender_tpu.ops.fused_ce import (
                    fused_softmax_ce_topk,
                )

                per_ce, top_i = fused_softmax_ce_topk(
                    h.astype(jnp.float32), sh["kernel"], sh["bias"],
                    batch["action"], k_need, model_cfg.action_dim,
                    model_cfg.head_precision,
                )
            sup_loss = _masked_mean(per_ce, batch["valid"])
        else:
            sup_loss = _fused_sup_ce(
                p_feat, model_cfg, h, batch["action"], batch["valid"],
                mesh, data_axis,
            )
        if lazy.qh_lr is not None:
            q = _q_from_rows(h, diff, ctx["aux"])  # (B, K)
        else:
            q = multihead_row_logit(
                h, diff["rest"]["q_heads"]["kernel"],
                diff["rest"]["q_heads"]["bias"], batch["action"],
            )
        qh_full = ctx["qh_full"]
        h_next = jax.lax.stop_gradient(
            apply_features(
                p_feat, model_cfg, batch["next_state"],
                batch["true_next_len"],
            )
        )
        p_boot = ctx["p_boot"]
        qb = p_boot["q_heads"]
        h_next_boot = apply_features(
            p_boot, model_cfg, batch["next_state"], boot_len
        )
        if lazy.qh_lr is not None:
            if mesh is not None:
                from ikea_recommender_tpu.parallel.q_kernels import (
                    dp_weighted_multihead_argmax_am,
                )

                max_a_next = dp_weighted_multihead_argmax_am(
                    h_next, qh_full["kernel_am"], qh_full["bias"], w,
                    model_cfg.action_dim, mesh, data_axis,
                    model_cfg.head_precision,
                )
            else:
                max_a_next = fused_weighted_multihead_argmax(
                    h_next, qh_full["kernel_am"], qh_full["bias"], w,
                    model_cfg.action_dim, model_cfg.head_precision,
                    action_major=True,
                )
            q_next_boot = jax.lax.stop_gradient(
                q_from_rows(
                    h_next_boot,
                    *gather_qhead_rows(
                        qb["kernel_am"], qb["bias"], max_a_next, K
                    ),
                )
            ) * not_end[:, None]
        else:
            max_a_next = fused_weighted_multihead_argmax(
                h_next, qh_full["kernel"], qh_full["bias"], w,
                model_cfg.action_dim, model_cfg.head_precision,
            )
            q_next_boot = jax.lax.stop_gradient(
                multihead_row_logit(
                    h_next_boot, qb["kernel"], qb["bias"], max_a_next
                )
            ) * not_end[:, None]

        rewards = [batch["reward"]]
        if K >= 2:
            rewards.append(
                diversity_from_topk(
                    batch["state"],
                    top_i[:, : rl.topk_div],
                    div_len,
                    rl.padding_pos,
                    div_embedding,
                    out_to_in=out_to_in,
                )
            )
        if K >= 3:
            rewards.append(
                novelty_from_topk(
                    top_i[:, : rl.topk_nov], unpopular_mask, rl.nov_rew_sig
                )
            )
        r = jnp.stack(rewards, axis=1).astype(jnp.float32)  # (B, K)

        td = (r + rl.gamma * q_next_boot - q) ** 2
        q_loss = _masked_mean(weighted_q_loss(td, w), batch["valid"])
        total = sup_loss + rl.alpha * q_loss
        return total, (sup_loss, q_loss)

    new_state, (sup_loss, q_loss) = _lazy_double_q_run(
        state, idx, batch, "smorl", model_cfg, opt, lazy, loss_builder
    )
    return new_state, {"sup_loss": sup_loss, "q_loss": q_loss}


# ---------------------------------------------------------------------------
# SARM step (5 self-bootstrapped Q heads)
# ---------------------------------------------------------------------------


def sarm_train_step(
    state: TrainState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
    mesh=None,
    data_axis=None,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    not_end = 1.0 - batch["is_end"].astype(jnp.float32)

    def loss_fn(params):
        if model_cfg.fused_ce:
            # Lean path: no (B, 5, A) logits materialize — fused CE on
            # head 0, row gather-dots for Q(s, a), and a blockwise per-head
            # max for the self-bootstrapped targets (honest A/B at the
            # RetailRocket point: 15.6ms -> see BENCH_DETAIL.md). Under a
            # mesh, the action-sharded variants (parallel/q_kernels.py).
            h = apply_features(params, model_cfg, batch["state"], batch["true_len"])
            qh = params["q_heads"]
            h_next = jax.lax.stop_gradient(
                apply_features(
                    params, model_cfg, batch["next_state"], batch["true_next_len"]
                )
            )
            if mesh is not None:
                from ikea_recommender_tpu.parallel.fused_ce import (
                    sharded_fused_softmax_ce,
                )
                from ikea_recommender_tpu.parallel.q_kernels import (
                    sharded_multihead_max,
                    sharded_multihead_row_logit,
                )

                per = sharded_fused_softmax_ce(
                    h.astype(jnp.float32),
                    qh["kernel"][0],
                    qh["bias"][0],
                    batch["action"],
                    mesh,
                    model_cfg.action_dim,
                    data_axis,
                    model_cfg.head_precision,
                )
                sup_loss = _masked_mean(per, batch["valid"])
                q = sharded_multihead_row_logit(
                    h, qh["kernel"], qh["bias"], batch["action"],
                    mesh, data_axis,
                )  # (B, 5)
                q_next = sharded_multihead_max(
                    h_next, qh["kernel"], qh["bias"], model_cfg.action_dim,
                    mesh, data_axis, precision=model_cfg.head_precision,
                )  # (B, 5)
            else:
                from ikea_recommender_tpu.ops.fused_topk import (
                    blockwise_multihead_max,
                )

                per = fused_softmax_ce(
                    h.astype(jnp.float32),
                    qh["kernel"][0],
                    qh["bias"][0],
                    batch["action"],
                    model_cfg.action_dim,
                    model_cfg.head_precision,
                )
                sup_loss = _masked_mean(per, batch["valid"])
                q = multihead_row_logit(
                    h, qh["kernel"], qh["bias"], batch["action"]
                )  # (B, 5)
                q_next = blockwise_multihead_max(
                    h_next, qh["kernel"], qh["bias"], model_cfg.action_dim,
                    precision=model_cfg.head_precision,
                )  # (B, 5)
        else:
            outs = apply_model(params, model_cfg, batch["state"], batch["true_len"])
            outs_next = apply_model(
                params, model_cfg, batch["next_state"], batch["true_next_len"]
            )
            outs_next = jax.lax.stop_gradient(
                jnp.stack(outs_next, axis=1)
            )  # (B,5,A)
            outs_stack = jnp.stack(outs, axis=1)  # (B, 5, A)

            q = gather_from_3d(outs_stack, batch["action"])  # (B, 5)
            q_next = jnp.max(outs_next, axis=2)  # (B, 5)
            sup_loss = _ce_loss(outs[0], batch["action"], batch["valid"])
        # Each head self-bootstraps with its own max (sarm.py:143-146);
        # targets masked at episode ends (reference omits this — see module
        # docstring).
        q_next = q_next * not_end[:, None]
        td = (batch["reward"][:, None] + rl.sarm_gamma * q_next - q) ** 2
        q_losses = jnp.sum(
            td * batch["valid"][:, None].astype(td.dtype), axis=0
        ) / jnp.maximum(jnp.sum(batch["valid"]), 1)  # (5,) per-head means
        total = sup_loss + jnp.mean(q_losses)
        return total, (sup_loss, jnp.mean(q_losses))

    (_, (sup_loss, q_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    grads = _apply_grad_mask(grads, model_cfg)
    updates, new_opt = opt.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        params=new_params, opt_state=new_opt, step=state.step + 1
    )
    return new_state, {"sup_loss": sup_loss, "q_loss": q_loss}


def sarm_train_step_lazy(
    state: TrainState,
    batch: Dict[str, jax.Array],
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
    lazy: LazyCfg,
) -> Tuple[TrainState, Dict[str, jax.Array]]:
    """SARM step with lazy embedding rows and/or lazy Q-head columns.

    Head 0 doubles as the supervised head, so its gradient is DENSE (the
    softmax-CE cotangent touches every column) — it keeps a dense Adam
    (exposed to optax as the ``h0`` leaf of the dense tree); heads 1..4 are
    pure TD and take the lazy-column path (train/lazy_adam.py:
    ``sarm_qhead_update``). Loss semantics identical to ``sarm_train_step``."""
    not_end = 1.0 - batch["is_end"].astype(jnp.float32)
    K = model_cfg.num_q_heads

    def loss_fn(diff, qh_full, emb, aux):
        from ikea_recommender_tpu.ops.fused_topk import blockwise_multihead_max

        p_feat = (
            merge_embedding(diff["rest"], emb)
            if lazy.emb_lr is not None
            else diff["rest"]
        )
        h = apply_features(
            diff["rest"], model_cfg, batch["state"], batch["true_len"],
            inputs_embeds=diff.get("x_emb"),
        ) if lazy.emb_lr is not None else apply_features(
            p_feat, model_cfg, batch["state"], batch["true_len"]
        )
        if lazy.qh_lr is not None:
            k0, b0 = diff["h0"]["kernel"], diff["h0"]["bias"]
        else:
            k0 = diff["rest"]["q_heads"]["kernel"][0]
            b0 = diff["rest"]["q_heads"]["bias"][0]
        per = fused_softmax_ce(
            h.astype(jnp.float32), k0, b0, batch["action"],
            model_cfg.action_dim, model_cfg.head_precision,
        )
        sup_loss = _masked_mean(per, batch["valid"])
        if lazy.qh_lr is not None:
            q0 = row_logit(h, k0, b0, batch["action"])  # dense head-0 grad
            q_rest = _q_from_rows(h, diff, aux)  # (B, K-1) lazy rows
            q = jnp.concatenate([q0[:, None], q_rest], axis=1)  # (B, K)
        else:
            q = multihead_row_logit(
                h, diff["rest"]["q_heads"]["kernel"],
                diff["rest"]["q_heads"]["bias"], batch["action"],
            )
        h_next = jax.lax.stop_gradient(
            apply_features(
                p_feat, model_cfg, batch["next_state"],
                batch["true_next_len"],
            )
        )
        if lazy.qh_lr is not None:
            from ikea_recommender_tpu.ops.fused_topk import (
                blockwise_multihead_max_am,
            )

            q_next0 = blockwise_multihead_max(
                h_next, qh_full["kernel0"][None], qh_full["bias0"][None],
                model_cfg.action_dim, precision=model_cfg.head_precision,
            )  # (B, 1)
            q_next_rest = blockwise_multihead_max_am(
                h_next, qh_full["kernel_am"], qh_full["bias_rest"],
                model_cfg.action_dim, precision=model_cfg.head_precision,
            )  # (B, K-1)
            q_next = jnp.concatenate([q_next0, q_next_rest], axis=1)
        else:
            q_next = blockwise_multihead_max(
                h_next, qh_full["kernel"], qh_full["bias"],
                model_cfg.action_dim, precision=model_cfg.head_precision,
            )  # (B, K)
        q_next = q_next * not_end[:, None]
        td = (batch["reward"][:, None] + rl.sarm_gamma * q_next - q) ** 2
        q_losses = jnp.sum(
            td * batch["valid"][:, None].astype(td.dtype), axis=0
        ) / jnp.maximum(jnp.sum(batch["valid"]), 1)
        total = sup_loss + jnp.mean(q_losses)
        return total, (sup_loss, jnp.mean(q_losses))

    diff, qh, emb, aux = _lazy_diff_parts(
        state.params, "sarm", model_cfg, lazy, batch
    )
    qh_full = qh if qh is not None else state.params["q_heads"]
    (_, (sup_loss, q_loss)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(diff, qh_full, emb, aux)
    new_p, new_opt = _lazy_apply_updates(
        state.params, diff, grads, qh, emb, aux, state.opt_state, opt, "sarm",
        model_cfg, lazy, state.step, batch,
    )
    new_state = state.replace(
        params=new_p, opt_state=new_opt, step=state.step + 1
    )
    return new_state, {"sup_loss": sup_loss, "q_loss": q_loss}


# ---------------------------------------------------------------------------
# Factory: family -> jitted step
# ---------------------------------------------------------------------------


class TrainStep:
    """Callable train step with auxiliary device arrays threaded as jit
    ARGUMENTS, never closure constants.

    Closure-captured device arrays become literal constants in the HLO;
    the TPU compile path handles large literal constants pathologically
    (minutes per program observed for a ~50KB constant). ``raw`` has
    signature ``(state, batch, aux) -> (state, metrics)`` so sharded
    wrappers can re-jit it with explicit shardings.
    """

    def __init__(self, raw: Callable, aux: Dict[str, jax.Array], jit: bool = True, donate: bool = True):
        self.raw = raw
        self.aux = aux
        if jit:
            self._fn = jax.jit(raw, donate_argnums=(0,) if donate else ())
        else:
            self._fn = raw

    def __call__(self, state, batch):
        return self._fn(state, batch, self.aux)


def make_train_step(
    model_cfg: ModelConfig,
    opt: optax.GradientTransformation,
    rl: RLStepConfig,
    *,
    div_embedding: Optional[jax.Array] = None,
    unpopular_mask: Optional[jax.Array] = None,
    out_to_in: Optional[jax.Array] = None,
    lazy_embedding_lr: Optional[float] = None,
    lazy_qhead_lr: Optional[float] = None,
    jit: bool = True,
    donate: bool = True,
    mesh=None,
    data_axis=None,
) -> TrainStep:
    """Build `step(state, batch) -> (state, metrics)` for the family.

    ``lazy_embedding_lr``: enable lazy (sparse-row) embedding Adam at this
    learning rate. ``lazy_qhead_lr``: enable lazy (sparse-column) Q-head
    Adam (sqn/smorl/sarm). Both need state from the matching lazy state
    builders (train/state.py) and the single-chip fused path (no mesh).

    ``mesh`` + ``data_axis``: run the fused paths through the ACTION-SHARDED
    kernels (parallel/{fused_ce,q_kernels}.py) — the head columns must be
    sharded on the mesh's model axis and the model built with
    ``align = model-axis size``. Only meaningful with model_cfg.fused_ce."""
    fam = model_cfg.family
    aux: Dict[str, jax.Array] = {}
    lazy = LazyCfg(emb_lr=lazy_embedding_lr, qh_lr=lazy_qhead_lr)
    if lazy_qhead_lr is not None and fam not in ("sqn", "smorl", "sarm"):
        raise ValueError("qhead_optimizer='lazy_adam' needs a Q family")
    if lazy.on and fam not in ("gru4rec", "bidir_gru4rec"):
        if mesh is not None and fam == "sarm":
            # sqn/smorl lazy (emb and/or qh) are mesh-capable (replicated
            # action-major heads + dp islands; GSPMD row exchange for the
            # sharded embedding); SARM's head0-dense split remains
            # single-chip (run/trainer.py falls back to dense)
            raise ValueError("mesh + lazy is not supported for sarm")
        if not model_cfg.fused_ce:
            raise ValueError("lazy optimizers require the fused train path")
        if fam == "sqn":
            raw = lambda state, batch, aux: sqn_train_step_lazy(
                state, batch, model_cfg, opt, rl, lazy, mesh, data_axis
            )
        elif fam == "smorl":
            if div_embedding is None or unpopular_mask is None:
                raise ValueError("SMORL needs div_embedding and unpopular_mask")
            aux = {"div_embedding": div_embedding, "unpopular_mask": unpopular_mask}
            if out_to_in is not None:
                aux["out_to_in"] = out_to_in
            raw = lambda state, batch, aux: smorl_train_step_lazy(
                state,
                batch,
                model_cfg,
                opt,
                rl,
                lazy,
                div_embedding=aux["div_embedding"],
                unpopular_mask=aux["unpopular_mask"],
                out_to_in=aux.get("out_to_in"),
                mesh=mesh,
                data_axis=data_axis,
            )
        else:  # sarm
            raw = lambda state, batch, aux: sarm_train_step_lazy(
                state, batch, model_cfg, opt, rl, lazy
            )
        return TrainStep(raw, aux, jit=jit, donate=donate)
    if lazy_embedding_lr is not None:
        raw = lambda state, batch, aux: ce_train_step_lazy(
            state, batch, model_cfg, opt, lazy_embedding_lr, mesh, data_axis
        )
    elif fam in ("gru4rec", "bidir_gru4rec"):
        raw = lambda state, batch, aux: ce_train_step(
            state, batch, model_cfg, opt, mesh, data_axis
        )
    elif fam == "sqn":
        raw = lambda state, batch, aux: sqn_train_step(
            state, batch, model_cfg, opt, rl, mesh, data_axis
        )
    elif fam == "smorl":
        if div_embedding is None or unpopular_mask is None:
            raise ValueError("SMORL needs div_embedding and unpopular_mask")
        aux = {"div_embedding": div_embedding, "unpopular_mask": unpopular_mask}
        if out_to_in is not None:
            aux["out_to_in"] = out_to_in
        raw = lambda state, batch, aux: smorl_train_step(
            state,
            batch,
            model_cfg,
            opt,
            rl,
            div_embedding=aux["div_embedding"],
            unpopular_mask=aux["unpopular_mask"],
            out_to_in=aux.get("out_to_in"),
            mesh=mesh,
            data_axis=data_axis,
        )
    elif fam == "sarm":
        raw = lambda state, batch, aux: sarm_train_step(
            state, batch, model_cfg, opt, rl, mesh, data_axis
        )
    else:
        raise ValueError(f"unknown family {fam}")
    return TrainStep(raw, aux, jit=jit, donate=donate)


def batch_to_device_dict(batch) -> Dict[str, jnp.ndarray]:
    """data.replay_buffer.Batch -> dict of device arrays for the steps."""
    return {
        "state": jnp.asarray(batch.state),
        "action": jnp.asarray(batch.action),
        "reward": jnp.asarray(batch.reward),
        "next_state": jnp.asarray(batch.next_state),
        "true_len": jnp.asarray(batch.true_len),
        "true_next_len": jnp.asarray(batch.true_next_len),
        "is_end": jnp.asarray(batch.is_end),
        "valid": jnp.asarray(batch.valid),
    }
