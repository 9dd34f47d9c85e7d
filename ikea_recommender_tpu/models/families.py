"""Model families as head-configurations over the shared backbone.

The reference's five model classes are structurally one backbone with
different head sets (SURVEY.md §2 #1-8):

- ``gru4rec``       -> sup head only                 (model.py:6-82)
- ``bidir_gru4rec`` -> sup head on 2H bidir features (BidirGRU4Rec/model.py)
- ``sqn``           -> sup + 1 Q head                (sqn_gru.py:10-112)
- ``smorl``         -> sup + K Q heads (canonical K=3: acc/div/nov; the
                       reference net emits 3 but trains 2 — quirk 1)
                                                     (smorl_gru.py:14-139)
- ``sarm``          -> 5 Q heads, head 0 doubles as the supervised head
                                                     (sarm.py:5-76)

``apply_model`` returns a tuple of head outputs so the eval protocol's
``head_idx`` selection works uniformly (reference
``evaluate/eval_protocol.py:103-120``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ikea_recommender_tpu.models.backbone import (
    BackboneConfig,
    apply_backbone,
    init_backbone,
)
from ikea_recommender_tpu.models.heads import (
    init_linear,
    init_multihead,
    linear_apply,
    multihead_apply,
)

FAMILIES = ("gru4rec", "bidir_gru4rec", "sqn", "smorl", "sarm")

# Below this catalog size the fused-CE kernel's fixed per-call cost beats its
# HBM-traffic savings (measured: 200-item synthetic runs ~12% slower fused,
# the 70852-item RetailRocket point ~18% faster).
FUSED_CE_MIN_ACTIONS = 8192


@dataclass(frozen=True)
class ModelConfig:
    family: str
    backbone: BackboneConfig
    action_dim: int
    num_q_heads: int = 0  # sqn: 1, smorl: K (default 3), sarm: 5
    # Pad the output head's action dim up to a multiple (sharding
    # divisibility + aligned TPU tiles). Padded logits are masked to -1e9
    # so softmax / top-k / argmax semantics are untouched. 1 = exact dims.
    action_align: int = 1
    # Compute the supervised CE (and the Q-target argmax / row logits /
    # reward top-k) through the fused kernels — logits never hit HBM
    # (ops/{fused_ce,fused_argmax,fused_topk}.py). Mesh runs route to the
    # action-sharded variants (parallel/{fused_ce,q_kernels}.py) via the
    # ``mesh`` argument of train.steps.make_train_step.
    fused_ce: bool = False
    # MXU precision for the fused train-step head matmuls (CE / Q-target
    # argmax): "high" = bf16x3, "highest" = 6-pass fp32, "default" = bf16.
    # See TrainConfig.head_precision and docs/performance.md.
    head_precision: str = "high"

    def __post_init__(self):
        if self.family not in FAMILIES:
            raise ValueError(f"unknown model family {self.family!r}")

    @property
    def padded_action_dim(self) -> int:
        a = self.action_align
        return -(-self.action_dim // a) * a

    @property
    def has_q(self) -> bool:
        return self.family in ("sqn", "smorl", "sarm")


def model_config_from_train(train_cfg, data_cfg, align: int = 1) -> ModelConfig:
    """Build a ModelConfig from the typed experiment config sections.

    ``align`` pads vocab rows and the action dim to a multiple (pass the
    model-axis size — or lcm(128, axis) for tile-aligned TPU tables)."""
    family = train_cfg.model
    backbone = BackboneConfig(
        num_items=data_cfg.num_items,
        embedding_dim=train_cfg.embedding_size,
        hidden_dim=train_cfg.hidden_state_size,
        gru_layers=train_cfg.gru_layers,
        bidirectional=(family == "bidir_gru4rec"),
        pad_id=train_cfg.padding_id,
        train_pad_embed=train_cfg.train_padding_embed,
        masked_recurrence=train_cfg.use_packed_seq,
        head_layer="first" if train_cfg.compat_first_layer_head else "last",
        dropout=train_cfg.dropout,
        compute_dtype=train_cfg.compute_dtype,
        scan_impl=getattr(train_cfg, "scan_impl", "auto"),
        vocab_align=align,
    )
    num_q = {"gru4rec": 0, "bidir_gru4rec": 0, "sqn": 1, "sarm": 5}.get(
        family, train_cfg.num_q_heads
    )
    return ModelConfig(
        family=family,
        backbone=backbone,
        action_dim=data_cfg.num_actions,
        num_q_heads=num_q,
        action_align=align,
        fused_ce=(
            getattr(train_cfg, "fused_ce", False)
            and data_cfg.num_actions
            >= (
                FUSED_CE_MIN_ACTIONS
                if getattr(train_cfg, "fused_ce_min_actions", None) is None
                else train_cfg.fused_ce_min_actions
            )
        ),
        head_precision=getattr(train_cfg, "head_precision", "high"),
    )


def init_model(key: jax.Array, cfg: ModelConfig) -> Dict:
    k_bb, k_sup, k_q = jax.random.split(key, 3)
    params: Dict = {"backbone": init_backbone(k_bb, cfg.backbone)}
    feat = cfg.backbone.feature_dim
    A = cfg.padded_action_dim
    if cfg.family == "sarm":
        # 5 Q heads; head 0 doubles as the supervised head (sarm.py:59-61).
        params["q_heads"] = init_multihead(k_q, 5, feat, A)
        return params
    params["sup_head"] = init_linear(k_sup, feat, A)
    if cfg.family == "sqn":
        params["q_head"] = init_linear(k_q, feat, A)
    elif cfg.family == "smorl":
        params["q_heads"] = init_multihead(k_q, cfg.num_q_heads, feat, A)
    return params


def apply_features(
    params: Dict,
    cfg: ModelConfig,
    states: jax.Array,
    lengths: jax.Array,
    *,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
    inputs_embeds: Optional[jax.Array] = None,
) -> jax.Array:
    """Backbone features (B, F) — the input every head shares."""
    return apply_backbone(
        params["backbone"],
        cfg.backbone,
        states,
        lengths,
        dropout_rng=dropout_rng,
        deterministic=deterministic,
        inputs_embeds=inputs_embeds,
    )


def mask_pad_logits(cfg: ModelConfig, logits: jax.Array) -> jax.Array:
    """Padded action slots never win softmax / top-k / argmax."""
    n_pad = cfg.padded_action_dim - cfg.action_dim
    if n_pad == 0:
        return logits
    neg = jnp.full(logits.shape[:-1] + (n_pad,), -1e9, dtype=logits.dtype)
    return jnp.concatenate([logits[..., : cfg.action_dim], neg], axis=-1)


def canonicalize_qheads(params: Dict, cfg: ModelConfig) -> Dict:
    """Lazy-optimizer states store the Q-head kernels ACTION-MAJOR
    ((A, K*F) ``kernel_am``; SARM splits off its densely-updated head 0 —
    train/lazy_adam.py). Transpose back to the canonical (K, F, A) layout
    for consumers that expect it (the dense/toy-scale paths, exported
    checkpoints) — a correctness-only conversion; the fused train/eval
    kernels read action-major directly."""
    from ikea_recommender_tpu.train.lazy_adam import from_action_major

    fam = cfg.family
    if fam == "sqn" and "kernel_am" in params.get("q_head", {}):
        k = from_action_major(params["q_head"]["kernel_am"], 1)[0]
        params = {
            **params,
            "q_head": {"kernel": k, "bias": params["q_head"]["bias"]},
        }
    elif fam == "smorl" and "kernel_am" in params.get("q_heads", {}):
        k = from_action_major(
            params["q_heads"]["kernel_am"], cfg.num_q_heads
        )
        params = {
            **params,
            "q_heads": {"kernel": k, "bias": params["q_heads"]["bias"]},
        }
    elif fam == "sarm" and "kernel0" in params.get("q_heads", {}):
        qh = params["q_heads"]
        krest = from_action_major(qh["kernel_am"], cfg.num_q_heads - 1)
        params = {
            **params,
            "q_heads": {
                "kernel": jnp.concatenate([qh["kernel0"][None], krest], 0),
                "bias": jnp.concatenate([qh["bias0"][None], qh["bias_rest"]], 0),
            },
        }
    return params


def apply_model(
    params: Dict,
    cfg: ModelConfig,
    states: jax.Array,
    lengths: jax.Array,
    *,
    dropout_rng: Optional[jax.Array] = None,
    deterministic: bool = True,
) -> Tuple[jax.Array, ...]:
    """Forward pass -> tuple of head outputs.

    gru4rec / bidir: (logits,)
    sqn:   (sup_logits, q_values (B, A))
    smorl: (sup_logits, q_all (B, K, A))
    sarm:  (head_0, ..., head_4) each (B, A)
    """
    params = canonicalize_qheads(params, cfg)
    h = apply_features(
        params, cfg, states, lengths,
        dropout_rng=dropout_rng, deterministic=deterministic,
    )

    def mask_pad(logits):
        return mask_pad_logits(cfg, logits)

    if cfg.family == "sarm":
        q_all = mask_pad(multihead_apply(params["q_heads"], h))  # (B, 5, A)
        return tuple(q_all[:, i, :] for i in range(5))
    sup = mask_pad(linear_apply(params["sup_head"], h))
    if cfg.family == "sqn":
        return sup, mask_pad(linear_apply(params["q_head"], h))
    if cfg.family == "smorl":
        return sup, mask_pad(multihead_apply(params["q_heads"], h))
    return (sup,)
