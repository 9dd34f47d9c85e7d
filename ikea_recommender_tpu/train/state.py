"""Train state containers.

Two shapes:

- :class:`TrainState` — one network + one Adam state (GRU4Rec / Bidir / SARM).
- :class:`DoubleQState` — the reference's double-Q pairs (SQN / SMORL:
  ``sqn_gru.py:141-181``) as a TUPLE of two independent pytrees. Per step a
  jax.random coin picks the main net via ``lax.cond`` over two branches that
  reference each tree directly (steps._double_q_run) — one jitted step, no
  retracing, no host round-trip (fixes SURVEY.md quirk 7).

Round-2 stored the pair STACKED (every leaf (2, ...)) and selected with
indexed gathers/scatters; a device trace showed ~4.3ms/step of pure copies
and layout conversions from that shape at the RetailRocket SMORL point
(donated in-place updates can't alias through the stack slice, and the
(2, F, K, A) heads kept bouncing between layouts). Separate trees let the
untouched net pass through the cond as an aliased identity: measured
5.7ms -> 4.4ms/step on SMORL (docs/performance.md).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ikea_recommender_tpu.models.families import ModelConfig, init_model


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar
    rng: jax.Array  # PRNG key


@struct.dataclass
class DoubleQState:
    params: Any  # (net0, net1) — two independent param pytrees
    opt_state: Any  # (opt0, opt1), or ONE shared Adam over the param pair
    step: jax.Array
    rng: jax.Array


def _scale_by_adam_mv(
    b1: float, b2: float, eps: float, mv_dtype
) -> optax.GradientTransformation:
    """optax.scale_by_adam with BOTH moments stored in ``mv_dtype``
    (math in fp32, storage downcast). At the RetailRocket operating point
    the m/v streams are the dominant per-step HBM traffic
    (docs/performance.md roofline); bf16 storage halves them."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=mv_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        c = count.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(b1, c)
        bc2 = 1.0 - jnp.power(b2, c)

        flat_u, treedef = jax.tree.flatten(updates)
        flat_m = jax.tree.leaves(state.mu)
        flat_n = jax.tree.leaves(state.nu)
        new_m, new_n, new_u = [], [], []
        for g, m, v in zip(flat_u, flat_m, flat_n):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * (g32 * g32)
            upd = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            new_m.append(m32.astype(mv_dtype))
            new_n.append(v32.astype(mv_dtype))
            new_u.append(upd.astype(g.dtype))
        return (
            jax.tree.unflatten(treedef, new_u),
            optax.ScaleByAdamState(
                count=count,
                mu=jax.tree.unflatten(treedef, new_m),
                nu=jax.tree.unflatten(treedef, new_n),
            ),
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    learning_rate: float, mv_dtype: str | None = None
) -> optax.GradientTransformation:
    """Adam with torch defaults (betas 0.9/0.999, eps 1e-8) — the reference's
    optimizer everywhere (``models/GRU4Rec/model.py:121-124``).

    ``mv_dtype`` (e.g. "bfloat16", config ``optimizer_mv_dtype``) stores both
    Adam moments in that dtype — NOT bit-identical to fp32 Adam; A/B'd in
    BENCH_DETAIL.md + tests/test_fused_topk.py's e2e tolerance check."""
    if mv_dtype is None:
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    return optax.chain(
        _scale_by_adam_mv(0.9, 0.999, 1e-8, jnp.dtype(mv_dtype)),
        optax.scale(-learning_rate),
    )


def make_train_state(
    key: jax.Array, model_cfg: ModelConfig, learning_rate: float,
    mv_dtype: str | None = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    k_init, k_state = jax.random.split(key)
    params = init_model(k_init, model_cfg)
    opt = make_optimizer(learning_rate, mv_dtype)
    return (
        TrainState(
            params=params,
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
            rng=k_state,
        ),
        opt,
    )


def make_double_q_state(
    key: jax.Array, model_cfg: ModelConfig, learning_rate: float,
    mv_dtype: str | None = None, single_optimizer: bool = False,
) -> Tuple[DoubleQState, optax.GradientTransformation]:
    """``single_optimizer=True`` gives ONE Adam state over the (net0, net1)
    param pair instead of one per net — the other arm of the reference's
    1-vs-2-optimizer ablation (see steps._double_q_run)."""
    k1, k2, k_state = jax.random.split(key, 3)
    p1 = init_model(k1, model_cfg)
    p2 = init_model(k2, model_cfg)  # independent init, like the reference's
    # sequential torch draws for DQN_1 / DQN_2
    opt = make_optimizer(learning_rate, mv_dtype)
    params = (p1, p2)
    if single_optimizer:
        opt_state = opt.init(params)
    else:
        opt_state = (opt.init(p1), opt.init(p2))
    return (
        DoubleQState(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=k_state,
        ),
        opt,
    )


def select_net(params: Any, idx: int) -> Any:
    """Network ``idx`` of a double-Q (net0, net1) pair. STATIC index only —
    a traced index would reintroduce the gather-copy the tuple layout
    exists to avoid."""
    return params[idx]


# ---------------------------------------------------------------------------
# Lazy embedding Adam (opt-in; train/lazy_adam.py)
# ---------------------------------------------------------------------------


def split_embedding(params: Any) -> Tuple[jax.Array, Any]:
    """(embedding table, params-without-embedding). The 'rest' tree is what
    the dense optimizer owns when TrainConfig.optimizer == 'lazy_adam'."""
    emb = params["backbone"]["embedding"]
    rest = dict(params)
    rest["backbone"] = {
        k: v for k, v in params["backbone"].items() if k != "embedding"
    }
    return emb, rest


def merge_embedding(rest: Any, emb: jax.Array) -> Any:
    params = dict(rest)
    params["backbone"] = dict(rest["backbone"])
    params["backbone"]["embedding"] = emb
    return params


def make_lazy_train_state(
    key: jax.Array, model_cfg: ModelConfig, learning_rate: float,
    mv_dtype: str | None = None,
) -> Tuple[TrainState, optax.GradientTransformation]:
    """TrainState whose opt_state is {'rest': adam-on-rest, 'emb': EmbAdamState}
    — no dense m/v traffic for the table (see train/lazy_adam.py).
    ``mv_dtype`` applies to the dense ("rest") moments AND the lazy moment
    buffers (update math stays fp32 — lazy_adam.py)."""
    from ikea_recommender_tpu.train.lazy_adam import init_emb_adam

    k_init, k_state = jax.random.split(key)
    params = init_model(k_init, model_cfg)
    emb, rest = split_embedding(params)
    opt = make_optimizer(learning_rate, mv_dtype)
    return (
        TrainState(
            params=params,
            opt_state={"rest": opt.init(rest), "emb": init_emb_adam(emb, mv_dtype)},
            step=jnp.zeros((), jnp.int32),
            rng=k_state,
        ),
        opt,
    )


# ---------------------------------------------------------------------------
# Lazy Q-family states (sparse-row embedding and/or sparse-column Q-heads —
# train/lazy_adam.py; steps._lazy_apply_updates consumes this structure)
# ---------------------------------------------------------------------------

_QH_KEY = {"sqn": "q_head", "smorl": "q_heads", "sarm": "q_heads"}


def split_qhead(params: Any, family: str) -> Tuple[Any, Any]:
    """(q-head subtree, params-without-q-head)."""
    key = _QH_KEY[family]
    rest = {k: v for k, v in params.items() if k != key}
    return params[key], rest


def lazy_qhead_params(params: Any, family: str) -> Any:
    """Replace the canonical Q-head leaf with the ACTION-MAJOR lazy layout
    (train/lazy_adam.py): ``kernel_am`` (A, K*F). SARM splits off head 0
    (supervised CE makes its gradient dense, so it keeps a dense Adam).
    ``models.families.canonicalize_qheads`` is the inverse for consumers
    that need (K, F, A)."""
    from ikea_recommender_tpu.train.lazy_adam import to_action_major

    if family == "sqn":
        qh = params["q_head"]
        return {
            **params,
            "q_head": {
                "kernel_am": to_action_major(qh["kernel"]),
                "bias": qh["bias"],
            },
        }
    if family == "smorl":
        qh = params["q_heads"]
        return {
            **params,
            "q_heads": {
                "kernel_am": to_action_major(qh["kernel"]),
                "bias": qh["bias"],
            },
        }
    qh = params["q_heads"]  # sarm
    return {
        **params,
        "q_heads": {
            "kernel0": qh["kernel"][0],
            "bias0": qh["bias"][0],
            "kernel_am": to_action_major(qh["kernel"][1:]),
            "bias_rest": qh["bias"][1:],
        },
    }


def _lazy_net_opt_state(
    opt: optax.GradientTransformation,
    params: Any,
    family: str,
    lazy_emb: bool,
    lazy_qh: bool,
    mv_dtype: str | None = None,
):
    """Per-net opt state for the lazy paths: {"rest": optax-on-dense-part,
    "emb"?: EmbAdamState, "qh"?: ColAdamState}. The dense part mirrors
    steps._dense_part: the remainder tree under "rest" plus, for SARM's
    densely-updated head 0, an "h0" leaf. ``params`` must already carry the
    action-major lazy layout (``lazy_qhead_params``) when lazy_qh."""
    from ikea_recommender_tpu.train.lazy_adam import init_col_adam, init_emb_adam

    rest = params
    st: dict = {}
    if lazy_emb:
        emb, rest = split_embedding(rest)
        st["emb"] = init_emb_adam(emb, mv_dtype)
    if lazy_qh:
        qh, rest = split_qhead(rest, family)
        if family == "sarm":
            st["qh"] = init_col_adam(
                qh["kernel_am"], qh["bias_rest"].shape[0], mv_dtype
            )
        else:
            K = qh["bias"].shape[0] if qh["bias"].ndim == 2 else 1
            st["qh"] = init_col_adam(qh["kernel_am"], K, mv_dtype)
    dense = {"rest": rest}
    if lazy_qh and family == "sarm":
        dense["h0"] = {"kernel": qh["kernel0"], "bias": qh["bias0"]}
    st["rest"] = opt.init(dense)
    # Per-NET update count for the sparse parts' Adam bias correction:
    # dense double-Q Adam's count advances only on the steps its net is the
    # selected main net, and the lazy paths must match (the global step
    # would over-correct the unselected net's first updates).
    st["count"] = jnp.zeros((), jnp.int32)
    return st


def make_lazy_double_q_state(
    key: jax.Array,
    model_cfg: ModelConfig,
    learning_rate: float,
    mv_dtype: str | None = None,
    *,
    lazy_emb: bool = False,
    lazy_qh: bool = False,
) -> Tuple[DoubleQState, optax.GradientTransformation]:
    """Double-Q state for sqn/smorl with lazy optimizer parts (each net owns
    independent {rest, emb?, qh?} states; the 1-optimizer ablation arm is
    dense-only)."""
    k1, k2, k_state = jax.random.split(key, 3)
    p1 = init_model(k1, model_cfg)
    p2 = init_model(k2, model_cfg)
    fam = model_cfg.family
    if lazy_qh:
        p1 = lazy_qhead_params(p1, fam)
        p2 = lazy_qhead_params(p2, fam)
    opt = make_optimizer(learning_rate, mv_dtype)
    opt_state = (
        _lazy_net_opt_state(opt, p1, fam, lazy_emb, lazy_qh, mv_dtype),
        _lazy_net_opt_state(opt, p2, fam, lazy_emb, lazy_qh, mv_dtype),
    )
    return (
        DoubleQState(
            params=(p1, p2),
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            rng=k_state,
        ),
        opt,
    )


def make_lazy_sarm_state(
    key: jax.Array,
    model_cfg: ModelConfig,
    learning_rate: float,
    mv_dtype: str | None = None,
    *,
    lazy_emb: bool = False,
    lazy_qh: bool = False,
) -> Tuple[TrainState, optax.GradientTransformation]:
    k_init, k_state = jax.random.split(key)
    params = init_model(k_init, model_cfg)
    if lazy_qh:
        params = lazy_qhead_params(params, "sarm")
    opt = make_optimizer(learning_rate, mv_dtype)
    return (
        TrainState(
            params=params,
            opt_state=_lazy_net_opt_state(
                opt, params, "sarm", lazy_emb, lazy_qh, mv_dtype
            ),
            step=jnp.zeros((), jnp.int32),
            rng=k_state,
        ),
        opt,
    )
