"""Typed experiment configuration.

The reference drives experiments from YAML files with four sections
(``experiment`` / ``data`` / ``train`` / ``metrics``) that scripts manually
unpack into ~30 keyword arguments (reference:
``recommenders/utils/load_config.py:10-32``,
``scripts/paper/smorl_gru_train.py:22-101``,
``experiments/IKEA/final_experiments/SMORL-paper.yaml:1-54``).

Here the same schema is a set of dataclasses with defaults matching the
reference's canonical operating points, plus explicit "quirk compatibility"
flags for each latent reference bug documented in SURVEY.md §2 — correct
behavior by default, reference behavior opt-in.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class ExperimentConfig:
    """Experiment metadata (reference YAML section ``experiment``)."""

    exp_class: str = "default"
    exp_name: str = "experiment"
    desc: str = ""
    use_wandb: bool = False
    use_tensorboard: bool = False
    tensorboard_root: str = "tensorboard"
    seed: int = 118
    # Reference keeps two RNG seeds (torch + python); we fold both into one
    # JAX key but keep the fields for config-file compatibility.
    seed_torch: Optional[int] = None
    seed_python: Optional[int] = None
    save_pretrained_embeddings: bool = False


@dataclass
class DataConfig:
    """Data paths and vocabulary sizes (reference YAML section ``data``)."""

    train_path: str = ""
    val_path: str = ""
    test_path: str = ""
    # Input vocabulary size (items; the embedding table has num_items + 1 rows
    # with the extra row used for padding — reference
    # ``models/GRU4Rec/model.py:30-39``).
    num_items: int = 0
    # Output head size. Distinct from num_items in the IKEA dual-tokenizer
    # setup (reference ``ikea/training/trainGRU.py:27-28``); defaults to
    # num_items when 0.
    num_actions: int = 0
    input_tokenizer: Optional[str] = None
    output_tokenizer: Optional[str] = None
    market_tokenizer: Optional[str] = None
    # Column names used when val/test paths point at RAW session files
    # (windowed in memory — reference ``evaluate/eval_dataset.py:6-77``)
    # rather than prebuilt eval buffers.
    session_col: str = "session_id"
    item_col: str = "item_id"

    def __post_init__(self) -> None:
        if self.num_actions == 0:
            self.num_actions = self.num_items


@dataclass
class TrainConfig:
    """Model + optimization hyperparameters (reference YAML section ``train``)."""

    model: str = "gru4rec"  # gru4rec | bidir_gru4rec | sqn | smorl | sarm
    batch_size: int = 256
    val_batch_size: int = 2000
    epochs: int = 30
    learning_rate: float = 0.01
    embedding_size: int = 64
    hidden_state_size: int = 64
    gru_layers: int = 1
    dropout: float = 0.0  # BidirGRU4Rec only
    gamma: float = 0.5
    alpha: float = 1.0
    q_weights: List[float] = field(default_factory=lambda: [1.0, 1.0, 1.0])
    state_size: int = 10
    padding_position: str = "end"  # "end" or "beg"
    padding_id: Optional[int] = None  # defaults to num_items
    train_padding_embed: bool = True
    # The reference's packed sequences become a length-masked GRU recurrence
    # on TPU (identical semantics, fixed shapes): h_t advances only for
    # t < true_len. use_packed_seq=False runs the GRU over pad tokens too,
    # like the reference's non-packed path.
    use_packed_seq: bool = True
    best_model_metric: str = "Val_NDCG@10"
    best_model_mode: str = "max"  # fixed comparator (reference SaveBestModel quirk 5)
    head_idx: int = 0
    eval_at: List[float] = field(default_factory=lambda: [0.25, 0.5, 0.75, 1.0])
    # Double-Q specifics (SQN / SMORL)
    num_q_heads: int = 3  # SMORL; canonical 3-head (acc, div, nov)
    # SARM discount. The reference hardcodes 0.99 (sarm.py:112), which makes
    # its self-bootstrapped Q targets DIVERGE (positive feedback through the
    # per-head max; measured: q_loss grows monotonically and the shared
    # backbone never learns) — faithful to the reference's half-finished
    # SARM. Lower it (e.g. 0.5) to stabilize.
    sarm_gamma: float = 0.99
    # dtype policy: params dtype and compute dtype. bfloat16 compute keeps the
    # MXU fed; fp32 params keep Adam stable.
    param_dtype: str = "float32"
    compute_dtype: str = "float32"
    # GRU scan implementation: "auto" applies the measured regime rule
    # (Pallas kernel for long sequences where its VMEM-pinning wins,
    # lax.scan otherwise — scripts/bench_gru_regime.py, docs/performance.md);
    # "xla" / "pallas" force one.
    scan_impl: str = "auto"
    # Fused Pallas softmax-CE for the supervised head in train steps
    # (ops/fused_ce.py): sup logits never materialize in HBM. Under a mesh
    # the action-sharded variants run (parallel/{fused_ce,q_kernels}.py).
    fused_ce: bool = True
    # Catalog size below which fused_ce auto-disables (the kernels' fixed
    # per-call cost beats their traffic savings on tiny catalogs —
    # models/families.py:FUSED_CE_MIN_ACTIONS). Set 0 to force fused on
    # (tests / multichip dryruns on toy catalogs).
    fused_ce_min_actions: Optional[int] = None
    # MXU precision of the fused head matmuls in TRAIN steps (CE + Q-target
    # argmax). The step-decomposition profile (scripts/profile_step.py)
    # showed 6-pass fp32 head matmuls dominating the train step, not HBM
    # traffic. "high" = bf16x3 (deltas at fp32 rounding level; default),
    # "highest" = 6-pass fp32 (exact reference-parity numerics),
    # "default" = single bf16 pass (fastest; ~1e-6 loss delta at the
    # RetailRocket point). Eval always runs at "highest".
    head_precision: str = "high"
    # "adam" (reference parity, dense) or "lazy_adam" (sparse-row embedding
    # updates — train/lazy_adam.py; large-catalog throughput opt-in, any
    # family, NOT bit-identical to dense Adam).
    optimizer: str = "adam"
    # Q-head optimizer (sqn/smorl/sarm): None/"adam" (dense; reference
    # parity) or "lazy_adam" — sparse-COLUMN Adam over the (K, F, A) head:
    # only the B batch-action columns' params/moments move per step (dW is
    # 99.6% zeros at the RetailRocket point; train/lazy_adam.py). Lazy
    # semantics (moment decay only when touched) — accuracy-gated e2e in
    # tests/test_lazy_qhead.py. Orthogonal to ``optimizer`` (the embedding
    # treatment); single-chip fused path only.
    qhead_optimizer: Optional[str] = None
    # Storage dtype for Adam's m/v moments (e.g. "bfloat16" halves the
    # dominant optimizer streaming traffic — docs/performance.md roofline).
    # None = fp32 (reference parity). Math stays fp32 either way.
    optimizer_mv_dtype: Optional[str] = None
    # Double-Q (sqn/smorl) optimizer count: 2 = one Adam per net (the live
    # reference, sqn_gru.py:172-179); 1 = one shared Adam over both nets —
    # the reference's historical ablation axis (experiments named
    # ``*_2_optimizers``). See train/steps.py:_double_q_run.
    double_q_optimizers: int = 2
    # --- Quirk-compatibility flags (SURVEY.md §2, "correct by default") ---
    # Quirk 2: reference bootstraps Q_boot(s', ·) with true_len instead of
    # true_next_len (sqn_gru.py:231, smorl_gru.py:291).
    compat_boot_len_bug: bool = False
    # Quirk 3: reference computes the online diversity reward with
    # len_states=true_next_len over s (smorl_gru.py:298-305).
    compat_div_len_bug: bool = False
    # Quirk 4: reference reads h[0] (first layer) instead of h[-1] as the
    # head input for multi-layer GRUs (models/GRU4Rec/model.py:76-77).
    compat_first_layer_head: bool = False
    # Resume support (an upgrade over the reference, which has none).
    checkpoint_dir: Optional[str] = None
    resume: bool = False
    # Max optimizer steps per device dispatch: training windows longer than
    # this are split into multiple scanned dispatches. Bounds single-program
    # execution time — long-running single dispatches can trip remote-backend
    # watchdogs (observed: multi-second Q-family windows killing the axon
    # TPU worker at the RetailRocket scale, r4) and delay preemption/health
    # signals in production. A few extra dispatch RTTs per epoch.
    max_window_batches: int = 1024
    # jax.profiler trace of the first training window (view in Perfetto /
    # TensorBoard). The reference has no tracing at all (SURVEY.md §5).
    profile_dir: Optional[str] = None
    # Named numerics presets (docs/performance.md):
    #   "fast"      — bf16 head matmuls + bf16 Adam moments + (Q families)
    #                 lazy-column Q-head Adam: the certified max-throughput
    #                 arm (accuracy-gated e2e in tests/test_optimizer_mv.py
    #                 and tests/test_lazy_qhead.py; ~1.8x the default arm on
    #                 gru4rec, ~1.5-2.3x on smorl/sarm at the RetailRocket
    #                 point).
    #   "reference" — 6-pass fp32 head matmuls + fp32 moments: exact
    #                 reference-parity numerics.
    # A preset only fills fields still at their defaults, so explicit
    # head_precision / optimizer_mv_dtype / qhead_optimizer settings win.
    preset: Optional[str] = None

    def __post_init__(self) -> None:
        if self.preset is not None:
            if self.preset not in ("fast", "reference"):
                raise ValueError(
                    f"train.preset must be 'fast' or 'reference', got {self.preset!r}"
                )
            if self.head_precision == "high":
                self.head_precision = (
                    "default" if self.preset == "fast" else "highest"
                )
            if self.optimizer_mv_dtype is None and self.preset == "fast":
                self.optimizer_mv_dtype = "bfloat16"
            if self.qhead_optimizer is None and self.preset == "fast":
                # no-op for non-Q families (run/trainer.py resolves it);
                # the marker lets the trainer fall back to dense Adam when
                # a lazy-qh precondition fails, instead of raising — only
                # EXPLICIT qhead_optimizer settings hard-error.
                self.qhead_optimizer = "lazy_adam"
                self.qhead_from_preset = True
        if self.head_precision not in ("highest", "high", "default"):
            raise ValueError(
                "train.head_precision must be one of highest/high/default, "
                f"got {self.head_precision!r}"
            )


@dataclass
class ParallelConfig:
    """Device-mesh scaling (YAML section ``parallel`` — a NEW capability;
    the reference is single-GPU, SURVEY.md §2 #35-38).

    ``data`` x ``model`` devices form a 2-D mesh: the batch is sharded on
    ``data`` (gradient all-reduce on ICI), embedding-table rows and
    output-head columns on ``model``. ``data = model = 1`` (default) is the
    reference's single-device operating point — the trainer then takes the
    plain single-chip path.
    """

    data: int = 1
    model: int = 1
    # Route the gru4rec/bidir supervised CE through the sharded flash-CE
    # kernel (parallel/fused_ce.py): per-shard logits never materialize.
    # Requires model > 1.
    sharded_ce: bool = False
    # Process-sharded data path: each process uploads only ITS rows of the
    # replay buffer (padded contiguous blocks per data shard, assembled
    # into one global row-sharded array — core/distributed.py), and epoch
    # sampling permutes WITHIN each data shard so batch gathers never cross
    # shards (no inter-host traffic in the input path). None = auto: on
    # when jax.process_count() > 1. Set True on one process to reproduce
    # the multi-host batch composition exactly (tests do this).
    process_sharded: Optional[bool] = None

    @property
    def num_devices(self) -> int:
        return self.data * self.model

    @property
    def enabled(self) -> bool:
        return self.num_devices > 1


@dataclass
class MetricsConfig:
    """Evaluation protocol parameters (reference YAML section ``metrics``)."""

    div_emb_dir: Optional[str] = None
    # SMORL without a frozen diversity embedding has a dead third objective
    # (cosine sim ≡ 1 -> div reward ≡ 0). The trainer always warns loudly in
    # that case; with require_div_emb it refuses to run (the RetailRocket
    # product protocol sets this).
    require_div_emb: bool = False
    unpopular_actions_path: Optional[str] = None
    topk_cov: List[int] = field(default_factory=lambda: [1, 5, 10, 20])
    topk_div: int = 1
    topk_hr_ndcg: List[int] = field(default_factory=lambda: [10, 20])
    topk_nov: int = 1
    nov_rew_sig: float = 1.0
    # Per-batch TRAIN-metric accumulation inside the train windows
    # (reference trainGRU.py:385-395 computes HR/NDCG/coverage/rewards on
    # every train batch). At large catalogs this costs a second full-catalog
    # top-k pass per optimizer step (measured: scripts/ab_inloop_accum.py,
    # RESULTS.md). False skips it: Train_* metric keys log as 0,
    # losses/val/test are unaffected. A production speed lever; keep True
    # for reference-parity logs.
    train_metrics: bool = True
    # Fused blockwise/sharded evaluation (ops/fused_topk.py): the eval pass
    # never materializes (B, A) logits. None = auto (on for big catalogs and
    # whenever the head is model-sharded), True/False = force.
    fused_eval: Optional[bool] = None
    # MXU precision of the fused eval head matmuls. None (default) keeps
    # logits bit-identical to the dense path ("highest" fp32 passes);
    # "high" (bf16x3) / "default" (bf16) trade exactness for throughput —
    # near-tie top-k order may then differ. Only affects fused_eval.
    eval_precision: Optional[str] = None
    # Per-action-type HR/NDCG (the old generation's capability, reference
    # old/sqn_evaluation_old.py): name for each numeric type id carried in
    # the buffers' action_type column, e.g. ["click", "buy"]. Emits
    # HR@k[Click] / NDCG@k[Buy] / ...[Total] logging keys
    # (old/logging_old.py format). None = off.
    action_type_names: Optional[List[str]] = None


@dataclass
class Config:
    """Top-level config: the four reference YAML sections."""

    experiment: ExperimentConfig = field(default_factory=ExperimentConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    metrics: MetricsConfig = field(default_factory=MetricsConfig)
    parallel: ParallelConfig = field(default_factory=ParallelConfig)
    # The config file's parent directory doubles as the experiment output dir
    # (reference ``scripts/paper/smorl_gru_train.py:20``).
    exp_dir: str = "."

    @property
    def padding_id(self) -> int:
        if self.train.padding_id is not None:
            return self.train.padding_id
        return self.data.num_items

    @property
    def seed(self) -> int:
        exp = self.experiment
        if exp.seed_torch is not None:
            # Fold the reference's two seeds into one deterministic value.
            return int(exp.seed_torch) * 1_000_003 + int(exp.seed_python or 0)
        return exp.seed


def _filter_kwargs(cls: type, raw: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in raw.items() if k in names}


# Keys the reference YAMLs use that map onto differently-named fields here.
_TRAIN_ALIASES = {
    "base_model": "model",
}


def config_from_dict(raw: Dict[str, Any], exp_dir: str = ".") -> Config:
    """Build a Config from a raw (reference-compatible) YAML dict."""
    exp_raw = dict(raw.get("experiment", {}))
    for key in ("exp_class", "exp_name"):
        if key in raw:
            exp_raw.setdefault(key, raw[key])
    data_raw = dict(raw.get("data", {}))
    train_raw = dict(raw.get("train", {}))
    for old, new in _TRAIN_ALIASES.items():
        if old in train_raw and new not in train_raw:
            val = train_raw.pop(old)
            # Reference uses base_model: "GRU"; our model names are lowercase.
            train_raw[new] = {"GRU": "gru4rec"}.get(val, str(val).lower())
    metrics_raw = dict(raw.get("metrics", {}))
    # eval_at historically lives in the metrics section of IKEA configs.
    if "eval_at" in metrics_raw and "eval_at" not in train_raw:
        train_raw["eval_at"] = metrics_raw["eval_at"]
    # padding_position was also spelled padding_pos in some configs.
    if "padding_pos" in train_raw and "padding_position" not in train_raw:
        train_raw["padding_position"] = train_raw.pop("padding_pos")
    # Reference YAMLs carry an ``actions:`` section for the per-action-type
    # capability (old generation; e.g. SQN_GRU_paper_*_2_optimizers.yaml):
    # actions.action_types_names {0: "click", 1: "buy"} -> ordered name list.
    actions_raw = raw.get("actions", {}) or {}
    names = actions_raw.get("action_types_names")
    if names and "action_type_names" not in metrics_raw:
        if isinstance(names, dict):
            names = [names[k] for k in sorted(names, key=int)]
        metrics_raw["action_type_names"] = list(names)
    par_raw = dict(raw.get("parallel", {}))
    # also accept parallel: {mesh: {data: N, model: M}} nesting
    if "mesh" in par_raw and isinstance(par_raw["mesh"], dict):
        par_raw.update(par_raw.pop("mesh"))
    return Config(
        experiment=ExperimentConfig(**_filter_kwargs(ExperimentConfig, exp_raw)),
        data=DataConfig(**_filter_kwargs(DataConfig, data_raw)),
        train=TrainConfig(**_filter_kwargs(TrainConfig, train_raw)),
        metrics=MetricsConfig(**_filter_kwargs(MetricsConfig, metrics_raw)),
        parallel=ParallelConfig(**_filter_kwargs(ParallelConfig, par_raw)),
        exp_dir=exp_dir,
    )


def load_experiment_config(yaml_path: str) -> Config:
    """Load a YAML experiment file (reference-compatible schema)."""
    with open(yaml_path, "r") as fh:
        raw = yaml.safe_load(fh) or {}
    exp_dir = os.path.dirname(os.path.abspath(yaml_path))
    return config_from_dict(raw, exp_dir=exp_dir)


def save_experiment_config(cfg: Config, yaml_path: str) -> None:
    raw = {
        "experiment": dataclasses.asdict(cfg.experiment),
        "data": dataclasses.asdict(cfg.data),
        "train": dataclasses.asdict(cfg.train),
        "metrics": dataclasses.asdict(cfg.metrics),
        "parallel": dataclasses.asdict(cfg.parallel),
    }
    with open(yaml_path, "w") as fh:
        yaml.safe_dump(raw, fh, sort_keys=False)
