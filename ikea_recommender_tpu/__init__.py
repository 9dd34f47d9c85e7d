"""ikea_recommender_tpu — a TPU-native session-based recommender framework.

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of
``adam-walsh-data/IKEA-Recommender-System`` (reference mounted read-only at
``/root/reference``): GRU4Rec / BidirGRU4Rec next-item models and SQN / SMORL /
SARM reinforcement-learning head variants trained over replay buffers of
clickstream sessions, with the full evaluation protocol (HR@k, NDCG@k,
coverage, diversity / novelty rewards, repetitions).

Layer map (bottom-up, mirrors SURVEY.md §7):

- ``core``      — config system, device mesh, PRNG and dtype policy.
- ``data``      — host-side data pipeline: tokenizers, session windowing,
                  replay buffers, fixed-shape batch iterators.
- ``models``    — functional pytree models: embedding + GRU backbone + heads.
- ``ops``       — compute kernels: Pallas fused GRU scan, RL tensor ops,
                  ranking/metric kernels (all on-device).
- ``train``     — jitted train steps (CE, double-Q TD, SMORL multi-objective).
- ``eval``      — on-device evaluation protocol.
- ``parallel``  — mesh shardings: row-sharded embeddings, sharded top-k and
                  cross-entropy, multi-chip train step.
- ``run``       — orchestration: epoch loop, fractional-epoch eval,
                  best-model tracking, orbax checkpoints, CLI.
- ``utils``     — logging dict builders (reference metric-name compatible).
"""

__version__ = "0.1.0"
