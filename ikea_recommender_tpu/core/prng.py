"""PRNG key plumbing.

The reference seeds torch + python RNGs at trainer init and draws a host-side
coin flip per double-Q step (``sqn_gru.py:207`` — SURVEY.md quirk 7). Here all
randomness is a threaded ``jax.random`` key so every step stays jittable and
reproducible.
"""

from __future__ import annotations

import jax


def root_key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def fold_in_step(key: jax.Array, step: jax.Array | int) -> jax.Array:
    return jax.random.fold_in(key, step)
