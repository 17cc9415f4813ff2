"""Train state and optimizer construction.

Optimizer matches the reference (plain Adam per config lr, ``train_ldm.py:138-140``)
plus global-norm gradient clipping (``max_grad_norm``, applied by Lightning in the
reference).  Mixed precision is bf16 compute / fp32 master params (the TPU-native
replacement for CUDA fp16 AMP — no loss scaling needed with bf16's fp32 exponent
range).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    step: jnp.ndarray  # () int32
    params: Any
    opt_state: Any
    # exponential moving average of params; None unless the run sets the
    # ``ema_decay`` config key (beyond-reference QoL — the reference has no EMA)
    ema: Any = None


def make_optimizer(learning_rate: float, max_grad_norm: float = 10.0):
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adam(learning_rate),
    )


def create_state(params, optimizer, ema_decay: float | None = None) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        # distinct buffers: the train step donates the whole state, and an
        # aliased params/ema pair would be donated twice
        ema=jax.tree_util.tree_map(jnp.copy, params) if ema_decay else None,
    )


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
