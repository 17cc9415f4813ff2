"""Uniform task contract.

A Task bundles a model family into the training runtime's interface (the JAX
counterpart of the reference's ``models/*`` wrappers with their
``get_loss_dict(batch, step, **sched) -> {"loss": ...}`` contract,
``models/model_sdf.py:185``):

    init_params(rng)                          -> trainable parameter pytree
    loss_fn(params, batch, rng, sched_params) -> (loss, metrics dict)

``loss_fn`` must be pure and jittable; frozen pretrained parameters are captured in
the task object and passed as constants into the jitted step.
"""

from __future__ import annotations

from typing import Dict, Protocol, Tuple

import jax
import jax.numpy as jnp


class Task(Protocol):
    name: str

    def init_params(self, rng: jax.Array):
        ...

    def loss_fn(
        self, params, batch, rng: jax.Array, sched_params: Dict[str, jnp.ndarray]
    ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        ...
