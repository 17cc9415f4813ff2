"""Jitted train/eval steps with donated state and mesh shardings.

One ``jax.jit`` per run: the loss, backward pass, gradient clip and Adam update are
a single XLA program.  Under a ``dp`` mesh the batch enters sharded on its leading
axis and parameters replicated; XLA inserts the gradient psum over ICI automatically
from the output sharding constraint (params replicated).  The state buffers are
donated, so parameters and optimizer state are updated in place in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..parallel.mesh import batch_sharding, replicated
from .state import TrainState


def make_train_step(task, optimizer, mesh=None, sched_keys=(), ema_decay=None, fsdp=False):
    """Build the jitted training step for a Task.

    Returns ``step_fn(state, batch, rng, sched_vals) -> (state, metrics)`` where
    ``sched_vals`` is a tuple of scalars matching ``sched_keys`` (e.g. teacher
    forcing rates) so schedule changes don't retrigger compilation.

    ``ema_decay``: when set (and ``state.ema`` is populated), the step also
    maintains an exponential moving average of the parameters in the same
    fused XLA program.

    ``fsdp``: ZeRO-3 state sharding over the ``dp`` axis (parallel/fsdp.py) —
    params/moments/EMA sharded instead of replicated; GSPMD inserts the weight
    all-gathers and gradient reduce-scatters.

    Tasks with ``has_frozen = True`` (tasks/distill.py) take an extra pytree of
    frozen, non-donated inputs — teacher params + phase tables — as a TRACED
    argument, so changing them between distillation phases reuses the same
    executable; the step signature gains a trailing ``frozen`` arg.
    """
    has_frozen = getattr(task, "has_frozen", False)

    def step(state: TrainState, batch, rng, sched_vals, *frozen):
        sched_params = dict(zip(sched_keys, sched_vals))
        sched_params["global_step"] = state.step
        rng = jax.random.fold_in(rng, state.step)

        def loss_of(params):
            if has_frozen:
                return task.loss_fn(params, frozen[0], batch, rng, sched_params)
            return task.loss_fn(params, batch, rng, sched_params)

        (loss, metrics), grads = jax.value_and_grad(loss_of, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates
        )
        metrics = dict(metrics)
        metrics["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))
        )
        ema = state.ema
        if ema_decay is not None and ema is not None:
            d = jnp.float32(ema_decay)
            ema = jax.tree_util.tree_map(
                lambda e, p: (e * d + p.astype(jnp.float32) * (1 - d)).astype(e.dtype),
                ema,
                params,
            )
        new_state = TrainState(state.step + 1, params, opt_state, ema)
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    bsh, rep = batch_sharding(mesh), replicated(mesh)
    extra = (rep,) if has_frozen else ()  # frozen pytree: replicated, not donated
    if has_frozen and "tp" in mesh.axis_names:
        raise ValueError("distillation (frozen-teacher tasks) on a tp mesh is unimplemented")
    if fsdp and "tp" in mesh.axis_names:
        # the tp branch below returns first and would silently drop fsdp —
        # a user asking for ZeRO-3 on a tp mesh must hear about it (ADVICE r3)
        raise ValueError(
            "fsdp=True is not supported on a tp mesh: tp shards params by the "
            "Megatron policy; combine dp-axis fsdp with tp is unimplemented. "
            "Drop 'fsdp: true' or use a dp-only mesh."
        )
    if "tp" in mesh.axis_names:
        # Megatron param sharding over the tp axis (parallel/tp.py); state
        # shardings are inferred per-leaf at the first call (jit resolves
        # pytree-of-shardings lazily against the actual state structure).
        # The Pallas fused-attention kernel cannot be GSPMD-partitioned —
        # einsum attention is forced, but only for THIS step's traces: the
        # override is a thread-local ContextVar scoped around each call
        # (tracing happens inside), so jit programs tracing concurrently in
        # other threads (eval/serve) are unaffected.
        from ..ops.attention import fused_attention_override
        from ..ops.gn_bwd import pallas_gn_bwd_override
        from ..parallel.tp import infer_tp_sharding

        def tp_jit(state_template):
            state_sh = infer_tp_sharding(state_template, mesh)
            return jax.jit(
                step,
                donate_argnums=(0,),
                in_shardings=(state_sh, bsh, rep, rep),
                out_shardings=(state_sh, rep),
            )

        compiled = {}

        def dispatch(state, batch, rng, sched_vals):
            key = jax.tree_util.tree_structure(state)
            if key not in compiled:
                compiled[key] = tp_jit(state)
            with fused_attention_override(False), pallas_gn_bwd_override(False):
                return compiled[key](state, batch, rng, sched_vals)

        return dispatch

    if fsdp:
        # ZeRO-3: state shardings are a per-leaf function of the actual state
        # structure, so resolve lazily at the first call (same dispatch pattern
        # as tp above).  The Pallas kernels stay enabled — their operands are
        # batch-sharded activations exactly as in the replicated dp step.
        from ..parallel.fsdp import infer_fsdp_sharding

        def fsdp_jit(state_template):
            state_sh = infer_fsdp_sharding(state_template, mesh)
            return jax.jit(
                step,
                donate_argnums=(0,),
                in_shardings=(state_sh, bsh, rep, rep) + extra,
                out_shardings=(state_sh, rep),
            )

        compiled_fsdp = {}

        def dispatch_fsdp(state, batch, rng, sched_vals, *frozen):
            key = jax.tree_util.tree_structure(state)
            if key not in compiled_fsdp:
                compiled_fsdp[key] = fsdp_jit(state)
            return compiled_fsdp[key](state, batch, rng, sched_vals, *frozen)

        return dispatch_fsdp

    state_sh = rep  # params + opt state replicated (dp-only: fastest at this size)
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(state_sh, bsh, rep, rep) + extra,
        out_shardings=(state_sh, rep),
    )


def make_eval_step(task, mesh=None, sched_keys=(), fsdp=False):
    """Deterministic eval step: fixed rng stream, no CFG dropout randomness beyond it.

    ``fsdp``: inherit the params' resident (ZeRO-3) shardings instead of
    forcing a replication gather before every validation pass."""

    has_frozen = getattr(task, "has_frozen", False)

    def step(params, batch, rng, sched_vals, *frozen):
        sched_params = dict(zip(sched_keys, sched_vals))
        if has_frozen:
            loss, metrics = task.loss_fn(params, frozen[0], batch, rng, sched_params)
        else:
            loss, metrics = task.loss_fn(params, batch, rng, sched_params)
        return dict(metrics)

    if mesh is None:
        return jax.jit(step)
    bsh, rep = batch_sharding(mesh), replicated(mesh)
    extra = (rep,) if has_frozen else ()
    params_sh = None if fsdp else rep  # None = keep the argument's sharding
    return jax.jit(
        step, in_shardings=(params_sh, bsh, rep, rep) + extra, out_shardings=rep
    )
