"""Training step: optimizer construction + jitted SPMD train/eval programs.

Replaces the reference's loop body (train.py:216-247): SGD+nesterov with
torch-style weight decay, per-iteration poly LR, joint multi-exit CE, and —
instead of DDP allreduce + (broken) SyncBN — a single shard_map program where
gradient reduction and BN statistics both ride `lax.pmean` over the 'data'
mesh axis.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from ..parallel.mesh import DATA_AXIS
from .loss import multi_exit_cross_entropy
from .schedules import Schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_optimizer(
    schedule: Schedule,
    momentum: float = 0.9,
    nesterov: bool = True,
    weight_decay: float = 4e-5,
) -> optax.GradientTransformation:
    """torch.optim.SGD parity (train.py:126-131): decay added to the raw
    gradient *before* the momentum buffer update."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=nesterov))
    return optax.chain(*parts)


def create_train_state(model, rng, sample_input, tx) -> TrainState:
    variables = model.init(rng, sample_input, train=True)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def _step_body(model, tx, class_weight, state: TrainState, batch):
    """One SPMD shard's train step; collectives over DATA_AXIS."""

    def loss_fn(params):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
        )
        loss = multi_exit_cross_entropy(outs, batch["label"], class_weight)
        return loss, mutated["batch_stats"]

    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
    grads = jax.lax.pmean(grads, DATA_AXIS)
    loss = jax.lax.pmean(loss, DATA_AXIS)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=params,
        batch_stats=new_stats,  # identical on all shards (BN stats pmean'd)
        opt_state=opt_state,
    )
    return new_state, {"loss": loss}


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh,
    class_weight: Optional[jnp.ndarray] = None,
) -> Callable:
    """Compile the data-parallel train step over `mesh`.

    The model must be constructed with axis_name=DATA_AXIS so its BatchNorms
    psum statistics across shards. state is replicated, batch sharded on the
    leading axis.
    """
    body = partial(_step_body, model, tx, class_weight)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_single_device_train_step(
    model, tx, class_weight: Optional[jnp.ndarray] = None
) -> Callable:
    """Plain jitted train step (model built with axis_name=None)."""

    def body(state: TrainState, batch):
        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mutable=["batch_stats"],
            )
            loss = multi_exit_cross_entropy(outs, batch["label"], class_weight)
            return loss, mutated["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                step=state.step + 1,
                params=params,
                batch_stats=new_stats,
                opt_state=opt_state,
            ),
            {"loss": loss},
        )

    return jax.jit(body, donate_argnums=(0,))


def make_eval_step(model) -> Callable:
    """Jitted all-exits eval program: batch -> list of per-exit predictions."""

    @jax.jit
    def eval_step(variables, image):
        outs = model.apply(variables, image, train=False)
        return [jnp.argmax(o, axis=-1) for o in outs]

    return eval_step
