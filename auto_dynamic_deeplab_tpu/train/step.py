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


def make_arch_optimizer(
    lr: float, weight_decay: float = 1e-3
) -> optax.GradientTransformation:
    """torch.optim.Adam parity for the architecture optimizer
    (search.py:99-102): L2 decay is added to the raw gradient BEFORE the
    Adam moment updates (not AdamW's decoupled decay — a different
    trajectory for the alphas/betas)."""
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def create_train_state(model, rng, sample_input, tx) -> TrainState:
    from ..utils.initialize import jit_init

    variables = jit_init(model, rng, sample_input, train=True)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
    )


def _step_body(model, tx, class_weight, class_leading, state: TrainState, batch):
    """One SPMD shard's train step; collectives over DATA_AXIS."""

    def loss_fn(params):
        outs, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
            **({"class_leading": True} if class_leading else {}),
        )
        loss = multi_exit_cross_entropy(
            outs, batch["label"], class_weight,
            channel_axis=1 if class_leading else -1,
        )
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
    class_leading: bool = False,
) -> Callable:
    """Compile the data-parallel train step over `mesh`.

    The model must be constructed with axis_name=DATA_AXIS so its BatchNorms
    psum statistics across shards. state is replicated, batch sharded on the
    leading axis. ``class_leading`` runs the logits tail + CE in (N, C, H, W)
    (keeps the 19-class dim off the TPU lane minor — identical loss/grads,
    less padded HBM traffic).
    """
    body = partial(_step_body, model, tx, class_weight, class_leading)
    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_single_device_train_step(
    model, tx, class_weight: Optional[jnp.ndarray] = None,
    class_leading: bool = False,
) -> Callable:
    """Plain jitted train step (model built with axis_name=None)."""

    def body(state: TrainState, batch):
        def loss_fn(params):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"],
                train=True,
                mutable=["batch_stats"],
                **({"class_leading": True} if class_leading else {}),
            )
            loss = multi_exit_cross_entropy(
                outs, batch["label"], class_weight,
                channel_axis=1 if class_leading else -1,
            )
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


def _search_bodies(model, w_tx, a_tx, class_weight, axis_name: Optional[str],
                   loss_reduce: str = "mean"):
    """Bilevel search step bodies (search.py:190-224). Each is one SPMD
    shard's step when ``axis_name`` is set: per-shard grads are pmean'd, BN
    statistics psum inside the model's BatchNorms (axis_name=DATA_AXIS), so
    the sharded step is numerically the global-batch step."""

    def weight_body(params, batch_stats, arch, w_opt, batch):
        def loss_fn(p):
            outs, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats, "arch": arch},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            return (
                multi_exit_cross_entropy(
                    outs, batch["label"], class_weight, reduce=loss_reduce
                ),
                mutated["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, w_opt = w_tx.update(grads, w_opt, params)
        return optax.apply_updates(params, updates), new_stats, w_opt, loss

    def arch_body(params, batch_stats, arch, a_opt, batch):
        def loss_fn(a):
            outs, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats, "arch": a},
                batch["image"], train=True, mutable=["batch_stats"],
            )
            return (
                multi_exit_cross_entropy(
                    outs, batch["label"], class_weight, reduce=loss_reduce
                ),
                mutated["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(arch)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss = jax.lax.pmean(loss, axis_name)
        updates, a_opt = a_tx.update(grads, a_opt, arch)
        return optax.apply_updates(arch, updates), new_stats, a_opt, loss

    return weight_body, arch_body


def make_search_steps(
    model,
    w_tx: optax.GradientTransformation,
    a_tx: optax.GradientTransformation,
    mesh=None,
    class_weight: Optional[jnp.ndarray] = None,
    loss_reduce: str = "mean",
) -> Sequence[Callable]:
    """(weight_step, arch_step) for stage-1 NAS search.

    ``loss_reduce`` picks the per-exit reduction: 'mean' (search.py:190-194)
    or 'sum' (the 2-exit search_layer.py:187-196 driver).

    With ``mesh``, both bilevel steps are data-parallel shard_map programs
    (the reference runs search under DataParallel+SyncBN, search.py:144-149;
    stage 1 is the most memory/compute-hungry stage). The model must then be
    constructed with axis_name=DATA_AXIS so BN stats psum across shards.
    """
    if mesh is None:
        wb, ab = _search_bodies(model, w_tx, a_tx, class_weight, None, loss_reduce)
        return jax.jit(wb), jax.jit(ab)
    wb, ab = _search_bodies(model, w_tx, a_tx, class_weight, DATA_AXIS, loss_reduce)
    in_specs = (P(), P(), P(), P(), P(DATA_AXIS))
    out_specs = (P(), P(), P(), P())
    steps = []
    for body in (wb, ab):
        sharded = jax.shard_map(
            body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
        steps.append(jax.jit(sharded))
    return tuple(steps)


def make_eval_step(model) -> Callable:
    """Jitted all-exits eval program: batch -> list of per-exit predictions."""

    @jax.jit
    def eval_step(variables, image):
        outs = model.apply(variables, image, train=False)
        return [jnp.argmax(o, axis=-1) for o in outs]

    return eval_step
