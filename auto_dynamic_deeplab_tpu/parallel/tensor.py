"""Tensor (channel) parallelism via GSPMD sharding annotations.

The reference has no tensor parallelism (SURVEY.md §2.2: "not required for
parity; optional via pjit sharding of conv channels"). This is the optional
TPU-native form: every conv kernel / channel vector whose trailing dim
divides the 'model' mesh axis is sharded on that dim; the batch rides the
'data' axis. The scaling-book recipe applies — annotate the pytree, jit the
GLOBAL program, and let XLA/GSPMD propagate shardings and insert the
all-gathers/reduce-scatters onto ICI. No per-shard code exists here (unlike
the shard_map dp path in train/step.py), so BatchNorm statistics are global
by construction and the step is numerically the single-device step.

Build the model with axis_name=None for this path.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# NOTE: train.* is imported lazily inside the functions — train/step.py
# imports this package for the mesh axes, so a module-level import here
# would be circular.


def channel_spec(x, n_model: int) -> P:
    """Shard the trailing (channel) dim over 'model' when it divides evenly.

    Covers conv kernels (H, W, Cin, Cout), BN scale/bias/stats (C,), and the
    optimizer momenta that mirror them; scalars and ragged leaves (e.g. the
    19-class classifier) stay replicated.
    """
    shape = getattr(x, "shape", ())
    if len(shape) >= 1 and shape[-1] >= n_model and shape[-1] % n_model == 0:
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    return P()


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState onto the mesh with channel-sharded leaves."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, channel_spec(x, n_model))
        ),
        state,
    )


def make_tp_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    class_weight: Optional[Any] = None,
) -> Callable:
    """Jitted dp×tp train step: batch sharded over 'data', channels over
    'model'. Pass a state placed by ``shard_train_state``; the model must be
    constructed with axis_name=None (stats are global — see module doc)."""
    from ..train.loss import multi_exit_cross_entropy

    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    n_model = mesh.shape[MODEL_AXIS]

    def constrain(tree):
        # pin the tp layout on the updated state: without this GSPMD is free
        # to emit replicated outputs, silently dropping the channel sharding
        # after the first step
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, channel_spec(x, n_model))
            ),
            tree,
        )

    def body(state, batch):
        batch = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, batch_sharding),
            batch,
        )

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
                params=constrain(params),
                batch_stats=constrain(new_stats),
                opt_state=constrain(opt_state),
            ),
            {"loss": loss},
        )

    return jax.jit(body, donate_argnums=(0,))
