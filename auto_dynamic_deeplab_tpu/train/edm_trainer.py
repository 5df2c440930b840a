"""Stage-3: train the Earlier-exit Decision Maker (train_edm.py equivalent).

1. make_data: one pass over full-size train images through the frozen
   backbone's first-exit program, caching (pre-head feature, normalized
   Shannon entropy of the exit logits) pairs (train_edm.py:146-167). Unlike
   the reference cache (feature.npy keyed by nothing, train_edm.py:137-141),
   the cache key includes arch/F/B/count so stale caches can't be reused.
2. train: Adam(1e-3) + L1 regression of entropy from feature
   (train_edm.py:107-108,:169-185).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.decoded import EDM
from ..ops.confidence import normalized_shannon_entropy


def make_edm_dataset(
    model,
    variables,
    loader,
    num_classes: int = 19,
    cache_dir: Optional[str] = None,
    max_items: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (features (N,h,w,c), entropies (N,))."""
    cache_key = (
        f"arch{''.join(map(str, model.network_arch))}_F{model.F}_B{model.B}"
    )
    if cache_dir:
        fpath = os.path.join(cache_dir, f"feature_{cache_key}.npy")
        epath = os.path.join(cache_dir, f"entropy_{cache_key}.npy")
        if os.path.exists(fpath) and os.path.exists(epath):
            return np.load(fpath), np.load(epath)

    @jax.jit
    def get(variables, x):
        logits, feature = model.apply(variables, x, train=False, method="get_feature")
        return feature, normalized_shannon_entropy(logits, num_classes)

    feats, ents = [], []
    count = 0
    for batch in loader:
        f, e = get(variables, jnp.asarray(batch["image"]))
        feats.append(np.asarray(f, np.float32))
        ents.append(np.asarray(e, np.float32))
        count += f.shape[0]
        if max_items and count >= max_items:
            break
    features = np.concatenate(feats)[: max_items or None]
    entropies = np.concatenate(ents)[: max_items or None]

    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
        np.save(fpath, features)
        np.save(epath, entropies)
    return features, entropies


def train_edm(
    features: np.ndarray,
    entropies: np.ndarray,
    epochs: int = 20,
    batch_size: int = 16,
    lr: float = 1e-3,
    seed: int = 0,
):
    """Returns (edm_model, edm_variables, final_epoch_loss).

    The whole training run is ONE jitted lax.scan over every (epoch, batch)
    step: a per-step host loop with a loss readback costs a device round
    trip per step (50-500 ms each on a remote-relay TPU — 400 epochs used
    to take minutes of pure RTT), while the scan is a single dispatch and a
    single readback of the loss history. Step math (Adam + L1, batch order,
    per-epoch host-side permutation) is unchanged."""
    edm = EDM()
    variables = edm.init(jax.random.PRNGKey(seed), jnp.asarray(features[:1]))
    tx = optax.adam(lr)

    params = variables["params"]
    n = features.shape[0]
    assert n > 0, "empty EDM dataset"
    if epochs <= 0:
        return edm, {"params": params}, float("nan")
    batch_size = min(batch_size, n)  # small datasets must still train
    rng = np.random.RandomState(seed)
    idx = np.stack(
        [
            np.stack(
                [
                    order[b : b + batch_size]
                    for b in range(0, n - batch_size + 1, batch_size)
                ]
            )
            for order in (rng.permutation(n) for _ in range(epochs))
        ]
    )  # (epochs, batches_per_epoch, batch_size)

    def step_math(params, opt_state, f, e):
        def loss_fn(p):
            pred = edm.apply({"params": p}, f)[:, 0]
            return jnp.mean(jnp.abs(pred - e))  # L1 (train_edm.py:108)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # The scan path keeps the ENTIRE feature corpus device-resident. On real
    # Cityscapes stage-3 (~3k full-size f32 features, several MB each) that
    # alone can exceed a v5e's 16 GB HBM — guard by byte budget and fall back
    # to a per-batch jitted step loop that uploads one batch at a time
    # (dispatched asynchronously; losses read back once at the end).
    budget = int(
        os.environ.get("ADD_EDM_SCAN_BYTE_BUDGET", str(2 * 1024**3))
    )
    if features.nbytes + entropies.nbytes <= budget:

        @jax.jit
        def run(params, feats, ents, idx):
            opt_state = tx.init(params)

            def one_step(carry, ib):
                params, opt_state = carry
                params, opt_state, loss = step_math(
                    params, opt_state, feats[ib], ents[ib]
                )
                return (params, opt_state), loss

            (params, _), losses = jax.lax.scan(
                one_step, (params, opt_state), idx.reshape(-1, idx.shape[-1])
            )
            return params, losses

        params, losses = run(
            params, jnp.asarray(features), jnp.asarray(entropies), jnp.asarray(idx)
        )
        last = float(np.asarray(losses).reshape(epochs, -1)[-1].mean())
        return edm, {"params": params}, last

    step = jax.jit(step_math)
    opt_state = tx.init(params)
    last_epoch_losses = []
    for ep in range(epochs):
        ep_losses = []
        for ib in idx[ep]:
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(features[ib]), jnp.asarray(entropies[ib])
            )
            ep_losses.append(loss)  # device array: no per-step readback
        last_epoch_losses = ep_losses
    last = float(np.mean([float(l) for l in last_epoch_losses]))
    return edm, {"params": params}, last
