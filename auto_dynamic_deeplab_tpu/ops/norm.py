"""BatchNorm as a pure function with optional cross-replica statistics.

TPU-native replacement for the reference's three inconsistent BN mechanisms
(SURVEY.md §2.2): vendored thread-based SyncBN under DataParallel, silently
*unsynchronized* local BN under DDP (train.py:172-178), and plain
nn.BatchNorm2d. Here cross-replica statistics are a single `lax.pmean` over a
named mesh axis — compiled by XLA onto ICI — so every parallel mode sees
identical numerics.

PyTorch-parity details (sync_batchnorm/batchnorm.py:48-125):
  * normalization uses the *biased* batch variance,
  * running stats use the *unbiased* variance (factor n/(n-1)),
  * running = (1 - momentum) * running + momentum * batch, momentum=0.1,
  * eps=1e-5.
Statistics are always accumulated in float32 regardless of compute dtype.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """NHWC batch normalization over (N, H, W).

    Attributes:
      momentum: fraction of the *batch* statistic blended into running stats
        (PyTorch convention; flax's convention is the complement).
      axis_name: if set, batch statistics are averaged across this mapped
        mesh axis (cross-replica SyncBN semantics).
      affine: learn scale/bias (the reference's search-time cells use
        affine=False, cell_level_search.py:19-21).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    affine: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        c = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )

        if train:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            n_local = 1
            for a in reduce_axes:
                n_local *= x.shape[a]
            n = float(n_local)
            # Cross-replica reduction; skipped during init, which runs outside
            # shard_map (param shapes don't depend on statistics).
            if self.axis_name is not None and not self.is_initializing():
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)

            if not self.is_initializing():
                unbiased = var * (n / max(n - 1.0, 1.0))
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        else:
            mean = ra_mean.value
            var = ra_var.value

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.affine:
            scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
            y = y * scale + bias
        return y.astype(self.dtype or x.dtype)
