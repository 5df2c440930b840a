"""DeepLabV3+ decoder head (modeling/decoder.py) and low-level skip conv."""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .norm import BatchNorm
from .primitives import conv2d, kaiming_normal
from .resize import resize_bilinear, resize_bilinear_cl


class DecoderHead(nn.Module):
    """Upsample ASPP out to low-level size, concat (256+48), refine with two
    3x3 convs, project to classes, upsample to input size (decoder.py:6-29).

    All interpolations are align_corners=False (torch F.interpolate default).
    """

    num_classes: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # Parity-sensitive evaluation can force the fp32 logits pipeline (the
    # bf16 eval fast path below shifts max logits by ~0.015, enough to flip
    # argmax on near-tie pixels vs the reference's fp32 logits).
    fp32_eval_logits: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        low_level: jnp.ndarray,
        size,
        train: bool,
        class_leading: bool = False,
    ) -> jnp.ndarray:
        if x.shape[1:3] != low_level.shape[1:3]:
            x = resize_bilinear(x, low_level.shape[1:3], align_corners=False)
        x = jnp.concatenate([x, low_level], axis=-1)
        x = nn.relu(x)
        x = conv2d(256, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = conv2d(256, 3, padding=1, dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn2")(x, train)
        x = nn.relu(x)
        # Final classifier conv carries a bias (torch Conv2d default,
        # decoder.py:21) and is computed in float32 for stable logits.
        x = nn.Conv(
            self.num_classes,
            (1, 1),
            use_bias=True,
            kernel_init=kaiming_normal,
            dtype=jnp.float32,
            name="classifier",
        )(x.astype(jnp.float32))
        # Inference under a bf16 compute policy upsamples the logits in bf16:
        # the full-res fp32 logits pipeline (banded-matmul writes + entropy +
        # cond copies) costs ~2.5 ms/image at 1025x2049 on v5e and bf16 halves
        # that HBM traffic (max logit delta ~0.015, entropy delta ~1e-5).
        # Training keeps fp32 logits for loss-grade numerics.
        if not train and self.dtype is not None and not self.fp32_eval_logits:
            x = x.astype(self.dtype)
        if class_leading:
            # (N, C, H, W) logits — the reference's torch layout; avoids the
            # 19-lane-padded full-res NHWC traffic (see resize_bilinear_cl).
            return resize_bilinear_cl(x, size, align_corners=False)
        return resize_bilinear(x, size, align_corners=False)


class LowLevelConv(nn.Module):
    """ReLU → 1x1 conv to 48ch → BN skip projection (modeling/ADD.py:255-259)."""

    features: int = 48
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        x = nn.relu(x)
        x = conv2d(self.features, 1, dtype=self.dtype, name="conv")(x)
        return BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn")(x, train)
