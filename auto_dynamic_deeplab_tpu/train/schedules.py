"""Per-iteration LR schedules — parity with utils/lr_scheduler.py LR_Scheduler.

Expressed as pure ``step -> lr`` functions (optax-compatible schedules), so
the whole update rule jits; no mutation of optimizer state from Python.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

Schedule = Callable[[jnp.ndarray], jnp.ndarray]


def lr_schedule(
    mode: str,
    base_lr: float,
    num_epochs: int,
    iters_per_epoch: int,
    lr_step: int = 0,
    warmup_epochs: int = 0,
    min_lr: Optional[float] = None,
) -> Schedule:
    """Modes (lr_scheduler.py:44-76):
      cos:  lr * ((1 - min_lr) * 0.5 (1 + cos(pi T/N)) + min_lr)
      poly: lr * (1 - T/N)^0.9
      step: lr * 0.1^(epoch // lr_step)
    plus the reference's min_lr floor and linear warmup.
    """
    N = float(num_epochs * iters_per_epoch)
    warmup_iters = float(warmup_epochs * iters_per_epoch)
    if mode == "step":
        assert lr_step, "step mode needs lr_step"

    def schedule(step):
        T = jnp.asarray(step, jnp.float32)
        if mode == "cos":
            assert min_lr is not None, "reference cos mode requires min_lr"
            cos = 0.5 * (1.0 + jnp.cos(T / N * math.pi))
            lr = base_lr * ((1.0 - min_lr) * cos + min_lr)
        elif mode == "poly":
            lr = base_lr * jnp.power(jnp.maximum(1.0 - T / N, 0.0), 0.9)
        elif mode == "step":
            epoch = jnp.floor(T / iters_per_epoch)
            lr = base_lr * jnp.power(0.1, jnp.floor(epoch / lr_step))
        else:
            raise NotImplementedError(mode)
        if min_lr is not None:
            lr = jnp.maximum(lr, min_lr)
        if warmup_iters > 0:
            lr = jnp.where(T < warmup_iters, lr * T / warmup_iters, lr)
        return lr

    return schedule
