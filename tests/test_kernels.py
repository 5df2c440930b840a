"""Pallas kernel parity (interpret mode on CPU; compiled parity is exercised
on the real chip by bench/verify drives)."""
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from auto_dynamic_deeplab_tpu.kernels import (
    entropy_argmax_pallas,
    entropy_argmax_reference,
)


def test_entropy_argmax_kernel_matches_reference(rng):
    x = jnp.asarray(rng.randn(1, 37, 53, 19).astype(np.float32) * 3)
    with pltpu.force_tpu_interpret_mode():
        ent_p, arg_p = entropy_argmax_pallas(x, 19)
    ent_r, arg_r = entropy_argmax_reference(x, 19)
    assert abs(float(ent_p[0]) - float(ent_r[0])) < 1e-5
    np.testing.assert_array_equal(np.asarray(arg_p), np.asarray(arg_r))
    # entropy normalized to [0, 1]
    assert 0.0 <= float(ent_p[0]) <= 1.0


def test_entropy_argmax_padding_exact_block(rng):
    """Pixel count exactly divisible by the block: no filler columns."""
    x = jnp.asarray(rng.randn(1, 64, 64, 19).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        ent_p, arg_p = entropy_argmax_pallas(x, 19)
    ent_r, arg_r = entropy_argmax_reference(x, 19)
    assert abs(float(ent_p[0]) - float(ent_r[0])) < 1e-5
    np.testing.assert_array_equal(np.asarray(arg_p), np.asarray(arg_r))
