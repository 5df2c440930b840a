"""Pallas kernel parity (interpret mode on CPU; compiled parity is exercised
on the real chip by bench/verify drives)."""
import math

import pytest

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


class TestFusedStems:
    """Pallas fused-stems kernel vs the XLA _Stems module (interpret mode)."""

    @pytest.mark.parametrize("hw", [(65, 97), (33, 33), (66, 98)])
    def test_matches_xla_stems(self, hw):
        from auto_dynamic_deeplab_tpu.kernels.stems import (
            fold_stem_bns,
            fused_stems,
        )
        from auto_dynamic_deeplab_tpu.models.decoded import _Stems

        H, W = hw
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, H, W, 3).astype(np.float32))
        stems = _Stems(dtype=jnp.bfloat16)
        variables = stems.init(jax.random.PRNGKey(0), x, False)
        # non-trivial running stats so the BN folding is actually exercised
        bs = jax.tree.map(
            lambda a: a + jnp.asarray(rng.rand(*a.shape), jnp.float32) * 0.3,
            variables["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": bs}
        s0_ref, s1_ref = stems.apply(variables, x, False)
        args = fold_stem_bns(variables["params"], variables["batch_stats"])
        s0_k, s1_k = fused_stems(x, *args, interpret=True)
        assert s0_k.shape == s0_ref.shape and s1_k.shape == s1_ref.shape
        for name, a, b in (("s0", s0_ref, s0_k), ("s1", s1_ref, s1_k)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
            assert rel < 0.02, (name, rel)

    @pytest.mark.parametrize("ts1", [4, 6, 8, 16])
    def test_ts1_tile_sizes_match(self, ts1):
        """TS1 (rows per grid tile) is a pure perf knob: every even value
        must produce the same stems, including TS1 that does not divide H1
        and NR values that need 8-alignment rounding. Odd TS1 is rejected
        (input DMA row starts 4*TS1*a would lose 8-alignment)."""
        from auto_dynamic_deeplab_tpu.kernels.stems import (
            fold_stem_bns,
            fused_stems,
        )
        from auto_dynamic_deeplab_tpu.models.decoded import _Stems

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 65, 97, 3).astype(np.float32))
        stems = _Stems(dtype=jnp.bfloat16)
        variables = stems.init(jax.random.PRNGKey(0), x, False)
        args = fold_stem_bns(variables["params"], variables["batch_stats"])
        s0_ref, s1_ref = fused_stems(x, *args, interpret=True, TS1=2)
        s0_k, s1_k = fused_stems(x, *args, interpret=True, TS1=ts1)
        np.testing.assert_array_equal(np.asarray(s0_k), np.asarray(s0_ref))
        np.testing.assert_array_equal(np.asarray(s1_k), np.asarray(s1_ref))
        with pytest.raises(AssertionError, match="even"):
            fused_stems(x, *args, interpret=True, TS1=3)


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="compiled Mosaic parity needs a real TPU (axon = TPU relay)",
)
def test_fused_stems_compiled_matches_xla_on_tpu():
    """COMPILED (interpret=False) fused-stems vs XLA stems on the chip.

    The kernel's stride-2 trick relies on Mosaic's bf16 (2,1) sublane
    packing order (kernels/stems.py _split_even_odd); interpret mode may
    not model the hardware packing, so a Mosaic change that flips it is
    only caught here."""
    from auto_dynamic_deeplab_tpu.kernels.stems import fold_stem_bns, fused_stems
    from auto_dynamic_deeplab_tpu.models.decoded import _Stems

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 65, 97, 3).astype(np.float32))
    stems = _Stems(dtype=jnp.bfloat16)
    variables = stems.init(jax.random.PRNGKey(0), x, False)
    bs = jax.tree.map(
        lambda a: a + jnp.asarray(rng.rand(*a.shape), jnp.float32) * 0.3,
        variables["batch_stats"],
    )
    variables = {"params": variables["params"], "batch_stats": bs}
    s0_ref, s1_ref = stems.apply(variables, x, False)
    args = fold_stem_bns(variables["params"], variables["batch_stats"])
    s0_k, s1_k = fused_stems(x, *args, interpret=False)
    for name, a, b in (("s0", s0_ref, s0_k), ("s1", s1_ref, s1_k)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
        assert rel < 0.02, (name, rel)
