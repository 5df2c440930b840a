"""GSPMD spatial sharding: H-sharded inference == unsharded inference."""
import jax
import jax.numpy as jnp
import numpy as np

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.parallel import make_mesh, spatial_shard_forward


def test_spatial_sharded_forward_matches(rng):
    model = ADD([1, 2, 2, 2, 3, 2], [1], AUTODEEPLAB_GENOTYPE, 19, F=2, B=5)
    # H=64 shards cleanly over 8 devices; content must be identical either way
    x = jnp.asarray(rng.randn(1, 64, 65, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    plain = model.apply(variables, x, train=False)
    mesh = make_mesh()
    sharded = spatial_shard_forward(model, variables, mesh)(x)

    assert len(plain) == len(sharded)
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )
