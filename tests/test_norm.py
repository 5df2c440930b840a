"""BatchNorm parity with torch (normalization + running-stat updates) and
cross-replica statistics equivalence: BN-psum over N shards == one big batch.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch

from auto_dynamic_deeplab_tpu.ops import BatchNorm
from torch_bridge import nchw, nhwc, to_torch_bn


def _train_once(x, momentum=0.1):
    bn = BatchNorm(momentum=momentum)
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, mutated = bn.apply(variables, x, train=True, mutable=["batch_stats"])
    return bn, variables, y, mutated["batch_stats"]


def test_train_mode_matches_torch(rng):
    x = rng.randn(4, 9, 11, 5).astype(np.float32)
    _, variables, y, stats = _train_once(x)

    tbn = torch.nn.BatchNorm2d(5, eps=1e-5, momentum=0.1)
    to_torch_bn(tbn, params=variables["params"])
    tbn.train()
    ty = tbn(nchw(x))

    np.testing.assert_allclose(np.asarray(y), nhwc(ty), rtol=1e-4, atol=1e-5)
    # Running stats: unbiased var, torch blending convention.
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6
    )


def test_eval_mode_matches_torch(rng):
    x = rng.randn(2, 7, 7, 3).astype(np.float32)
    bn = BatchNorm()
    variables = bn.init(jax.random.PRNGKey(1), x, train=True)
    variables = jax.tree.map(lambda a: a, variables)  # unfreeze-agnostic copy
    stats = {
        "mean": rng.randn(3).astype(np.float32),
        "var": np.abs(rng.randn(3)).astype(np.float32) + 0.5,
    }
    variables = {"params": variables["params"], "batch_stats": jax.tree.map(jnp.asarray, stats)}
    y = bn.apply(variables, x, train=False)

    tbn = torch.nn.BatchNorm2d(3)
    to_torch_bn(tbn, params=variables["params"], stats=stats)
    tbn.eval()
    ty = tbn(nchw(x))
    np.testing.assert_allclose(np.asarray(y), nhwc(ty), rtol=1e-4, atol=1e-5)


def test_cross_replica_equals_global_batch(rng):
    """BN with axis_name psum over 8 shards == BN over the concatenated batch.

    This is the single most important distributed-numerics parity target
    (SURVEY.md §2.2): the reference's SyncBN under DataParallel computes
    global-batch statistics; our shard_map version must match.
    """
    n_dev = jax.device_count()
    assert n_dev == 8, f"conftest should give 8 cpu devices, got {n_dev}"
    x = rng.randn(16, 6, 6, 4).astype(np.float32)

    bn_sync = BatchNorm(axis_name="data")
    bn_ref = BatchNorm()
    variables = bn_ref.init(jax.random.PRNGKey(0), x, train=True)

    y_ref, m_ref = bn_ref.apply(variables, x, train=True, mutable=["batch_stats"])

    mesh = jax.sharding.Mesh(np.array(jax.devices()), ("data",))

    def shard_fn(v, xs):
        return bn_sync.apply(v, xs, train=True, mutable=["batch_stats"])

    y_sh, m_sh = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            jax.sharding.PartitionSpec(),
            jax.sharding.PartitionSpec("data"),
        ),
        out_specs=(
            jax.sharding.PartitionSpec("data"),
            jax.sharding.PartitionSpec(),  # stats identical on all shards
        ),
        check_vma=False,
    )(variables, x)

    np.testing.assert_allclose(np.asarray(y_sh), np.asarray(y_ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_sh["batch_stats"]["mean"]),
        np.asarray(m_ref["batch_stats"]["mean"]),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m_sh["batch_stats"]["var"]),
        np.asarray(m_ref["batch_stats"]["var"]),
        rtol=1e-4,
        atol=1e-5,
    )
