"""Wave-packed eval-path invariants (ops/packed.py):
  * the static schedule covers every genotype op exactly once and only runs
    ops whose input state exists;
  * packed eval == unpacked eval in fp32 (up to reassociation noise) for the
    shipped genotype AND random genotypes exercising all 8 primitives;
  * under the bf16 policy the packed path is as close to the fp32 oracle as
    the unpacked bf16 path (folding must not amplify rounding);
  * training/init are untouched (identical param pytrees).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from auto_dynamic_deeplab_tpu.models import ADD
from auto_dynamic_deeplab_tpu.models.cell import FixedCell, as_genotype_rows
from auto_dynamic_deeplab_tpu.nas import AUTODEEPLAB_GENOTYPE
from auto_dynamic_deeplab_tpu.nas.genotypes import num_edges
from auto_dynamic_deeplab_tpu.ops.packed import _block_edges, schedule_waves

_PATH, _C_INDEX = [1, 2, 2, 2, 3, 2], [1]


def _random_genotype(seed: int, B: int = 5):
    """Two random edges per block, random ops — includes pools/skip/none."""
    rng = np.random.RandomState(seed)
    rows = []
    for edges in _block_edges(B):
        picked = rng.choice(edges, size=2, replace=False)
        for e in picked:
            rows.append([int(e), int(rng.randint(0, 8))])
    return np.array(rows, dtype=np.int64)


def test_schedule_covers_all_ops_in_dependency_order():
    for seed in range(6):
        geno = _random_genotype(seed)
        from auto_dynamic_deeplab_tpu.models.cell import edge_op_assignment

        assignment = edge_op_assignment(as_genotype_rows(geno))
        waves = schedule_waves(assignment, 5)
        seen = set()
        ready = {0, 1}
        # block -> its two module indices
        blocks = _block_edges(5)
        edge_block = {e: b for b, es in enumerate(blocks) for e in es}
        block_members = {}
        for idx, (edge, _) in enumerate(assignment):
            block_members.setdefault(edge_block[edge], []).append(idx)
        for wave in waves:
            for kind, k, members in wave:
                assert kind in ("sep", "dil", "max", "avg", "skip", "zero")
                assert k in (3, 5)
                for b, s, idx, name in members:
                    assert s in ready, (s, ready)
                    assert idx not in seen
                    seen.add(idx)
            for b, mem in block_members.items():
                if all(i in seen for i in mem):
                    ready.add(2 + b)
        assert len(seen) == len(assignment)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_packed_matches_unpacked_fp32_random_genotypes(rng, seed):
    geno = _random_genotype(seed)
    x = jnp.asarray(rng.randn(2, 33, 33, 3), jnp.float32)
    kw = dict(F=2, B=5, low_level_layer=0)
    m0 = ADD(_PATH, _C_INDEX, geno, 19, **kw)
    m1 = ADD(_PATH, _C_INDEX, geno, 19, packed_eval=True, **kw)
    v = m0.init(jax.random.PRNGKey(seed), x, train=False)
    # drift BN stats off init so folding is non-trivial
    _, mut = m0.apply(v, x, train=True, mutable=["batch_stats"])
    v = {**v, "batch_stats": mut["batch_stats"]}
    ref = m0.apply(v, x, train=False)
    got = m1.apply(v, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
        )


def test_packed_bf16_tracks_fp32_oracle(rng):
    """Folding must not amplify bf16 rounding: packed-bf16 error vs the fp32
    oracle stays within 2x of the unpacked-bf16 error."""
    x = jnp.asarray(rng.randn(1, 33, 33, 3), jnp.float32)
    kw = dict(F=2, B=5, low_level_layer=0)
    m_fp = ADD(_PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19, **kw)
    m_bf = ADD(_PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19, dtype=jnp.bfloat16, **kw)
    m_pk = ADD(
        _PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19,
        dtype=jnp.bfloat16, packed_eval=True, **kw,
    )
    v = m_fp.init(jax.random.PRNGKey(0), x, train=False)
    _, mut = m_fp.apply(v, x, train=True, mutable=["batch_stats"])
    v = {**v, "batch_stats": mut["batch_stats"]}
    oracle = [np.asarray(o, np.float32) for o in m_fp.apply(v, x, train=False)]
    bf = [np.asarray(o, np.float32) for o in m_bf.apply(v, x, train=False)]
    pk = [np.asarray(o, np.float32) for o in m_pk.apply(v, x, train=False)]
    for o, b, p in zip(oracle, bf, pk):
        scale = np.abs(o).max() + 1e-9
        err_b = np.abs(b - o).max() / scale
        err_p = np.abs(p - o).max() / scale
        assert err_p < max(2.0 * err_b, 5e-3), (err_p, err_b)


def test_packed_flag_does_not_change_params_or_train(rng):
    x = jnp.asarray(rng.randn(1, 33, 33, 3), jnp.float32)
    kw = dict(F=2, B=5, low_level_layer=0)
    m0 = ADD(_PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19, **kw)
    m1 = ADD(_PATH, _C_INDEX, AUTODEEPLAB_GENOTYPE, 19, packed_eval=True, **kw)
    v0 = m0.init(jax.random.PRNGKey(0), x, train=True)
    v1 = m1.init(jax.random.PRNGKey(0), x, train=True)
    assert jax.tree.structure(v0) == jax.tree.structure(v1)
    for a, b in zip(jax.tree.leaves(v0), jax.tree.leaves(v1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # train mode ignores the flag entirely
    o0, mut0 = m0.apply(v0, x, train=True, mutable=["batch_stats"])
    o1, mut1 = m1.apply(v1, x, train=True, mutable=["batch_stats"])
    for a, b in zip(o0, o1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
