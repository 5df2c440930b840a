"""NAS decode parity vs the reference Decoding/decoding_formulas.py (oracle
imported from /root/reference) and vs the shipped searched artifacts."""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

from auto_dynamic_deeplab_tpu.nas.decode import (
    ArchDecoder,
    genotype_decode,
    network_layer_to_space,
    viterbi_decode,
)


def test_network_layer_to_space_matches_shipped():
    path = np.load("/root/reference/searched_arch/searched_baseline/network_path.npy")
    space = np.load(
        "/root/reference/searched_arch/searched_baseline/network_path_space.npy"
    )
    np.testing.assert_array_equal(network_layer_to_space(path), space)


@pytest.mark.parametrize("seed", range(5))
def test_viterbi_matches_reference(seed):
    import torch
    from Decoding.decoding_formulas import Decoder as RefDecoder

    rng = np.random.RandomState(seed)
    betas = rng.randn(12, 4, 3).astype(np.float32)

    ours_path, ours_space = viterbi_decode(betas)
    ref = RefDecoder(None, torch.from_numpy(betas), 5)
    ref_path, ref_space = ref.viterbi_decode()

    np.testing.assert_array_equal(ours_path, ref_path)
    np.testing.assert_array_equal(ours_space, ref_space)
    # decoded paths are valid trellis walks starting at level 0/1
    assert ours_path[0] in (0, 1)
    assert all(abs(int(a) - int(b)) <= 1 for a, b in zip(ours_path, ours_path[1:]))


@pytest.mark.parametrize("seed", range(5))
def test_genotype_matches_reference(seed):
    import torch
    from Decoding.decoding_formulas import Decoder as RefDecoder

    rng = np.random.RandomState(100 + seed)
    alphas = rng.randn(20, 8).astype(np.float32)
    betas = rng.randn(12, 4, 3).astype(np.float32)

    ours = genotype_decode(alphas, B=5)
    ref = RefDecoder(torch.from_numpy(alphas), torch.from_numpy(betas), 5)
    theirs = ref.genotype_decode()
    np.testing.assert_array_equal(ours, theirs)

    # ArchDecoder bundle mirrors both
    bundle = ArchDecoder(alphas, betas, 5)
    np.testing.assert_array_equal(bundle.genotype_decode(), theirs)
    np.testing.assert_array_equal(bundle.viterbi_decode()[0], ref.viterbi_decode()[0])
