"""Bit-exactness of the torch-free randperm (utils/torch_rng.py).

The reference's train/valid split is torch.random_split under a manually
seeded generator (MuRaL/training.py:220-229); split parity therefore
requires reproducing torch's exact MT19937 + Fisher-Yates stream.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.parametrize("seed", [0, 1, 100, 2**31 - 1, 2**40 + 7])
@pytest.mark.parametrize("n", [1, 2, 7, 100, 1000])
def test_randperm_matches_torch(seed, n):
    from mural_tpu.utils.torch_rng import torch_randperm
    g = torch.Generator().manual_seed(seed)
    ref = torch.randperm(n, generator=g).numpy()
    assert (torch_randperm(n, seed) == ref).all()


def test_split_uses_native_stream():
    """split_segments_like_torch must match a literal torch random_split."""
    from mural_tpu.train.loop import split_segments_like_torch
    n, ratio, seed = 137, 0.2, 42
    train_ids, valid_ids = split_segments_like_torch(n, ratio, seed)
    g = torch.Generator().manual_seed(seed)
    perm = torch.randperm(n, generator=g).tolist()
    valid_size = int(n * ratio)
    assert train_ids.tolist() == perm[:n - valid_size]
    assert valid_ids.tolist() == sorted(perm[n - valid_size:])
    assert len(set(train_ids) | set(valid_ids)) == n
