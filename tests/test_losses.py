"""Alternative-loss parity vs torch (ref evaluation.py:367-487) and the
k-mer subsample diagnostic (ref f*mer_comp_rand, :69-122)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.fixture()
def batch(rng):
    logits = rng.normal(size=(64, 4)).astype(np.float32)
    labels = rng.integers(0, 4, 64).astype(np.int64)
    return logits, labels


@pytest.mark.parametrize("gamma,size_average", [(0.0, False), (2.0, False),
                                                (1.0, True)])
def test_focal_ce_matches_torch(batch, gamma, size_average):
    from mural_tpu.train.losses import focal_ce_loss
    logits, labels = batch
    got = float(focal_ce_loss(logits, labels, gamma, size_average))

    t_in = torch.tensor(logits)
    t_tgt = torch.tensor(labels).view(-1, 1)
    logpt = F.log_softmax(t_in, dim=1).gather(1, t_tgt).view(-1)
    pt = logpt.exp()
    loss = -1 * (1 - pt) ** gamma * logpt
    expect = float(loss.mean() if size_average else loss.sum())
    assert got == pytest.approx(expect, rel=1e-5)


@pytest.mark.parametrize("loss_type,gamma", [("sigmoid", 1.0),
                                             ("focal", 2.0),
                                             ("softmax", 1.0)])
def test_class_balanced_matches_torch(batch, loss_type, gamma):
    from mural_tpu.train.losses import class_balanced_loss
    logits, labels = batch
    samples_per_cls = [1000, 300, 50, 10]
    beta = 0.9999
    got = float(class_balanced_loss(logits, labels, samples_per_cls, 4,
                                    loss_type, beta, gamma))

    # reference CBLoss.forward re-computed in torch
    effective_num = 1.0 - np.power(beta, samples_per_cls)
    weights = (1.0 - beta) / np.asarray(effective_num)
    weights = weights / weights.sum() * 4
    t_logits = torch.tensor(logits)
    one_hot = F.one_hot(torch.tensor(labels), 4).float()
    w = torch.tensor(weights).float().unsqueeze(0).repeat(64, 1) * one_hot
    w = w.sum(1).unsqueeze(1).repeat(1, 4)
    if loss_type == "sigmoid":
        expect = F.binary_cross_entropy_with_logits(
            input=t_logits, target=one_hot, weight=w)
    elif loss_type == "softmax":
        expect = F.binary_cross_entropy(input=t_logits.softmax(dim=1),
                                        target=one_hot, weight=w)
    else:  # focal (ref focal_loss, evaluation.py:389-417)
        bc = F.binary_cross_entropy_with_logits(
            input=t_logits, target=one_hot, reduction="none")
        modulator = torch.exp(-gamma * one_hot * t_logits
                              - gamma * torch.log(
                                  1 + torch.exp(-1.0 * t_logits)))
        expect = (w * modulator * bc).sum() / one_hot.sum()
    assert got == pytest.approx(float(expect), rel=1e-4)


def test_kmer_comp_rand_diagnostic(rng):
    import pandas as pd

    from mural_tpu.evaluation.evaluator import kmer_comp_rand
    n = 20000
    us1 = rng.integers(0, 4, n)
    ds1 = rng.integers(0, 4, n)
    # mutation probability depends deterministically on the 3-mer
    p = (us1 * 4 + ds1) / 32.0
    mut = (rng.random(n) < p).astype(int)
    df = pd.DataFrame({"us1": us1, "ds1": ds1, "mut_type": mut})
    mean_corr = kmer_comp_rand(df, 3, n_rows=8000, sampling_times=4,
                               rng=rng, printer=lambda *a: None)
    # strong planted signal -> subsamples must agree
    assert mean_corr > 0.8
    # pure noise -> low correlation
    df_noise = pd.DataFrame({"us1": us1, "ds1": ds1,
                             "mut_type": rng.integers(0, 2, n)})
    noise_corr = kmer_comp_rand(df_noise, 3, n_rows=2000,
                                sampling_times=4, rng=rng,
                                printer=lambda *a: None)
    assert noise_corr < mean_corr
