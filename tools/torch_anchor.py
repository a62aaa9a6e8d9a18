#!/usr/bin/env python
"""Measure the torch-CPU anchor rows of BASELINE.md.

The reference (CaiLiLab/MuRaL) publishes no absolute throughput numbers
(SURVEY.md section 6), and its full pipeline cannot run in this
container (pybedtools/pyBigWig/Ray absent), so the anchor is the
reference *model compute* re-expressed in torch — the clones in
tests/test_torch_parity.py, numerically identical to the reference
models per the parity tests — timed on this host's CPU at 1 thread:

- SNV: Network2 semantics (MuRaL/model/model_snv.py:290-525) at the
  reference defaults local_radius 7 / local_order 3 / distal_radius 200
  / k3 / ch32, fwd+bwd+Adam step (training.py:424-451 flow:
  CE-sum loss, clip_grad_norm 10, optimizer.step).
- INDEL: UNet_Small semantics (MuRaL/model/model_indel.py:21-178) at
  the reference human recipe distal_radius 4000 -> W=8000, k7 / ch8 /
  down_list 1,4,5,5,5,2, B=64, AdamW wd 0.01.

Usage:  python tools/torch_anchor.py [snv|indel] [--batch N]
Prints one JSON line: {"model": ..., "batch": N, "windows_per_sec": X}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

import numpy as np
import torch

torch.set_num_threads(1)


def _time_steps(run_step, warmup=3, measure=10):
    for _ in range(warmup):
        run_step()
    t0 = time.time()
    for _ in range(measure):
        run_step()
    return (time.time() - t0) / measure


def anchor_snv(batch):
    from tests.test_torch_parity import TorchSNVNet2
    model = TorchSNVNet2(65, 13, [150, 75], 4, 32, 3, 4)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)
    crit = torch.nn.CrossEntropyLoss(reduction="sum")
    rng = np.random.default_rng(0)
    cat = torch.from_numpy(rng.integers(0, 64, (batch, 13)).astype(np.int64))
    distal = torch.from_numpy(
        rng.normal(size=(batch, 4, 401)).astype(np.float32))
    y = torch.from_numpy(rng.integers(0, 4, batch).astype(np.int64))

    def step():
        opt.zero_grad()
        loss = crit(model(cat, distal), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=10)
        opt.step()

    return batch / _time_steps(step)


def anchor_indel(batch):
    from tests.test_torch_parity import TorchUNet
    model = TorchUNet(8, 8, 7, (1, 4, 5, 5, 5, 2), False)
    model.train()
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3, weight_decay=0.01)
    crit = torch.nn.CrossEntropyLoss(reduction="sum")
    rng = np.random.default_rng(0)
    distal = torch.from_numpy(
        rng.normal(size=(batch, 4, 8000)).astype(np.float32))
    y = torch.from_numpy(rng.integers(0, 8, batch).astype(np.int64))

    def step():
        opt.zero_grad()
        loss = crit(model(distal), y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), max_norm=10)
        opt.step()

    return batch / _time_steps(step, warmup=2, measure=5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=["snv", "indel"])
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()
    if args.model == "snv":
        batch = args.batch or 2048
        rate = anchor_snv(batch)
    else:
        batch = args.batch or 64
        rate = anchor_indel(batch)
    print(json.dumps({"model": args.model, "batch": batch,
                      "windows_per_sec": round(rate, 1)}))


if __name__ == "__main__":
    main()
