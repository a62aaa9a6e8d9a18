#!/usr/bin/env python
"""Generate a synthetic example dataset (genome + BEDs) for the example
workflows, since real genomes are large downloads.

The genome embeds a learnable signal: mutation class probabilities depend
on the local 3-mer context, so trained models achieve meaningful k-mer
correlations.
"""

import argparse
import gzip
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="snv/data")
    ap.add_argument("--genome_mb", type=float, default=2.0)
    ap.add_argument("--n_train", type=int, default=100_000)
    ap.add_argument("--n_valid", type=int, default=20_000)
    ap.add_argument("--n_test", type=int, default=50_000)
    ap.add_argument("--n_class", type=int, default=4)
    ap.add_argument("--focal_base", default="A")
    ap.add_argument("--model_type", default="snv", choices=["snv", "indel"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    L = int(args.genome_mb * 1e6)
    bases = np.array(list("ACGT"))
    seq = rng.choice(4, size=L)
    os.makedirs(args.out_dir, exist_ok=True)

    fa = os.path.join(args.out_dir, "seq.fa")
    with open(fa, "w") as fh:
        fh.write(">chr1\n")
        s = "".join(bases[seq])
        for i in range(0, L, 80):
            fh.write(s[i:i + 80] + "\n")

    if args.model_type == "indel":
        # INDEL sites have no focal-base constraint; sample positions
        n_total = args.n_train * 2 + args.n_valid + args.n_test
        pos = np.sort(rng.choice(
            np.arange(10, L - 10), size=min(n_total, L - 20),
            replace=False))
        strand = rng.uniform(size=len(pos)) < 0.5
    else:
        focal = int(np.where(bases == args.focal_base)[0][0])
        comp = 3 - focal
        pos_fwd = np.nonzero(seq == focal)[0]
        pos_rev = np.nonzero(seq == comp)[0]
        pos = np.concatenate([pos_fwd, pos_rev])
        strand = np.concatenate([np.zeros(len(pos_fwd), bool),
                                 np.ones(len(pos_rev), bool)])
        order = np.argsort(pos)
        pos, strand = pos[order], strand[order]
        keep = (pos > 10) & (pos < L - 10)
        pos, strand = pos[keep], strand[keep]

    # context-dependent class probabilities via the flanking 3-mer
    up = np.where(strand, 3 - seq[pos + 1], seq[pos - 1])
    dn = np.where(strand, 3 - seq[pos - 1], seq[pos + 1])
    ctx = up * 4 + dn
    base_rate = 0.06 + 0.08 * (ctx / 15.0)
    labels = np.zeros(len(pos), dtype=int)
    mutated = rng.uniform(size=len(pos)) < base_rate
    labels[mutated] = 1 + (ctx[mutated] + rng.integers(
        0, 2, mutated.sum())) % (args.n_class - 1)

    sel = rng.permutation(len(pos))
    splits = {
        "training.sorted.bed": sel[:args.n_train],
        "validation.sorted.bed": sel[args.n_train:
                                     args.n_train + args.n_valid],
        "testing.bed.gz": sel[args.n_train + args.n_valid:
                              args.n_train + args.n_valid + args.n_test],
        "training_TL.sorted.bed": sel[args.n_train + args.n_valid +
                                      args.n_test:
                                      2 * args.n_train + args.n_valid +
                                      args.n_test],
    }
    for name, idx in splits.items():
        idx = idx[np.argsort(pos[idx])]
        opener = gzip.open if name.endswith(".gz") else open
        with opener(os.path.join(args.out_dir, name), "wt") as fh:
            for i in idx:
                fh.write(f"chr1\t{pos[i]}\t{pos[i] + 1}\t.\t{labels[i]}"
                         f"\t{'-' if strand[i] else '+'}\n")
        print(name, len(idx), "sites")
    print("wrote", fa, f"({L / 1e6:.1f} Mb)")


if __name__ == "__main__":
    main()
