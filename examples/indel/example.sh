#!/bin/bash
# End-to-end INDEL workflow (mirrors the reference's
# examples/indel/examples.sh): train -> predict -> evaluate (incl. the
# motif mode).
set -euo pipefail
cd "$(dirname "$0")"

BIN=${MURAL_BIN:-mural_indel}

# NOTE: --n_class must match the classes the data actually shows
# (make_example_data.py writes 4 by default; the CLI default is 8 and
# training fails fast if some class never appears in validation data).
N_CLASS=${N_CLASS:-4}

$BIN train --ref_genome data/seq.fa --train_data data/training.sorted.bed \
    --validation_data data/validation.sorted.bed \
    --experiment_name indel_example --n_trials 1 --epochs 3 \
    --n_class "$N_CLASS" \
    --distal_radius 4000 --down_list 1 4 5 5 5 2 \
    --CNN_kernel_size 7 --CNN_out_channels 8 --use_reverse

BEST=$(ls -d results/indel_example/Train_*/checkpoint_* | head -1)

$BIN predict --ref_genome data/seq.fa --test_data data/testing.bed.gz \
    --model_path "$BEST/model" \
    --model_config_path "$BEST/model.config.pkl" \
    --calibrator_path "$BEST/model.fdiri_cal.pkl" \
    --pred_file indel_pred.tsv.gz

$BIN evaluate --pred_file indel_pred.tsv.gz --out_prefix indel_eval \
    --ref_genome data/seq.fa --kmer_length 2 --strand both --n_class "$N_CLASS"
$BIN evaluate --pred_file indel_pred.tsv.gz --out_prefix indel_eval \
    --ref_genome data/seq.fa --motif_only --motif_length 5 --n_class "$N_CLASS"
