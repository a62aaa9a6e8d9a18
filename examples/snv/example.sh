#!/bin/bash
# End-to-end SNV workflow on the example data (mirrors the reference's
# examples/snv/examples.sh): train -> get_best_model -> predict ->
# transfer -> evaluate.
#
# Expects in data/: seq.fa, training.sorted.bed, validation.sorted.bed,
# testing.bed.gz (generate a synthetic set with make_example_data.py if
# you have no genome at hand).
set -euo pipefail
cd "$(dirname "$0")"

BIN=${MURAL_BIN:-mural_snv}

# 1. train: 2 trials, small model for the example genome
$BIN train --ref_genome data/seq.fa --train_data data/training.sorted.bed \
    --validation_data data/validation.sorted.bed \
    --experiment_name snv_example --n_trials 2 --epochs 5 \
    --distal_radius 200 --local_radius 7 --local_order 3 \
    --batch_size 128 --split_seed 42

# 2. best checkpoint
$BIN get_best_model --trial_path results/snv_example

BEST=$(ls -d results/snv_example/Train_*/checkpoint_* | head -1)

# 3. predict the test set with calibration
$BIN predict --ref_genome data/seq.fa --test_data data/testing.bed.gz \
    --model_path "$BEST/model" \
    --model_config_path "$BEST/model.config.pkl" \
    --calibrator_path "$BEST/model.fdiri_cal.pkl" \
    --pred_file pred.tsv.gz --pred_batch_size 512

# 4. transfer-learn onto a second dataset
$BIN transfer --ref_genome data/seq.fa \
    --train_data data/training_TL.sorted.bed \
    --model_path "$BEST/model" \
    --model_config_path "$BEST/model.config.pkl" \
    --train_all --init_fc_with_pretrained \
    --experiment_name snv_example_TL --n_trials 1 --epochs 3

# 5. evaluate the predictions
$BIN evaluate --pred_file pred.tsv.gz --out_prefix snv_eval \
    --ref_genome data/seq.fa --kmer_length 3 --window_size 100000
