#!/usr/bin/env bash
# Unimodal experiment grid on RadioNews-SBBC.
# Usage: run_radionews_unimodal.sh <batch_size> <experiment_dir> <metric>
# Reproduces the reference grid (run_radionews_unimodal.sh): 6 encoders,
# BiLSTM h=256 x2, dropout {0,.2,.5}^2, FocalLoss, fixed split.
set -e
bs=$1; expdir=$2; metric=$3
encoders=(x-vectors openl3/_mean_std radio_news_roberta radio_news_topseg \
  "RadioNewsSentence/x-vectors+RadioNewsSentence/openl3/_mean_std" \
  "RadioNewsSentence/radio_news_roberta+RadioNewsSentence/radio_news_topseg")
for encoder in "${encoders[@]}"; do
  python ../train_fit.py -exp "${expdir}/BiLSTM_bs${bs}_${encoder}" -arc BiLSTM \
    -enc "${encoder}" -data RadioNews -bs "${bs}" -ef "RadioNewsSentence/${encoder}" \
    -lf RadioNewsSentence/labs_dict.pkl --metric "${metric}" \
    -split RadioNews_split.json \
    -lr 1e-3 -hs -huss 256 -nlss 2 -diss 0 0.2 0.5 -doss 0 0.2 0.5 \
    -max 1000 -vp 0.15 -pat 50 -ar -as -loss FocalLoss -s_last
done
