#!/usr/bin/env bash
# Low-level acoustic features with per-sentence timing appended (+2 dims)
# (reference run_radionews_lowlevel_acoustic_features.sh).
set -e
bs=$1; expdir=$2; metric=$3
encoders=("RadioNewsSentence/radio_news_roberta" "RadioNewsSentence/radio_news_topseg" \
  "RadioNewsSentence/radio_news_roberta+RadioNewsSentence/radio_news_topseg")
for encoder in "${encoders[@]}"; do
  python ../train_fit.py -exp "${expdir}/BiLSTM_bs${bs}_${encoder}" -arc BiLSTM \
    -enc "${encoder}" -data RadioNews -bs "${bs}" -ef "${encoder}" \
    -lf RadioNewsSentence/labs_dict.pkl --metric "${metric}" \
    -split RadioNews_split.json --timing_file nltk_sents_timings.pkl \
    -lr 1e-3 -hs -huss 256 -nlss 2 -diss 0 0.2 0.5 -doss 0 0.2 0.5 \
    -max 1000 -vp 0.15 -pat 50 -ar -as -loss FocalLoss -s_last
done
