#!/usr/bin/env bash
# Pairwise early-fusion combinations of the 4 base encoders
# (reference run_radionews_combinations.sh).
set -e
bs=$1; expdir=$2; metric=$3
encoders=(x-vectors openl3/_mean_std radio_news_roberta radio_news_topseg)
for i in "${!encoders[@]}"; do for j in "${!encoders[@]}"; do
  if (( j > i )); then
    e1=${encoders[$i]}; e2=${encoders[$j]}
    python ../train_fit.py -exp "${expdir}/BiLSTM_bs${bs}_${e1}+${e2}" -arc BiLSTM \
      -enc "${e1}+${e2}" -data RadioNews -bs "${bs}" \
      -ef "RadioNewsSentence/${e1}+RadioNewsSentence/${e2}" \
      -lf RadioNewsSentence/labs_dict.pkl --metric "${metric}" \
      -split RadioNews_split.json \
      -lr 1e-3 -hs -huss 256 -nlss 2 -diss 0 0.2 0.5 -doss 0 0.2 0.5 \
      -max 1000 -vp 0.15 -pat 50 -ar -as -loss FocalLoss -s_last
  fi
done; done
