#!/usr/bin/env bash
# Early-fusion grid: 3 audio x 3 text encoder combinations concatenated
# feature-wise ('+'), single BiLSTM tower (reference run_radionews_earlyfusion.sh).
set -e
bs=$1; expdir=$2; metric=$3
audio=("RadioNewsSentence/x-vectors" "RadioNewsSentence/openl3/_mean_std" \
  "RadioNewsSentence/x-vectors+RadioNewsSentence/openl3/_mean_std")
text=("RadioNewsSentence/radio_news_roberta" "RadioNewsSentence/radio_news_topseg" \
  "RadioNewsSentence/radio_news_roberta+RadioNewsSentence/radio_news_topseg")
for a in "${audio[@]}"; do for t in "${text[@]}"; do
  python ../train_fit.py -exp "${expdir}/BiLSTM_bs${bs}_${a}+${t}" -arc BiLSTM \
    -enc "${a}+${t}" -data RadioNews -bs "${bs}" -ef "${a}+${t}" \
    -lf RadioNewsSentence/labs_dict.pkl --metric "${metric}" \
    -split RadioNews_split.json \
    -lr 1e-3 -hs -huss 256 -nlss 2 -diss 0 0.2 0.5 -doss 0 0.2 0.5 \
    -max 1000 -vp 0.15 -pat 50 -ar -as -loss FocalLoss -s_last
done; done
