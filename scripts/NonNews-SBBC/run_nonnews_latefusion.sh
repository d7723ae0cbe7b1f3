#!/usr/bin/env bash
# Late-fusion grid: two parallel BiLSTM towers per modality
# (reference run_nonnews_latefusion.sh).
set -e
bs=$1; expdir=$2; metric=$3
audio=("NonNewsSentence/x-vectors" "NonNewsSentence/openl3/_mean_std" \
  "NonNewsSentence/x-vectors+NonNewsSentence/openl3/_mean_std")
text=("NonNewsSentence/non_news_roberta" "NonNewsSentence/non_news_topseg" \
  "NonNewsSentence/non_news_roberta+NonNewsSentence/non_news_topseg")
for a in "${audio[@]}"; do for t in "${text[@]}"; do
  python ../train_fit.py -exp "${expdir}/BiLSTM_bs${bs}_${a}+${t}" -arc BiLSTMLateFusion \
    -enc "${a}" -enc2 "${t}" -data NonNews -bs "${bs}" -ef "${a}" -ef2 "${t}" \
    -lf NonNewsSentence/labs_dict.pkl --metric "${metric}" \
    -split NonNews_split.json \
    -lr 1e-3 -hs -huss 256 -nlss 2 -diss 0 0.2 0.5 -doss 0 0.2 0.5 \
    -max 1000 -vp 0.15 -pat 50 -ar -as -loss FocalLoss -s_last
done; done
