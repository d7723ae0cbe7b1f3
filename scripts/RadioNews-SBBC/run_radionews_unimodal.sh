#!/usr/bin/env bash
# Unimodal experiment grid on RadioNews-SBBC.
# Usage: run_radionews_unimodal.sh <batch_size> <experiment_dir> <metric>
# Reproduces the reference grid (run_radionews_unimodal.sh): 6 encoders,
# BiLSTM h=256 x2, dropout {0,.2,.5}^2, FocalLoss, fixed split.
#
# Test hooks (tests/test_shell_drivers.py runs this script on a tiny
# synthetic corpus): MTS_ENCODERS overrides the encoder list, MTS_MAX_EPOCHS
# / MTS_PATIENCE bound the fit; defaults reproduce the paper grid.
set -e
bs=$1; expdir=$2; metric=$3
if [ -n "${MTS_ENCODERS}" ]; then
  read -r -a encoders <<< "${MTS_ENCODERS}"
else
  encoders=(x-vectors openl3/_mean_std radio_news_roberta radio_news_topseg \
    "RadioNewsSentence/x-vectors+RadioNewsSentence/openl3/_mean_std" \
    "RadioNewsSentence/radio_news_roberta+RadioNewsSentence/radio_news_topseg")
fi
for encoder in "${encoders[@]}"; do
  python ../train_fit.py -exp "${expdir}/BiLSTM_bs${bs}_${encoder}" -arc BiLSTM \
    -enc "${encoder}" -data RadioNews -bs "${bs}" -ef "RadioNewsSentence/${encoder}" \
    -lf RadioNewsSentence/labs_dict.pkl --metric "${metric}" \
    -split RadioNews_split.json \
    -lr 1e-3 -hs -huss 256 -nlss 2 -diss 0 0.2 0.5 -doss 0 0.2 0.5 \
    -max "${MTS_MAX_EPOCHS:-1000}" -vp 0.15 -pat "${MTS_PATIENCE:-50}" \
    -ar -as -loss FocalLoss -s_last
done
