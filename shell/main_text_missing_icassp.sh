#!/bin/sh
# Canonical ICASSP training recipe (reference shell/main_text_missing_icassp.sh:6,
# live uncommented line) on the sdumc_tpu train CLI — flag-for-flag compatible.
python -u -m sdumc_tpu.cli.train --dataset='CMU-MOSEI' \
  --model='wengnet_mosei_mult_views_text_missing' --num_workers=4 \
  --audio_feature='wavlm-large-FRA_-5' \
  --text_feature='vicuna-7b-v1.5-FRA-wavlm2vicuna-half-gt' \
  --video_feature='manet_FRA' \
  --feat4_feature='vicuna-7b-v1.5-FRA-wavlm2vicuna-half-wav+prompt[take_generate_wordembed_-4]' \
  --batch_size=96 --lr=1e-4 --epochs=25 \
  --full_mse_loss_w=0.5 --missing_mse_loss_w=0.5 --text_feat_loss_w=0 \
  --text_query_feat_loss_w=0 --features_loss_w=0.13 --rnc_loss_w=0.5 "$@"
