#!/bin/sh
# Canonical inference recipe (reference shell/main_text_missing_icassp_inference.sh:5,
# live uncommented line): eval-only dual-view passes from a released-style
# checkpoint; add --savewhole to dump the 8 embedding streams.
python -u -m sdumc_tpu.cli.infer --dataset='CMU-MOSEI' \
  --model='wengnet_mosei_mult_views_text_missing' --num_workers=4 \
  --audio_feature='wavlm-large-FRA_-5' \
  --text_feature='vicuna-7b-v1.5-FRA-wavlm2vicuna-half-gt' \
  --video_feature='manet_FRA' \
  --feat4_feature='vicuna-7b-v1.5-FRA-wavlm2vicuna-half-wav+prompt[take_generate_wordembed_-4]' \
  --batch_size=128 \
  --text_feat_loss_w=0.1 --text_query_feat_loss_w=0.7 --features_loss_w=0.13 --rnc_loss_w=0.5 "$@"
