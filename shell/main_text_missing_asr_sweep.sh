#!/bin/sh
# Whisper-ASR text-variant inference sweep (reference
# shell/main_text_missing_icassp_inference.sh:6-9, the commented
# `-gt(<whisper_model>_vad)` lines): the same dual-view eval with the
# gt-text stream swapped for ASR-transcript embeddings. The reference
# ships no whisper code (SURVEY §2.1) and only consumes these features;
# here the producing side is in-tree — build them with:
#
#   python -m sdumc_tpu.extract.asr  --model_dir .../whisper-base.en \
#       --audio_dir wavs/ --save_csv asr_base.en_vad.csv --vad
#   python -m sdumc_tpu.extract.text --model_dir .../vicuna-7b-v1.5 \
#       --trans_path asr_base.en_vad.csv --save_dir <text_feature dir>
#
# Any `--text_feature` directory that follows the L1 contract
# ({clip}.npy [T, 4096]) drops in.
for ASR in base.en_vad small.en_vad medium.en_vad large-v2.en_vad; do
  python -u -m sdumc_tpu.cli.infer --dataset='CMU-MOSEI' \
    --model='wengnet_mosei_mult_views_text_missing' --num_workers=4 \
    --audio_feature='wavlm-large-FRA_-5' \
    --text_feature="vicuna-7b-v1.5-FRA-wavlm2vicuna-half-gt(${ASR})" \
    --video_feature='manet_FRA' \
    --feat4_feature='vicuna-7b-v1.5-FRA-wavlm2vicuna-half-wav+prompt[take_generate_wordembed_-4]' \
    --batch_size=128 \
    --text_feat_loss_w=0.1 --text_query_feat_loss_w=0.7 \
    --features_loss_w=0.13 --rnc_loss_w=0.5 "$@"
done
