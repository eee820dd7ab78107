#!/usr/bin/env bash
# ZipVoice-Dialog on OpenDialog — fine-tune from the base ZipVoice model,
# then (optionally) the stereo variant from the dialog model
# (TPU rebuild of ref egs/zipvoice_dialog/run_opendialog.sh; fbank
# precompute is unnecessary — features are computed on device).
set -euo pipefail

stage=${1:-1}
stop_stage=${2:-6}

data_dir=download/OpenDialog
download_dir=download

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: prepare OpenDialog TSV manifests"
  for lang in en zh; do
    python local/prepare_opendialog.py \
      --jsonl ${data_dir}/${lang}.jsonl \
      --output data/raw/opendialog_${lang}.tsv
  done
  # the reference muxes ZH at 2x weight (ref train_zipvoice_dialog.py:855-865)
  cat data/raw/opendialog_en.tsv data/raw/opendialog_zh.tsv \
      data/raw/opendialog_zh.tsv > data/raw/opendialog_train.tsv
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: download the dialog token file + pre-trained base model"
  mkdir -p ${download_dir}
  hf_repo=k2-fsa/ZipVoice
  huggingface-cli download --local-dir ${download_dir} ${hf_repo} \
    zipvoice_dialog/tokens.txt
  for file in model.pt tokens.txt model.json; do
    huggingface-cli download --local-dir ${download_dir} ${hf_repo} \
      zipvoice/${file}
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: train ZipVoice-Dialog (vocab-extended init from base)"
  python -m zipvoice_tpu.bin.train_zipvoice_dialog \
    --base-lr 0.0001 \
    --max-duration 500 \
    --checkpoint ${download_dir}/zipvoice/model.pt \
    --model-config ${download_dir}/zipvoice/model.json \
    --token-file ${download_dir}/zipvoice_dialog/tokens.txt \
    --train-manifest data/raw/opendialog_train.tsv \
    --dtype bfloat16 \
    --exp-dir exp/zipvoice_dialog_opendialog
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: average the dialog checkpoints"
  python -m zipvoice_tpu.bin.generate_averaged_model \
    --epoch 11 --avg 4 --exp-dir exp/zipvoice_dialog_opendialog \
    --out exp/zipvoice_dialog_opendialog/model.pt
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "Stage 5: train ZipVoice-Dialog-Stereo (proj surgery from dialog)"
  python -m zipvoice_tpu.bin.train_zipvoice_dialog_stereo \
    --base-lr 0.0001 \
    --max-duration 500 \
    --checkpoint exp/zipvoice_dialog_opendialog/model.pt \
    --model-config ${download_dir}/zipvoice/model.json \
    --token-file ${download_dir}/zipvoice_dialog/tokens.txt \
    --train-manifest data/raw/opendialog_train.tsv \
    --dtype bfloat16 \
    --exp-dir exp/zipvoice_dialog_stereo
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "Stage 6: dialog inference"
  python -m zipvoice_tpu.bin.infer_zipvoice_dialog \
    --model-name zipvoice_dialog \
    --model-dir exp/zipvoice_dialog_opendialog \
    --test-list test.tsv \
    --res-dir results/dialog
fi
