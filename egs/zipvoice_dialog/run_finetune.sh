#!/usr/bin/env bash
# Fine-tune ZipVoice-Dialog on a custom two-party dialog dataset
# (TPU rebuild of ref egs/zipvoice_dialog/run_finetune.sh).
#
# Expects data/raw/custom_{train,dev}.tsv rows: {uniq_id}\t{text}\t{wav}
# where text interleaves speaker tags: "[S1] hello. [S2] hi there. ..."
set -euo pipefail

stage=${1:-1}
stop_stage=${2:-4}

data_dir=data
pretrained_dir=${PRETRAINED_DIR:-download/zipvoice_dialog}
exp_dir=exp/zipvoice_dialog_finetune

for subset in train dev; do
  f=$data_dir/raw/custom_${subset}.tsv
  [ -f "$f" ] || { echo "Error: expected $f" >&2; exit 1; }
done

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: validate manifests"
  python ../zipvoice/utils/validate_manifest.py --check-files \
    $data_dir/raw/custom_train.tsv $data_dir/raw/custom_dev.tsv
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: fine-tune from the pre-trained dialog checkpoint"
  python -m zipvoice_tpu.bin.train_zipvoice_dialog \
    --checkpoint ${pretrained_dir}/model.pt \
    --model-config ${pretrained_dir}/model.json \
    --token-file ${pretrained_dir}/tokens.txt \
    --train-manifest $data_dir/raw/custom_train.tsv \
    --dev-manifest $data_dir/raw/custom_dev.tsv \
    --base-lr 0.0001 \
    --num-epochs 10 \
    --max-duration 250 \
    --dtype bfloat16 \
    --exp-dir ${exp_dir}
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: average checkpoints"
  python -m zipvoice_tpu.bin.generate_averaged_model \
    --epoch 10 --avg 3 --exp-dir ${exp_dir} --out ${exp_dir}/model.pt
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: inference with the fine-tuned dialog model"
  python -m zipvoice_tpu.bin.infer_zipvoice_dialog \
    --model-name zipvoice_dialog \
    --model-dir ${exp_dir} \
    --test-list test.tsv \
    --res-dir results/dialog_finetune
fi
