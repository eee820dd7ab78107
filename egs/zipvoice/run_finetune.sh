#!/usr/bin/env bash
# Fine-tune ZipVoice on a custom dataset from a pre-trained checkpoint
# (TPU rebuild of ref egs/zipvoice/run_finetune.sh).
#
# Expects data/raw/custom_{train,dev}.tsv with rows
#   {uniq_id}\t{text}\t{wav_path}            (text covers the whole wav), or
#   {uniq_id}\t{text}\t{wav_path}\t{start}\t{end}
# and a pre-trained model dir {model.pt, model.json, tokens.txt} (e.g. the
# released k2-fsa/ZipVoice checkpoint, downloaded to ${pretrained_dir}).
set -euo pipefail

stage=${1:-1}
stop_stage=${2:-4}

data_dir=data
pretrained_dir=${PRETRAINED_DIR:-download/zipvoice}
exp_dir=exp/zipvoice_finetune

# emilia tokenizer covers ZH+EN; use espeak + lang for other languages
# (ref run_finetune.sh:22-34)
tokenizer=${TOKENIZER:-emilia}
lang=${LANG_ID:-en-us}

# filter out utterances longer than this (seconds); set to the p99 duration
max_len=${MAX_LEN:-20}

for subset in train dev; do
  f=$data_dir/raw/custom_${subset}.tsv
  [ -f "$f" ] || { echo "Error: expected $f" >&2; exit 1; }
done

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: validate manifests"
  python utils/validate_manifest.py --check-files \
    $data_dir/raw/custom_train.tsv $data_dir/raw/custom_dev.tsv
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: fine-tune from the pre-trained checkpoint"
  # token file MUST be the pre-trained model's (ids are baked into the
  # embedding); --finetune = fixed LR + regularizer schedules pinned past
  # their ramps (ref train_zipvoice.py:564-565)
  python -m zipvoice_tpu.bin.train_zipvoice \
    --finetune \
    --checkpoint ${pretrained_dir}/model.pt \
    --model-config ${pretrained_dir}/model.json \
    --token-file ${pretrained_dir}/tokens.txt \
    --tokenizer ${tokenizer} --lang ${lang} \
    --train-manifest $data_dir/raw/custom_train.tsv \
    --dev-manifest $data_dir/raw/custom_dev.tsv \
    --max-len ${max_len} \
    --num-epochs 10 \
    --max-duration 250 \
    --base-lr 0.0001 \
    --dtype bfloat16 \
    --exp-dir ${exp_dir}
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: average checkpoints"
  python -m zipvoice_tpu.bin.generate_averaged_model \
    --epoch 10 --avg 3 --exp-dir ${exp_dir} --out ${exp_dir}/model.pt
  cp ${pretrained_dir}/tokens.txt ${pretrained_dir}/model.json ${exp_dir}/ 2>/dev/null || true
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: inference with the fine-tuned model"
  python -m zipvoice_tpu.bin.infer_zipvoice \
    --model-name zipvoice \
    --model-dir ${exp_dir} \
    --tokenizer ${tokenizer} --lang ${lang} \
    --test-list test.tsv \
    --res-dir results/finetune
fi
