#!/usr/bin/env bash
# ZipVoice on LibriTTS — char-token recipe
# (TPU rebuild of ref egs/zipvoice/run_libritts.sh: lhotse download/prepare
# is replaced by a directory walk -> TSV; fbank precompute is optional
# because features are computed on device during training).
set -euo pipefail

stage=${1:-1}
stop_stage=${2:-5}

data_dir=data
corpus=${LIBRITTS_ROOT:-download/LibriTTS}
num_epochs=11

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: prepare LibriTTS manifests"
  python local/prepare_libritts.py --corpus ${corpus} \
    --subsets train-clean-100 train-clean-360 train-other-500 \
    --output $data_dir/raw/libritts_train.tsv
  python local/prepare_libritts.py --corpus ${corpus} \
    --subsets dev-clean \
    --output $data_dir/raw/libritts_dev.tsv
  python utils/validate_manifest.py \
    $data_dir/raw/libritts_train.tsv $data_dir/raw/libritts_dev.tsv
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: build the char token file (ref local/prepare_token_file_char.py)"
  python -m zipvoice_tpu.bin.make_tokens \
    --manifest $data_dir/raw/libritts_train.tsv \
    --tokenizer libritts --output $data_dir/tokens_libritts.txt
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: train ZipVoice on LibriTTS"
  python -m zipvoice_tpu.bin.train_zipvoice \
    --num-epochs ${num_epochs} \
    --max-duration 250 \
    --lr-epochs 10 \
    --model-config conf/zipvoice_base.json \
    --tokenizer libritts \
    --token-file $data_dir/tokens_libritts.txt \
    --train-manifest $data_dir/raw/libritts_train.tsv \
    --dev-manifest $data_dir/raw/libritts_dev.tsv \
    --dtype bfloat16 \
    --exp-dir exp/zipvoice_libritts
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: average checkpoints"
  python -m zipvoice_tpu.bin.generate_averaged_model \
    --epoch ${num_epochs} --avg 4 --exp-dir exp/zipvoice_libritts \
    --out exp/zipvoice_libritts/model.pt
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "Stage 5: inference"
  python -m zipvoice_tpu.bin.infer_zipvoice \
    --model-name zipvoice \
    --model-dir exp/zipvoice_libritts \
    --tokenizer libritts \
    --test-list test.tsv \
    --res-dir results/libritts
fi
