#!/usr/bin/env bash
# ZipVoice recipe: staged data-prep -> train -> average -> export -> infer -> eval
# (TPU rebuild of ref egs/zipvoice/run_emilia.sh; stages mirror the reference)
set -euo pipefail

stage=${1:-0}
stop_stage=${2:-6}

data_dir=data
exp_dir=exp/zipvoice
train_tsv=$data_dir/raw/train.tsv      # id \t text \t wav
dev_tsv=$data_dir/raw/dev.tsv
tokens=$data_dir/tokens.txt
config=conf/zipvoice_base.json
num_epochs=11

if [ $stage -le 0 ] && [ $stop_stage -ge 0 ]; then
  echo "Stage 0: prepare dataset (validate + probe durations)"
  python -m zipvoice_tpu.bin.prepare_dataset \
    --tsv-path $train_tsv --prefix custom --subset train \
    --output-dir $data_dir
  python -m zipvoice_tpu.bin.prepare_dataset \
    --tsv-path $dev_tsv --prefix custom --subset dev \
    --output-dir $data_dir
fi

if [ $stage -le 1 ] && [ $stop_stage -ge 1 ]; then
  echo "Stage 1: offline tokenization (optional; training tokenizes lazily)"
  python -m zipvoice_tpu.bin.prepare_tokens \
    --manifest $data_dir/custom_train.tsv \
    --output $data_dir/custom_train_tokens.tsv --tokenizer emilia
  python -m zipvoice_tpu.bin.prepare_tokens \
    --manifest $data_dir/custom_dev.tsv \
    --output $data_dir/custom_dev_tokens.tsv --tokenizer emilia
fi

if [ $stage -le 2 ] && [ $stop_stage -ge 2 ]; then
  echo "Stage 2: train (fbank computed on device; no precompute stage)"
  # the *_tokens.tsv manifests carry the offline tokens (stage 1), so
  # training skips G2P; swap to custom_{train,dev}.tsv to tokenize lazily
  python -m zipvoice_tpu.bin.train_zipvoice \
    --train-manifest $data_dir/custom_train_tokens.tsv \
    --dev-manifest $data_dir/custom_dev_tokens.tsv \
    --token-file $tokens --tokenizer emilia \
    --model-config $config --exp-dir $exp_dir \
    --num-epochs $num_epochs --max-duration 250 \
    --base-lr 0.02 --lr-hours 30000
fi

if [ $stage -le 3 ] && [ $stop_stage -ge 3 ]; then
  echo "Stage 3: average checkpoints (epoch-11-avg-4 recipe)"
  python -m zipvoice_tpu.bin.generate_averaged_model \
    --exp-dir $exp_dir --epoch $num_epochs --avg 4 \
    --out $exp_dir/model.pt
fi

if [ $stage -le 4 ] && [ $stop_stage -ge 4 ]; then
  echo "Stage 4: export compiled programs (stablehlo)"
  python -m zipvoice_tpu.bin.export_model \
    --model-dir $exp_dir --out-dir $exp_dir/export
fi

if [ $stage -le 5 ] && [ $stop_stage -ge 5 ]; then
  echo "Stage 5: inference on the test list"
  python -m zipvoice_tpu.bin.infer_zipvoice \
    --model-name zipvoice --model-dir $exp_dir \
    --test-list $data_dir/test.tsv --res-dir results/zipvoice
fi

if [ $stage -le 6 ] && [ $stop_stage -ge 6 ]; then
  echo "Stage 6: evaluation (mel parity + WER + SIM + UTMOS)"
  python -m zipvoice_tpu.eval.parity --model-dir $exp_dir
  python -m zipvoice_tpu.eval.wer --wav-dir results/zipvoice \
    --test-list $data_dir/test.tsv --model hubert --out results/wer.tsv
  python -m zipvoice_tpu.eval.sim --wav-dir results/zipvoice \
    --test-list $data_dir/test.tsv --out results/sim.tsv
  python -m zipvoice_tpu.eval.mos --wav-dir results/zipvoice \
    --out results/utmos.tsv
fi
