#!/usr/bin/env bash
# ZipVoice on Emilia — the published-checkpoint recipe
# (TPU rebuild of ref egs/zipvoice/run_emilia.sh; same stage layout and
# hyperparameters; multi-chip scaling comes from the TPU mesh instead of
# --world-size, so throughput knobs are --max-duration and the pod slice).
set -euo pipefail

stage=${1:-1}
stop_stage=${2:-12}

data_dir=data
num_epochs=11

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: data preparation for Emilia"
  # Emilia metadata JSONL -> filtered TSV (ref preprocess_emilia.py rules)
  python local/prepare_emilia.py \
    --jsonl "$data_dir/raw/emilia/*.jsonl" --wav-root $data_dir/raw/emilia \
    --output $data_dir/raw/emilia_train.tsv
  python utils/validate_manifest.py $data_dir/raw/emilia_train.tsv
  # released-model token inventory (espeak id block + pinyin, ref
  # local/prepare_token_file_emilia.py) — reproduced offline.
  # local/pinyin.txt is the upstream valid-syllable list (ships with the
  # reference recipe / k2-fsa/ZipVoice assets).
  python -m zipvoice_tpu.bin.make_tokens \
    --emilia-pinyin local/pinyin.txt --output $data_dir/tokens_emilia.txt
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: train the ZipVoice model (ref run_emilia.sh:31-44)"
  python -m zipvoice_tpu.bin.train_zipvoice \
    --num-epochs ${num_epochs} \
    --max-duration 500 \
    --lr-hours 30000 \
    --model-config conf/zipvoice_base.json \
    --tokenizer emilia \
    --token-file $data_dir/tokens_emilia.txt \
    --train-manifest $data_dir/raw/emilia_train.tsv \
    --dtype bfloat16 \
    --exp-dir exp/zipvoice
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: average the ZipVoice checkpoints (epoch-11-avg-4)"
  python -m zipvoice_tpu.bin.generate_averaged_model \
    --epoch ${num_epochs} --avg 4 --exp-dir exp/zipvoice
  # -> exp/zipvoice/epoch-11-avg-4.pt
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: train ZipVoice-Distill (first stage, 60k iters @ 5e-4)"
  python -m zipvoice_tpu.bin.train_zipvoice_distill \
    --num-iters 60000 \
    --max-duration 500 \
    --base-lr 0.0005 \
    --model-config conf/zipvoice_base.json \
    --tokenizer emilia \
    --token-file $data_dir/tokens_emilia.txt \
    --train-manifest $data_dir/raw/emilia_train.tsv \
    --teacher-checkpoint exp/zipvoice/epoch-11-avg-4.pt \
    --distill-stage first \
    --dtype bfloat16 \
    --exp-dir exp/zipvoice_distill_1stage
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "Stage 5: average ZipVoice-Distill stage-1 (iter-60000-avg-7)"
  python -m zipvoice_tpu.bin.generate_averaged_model \
    --iter 60000 --avg 7 --exp-dir exp/zipvoice_distill_1stage
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "Stage 6: train ZipVoice-Distill (second stage, EMA teacher)"
  python -m zipvoice_tpu.bin.train_zipvoice_distill \
    --num-iters 2000 \
    --save-every-n 1000 \
    --max-duration 500 \
    --base-lr 0.0001 \
    --model-config conf/zipvoice_base.json \
    --tokenizer emilia \
    --token-file $data_dir/tokens_emilia.txt \
    --train-manifest $data_dir/raw/emilia_train.tsv \
    --teacher-checkpoint exp/zipvoice_distill_1stage/iter-60000-avg-7.pt \
    --distill-stage second \
    --dtype bfloat16 \
    --exp-dir exp/zipvoice_distill
fi

if [ ${stage} -le 7 ] && [ ${stop_stage} -ge 7 ]; then
  echo "Stage 7: export compiled ZipVoice programs (StableHLO; the ONNX
  counterpart is ref run_emilia.sh:110-117)"
  python -m zipvoice_tpu.bin.export_model \
    --model-dir exp/zipvoice --checkpoint-name epoch-11-avg-4.pt \
    --out-dir exp/zipvoice/export
fi

if [ ${stage} -le 8 ] && [ ${stop_stage} -ge 8 ]; then
  echo "Stage 8: export compiled ZipVoice-Distill programs"
  python -m zipvoice_tpu.bin.export_model \
    --model-dir exp/zipvoice_distill --checkpoint-name checkpoint-2000.pt \
    --out-dir exp/zipvoice_distill/export
fi

if [ ${stage} -le 9 ] && [ ${stop_stage} -ge 9 ]; then
  echo "Stage 9: inference with ZipVoice"
  python -m zipvoice_tpu.bin.infer_zipvoice \
    --model-name zipvoice \
    --model-dir exp/zipvoice --checkpoint-name epoch-11-avg-4.pt \
    --tokenizer emilia \
    --test-list test.tsv \
    --res-dir results/test \
    --num-step 16 --guidance-scale 1
fi

if [ ${stage} -le 10 ] && [ ${stop_stage} -ge 10 ]; then
  echo "Stage 10: inference with ZipVoice-Distill"
  python -m zipvoice_tpu.bin.infer_zipvoice \
    --model-name zipvoice_distill \
    --model-dir exp/zipvoice_distill --checkpoint-name checkpoint-2000.pt \
    --tokenizer emilia \
    --test-list test.tsv \
    --res-dir results/test_distill \
    --num-step 8 --guidance-scale 3
fi

if [ ${stage} -le 11 ] && [ ${stop_stage} -ge 11 ]; then
  echo "Stage 11: inference with the exported ZipVoice programs"
  python -m zipvoice_tpu.bin.infer_exported \
    --export-dir exp/zipvoice/export --model-dir exp/zipvoice \
    --tokenizer emilia --mode fused \
    --prompt-wav prompt.wav --prompt-text "$(cat prompt.txt)" \
    --text "I am the exported ZipVoice program." \
    --res-wav-path results/test_exported.wav
fi

if [ ${stage} -le 12 ] && [ ${stop_stage} -ge 12 ]; then
  echo "Stage 12: inference with the exported ZipVoice-Distill programs"
  python -m zipvoice_tpu.bin.infer_exported \
    --export-dir exp/zipvoice_distill/export --model-dir exp/zipvoice_distill \
    --tokenizer emilia --mode fused \
    --prompt-wav prompt.wav --prompt-text "$(cat prompt.txt)" \
    --text "I am the exported ZipVoice Distill program." \
    --res-wav-path results/test_distill_exported.wav
fi
