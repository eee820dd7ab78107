#!/usr/bin/env bash
# Dialog evaluation — cpSIM + WER/cpWER on the test-dialog sets
# (TPU rebuild of ref egs/zipvoice_dialog/run_eval.sh; same scorer stacks
# via zipvoice_tpu.eval.{cpsim,wer}).
set -euo pipefail

stage=${1:-1}
stop_stage=${2:-5}

download_dir=download

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: download the dialog test sets"
  huggingface-cli download --repo-type dataset \
    --local-dir ${download_dir} k2-fsa/TTS_eval_datasets dialog_testset.tar.gz
  tar -xzf ${download_dir}/dialog_testset.tar.gz -C ${download_dir}
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: download the evaluation models"
  mkdir -p ${download_dir}/tts_eval_models
  huggingface-cli download --local-dir ${download_dir}/tts_eval_models \
    k2-fsa/TTS_eval_models
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: inference on the dialog test sets"
  for testset in test_dialog_en test_dialog_zh; do
    case ${testset} in
      test_dialog_en) test_tsv=${download_dir}/dialog_testset/en/test.tsv ;;
      test_dialog_zh) test_tsv=${download_dir}/dialog_testset/zh/test.tsv ;;
    esac
    python -m zipvoice_tpu.bin.infer_zipvoice_dialog \
      --model-name zipvoice_dialog \
      --model-dir ${MODEL_DIR:-download/zipvoice_dialog} \
      --test-list ${test_tsv} \
      --res-dir results/${testset}
  done
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: evaluation on test-dialog-en (cpSIM, WhisperD WER + cpWER)"
  model_path=${download_dir}/tts_eval_models
  wav_dir=results/test_dialog_en
  test_tsv=${download_dir}/dialog_testset/en/test.tsv

  python -m zipvoice_tpu.eval.cpsim --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --prompt-mode split --model-dir ${model_path}
  python -m zipvoice_tpu.eval.wer --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --model whisperd --lang en --model-dir ${model_path}
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "Stage 5: evaluation on test-dialog-zh"
  model_path=${download_dir}/tts_eval_models
  wav_dir=results/test_dialog_zh
  test_tsv=${download_dir}/dialog_testset/zh/test.tsv

  python -m zipvoice_tpu.eval.cpsim --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --prompt-mode split --model-dir ${model_path}
  python -m zipvoice_tpu.eval.wer --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --model whisperd --lang zh --model-dir ${model_path}
fi
