#!/usr/bin/env bash
# Paper-metric evaluation — SIM-o / WER / UTMOS on LibriSpeech-PC and
# Seed-TTS test sets (TPU rebuild of ref egs/zipvoice/run_eval.sh; same
# test sets, same scorer stacks via zipvoice_tpu.eval.*).
set -euo pipefail

stage=${1:-1}
stop_stage=${2:-6}

download_dir=download

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: download test sets (LibriSpeech-PC and Seed-TTS)"
  hf_repo=k2-fsa/TTS_eval_datasets
  mkdir -p ${download_dir}
  for file in librispeech_pc_testset.tar.gz seedtts_testset.tar.gz; do
    huggingface-cli download --repo-type dataset \
      --local-dir ${download_dir} ${hf_repo} ${file}
    tar -xzf ${download_dir}/${file} -C ${download_dir}
  done
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: download the evaluation models (k2-fsa/TTS_eval_models)"
  mkdir -p ${download_dir}/tts_eval_models
  huggingface-cli download --local-dir ${download_dir}/tts_eval_models \
    k2-fsa/TTS_eval_models
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: inference on the three test sets"
  for testset in librispeech_pc seedtts_en seedtts_zh; do
    case ${testset} in
      librispeech_pc) test_tsv=${download_dir}/librispeech_pc_testset/test.tsv ;;
      seedtts_en)     test_tsv=${download_dir}/seedtts_testset/en/test.tsv ;;
      seedtts_zh)     test_tsv=${download_dir}/seedtts_testset/zh/test.tsv ;;
    esac
    python -m zipvoice_tpu.bin.infer_zipvoice \
      --model-name zipvoice --model-dir ${MODEL_DIR:-download/zipvoice} \
      --tokenizer emilia \
      --test-list ${test_tsv} \
      --res-dir results/${testset}
  done
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: evaluation on LibriSpeech-PC (SIM-o, hubert WER, UTMOS)"
  model_path=${download_dir}/tts_eval_models
  wav_dir=results/librispeech_pc
  test_tsv=${download_dir}/librispeech_pc_testset/test.tsv
  transcript_tsv=${download_dir}/librispeech_pc_testset/transcript.tsv

  python -m zipvoice_tpu.eval.sim --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --model-dir ${model_path}
  python -m zipvoice_tpu.eval.wer --wav-dir ${wav_dir} \
    --test-list ${transcript_tsv} --model hubert --model-dir ${model_path}
  python -m zipvoice_tpu.eval.mos --wav-dir ${wav_dir} \
    --checkpoint ${model_path}/mos/utmos22_strong.pt
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "Stage 5: evaluation on Seed-TTS test-en (SIM-o, whisper WER, UTMOS)"
  model_path=${download_dir}/tts_eval_models
  wav_dir=results/seedtts_en
  test_tsv=${download_dir}/seedtts_testset/en/test.tsv

  python -m zipvoice_tpu.eval.sim --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --model-dir ${model_path}
  python -m zipvoice_tpu.eval.wer --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --model whisper --lang en --model-dir ${model_path}
  python -m zipvoice_tpu.eval.mos --wav-dir ${wav_dir} \
    --checkpoint ${model_path}/mos/utmos22_strong.pt
fi

if [ ${stage} -le 6 ] && [ ${stop_stage} -ge 6 ]; then
  echo "Stage 6: evaluation on Seed-TTS test-zh (SIM-o, paraformer WER, UTMOS)"
  model_path=${download_dir}/tts_eval_models
  wav_dir=results/seedtts_zh
  test_tsv=${download_dir}/seedtts_testset/zh/test.tsv

  python -m zipvoice_tpu.eval.sim --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --model-dir ${model_path}
  python -m zipvoice_tpu.eval.wer --wav-dir ${wav_dir} \
    --test-list ${test_tsv} --model paraformer --lang zh --model-dir ${model_path}
  python -m zipvoice_tpu.eval.mos --wav-dir ${wav_dir} \
    --checkpoint ${model_path}/mos/utmos22_strong.pt
fi
