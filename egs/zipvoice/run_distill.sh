#!/usr/bin/env bash
# ZipVoice-Distill recipe (ref egs/zipvoice/run_emilia.sh:59-105):
# stage 1: 60k iters @ 5e-4 from the averaged base model;
# stage 2: 2k iters @ 1e-4 with EMA teacher; average 7 / 2 checkpoints.
set -euo pipefail

data_dir=data
base=exp/zipvoice
exp1=exp/zipvoice_distill_s1
exp2=exp/zipvoice_distill
tokens=$data_dir/tokens.txt
config=conf/zipvoice_base.json

python -m zipvoice_tpu.bin.train_zipvoice_distill \
  --distill-stage first --teacher-checkpoint $base/model.pt \
  --train-manifest $data_dir/custom_train.tsv --token-file $tokens \
  --model-config $config --exp-dir $exp1 \
  --base-lr 5e-4 --num-iters 60000 --max-duration 250

python -m zipvoice_tpu.bin.generate_averaged_model \
  --exp-dir $exp1 --iter 60000 --avg 7 --out $exp1/model.pt

python -m zipvoice_tpu.bin.train_zipvoice_distill \
  --distill-stage second --teacher-checkpoint $exp1/model.pt \
  --train-manifest $data_dir/custom_train.tsv --token-file $tokens \
  --model-config $config --exp-dir $exp2 \
  --base-lr 1e-4 --num-iters 2000 --max-duration 250

python -m zipvoice_tpu.bin.generate_averaged_model \
  --exp-dir $exp2 --iter 2000 --avg 2 --out $exp2/model.pt
