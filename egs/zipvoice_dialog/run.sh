#!/usr/bin/env bash
# ZipVoice-Dialog recipe (ref egs/zipvoice_dialog/run.sh): finetune the base
# model on two-party dialog data, then the stereo variant from the dialog one.
set -euo pipefail

data_dir=data
base=exp/zipvoice
exp=exp/zipvoice_dialog
exp_stereo=exp/zipvoice_dialog_stereo
tokens=$data_dir/tokens_dialog.txt   # base vocab + 28 dialog tokens incl [S1]/[S2]
config=conf/zipvoice_base.json

python -m zipvoice_tpu.bin.train_zipvoice_dialog \
  --train-manifest $data_dir/dialog_train.tsv --token-file $tokens \
  --model-config $config --exp-dir $exp \
  --checkpoint $base/model.pt --base-lr 1e-4 --max-duration 250

python -m zipvoice_tpu.bin.generate_averaged_model \
  --exp-dir $exp --epoch 11 --avg 4 --out $exp/model.pt

python -m zipvoice_tpu.bin.train_zipvoice_dialog_stereo \
  --train-manifest $data_dir/dialog_stereo_train.tsv --token-file $tokens \
  --model-config $config --exp-dir $exp_stereo \
  --checkpoint $exp/model.pt --base-lr 1e-4 --max-duration 250

python -m zipvoice_tpu.bin.generate_averaged_model \
  --exp-dir $exp_stereo --epoch 11 --avg 4 --out $exp_stereo/model.pt

# dialog inference + cpWER/cpSIM evaluation
python -m zipvoice_tpu.bin.infer_zipvoice_dialog \
  --model-name zipvoice_dialog --model-dir $exp \
  --test-list $data_dir/test_dialog.tsv --res-dir results/dialog
python -m zipvoice_tpu.eval.wer --wav-dir results/dialog \
  --test-list $data_dir/test_dialog.tsv --model whisperd --out results/cpwer.tsv
