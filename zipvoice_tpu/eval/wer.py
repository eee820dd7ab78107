"""WER evaluation with pretrained ASR (ref zipvoice/eval/wer/).

Transcribes generated wavs with an HF ASR model and scores WER (or cpWER for
dialog) against the reference transcripts.  Model weights download from HF
at first use — in offline environments only the pure-math metrics
(eval/metrics.py) are exercised.

Usage:
  python -m zipvoice_tpu.eval.wer --wav-dir results --test-list test.tsv \
      --model hubert  # hubert | whisper | whisperd (dialog cpWER)
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

ASR_MODELS = {
    # ref eval/wer/hubert.py (LibriSpeech protocol)
    "hubert": "facebook/hubert-large-ls960-ft",
    # ref eval/wer/seedtts.py (Seed-TTS protocol, EN)
    "whisper": "openai/whisper-large-v3",
    # ref eval/wer/dialog.py (dialog cpWER)
    "whisperd": "openai/whisper-large-v3",
}


def load_asr(model_key: str):
    from transformers import pipeline  # downloads weights on first use

    return pipeline(
        "automatic-speech-recognition", model=ASR_MODELS[model_key],
        chunk_length_s=30,
    )


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", type=str, required=True)
    p.add_argument("--test-list", type=str, required=True,
                   help="TSV: name\\t...\\ttext (text = last column)")
    p.add_argument("--model", type=str, default="hubert",
                   choices=list(ASR_MODELS))
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.audio.wav import read_wav, resample
    from zipvoice_tpu.eval.metrics import corpus_wer, cp_wer, wer

    asr = load_asr(args.model)
    dialog = args.model == "whisperd"

    pairs = []
    with open(args.test_list, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            items = line.rstrip("\n").split("\t")
            name, text = items[0], items[-1]
            wav_path = Path(args.wav_dir) / f"{name}.wav"
            if not wav_path.exists():
                logging.warning("missing %s", wav_path)
                continue
            wav, sr = read_wav(wav_path)
            wav = resample(wav.mean(axis=0), sr, 16000)
            hyp = asr({"array": np.asarray(wav), "sampling_rate": 16000})["text"]
            pairs.append((name, text, hyp))

    if dialog:
        scores = [cp_wer(ref, hyp) for _, ref, hyp in pairs]
        overall = float(np.mean(scores)) if scores else float("nan")
        metric = "cpWER"
    else:
        overall = corpus_wer([(ref, hyp) for _, ref, hyp in pairs])
        metric = "WER"

    logging.info("%s over %d utts: %.4f", metric, len(pairs), overall)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(f"{metric}\t{overall:.6f}\n")
            for name, ref, hyp in pairs:
                s = cp_wer(ref, hyp) if dialog else wer(ref, hyp)[0]
                f.write(f"{name}\t{s:.4f}\t{ref}\t{hyp}\n")


if __name__ == "__main__":
    main()
