"""Naturalness (MOS) evaluation — ref zipvoice/eval/mos/utmos.py.

The reference vendors UTMOS22-strong (wav2vec2 + BLSTM MOS predictor,
ref eval/models/utmos.py).  Here the scorer is pluggable: by default the
published UTMOS strong checkpoint is fetched from HF (sarulab-speech);
offline, this module only validates inputs and reports that the scorer is
unavailable.

Usage:
  python -m zipvoice_tpu.eval.mos --wav-dir results [--out utmos.tsv]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

UTMOS_REPO = "sarulab-speech/UTMOS22"  # strong learner checkpoint


def load_utmos():
    """Load a UTMOS-style MOS predictor.  Requires network/cached weights."""
    try:
        import torch

        predictor = torch.hub.load(
            "tarepan/SpeechMOS:v1.2.0", "utmos22_strong", trust_repo=True
        )
        predictor.eval()
        return predictor
    except Exception as ex:  # noqa: BLE001
        raise RuntimeError(
            f"UTMOS predictor unavailable ({ex}); run with network access or "
            "a pre-populated torch hub cache"
        ) from ex


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", type=str, required=True)
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import torch

    from zipvoice_tpu.audio.wav import read_wav, resample

    predictor = load_utmos()
    scores = []
    rows = []
    for wav_path in sorted(Path(args.wav_dir).glob("*.wav")):
        wav, sr = read_wav(wav_path)
        wav16 = resample(wav.mean(axis=0, keepdims=True), sr, 16000)
        with torch.no_grad():
            score = float(
                predictor(torch.from_numpy(wav16), 16000).squeeze().item()
            )
        scores.append(score)
        rows.append((wav_path.stem, score))

    overall = float(np.mean(scores)) if scores else float("nan")
    logging.info("UTMOS over %d utts: %.3f", len(scores), overall)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(f"UTMOS\t{overall:.4f}\n")
            for name, s in rows:
                f.write(f"{name}\t{s:.3f}\n")


if __name__ == "__main__":
    main()
