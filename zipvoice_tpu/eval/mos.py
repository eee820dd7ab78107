"""Naturalness (MOS) evaluation — ref zipvoice/eval/mos/utmos.py.

The scorer is the vendored UTMOS22-strong definition
(eval/models/utmos.py — same architecture/checkpoint tree as the
reference's eval/models/utmos.py).  Weights load from a local state-dict
file (--checkpoint) or from the SpeechMOS release URL (network needed).

Usage:
  python -m zipvoice_tpu.eval.mos --wav-dir results [--checkpoint utmos.pt]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def load_utmos(checkpoint: str = None):
    """Load the vendored UTMOS22-strong MOS predictor."""
    from zipvoice_tpu.eval.models.utmos import load_utmos22_strong

    try:
        return load_utmos22_strong(checkpoint)
    except Exception as ex:  # noqa: BLE001
        raise RuntimeError(
            f"UTMOS predictor unavailable ({ex}); pass --checkpoint with a "
            "local utmos22_strong state dict or run with network access"
        ) from ex


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="local utmos22_strong.pt state dict")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import torch

    from zipvoice_tpu.audio.wav import read_wav, resample

    predictor = load_utmos(args.checkpoint)
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
