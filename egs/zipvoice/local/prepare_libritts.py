#!/usr/bin/env python3
"""Prepare TSV manifests from a LibriTTS-style directory tree.

TPU-rebuild equivalent of ref egs/zipvoice/local/prepare_libritts.sh (which
drives `lhotse download/prepare libritts`): walks the extracted LibriTTS
corpus (``<root>/<subset>/<speaker>/<chapter>/*.wav`` with sibling
``*.normalized.txt`` / ``*.original.txt`` transcripts) and writes
``id\ttext\twav_path`` rows.

Usage:
  python local/prepare_libritts.py --corpus /data/LibriTTS \
      --subsets train-clean-100 train-clean-360 --output data/raw/libritts_train.tsv
"""

import argparse
from pathlib import Path


def transcript_for(wav: Path) -> str:
    for suffix in (".normalized.txt", ".original.txt", ".txt"):
        t = wav.parent / (wav.stem + suffix)
        if t.exists():
            return t.read_text(encoding="utf-8").strip()
    # fall back to the chapter .trans.tsv if present
    trans = wav.parent / f"{wav.parent.parent.name}_{wav.parent.name}.trans.tsv"
    if trans.exists():
        for line in trans.read_text(encoding="utf-8").splitlines():
            parts = line.split("\t")
            if len(parts) >= 3 and parts[0] == wav.stem:
                return parts[2].strip()
    return ""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--corpus", required=True, help="LibriTTS root directory")
    p.add_argument("--subsets", nargs="+",
                   default=["train-clean-100", "train-clean-360",
                            "train-other-500"])
    p.add_argument("--output", required=True)
    args = p.parse_args()

    root = Path(args.corpus)
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    n = skipped = 0
    with open(out, "w", encoding="utf-8") as fo:
        for subset in args.subsets:
            base = root / subset
            if not base.is_dir():
                raise SystemExit(f"missing subset dir: {base}")
            for wav in sorted(base.rglob("*.wav")):
                text = transcript_for(wav)
                if not text:
                    skipped += 1
                    continue
                fo.write(f"{wav.stem}\t{text}\t{wav}\n")
                n += 1
    print(f"wrote {n} rows ({skipped} without transcript) -> {out}")


if __name__ == "__main__":
    main()
