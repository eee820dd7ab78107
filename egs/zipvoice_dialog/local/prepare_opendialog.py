#!/usr/bin/env python3
"""Prepare TSV manifests from the raw OpenDialog dataset.

TPU-rebuild equivalent of ref egs/zipvoice_dialog/local/
prepare_opendialog.py (which builds lhotse Recording/Supervision sets):
reads the OpenDialog metadata JSONL (one object per conversation with
``id``/``text``/``path``, ref prepare_opendialog.py:155-166), applies the
same text cleanup (``_`` is the pad symbol -> space; collapse whitespace,
ref prepare_opendialog.py:121-122), and writes ``id\ttext\twav_path`` rows.

Download OpenDialog at https://huggingface.co/datasets/k2-fsa/OpenDialog;
after untarring, audio lives under audio/en and audio/zh with a JSONL per
language.

Usage:
  python local/prepare_opendialog.py --jsonl /data/OpenDialog/en.jsonl \
      --output data/raw/opendialog_en.tsv
"""

import argparse
import json
import re
from pathlib import Path


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--jsonl", nargs="+", required=True,
                   help="OpenDialog metadata JSONL file(s)")
    p.add_argument("--output", required=True)
    args = p.parse_args()

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    n = bad = 0
    with open(out, "w", encoding="utf-8") as fo:
        for jsonl in args.jsonl:
            jsonl = Path(jsonl)
            with open(jsonl, encoding="utf-8") as fr:
                for line in fr:
                    try:
                        item = json.loads(line)
                        uid, text, wav = item["id"], item["text"], item["path"]
                    except (json.JSONDecodeError, KeyError):
                        bad += 1
                        continue
                    text = re.sub(r"\s+", " ", text.replace("_", " ")).strip()
                    if not text or "[S1]" not in text:
                        bad += 1
                        continue
                    wav_path = jsonl.parent / wav
                    fo.write(f"{uid}\t{text}\t{wav_path}\n")
                    n += 1
    print(f"wrote {n} rows ({bad} skipped) -> {out}")


if __name__ == "__main__":
    main()
