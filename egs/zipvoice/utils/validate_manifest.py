#!/usr/bin/env python3
"""Validate a TSV manifest before training.

TPU-rebuild equivalent of ref egs/zipvoice/utils/validate_manifest.py
(which checks one-supervision-per-cut on lhotse cuts): checks the rebuild's
TSV manifest contract (id\ttext\twav_path[\tstart\tend]):

* unique, non-empty ids;
* non-empty text;
* wav files exist (optional --check-files to stat each one);
* start/end sane when present (0 <= start < end);
* 4/6-column manifests (trailing offline-tokens column from
  bin/prepare_tokens) accepted.

Usage:  python utils/validate_manifest.py data/raw/train.tsv [--check-files]
"""

import argparse
import sys
from pathlib import Path


def validate(path: str, check_files: bool = False) -> int:
    errors = 0
    seen = set()
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line:
                continue
            parts = line.split("\t")
            if len(parts) not in (3, 4, 5, 6):
                print(f"{path}:{ln}: expected 3-6 columns, got {len(parts)}")
                errors += 1
                continue
            uid, text, wav = parts[0], parts[1], parts[2]
            if not uid:
                print(f"{path}:{ln}: empty id")
                errors += 1
            if uid in seen:
                print(f"{path}:{ln}: duplicate id {uid!r}")
                errors += 1
            seen.add(uid)
            if not text.strip():
                print(f"{path}:{ln}: empty text for {uid!r}")
                errors += 1
            if check_files and not Path(wav).is_file():
                print(f"{path}:{ln}: missing wav {wav!r}")
                errors += 1
            if len(parts) in (5, 6):
                try:
                    start, end = float(parts[3]), float(parts[4])
                    if not (0 <= start < end):
                        raise ValueError
                except ValueError:
                    print(f"{path}:{ln}: bad start/end {parts[3:5]}")
                    errors += 1
    print(f"{path}: {len(seen)} rows, {errors} errors")
    return errors


def main():
    p = argparse.ArgumentParser()
    p.add_argument("manifests", nargs="+")
    p.add_argument("--check-files", action="store_true")
    args = p.parse_args()
    total = sum(validate(m, args.check_files) for m in args.manifests)
    sys.exit(1 if total else 0)


if __name__ == "__main__":
    main()
