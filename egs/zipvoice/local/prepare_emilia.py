#!/usr/bin/env python3
"""Prepare TSV manifests from the raw Emilia dataset.

TPU-rebuild equivalent of ref egs/zipvoice/local/{prepare_emilia.sh,
preprocess_emilia.py}: instead of lhotse shar→cuts→filter, this reads the
Emilia metadata JSONL files directly (one object per utterance with at
least ``wav``/``text`` and optionally ``duration``/``language``/``dnsmos``)
and writes the rebuild's TSV manifest (``id\ttext\twav_path``) with the
same text-quality filters the reference applies
(ref preprocess_emilia.py:129-174):

* drop utterances containing Korean or Japanese characters;
* drop utterances with no Chinese/alphabet characters at all;
* drop texts where one token repeats 10x in a row (ASR hallucination);
* drop utterances whose speaking rate is outside 20-600 words/minute
  (when a duration field is present);
* optionally drop low-quality audio by DNSMOS (``--min-dnsmos``).

Usage:
  python local/prepare_emilia.py --jsonl EN/*.jsonl --wav-root /data/emilia \
      --output data/raw/emilia_train.tsv
"""

import argparse
import glob
import json
import logging
import re
import unicodedata
from pathlib import Path

CJK_SPLIT = re.compile(
    r"([ᄀ-ᇿ⺀-꓏ꡀ-힯豈-﫿"
    r"︰-﹏･-ￜ\U00020000-\U0002FFFF])"
)


def tokenize_by_cjk_char(text: str):
    chars = CJK_SPLIT.split(text.strip())
    return " ".join(w.strip() for w in chars if w.strip()).split()


def is_hangul(ch: str) -> bool:
    letters = unicodedata.normalize("NFD", ch)
    return all("ᄀ" <= c <= "ᇿ" or "ㄱ" <= c <= "ㆎ"
               for c in letters) and bool(letters)


def is_japanese(ch: str) -> bool:
    return any(s <= ch <= e for s, e in [
        ("ぁ", "ゖ"), ("゠", "ヿ"), ("｟", "ﾟ"),
        ("ㇰ", "ㇿ"), ("㈠", "㉃"), ("㊀", "㍿"),
    ])


def keep_text(text: str, duration=None) -> bool:
    """The reference's cut filter (ref preprocess_emilia.py:136-174)."""
    chinese, english, clean = [], [], []
    for x in text:
        if is_hangul(x):
            return False
        if is_japanese(x):
            return False
        if "一" <= x <= "龥":
            chinese.append(x)
            clean.append(x)
        elif x.isascii() and x.isalpha():
            english.append(x)
            clean.append(x)
        elif x == " ":
            clean.append(x)
    if not english and not chinese:
        return False
    words = tokenize_by_cjk_char("".join(clean))
    for i in range(len(words) - 9):
        if words[i:i + 10].count(words[i]) == 10:
            return False
    if duration is not None and words:
        if duration < len(words) / 600 * 60 or duration > len(words) / 20 * 60:
            return False
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--jsonl", nargs="+", required=True,
                   help="Emilia metadata JSONL file(s) or globs")
    p.add_argument("--wav-root", default="",
                   help="prefix joined to relative wav paths")
    p.add_argument("--output", required=True, help="output TSV manifest")
    p.add_argument("--min-dnsmos", type=float, default=None,
                   help="drop utterances below this DNSMOS (Emilia ships "
                        "3.0+ by default)")
    p.add_argument("--language", default=None,
                   help="keep only this language code (e.g. en / zh)")
    args = p.parse_args()

    files = []
    for pat in args.jsonl:
        files.extend(sorted(glob.glob(pat)) or [pat])
    kept = dropped = 0
    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w", encoding="utf-8") as fo:
        for path in files:
            with open(path, encoding="utf-8") as fr:
                for line in fr:
                    try:
                        item = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    text = (item.get("text") or "").strip()
                    wav = item.get("wav") or item.get("path") or ""
                    uid = item.get("id") or Path(wav).stem
                    dur = item.get("duration")
                    if args.language and (item.get("language") or
                                          item.get("lang")) != args.language:
                        continue
                    if args.min_dnsmos is not None and \
                            float(item.get("dnsmos", 99)) < args.min_dnsmos:
                        dropped += 1
                        continue
                    if not text or not wav or not keep_text(text, dur):
                        dropped += 1
                        continue
                    wav_path = str(Path(args.wav_root) / wav) if args.wav_root else wav
                    text = re.sub(r"\s+", " ", text.replace("_", " ")).strip()
                    fo.write(f"{uid}\t{text}\t{wav_path}\n")
                    kept += 1
    logging.info("%s: kept %d, dropped %d", out, kept, dropped)
    print(f"kept {kept}, dropped {dropped} -> {out}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
