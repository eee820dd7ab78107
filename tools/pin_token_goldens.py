"""Regenerate tests/fixtures/token_goldens.json from the current tokenizers.

Pins golden token STRINGS for eval/golden.py's sentence battery (emilia +
dialog).  EN entries are produced by whatever G2P backend is active
(piper > espeak-ng binary > the vendored offline fallback, see
text/tokenizer.active_g2p_backend); the backend used is recorded per
tokenizer in the fixture's ``_provenance`` block so the golden report can
distinguish engine-pinned goldens from fallback-pinned ones.

Previously-pinned entries are REGENERATED AND COMPARED: a mismatch aborts
unless --repin is passed (a silent re-pin would mask a tokenizer
regression as a fixture update).

Usage: python tools/pin_token_goldens.py [--repin] [--dry-run]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

FIXTURE = REPO / "tests" / "fixtures" / "token_goldens.json"

DOC = (
    "Golden token STRINGS for eval/golden.py's sentence battery, keyed by "
    "tokenizer name then input text.  Strings (not ids) so they stay valid "
    "without the released tokens.txt: the id mapping is a dict lookup; the "
    "logic under test is segmentation / pinyin split / punctuation mapping "
    "(ref tokenizer.py:234-296).  ZH / <pinyin> / [tag] / punctuation "
    "entries were pinned offline with jieba + the vendored tone3 table; EN "
    "entries are pinned from the G2P backend recorded in _provenance "
    "(offline-fallback = text/en_g2p.py, NOT the espeak engine — re-pin "
    "with tools/pin_token_goldens.py --repin when a real espeak backend "
    "becomes available)."
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repin", action="store_true",
                    help="allow changing previously-pinned entries")
    ap.add_argument("--dry-run", action="store_true")
    args = ap.parse_args()

    from zipvoice_tpu.eval.golden import DIALOG_BATTERY, SENTENCE_BATTERY
    from zipvoice_tpu.text.tokenizer import (
        active_g2p_backend,
        get_tokenizer,
        write_token_file,
    )

    old = json.loads(FIXTURE.read_text()) if FIXTURE.exists() else {}

    with tempfile.TemporaryDirectory() as td:
        tokens = {"_": 0, " ": 1}
        for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz"):
            tokens[ch] = i + 2
        tokens["[S1]"] = 28
        tokens["[S2]"] = 29
        token_file = str(Path(td) / "tokens.txt")
        write_token_file(tokens, token_file)

        fixture = {"_doc": DOC, "_provenance": {}}
        mismatches = []
        for tok_name, battery in (
            ("emilia", SENTENCE_BATTERY),
            ("dialog", SENTENCE_BATTERY + DIALOG_BATTERY),
        ):
            entries = {}
            tok_cache = {}
            for item in battery:
                tok = tok_cache.get(item["lang"])
                if tok is None:
                    tok = tok_cache[item["lang"]] = get_tokenizer(
                        tok_name, token_file, lang=item["lang"]
                    )
                toks = tok.texts_to_tokens([item["text"]])[0]
                assert toks, f"empty tokenization for {item['text']!r}"
                prev = old.get(tok_name, {}).get(item["text"])
                if prev is not None and list(prev) != list(toks):
                    mismatches.append((tok_name, item["text"], prev, toks))
                entries[item["text"]] = toks
            fixture[tok_name] = entries
            fixture["_provenance"][tok_name] = {
                "en_g2p_backend": active_g2p_backend("en-us"),
            }

    if mismatches and not args.repin:
        for tok_name, text, prev, now in mismatches:
            print(f"MISMATCH [{tok_name}] {text!r}:\n  pinned: {prev}\n"
                  f"  now:    {now}")
        print("refusing to overwrite pinned goldens without --repin")
        return 1

    out = json.dumps(fixture, ensure_ascii=False, indent=1)
    if args.dry_run:
        print(out)
        return 0
    FIXTURE.write_text(out + "\n")
    n = sum(len(v) for k, v in fixture.items() if not k.startswith("_"))
    print(f"pinned {n} entries -> {FIXTURE}")
    print(f"provenance: {fixture['_provenance']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
