"""Build a tokens.txt vocabulary from a corpus.

The reference ships tokens.txt with its released models; for training from
scratch on new data this tool derives one: tokenize every manifest text with
the chosen tokenizer, collect the token inventory, and write
'{token}\\t{id}' lines with '_' (pad) at id 0 (the tokens.txt contract,
ref tokenizer.py:82-90).  Dialog mode reserves [S1]/[S2].

Two modes:

* corpus mode (--manifest): derive the inventory from data;
* emilia mode (--emilia-pinyin <pinyin list>): reproduce the released
  models' tokens.txt construction (ref egs/zipvoice/local/
  prepare_token_file_emilia.py): the piper espeak phoneme-id block
  verbatim (text/espeak_map.py), then pinyin initials ('+0') and tone3
  finals from the valid-pinyin list, sorted, appended after the espeak ids.

Usage:
  python -m zipvoice_tpu.bin.make_tokens --manifest train.tsv \
      --tokenizer simple --output tokens.txt
  python -m zipvoice_tpu.bin.make_tokens --emilia-pinyin pinyin.txt \
      --output tokens_emilia.txt
"""

from __future__ import annotations

import argparse
import logging
from collections import Counter


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", type=str, default=None, action="append",
                   help="TSV manifest(s); repeatable")
    p.add_argument("--emilia-pinyin", type=str, default=None,
                   help="valid-pinyin list (one syllable per line) -> "
                        "reproduce the released emilia tokens.txt layout")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default="simple",
                   choices=["emilia", "espeak", "dialog", "libritts", "simple"])
    p.add_argument("--lang", type=str, default="en-us")
    p.add_argument("--min-count", type=int, default=1,
                   help="drop tokens rarer than this")
    return p


def build_emilia_tokens(pinyin_path: str):
    """espeak-map block + sorted pinyin initial/final tokens (ref
    prepare_token_file_emilia.py:53-82)."""
    from zipvoice_tpu.text.espeak_map import get_espeak_map
    from zipvoice_tpu.text.tokenizer import split_pinyin

    token2id = dict(get_espeak_map())
    phones = set()
    with open(pinyin_path, encoding="utf-8") as f:
        for line in f:
            syl = line.strip()
            if not syl:
                continue
            # bare syllable = neutral tone (neutral_tone_with_five -> '5')
            if syl[-1] not in "12345":
                syl = syl + "5"
            phones.update(split_pinyin(syl))
    base = len(token2id)
    for i, ph in enumerate(sorted(phones)):
        assert ph not in token2id, ph
        token2id[ph] = base + i
    return token2id


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.data.dataset import read_tsv_manifest
    from zipvoice_tpu.text.tokenizer import get_tokenizer, write_token_file

    if args.emilia_pinyin:
        token2id = build_emilia_tokens(args.emilia_pinyin)
        write_token_file(token2id, args.output)
        logging.info("wrote %s (%d tokens, emilia layout)", args.output,
                     len(token2id))
        return
    assert args.manifest, "--manifest or --emilia-pinyin required"

    tokenizer = get_tokenizer(args.tokenizer, token_file=None, lang=args.lang)
    counts: Counter = Counter()
    for manifest in args.manifest:
        utts = read_tsv_manifest(manifest)
        for toks in tokenizer.texts_to_tokens([u.text for u in utts]):
            counts.update(toks)

    vocab = ["_"]  # pad at id 0
    if args.tokenizer == "dialog":
        vocab += ["[S1]", "[S2]"]
    for tok, c in sorted(counts.items()):
        if c >= args.min_count and tok not in vocab:
            vocab.append(tok)

    write_token_file({t: i for i, t in enumerate(vocab)}, args.output)
    logging.info("wrote %s (%d tokens)", args.output, len(vocab))


if __name__ == "__main__":
    main()
