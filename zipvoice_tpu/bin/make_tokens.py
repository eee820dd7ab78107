"""Build a tokens.txt vocabulary from a corpus.

The reference ships tokens.txt with its released models; for training from
scratch on new data this tool derives one: tokenize every manifest text with
the chosen tokenizer, collect the token inventory, and write
'{token}\\t{id}' lines with '_' (pad) at id 0 (the tokens.txt contract,
ref tokenizer.py:82-90).  Dialog mode reserves [S1]/[S2].

Usage:
  python -m zipvoice_tpu.bin.make_tokens --manifest train.tsv \
      --tokenizer simple --output tokens.txt
"""

from __future__ import annotations

import argparse
import logging
from collections import Counter


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", type=str, required=True, action="append",
                   help="TSV manifest(s); repeatable")
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default="simple",
                   choices=["emilia", "espeak", "dialog", "libritts", "simple"])
    p.add_argument("--lang", type=str, default="en-us")
    p.add_argument("--min-count", type=int, default=1,
                   help="drop tokens rarer than this")
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.data.dataset import read_tsv_manifest
    from zipvoice_tpu.text.tokenizer import get_tokenizer, write_token_file

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
