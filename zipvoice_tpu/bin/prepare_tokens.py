"""Offline tokenization — parity with `zipvoice.bin.prepare_tokens`.

Tokenizes manifest texts ahead of training (the collator otherwise
tokenizes lazily) and writes a TSV with a trailing tokens column of
space-separated token strings (ref bin/prepare_tokens.py:56-79 attaches
tokens to lhotse cuts; here they append to the TSV row).
"""

from __future__ import annotations

import argparse
import logging


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default="emilia",
                   choices=["emilia", "espeak", "dialog", "libritts", "simple"])
    p.add_argument("--lang", type=str, default="en-us")
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.data.dataset import read_tsv_manifest
    from zipvoice_tpu.text.tokenizer import get_tokenizer

    from zipvoice_tpu.data.dataset import probe_duration

    tokenizer = get_tokenizer(args.tokenizer, token_file=None, lang=args.lang)
    utts = read_tsv_manifest(args.manifest)
    tokens = tokenizer.texts_to_tokens([u.text for u in utts])
    # 6-column output round-trips through read_tsv_manifest: the training
    # collator consumes the trailing token column via Utterance.token_strs
    # (string->id is a dict lookup; the expensive G2P ran here)
    with open(args.output, "w", encoding="utf-8") as f:
        for u, toks in zip(utts, tokens):
            if u.duration is None:
                probe_duration(u)
            f.write(
                f"{u.uid}\t{u.text}\t{u.wav_path}\t{u.start}\t"
                f"{u.start + u.duration}\t{' '.join(toks)}\n"
            )
    logging.info("wrote %s (%d utterances)", args.output, len(utts))


if __name__ == "__main__":
    main()
