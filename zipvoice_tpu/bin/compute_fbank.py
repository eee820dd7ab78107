"""Offline fbank extraction — parity with `zipvoice.bin.compute_fbank`.

The training pipeline computes fbank on device and does not need precompute,
but an offline store is still useful (repeated epochs over slow storage,
CPU-only prep boxes).  Features are written as sharded compressed .npz files
(id -> float16 (T, F) arrays) replacing lhotse's LilcomChunkyWriter
(ref bin/compute_fbank.py:211-263), plus a TSV indexing shard/key.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("--output-dir", type=str, required=True)
    p.add_argument("--prefix", type=str, default="custom")
    p.add_argument("--subset", type=str, default="train")
    p.add_argument("--type", type=str, default="vocos",
                   choices=["vocos", "bigvgan"])
    p.add_argument("--num-channels", type=int, default=1, choices=[1, 2])
    p.add_argument("--shard-size", type=int, default=1000,
                   help="utterances per .npz shard")
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.audio.mel import extract_features
    from zipvoice_tpu.audio.wav import read_wav, resample
    from zipvoice_tpu.config import FeatureConfig
    from zipvoice_tpu.data.dataset import read_tsv_manifest

    feat_cfg = FeatureConfig(type=args.type)
    utts = read_tsv_manifest(args.manifest)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    index_rows = []
    shard: dict = {}
    shard_idx = 0

    def flush():
        nonlocal shard, shard_idx
        if not shard:
            return
        path = out_dir / f"{args.prefix}_{args.subset}_feats_{shard_idx:05d}.npz"
        np.savez_compressed(path, **shard)
        logging.info("wrote %s (%d utts)", path, len(shard))
        shard = {}
        shard_idx += 1

    for u in utts:
        wav, sr = read_wav(u.wav_path)
        # 5-column segment manifests: featurize only [start, start+duration)
        # (the on-device collator slices the same way — dataset.load_audio)
        if u.duration is not None and (u.start or u.duration):
            a = int(u.start * sr)
            wav = wav[:, a : a + int(u.duration * sr)]
        if sr != feat_cfg.sampling_rate:
            wav = resample(wav, sr, feat_cfg.sampling_rate)
        feats = np.asarray(
            extract_features(wav, feat_cfg, num_channels=args.num_channels),
            np.float16,
        )
        shard[u.uid] = feats
        index_rows.append(
            f"{u.uid}\t{u.text}\t{u.wav_path}\t"
            f"{args.prefix}_{args.subset}_feats_{shard_idx:05d}.npz\t"
            f"{feats.shape[0]}"
        )
        if len(shard) >= args.shard_size:
            flush()
    flush()

    index = out_dir / f"{args.prefix}_{args.subset}_feats.tsv"
    index.write_text("\n".join(index_rows) + "\n", encoding="utf-8")
    logging.info("wrote %s (%d utterances)", index, len(index_rows))


if __name__ == "__main__":
    main()
