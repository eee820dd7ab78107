"""Dataset preparation — validated TSV manifests (lhotse-free).

The reference converts TSVs into lhotse CutSets (ref bin/prepare_dataset.py);
here manifests stay TSV (the pipeline consumes them directly with on-device
fbank), so preparation = validation + duration probing + optional resampling
to the target rate, emitting a normalized 5-column TSV:
``id\\ttext\\twav_path\\tstart\\tend`` (the reference's segment contract).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tsv-path", type=str, required=True,
                   help="input TSV: id\\ttext\\twav[\\tstart\\tend]")
    p.add_argument("--prefix", type=str, default="custom")
    p.add_argument("--subset", type=str, default="train")
    p.add_argument("--sampling-rate", type=int, default=24000,
                   help="resample wavs that differ (writes to --resample-dir)")
    p.add_argument("--resample-dir", type=str, default=None,
                   help="if set, resampled copies are written here")
    p.add_argument("--output-dir", type=str, required=True)
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.audio.wav import read_wav, resample, write_wav
    from zipvoice_tpu.data.dataset import read_tsv_manifest

    utts = read_tsv_manifest(args.tsv_path)
    out_dir = Path(args.output_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    resample_dir = Path(args.resample_dir) if args.resample_dir else None
    if resample_dir:
        resample_dir.mkdir(parents=True, exist_ok=True)

    kept, dropped = [], 0
    for u in utts:
        try:
            wav, sr = read_wav(u.wav_path)
        except Exception as ex:  # noqa: BLE001
            logging.warning("drop %s: %s", u.uid, ex)
            dropped += 1
            continue
        if sr != args.sampling_rate:
            if resample_dir is None:
                logging.warning(
                    "drop %s: rate %d != %d (set --resample-dir to convert)",
                    u.uid, sr, args.sampling_rate,
                )
                dropped += 1
                continue
            wav = resample(wav, sr, args.sampling_rate)
            new_path = resample_dir / f"{u.uid}.wav"
            write_wav(new_path, wav, args.sampling_rate)
            u.wav_path = str(new_path)
            sr = args.sampling_rate
        file_secs = wav.shape[-1] / sr
        if u.duration is None:
            # 3-column input: the text covers the whole file
            u.duration = file_secs
        elif u.start + u.duration > file_secs + 1e-3:
            # 5-column segment: validate the provided bounds, keep them
            logging.warning(
                "drop %s: segment [%0.2f, %0.2f) beyond file end %0.2f",
                u.uid, u.start, u.start + u.duration, file_secs,
            )
            dropped += 1
            continue
        kept.append(u)

    out = out_dir / f"{args.prefix}_{args.subset}.tsv"
    with open(out, "w", encoding="utf-8") as f:
        for u in kept:
            f.write(f"{u.uid}\t{u.text}\t{u.wav_path}\t{u.start}\t"
                    f"{u.start + u.duration}\n")
    logging.info("wrote %s: %d utterances (%d dropped)", out, len(kept), dropped)


if __name__ == "__main__":
    main()
