"""cpSIM — concatenated max-permutation speaker similarity for dialog TTS
(ref zipvoice/eval/speaker_similarity/cpsim.py).

Per conversation: split each 2-speaker wav into per-speaker tracks, embed
each track with the SIM-o speaker-verification model, and score the best
speaker assignment's mean cosine similarity against the prompt speakers.

Speaker separation backends, chosen per input:

* ``--prompt-mode split`` — the prompt is two single-speaker wavs
  (tab-separated columns, ref cpsim.py:208-236): no diarization needed;
* stereo wavs (2 channels) — each channel IS a speaker (ZipVoice-Dialog-
  Stereo output): no diarization needed;
* mono 2-speaker wavs — pyannote diarization when installed
  (``speaker_similarity/pyannote/pyannote_diarization_config.yaml`` under
  --model-dir, ref cpsim.py:129-134); otherwise the reference's own
  fallback behavior (use the full audio for both speakers,
  ref cpsim.py:179-188) with a loud warning.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path
from typing import List, Optional

import numpy as np


def _diarize_pyannote(pipeline, wav: np.ndarray, sr: int) -> Optional[List[np.ndarray]]:
    """2-speaker diarization -> per-speaker concatenated tracks, or None."""
    import torch

    annotation = pipeline(
        {"waveform": torch.from_numpy(wav[None, :]), "sample_rate": sr},
        num_speakers=2,
    )
    chunks = {"SPEAKER_00": [], "SPEAKER_01": []}
    for turn, _, speaker in annotation.itertracks(yield_label=True):
        if speaker in chunks:
            chunks[speaker].append(wav[int(turn.start * sr): int(turn.end * sr)])
    if not (chunks["SPEAKER_00"] and chunks["SPEAKER_01"]):
        return None
    return [np.concatenate(chunks["SPEAKER_00"]),
            np.concatenate(chunks["SPEAKER_01"])]


def load_diarizer(model_dir: Optional[str]):
    """pyannote pipeline from the reference model-dir layout, or None."""
    if model_dir is None:
        return None
    cfg = Path(model_dir) / "speaker_similarity/pyannote" / \
        "pyannote_diarization_config.yaml"
    if not cfg.exists():
        return None
    try:
        from pyannote.audio import Pipeline  # gated: not in the base image

        return Pipeline.from_pretrained(str(cfg))
    except ImportError:
        logging.warning("pyannote not installed; mono dialog wavs fall back "
                        "to full-audio-for-both-speakers")
        return None


def speaker_tracks(wav: np.ndarray, sr: int, diarizer) -> List[np.ndarray]:
    """(C, T) waveform -> two per-speaker 1-D tracks."""
    if wav.ndim == 2 and wav.shape[0] == 2:
        return [wav[0], wav[1]]  # stereo: channel = speaker
    mono = wav.mean(axis=0) if wav.ndim == 2 else wav
    if diarizer is not None:
        tracks = _diarize_pyannote(diarizer, mono.astype(np.float32), sr)
        if tracks is not None:
            return tracks
        logging.debug("diarization found <2 speakers; using full audio")
    return [mono, mono]  # reference fallback (ref cpsim.py:179-188)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-dir", type=str, required=True)
    p.add_argument("--test-list", type=str, required=True,
                   help="TSV: name\\tptext1\\tptext2\\tpwav1\\tpwav2\\ttext "
                        "(split mode) or name\\tptext\\tpwav\\ttext (merge)")
    p.add_argument("--prompt-mode", type=str, default="split",
                   choices=["split", "merge"])
    p.add_argument("--model-dir", type=str, default=None,
                   help="local k2-fsa/TTS_eval_models clone")
    p.add_argument("--extension", type=str, default="wav")
    p.add_argument("--out", type=str, default=None)
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.audio.wav import read_wav
    from zipvoice_tpu.eval.sim import EcapaWavLMEncoder, SpeakerEncoder

    if args.model_dir:
        enc = EcapaWavLMEncoder(args.model_dir)
    else:
        logging.warning("no --model-dir: HF fallback encoder; cpSIM numbers "
                        "will not be paper-comparable")
        enc = SpeakerEncoder()
    diarizer = load_diarizer(args.model_dir)

    scores, rows = [], []
    with open(args.test_list, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            items = line.rstrip("\n").split("\t")
            name = items[0]
            gen_path = Path(args.wav_dir) / f"{name}.{args.extension}"
            if not gen_path.exists():
                logging.warning("missing %s", gen_path)
                continue
            g_wav, g_sr = read_wav(gen_path)
            gen_tracks = speaker_tracks(g_wav, g_sr, diarizer)

            if args.prompt_mode == "split":
                pw1, psr1 = read_wav(items[3])
                pw2, psr2 = read_wav(items[4])
                prompt_tracks = [pw1.mean(axis=0), pw2.mean(axis=0)]
                p_sr = [psr1, psr2]  # per-track: the two prompt wavs may
                # legitimately differ; a single rate would mis-resample
                # (pitch/time-warp) the second speaker's embedding
            else:
                p_wav, p_sr = read_wav(items[2])
                prompt_tracks = speaker_tracks(p_wav, p_sr, diarizer)

            # embed at native rates (encoders resample internally)
            s = cp_sim_tracks(enc, gen_tracks, g_sr, prompt_tracks, p_sr)
            scores.append(s)
            rows.append((name, s))

    overall = float(np.mean(scores)) if scores else float("nan")
    logging.info("cpSIM over %d conversations: %.4f", len(scores), overall)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(f"cpSIM\t{overall:.6f}\n")
            for name, s in rows:
                f.write(f"{name}\t{s:.4f}\n")


def cp_sim_tracks(encoder, gen_tracks, gen_sr, prompt_tracks, prompt_sr) -> float:
    """Best-permutation mean cosine over per-speaker (gen, prompt) pairs.
    prompt_sr: one rate for all tracks, or a per-track list."""
    from itertools import permutations

    from zipvoice_tpu.eval.metrics import cosine_similarity

    if not isinstance(prompt_sr, (list, tuple)):
        prompt_sr = [prompt_sr] * len(prompt_tracks)
    g = [encoder.embed(w, gen_sr) for w in gen_tracks]
    p = [encoder.embed(w, sr) for w, sr in zip(prompt_tracks, prompt_sr)]
    return max(
        float(np.mean([cosine_similarity(g[i], p[j])
                       for i, j in enumerate(perm)]))
        for perm in permutations(range(len(p)))
    )


if __name__ == "__main__":
    main()
