"""Speaker-similarity evaluation (SIM-o) — ref zipvoice/eval/speaker_similarity/.

Embeds prompt and generated wavs with a speaker encoder and reports mean
cosine similarity.  Paper-comparable backend: the reference's WavLM-large +
finetuned ECAPA-TDNN stack (ref sim.py:77-197, eval/models/
ecapa_tdnn_wavlm.py) — pass ``--model-dir`` pointing at a local
k2-fsa/TTS_eval_models clone (uses speaker_similarity/
wavlm_large_finetune.pth and speaker_similarity/wavlm_large/wavlm_large.pt;
see eval/models/ecapa_tdnn_wavlm.py).  Without --model-dir a lightweight HF
WavLM-base-sv fallback is used (numbers NOT paper-comparable).

cpSIM (ref cpsim.py) additionally needs diarization; given per-speaker
tracks (pyannote RTTM, stereo channels, or an [S1]/[S2] split) it reduces
to per-speaker SIM with best permutation — see cp_sim().

Usage:
  python -m zipvoice_tpu.eval.sim --wav-dir results --test-list test.tsv \
      --model-dir /path/to/tts_eval_models
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


class EcapaWavLMEncoder:
    """The reference's SIM-o backbone: finetuned ECAPA-TDNN on WavLM-large
    (ref eval/speaker_similarity/sim.py:83-113).  model_dir = local clone of
    k2-fsa/TTS_eval_models."""

    MAX_SECONDS = 120  # ref eval/utils.py load_waveform cap

    def __init__(self, model_dir: str):
        import os

        import torch

        from zipvoice_tpu.eval.models.ecapa_tdnn_wavlm import load_sv_model

        self.torch = torch
        sv = os.path.join(model_dir,
                          "speaker_similarity/wavlm_large_finetune.pth")
        ssl = os.path.join(model_dir,
                           "speaker_similarity/wavlm_large/wavlm_large.pt")
        self.model = load_sv_model(sv, ssl if os.path.exists(ssl) else None)

    def embed(self, wav: np.ndarray, sr: int) -> np.ndarray:
        from zipvoice_tpu.audio.wav import resample

        wav = resample(np.asarray(wav, np.float32).reshape(1, -1), sr, 16000)
        wav = wav[:, : self.MAX_SECONDS * 16000]
        with self.torch.no_grad():
            emb = self.model(self.torch.from_numpy(wav))
        return emb[0].numpy()


class SpeakerEncoder:
    """Mean-pooled WavLM embedding as a lightweight SIM fallback (numbers
    not paper-comparable; use EcapaWavLMEncoder via --model-dir)."""

    def __init__(self, model_name: str = "microsoft/wavlm-base-plus-sv"):
        import torch
        from transformers import AutoFeatureExtractor, AutoModel

        self.torch = torch
        self.fe = AutoFeatureExtractor.from_pretrained(model_name)
        self.model = AutoModel.from_pretrained(model_name)
        self.model.eval()

    def embed(self, wav: np.ndarray, sr: int) -> np.ndarray:
        from zipvoice_tpu.audio.wav import resample

        wav = resample(np.asarray(wav, np.float32).reshape(1, -1), sr, 16000)[0]
        inputs = self.fe(wav, sampling_rate=16000, return_tensors="pt")
        with self.torch.no_grad():
            out = self.model(**inputs)
        if hasattr(out, "embeddings"):
            emb = out.embeddings[0]
        else:
            emb = out.last_hidden_state.mean(dim=1)[0]
        return emb.numpy()


def cp_sim(encoder, gen_tracks, prompt_tracks, sr: int) -> float:
    """Best-permutation per-speaker similarity (ref cpsim.py) — thin alias
    over the cpSIM CLI's implementation so there is one scorer to maintain."""
    from zipvoice_tpu.eval.cpsim import cp_sim_tracks

    return cp_sim_tracks(encoder, gen_tracks, sr, prompt_tracks, sr)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--wav-dir", type=str, required=True)
    parser.add_argument("--test-list", type=str, required=True,
                        help="TSV: name\\tprompt_text\\tprompt_wav\\ttext")
    parser.add_argument("--model-dir", type=str, default=None,
                        help="local k2-fsa/TTS_eval_models clone -> "
                             "paper-grade WavLM-large ECAPA backend")
    parser.add_argument("--model", type=str,
                        default="microsoft/wavlm-base-plus-sv",
                        help="HF fallback encoder when no --model-dir")
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.audio.wav import read_wav
    from zipvoice_tpu.eval.metrics import cosine_similarity

    if args.model_dir:
        enc = EcapaWavLMEncoder(args.model_dir)
    else:
        logging.warning("no --model-dir: using the HF fallback encoder; "
                        "SIM numbers will not be paper-comparable")
        enc = SpeakerEncoder(args.model)
    scores = []
    rows = []
    with open(args.test_list, encoding="utf-8") as f:
        for line in f:
            if not line.strip():
                continue
            name, _ptext, pwav, _text = line.rstrip("\n").split("\t")[:4]
            gen_path = Path(args.wav_dir) / f"{name}.wav"
            if not gen_path.exists():
                continue
            g, gsr = read_wav(gen_path)
            p, psr = read_wav(pwav)
            s = cosine_similarity(
                enc.embed(g.mean(axis=0), gsr), enc.embed(p.mean(axis=0), psr)
            )
            scores.append(s)
            rows.append((name, s))

    overall = float(np.mean(scores)) if scores else float("nan")
    logging.info("SIM over %d utts: %.4f", len(scores), overall)
    if args.out:
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(f"SIM\t{overall:.6f}\n")
            for name, s in rows:
                f.write(f"{name}\t{s:.4f}\n")


if __name__ == "__main__":
    main()
