"""Dialogue TTS inference CLI — parity with `zipvoice.bin.infer_zipvoice_dialog`.

Two-party dialogue generation with [S1]/[S2] speaker-turn tags.  Prompts are
either merged (one wav whose transcription carries both speakers' tags) or
split (two wavs, one per speaker, concatenated — ref infer_zipvoice_dialog.py:
260-283).  The stereo model emits 2-channel features vocoded per channel
(ref :424-442, :482-490).

Example:
  python -m zipvoice_tpu.bin.infer_zipvoice_dialog \
      --model-name zipvoice_dialog --model-dir exp/dialog \
      --vocoder-path vocos/pytorch_model.bin \
      --prompt-text "[S1] hi there [S2] hello" --prompt-wav merged.wav \
      --text "[S1] how are you? [S2] great!" --res-wav-path out.wav
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path

import numpy as np


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-name", type=str, default="zipvoice_dialog",
                   choices=["zipvoice_dialog", "zipvoice_dialog_stereo"])
    p.add_argument("--model-dir", type=str, default=None)
    p.add_argument("--checkpoint-name", type=str, default="model.pt")
    p.add_argument("--vocoder-path", type=str, default=None)
    p.add_argument("--test-list", type=str, default=None,
                   help="TSV: name\\tprompt_text\\tprompt_wav\\ttext "
                        "(or split prompts: name\\tp1_text\\tp1_wav\\t"
                        "p2_text\\tp2_wav\\ttext)")
    p.add_argument("--prompt-text", type=str, default=None)
    p.add_argument("--prompt-wav", type=str, default=None,
                   help="merged prompt wav (both speakers)")
    p.add_argument("--prompt-text-1", type=str, default=None)
    p.add_argument("--prompt-wav-1", type=str, default=None)
    p.add_argument("--prompt-text-2", type=str, default=None)
    p.add_argument("--prompt-wav-2", type=str, default=None)
    p.add_argument("--text", type=str, default=None)
    p.add_argument("--res-dir", type=str, default="results")
    p.add_argument("--res-wav-path", type=str, default="result.wav")
    p.add_argument("--num-step", type=int, default=16)
    p.add_argument("--guidance-scale", type=float, default=1.5)
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--t-shift", type=float, default=0.5)
    p.add_argument("--target-rms", type=float, default=0.1)
    p.add_argument("--feat-scale", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=666)
    p.add_argument("--dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    return p


def load_merged_prompt(args, sampling_rate: int, stereo: bool):
    """Build (prompt_text, prompt_wav (C, L)) from merged or split prompts
    (ref infer_zipvoice_dialog.py:260-283 mono, :424-442 stereo)."""
    from zipvoice_tpu.audio.wav import read_wav, resample

    def load(path):
        wav, sr = read_wav(path)
        if sr != sampling_rate:
            wav = resample(wav, sr, sampling_rate)
        return wav

    if args.prompt_wav:
        wav = load(args.prompt_wav)
        if not stereo and wav.shape[0] != 1:
            wav = wav.mean(axis=0, keepdims=True)
        if stereo:
            assert wav.shape[0] == 2, "merged stereo prompt must be 2-channel"
        return args.prompt_text, wav

    assert args.prompt_wav_1 and args.prompt_wav_2, (
        "need --prompt-wav or both --prompt-wav-1/--prompt-wav-2"
    )
    w1, w2 = load(args.prompt_wav_1), load(args.prompt_wav_2)
    text = f"[S1]{args.prompt_text_1}[S2]{args.prompt_text_2}"
    if not stereo:
        w1 = w1.mean(axis=0, keepdims=True)
        w2 = w2.mean(axis=0, keepdims=True)
        return text, np.concatenate([w1, w2], axis=1)
    # stereo split prompts: speaker 1 on channel 0, speaker 2 on channel 1,
    # silence elsewhere (ref :436-442)
    w1 = w1.mean(axis=0)
    w2 = w2.mean(axis=0)
    total = len(w1) + len(w2)
    wav = np.zeros((2, total), np.float32)
    wav[0, : len(w1)] = w1
    wav[1, len(w1) :] = w2
    return text, wav


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import dataclasses

    import jax.numpy as jnp

    from zipvoice_tpu.audio.wav import write_wav
    from zipvoice_tpu.bin.infer_zipvoice import load_vocoder_params
    from zipvoice_tpu.io.model_dir import load_model_dir
    from zipvoice_tpu.models.pipeline import (
        ZipVoicePipeline,
        enable_compilation_cache,
    )

    enable_compilation_cache()

    stereo = args.model_name == "zipvoice_dialog_stereo"
    assets = load_model_dir(
        model_dir=args.model_dir, model_name=args.model_name,
        checkpoint_name=args.checkpoint_name,
    )
    feat_cfg = dataclasses.replace(assets.feat_cfg, feat_scale=args.feat_scale)
    pipeline = ZipVoicePipeline(
        params=assets.params,
        model_cfg=assets.model_cfg,
        feat_cfg=feat_cfg,
        vocos_params=load_vocoder_params(args.vocoder_path),
        tokenizer=assets.tokenizer,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        variant="dialog_stereo" if stereo else "dialog",
    )
    sr = feat_cfg.sampling_rate

    def synth_one(prompt_text, prompt_wav, text, out_path):
        import time

        tok = pipeline.tokenizer
        t0 = time.monotonic()
        tokens = tok.texts_to_token_ids([text])[0]
        prompt_tokens = tok.texts_to_token_ids([prompt_text])[0]
        pf, prompt_rms = pipeline.prompt_features(
            prompt_wav, sr, args.target_rms
        )
        mel, gen_len = pipeline.sample_features(
            tokens, prompt_tokens, pf, num_step=args.num_step,
            guidance_scale=args.guidance_scale, speed=args.speed,
            t_shift=args.t_shift, seed=args.seed,
        )
        t1 = time.monotonic()
        if stereo:
            wav = pipeline.vocode_stereo(mel, gen_len)
        else:
            wav = pipeline.vocode(mel, gen_len)
        if prompt_rms < args.target_rms:
            wav = wav * (prompt_rms / args.target_rms)
        t2 = time.monotonic()
        write_wav(out_path, wav, sr)
        secs = wav.shape[-1] / sr
        logging.info(
            "%s: %.2fs audio, rtf %.4f (model %.4f, vocoder %.4f)",
            out_path, secs, (t2 - t0) / secs, (t1 - t0) / secs, (t2 - t1) / secs,
        )

    if args.test_list:
        os.makedirs(args.res_dir, exist_ok=True)
        with open(args.test_list, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                items = line.rstrip("\n").split("\t")
                if len(items) == 4:
                    name, ptext, pwav, text = items
                    a = argparse.Namespace(
                        **{**vars(args), "prompt_text": ptext,
                           "prompt_wav": pwav, "prompt_wav_1": None,
                           "prompt_wav_2": None}
                    )
                elif len(items) == 6:
                    name, pt1, pw1, pt2, pw2, text = items
                    a = argparse.Namespace(
                        **{**vars(args), "prompt_wav": None,
                           "prompt_text_1": pt1, "prompt_wav_1": pw1,
                           "prompt_text_2": pt2, "prompt_wav_2": pw2}
                    )
                else:
                    raise ValueError(f"bad test-list line: {items}")
                prompt_text, prompt_wav = load_merged_prompt(a, sr, stereo)
                synth_one(prompt_text, prompt_wav, text,
                          str(Path(args.res_dir) / f"{name}.wav"))
    else:
        assert args.text, "need --text (or --test-list)"
        prompt_text, prompt_wav = load_merged_prompt(args, sr, stereo)
        synth_one(prompt_text, prompt_wav, args.text, args.res_wav_path)


if __name__ == "__main__":
    main()
