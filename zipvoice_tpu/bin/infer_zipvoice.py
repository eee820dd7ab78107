"""Zero-shot TTS inference CLI — parity with `zipvoice.bin.infer_zipvoice`.

Usage (single sentence):
  python -m zipvoice_tpu.bin.infer_zipvoice \
      --model-name zipvoice --model-dir exp/zipvoice \
      --vocoder-path vocos/pytorch_model.bin \
      --prompt-wav prompt.wav --prompt-text "..." --text "..." \
      --res-wav-path out.wav

Batch mode mirrors the reference TSV contract (`name\\tprompt_text\\t
prompt_wav\\ttext` per line) via --test-list/--res-dir
(ref zipvoice/bin/infer_zipvoice.py:420-470).
"""

from __future__ import annotations

import argparse
import logging
import os
from pathlib import Path


def get_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-name", type=str, default="zipvoice",
                        choices=["zipvoice", "zipvoice_distill"],
                        help="The model used for inference")
    parser.add_argument("--model-dir", type=str, default=None,
                        help="Model dir with checkpoint, model.json, tokens.txt; "
                             "downloads from HF when unset (needs network)")
    parser.add_argument("--checkpoint-name", type=str, default="model.pt",
                        help="The name of model checkpoint")
    parser.add_argument("--vocoder-path", type=str, default=None,
                        help="Vocos vocoder checkpoint (pytorch_model.bin / "
                             ".safetensors); downloads from HF when unset")
    parser.add_argument("--tokenizer", type=str, default="emilia",
                        help="Tokenizer type")
    parser.add_argument("--lang", type=str, default="en-us",
                        help="Language identifier for the espeak tokenizer")
    parser.add_argument("--test-list", type=str, default=None,
                        help="TSV of name\\tprompt_text\\tprompt_wav\\ttext")
    parser.add_argument("--prompt-wav", type=str, default=None,
                        help="The prompt wav to mimic")
    parser.add_argument("--prompt-text", type=str, default=None,
                        help="The transcription of the prompt wav")
    parser.add_argument("--text", type=str, default=None,
                        help="The text to synthesize")
    parser.add_argument("--res-dir", type=str, default="results",
                        help="Output dir for --test-list mode")
    parser.add_argument("--res-wav-path", type=str, default="result.wav",
                        help="Output wav for single-sentence mode")
    parser.add_argument("--guidance-scale", type=float, default=None,
                        help="Classifier-free guidance scale "
                             "(default: per-model)")
    parser.add_argument("--num-step", type=int, default=None,
                        help="Number of sampling steps (default: per-model)")
    parser.add_argument("--feat-scale", type=float, default=0.1,
                        help="The scale factor of fbank feature")
    parser.add_argument("--feat-bias", type=float, default=0.0,
                        help="The bias added to fbank feature")
    parser.add_argument("--speed", type=float, default=1.0,
                        help="Speech speed control (>1 speeds up)")
    parser.add_argument("--t-shift", type=float, default=0.5,
                        help="Timestep shift toward low SNR if < 1.0")
    parser.add_argument("--timesteps", type=str, default=None,
                        help="Explicit comma-separated Euler grid in [0,1] "
                             "(e.g. '0,0.4,0.7,0.9,1'), overriding "
                             "--num-step/--t-shift — supports empirically "
                             "pruned step schedules (EPSS)")
    parser.add_argument("--target-rms", type=float, default=0.1,
                        help="Prompt RMS normalization target (0 disables)")
    parser.add_argument("--seed", type=int, default=666, help="Random seed")
    parser.add_argument("--long-form", action="store_true",
                        help="chunked synthesis for texts beyond the ~30s "
                             "training cap (rolling mel-prompt continuity)")
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="On-device compute dtype")
    parser.add_argument("--quantize", type=str, default=None,
                        choices=["int8", "int8-dynamic"],
                        help="int8 linear layers: weight-only, or dynamic "
                             "(per-row activation scales, s8xs8->s32 MXU)")
    return parser


def load_vocoder_params(path: str | None, kind: str = "vocos"):
    from zipvoice_tpu.io.checkpoint import load_torch_state_dict

    if kind == "bigvgan":
        from zipvoice_tpu.audio.bigvgan import load_bigvgan_params

        if path is None:
            from huggingface_hub import hf_hub_download

            path = hf_hub_download(
                "nvidia/bigvgan_v2_24khz_100band_256x", "bigvgan_generator.pt"
            )
        sd = load_torch_state_dict(path)
        sd = {k[len("generator."):] if k.startswith("generator.") else k: v
              for k, v in sd.items()}
        return load_bigvgan_params(sd)

    from zipvoice_tpu.audio.vocos import load_vocos_params

    if path is None:
        from huggingface_hub import hf_hub_download

        path = hf_hub_download("charactr/vocos-mel-24khz", "pytorch_model.bin")
    return load_vocos_params(load_torch_state_dict(path))


def build_pipeline(args):
    import dataclasses

    import jax.numpy as jnp

    from zipvoice_tpu.io.model_dir import load_model_dir
    from zipvoice_tpu.models.pipeline import (
        ZipVoicePipeline,
        enable_compilation_cache,
    )

    enable_compilation_cache()

    assets = load_model_dir(
        model_dir=args.model_dir,
        model_name=args.model_name,
        checkpoint_name=args.checkpoint_name,
        tokenizer_name=args.tokenizer,
        lang=args.lang,
    )
    feat_cfg = dataclasses.replace(
        assets.feat_cfg, feat_scale=args.feat_scale, feat_bias=args.feat_bias
    )
    # feature type selects the matching vocoder family
    # (ref infer_zipvoice.py:249-269: vocos vs bigvgan by model config)
    vocoder_kind = "bigvgan" if feat_cfg.type == "bigvgan" else "vocos"
    vocoder_params = load_vocoder_params(args.vocoder_path, vocoder_kind)
    pipeline = ZipVoicePipeline(
        params=assets.params,
        model_cfg=assets.model_cfg,
        feat_cfg=feat_cfg,
        vocos_params=vocoder_params,
        tokenizer=assets.tokenizer,
        dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        distill=assets.defaults["distill"],
        vocoder=vocoder_kind,
        quantize=getattr(args, "quantize", None),
    )
    defaults = assets.defaults
    num_step = args.num_step if args.num_step is not None else defaults["num_step"]
    gs = (
        args.guidance_scale
        if args.guidance_scale is not None
        else defaults["guidance_scale"]
    )
    return pipeline, num_step, gs


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.audio.wav import read_wav, write_wav

    pipeline, num_step, guidance_scale = build_pipeline(args)
    sr = pipeline.feat_cfg.sampling_rate
    timesteps = (
        tuple(float(x) for x in args.timesteps.split(","))
        if args.timesteps else None
    )
    if timesteps is not None and args.long_form:
        raise SystemExit(
            "--timesteps is not supported with --long-form (chunked "
            "synthesis re-derives its schedule per chunk); drop one flag"
        )

    def synth_one(prompt_text, prompt_wav_path, text, out_path):
        wav, wav_sr = read_wav(prompt_wav_path)
        extra = {} if args.long_form else {"timesteps": timesteps}
        synth = pipeline.synthesize_long if args.long_form else pipeline.synthesize
        res = synth(
            text=text, prompt_text=prompt_text, prompt_wav=wav, prompt_sr=wav_sr,
            num_step=num_step, guidance_scale=guidance_scale, speed=args.speed,
            t_shift=args.t_shift, target_rms=args.target_rms, seed=args.seed,
            **extra,
        )
        write_wav(out_path, res.wav, sr)
        m = res.metrics
        # synthesize_long reports chunked totals without the per-stage split
        logging.info(
            "%s: %.2fs audio, rtf %.4f (model %.4f, vocoder %.4f)",
            out_path, m["wav_seconds"], m["rtf"],
            m.get("rtf_no_vocoder",
                  m.get("t_no_vocoder", 0.0) / max(m["wav_seconds"], 1e-9)),
            m.get("rtf_vocoder",
                  m.get("t_vocoder", 0.0) / max(m["wav_seconds"], 1e-9)),
        )
        return res.metrics

    if args.test_list is not None:
        os.makedirs(args.res_dir, exist_ok=True)
        all_metrics = []
        with open(args.test_list, encoding="utf-8") as f:
            for line in f:
                if not line.strip():
                    continue
                name, prompt_text, prompt_wav_path, text = line.strip().split("\t")[:4]
                out = Path(args.res_dir) / f"{name}.wav"
                all_metrics.append(
                    synth_one(prompt_text, prompt_wav_path, text, str(out))
                )
        if all_metrics:
            tot = {
                k: sum(m[k] for m in all_metrics) for k in all_metrics[0]
            }
            logging.info(
                "Average RTF: %.4f (model %.4f, vocoder %.4f) over %.2fs audio",
                tot["t"] / tot["wav_seconds"],
                tot["t_no_vocoder"] / tot["wav_seconds"],
                tot["t_vocoder"] / tot["wav_seconds"],
                tot["wav_seconds"],
            )
    else:
        assert args.prompt_wav and args.prompt_text is not None and args.text, (
            "need --prompt-wav, --prompt-text and --text (or --test-list)"
        )
        synth_one(args.prompt_text, args.prompt_wav, args.text, args.res_wav_path)


if __name__ == "__main__":
    main()
