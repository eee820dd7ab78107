"""Inference from exported StableHLO programs — the onnxruntime-path
equivalent (ref zipvoice/bin/infer_zipvoice_onnx.py).

Loads the artifacts of bin/export_model.py and synthesizes either with the
fully-fused sampler program or with the split text/fm-step programs driven by
a host Euler loop (mirroring the reference's Python loop over the ONNX flow
session, ref infer_zipvoice_onnx.py:357-377).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np


def load_exported(path: str):
    from jax import export as jexport

    return jexport.deserialize(bytearray(Path(path).read_bytes()))


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--export-dir", type=str, required=True)
    p.add_argument("--model-dir", type=str, required=True,
                   help="for tokens.txt / model.json (tokenizer + dims)")
    p.add_argument("--tokenizer", type=str, default="emilia")
    p.add_argument("--vocoder-path", type=str, default=None)
    p.add_argument("--mode", type=str, default="fused",
                   choices=["fused", "host-loop"])
    p.add_argument("--num-step", type=int, default=16,
                   help="host-loop mode only (fused bakes its own)")
    p.add_argument("--t-shift", type=float, default=0.5)
    p.add_argument("--prompt-wav", type=str, required=True)
    p.add_argument("--prompt-text", type=str, required=True)
    p.add_argument("--text", type=str, required=True)
    p.add_argument("--res-wav-path", type=str, default="result.wav")
    p.add_argument("--speed", type=float, default=1.0)
    p.add_argument("--target-rms", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=666)
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    import jax

    from zipvoice_tpu.audio.wav import read_wav, write_wav
    from zipvoice_tpu.bin.infer_zipvoice import load_vocoder_params
    from zipvoice_tpu.io.model_dir import load_model_dir
    from zipvoice_tpu.models.pipeline import ZipVoicePipeline
    from zipvoice_tpu.models.zipvoice import get_time_steps, predict_features_lens

    assets = load_model_dir(model_dir=args.model_dir,
                            tokenizer_name=args.tokenizer)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=load_vocoder_params(args.vocoder_path),
        tokenizer=assets.tokenizer,
    )

    sampler = load_exported(str(Path(args.export_dir) / "sampler_fused.stablehlo"))
    # static sizes baked into the export
    s_max = sampler.in_avals[0].shape[1]
    t_max = sampler.in_avals[2].shape[1]
    f = sampler.in_avals[2].shape[2]

    tok = assets.tokenizer
    tokens = tok.texts_to_token_ids([args.text])[0]
    prompt_tokens = tok.texts_to_token_ids([args.prompt_text])[0]
    wav, sr = read_wav(args.prompt_wav)
    pf_dev, prompt_rms = pipe.prompt_features(wav, sr, args.target_rms)
    pf = np.asarray(pf_dev, np.float32)

    cat = prompt_tokens + tokens
    total = int(predict_features_lens(
        np.array([pf.shape[0]]), np.array([max(len(prompt_tokens), 1)]),
        np.array([len(tokens)]), speed=args.speed,
    )[0])
    assert len(cat) + 1 <= s_max and total <= t_max, "export too small"

    tokens_padded = np.full((1, s_max), assets.model_cfg.pad_id, np.int32)
    row = cat + [assets.model_cfg.pad_id]
    tokens_padded[0, : len(row)] = row
    pf_full = np.zeros((1, t_max, f), np.float32)
    pf_full[0, : pf.shape[0]] = pf
    noise = np.asarray(
        jax.random.normal(jax.random.PRNGKey(args.seed), (1, t_max, f))
    ).astype(np.float32)
    lens = (np.array([len(cat)], np.int32), np.array([pf.shape[0]], np.int32),
            np.array([total], np.int32))

    dt = sampler.in_avals[2].dtype
    if args.mode == "fused":
        x1 = np.asarray(sampler.call(
            tokens_padded, lens[0], pf_full.astype(dt), lens[1], lens[2],
            noise.astype(dt),
        ))
    else:
        text_prog = load_exported(str(Path(args.export_dir) / "text_model.stablehlo"))
        fm_prog = load_exported(
            str(Path(args.export_dir) / "fm_decoder_step.stablehlo")
        )
        cond = np.asarray(text_prog.call(tokens_padded, lens[0], lens[2]))
        pad_mask = np.arange(t_max)[None, :] >= lens[2][:, None]
        speech_cond = pf_full.copy()
        speech_cond[0, pf.shape[0]:] = 0.0
        ts = get_time_steps(0.0, 1.0, args.num_step, args.t_shift)
        x = noise.astype(np.float32)
        for i in range(args.num_step):
            v = np.asarray(fm_prog.call(
                np.float32(ts[i]), x.astype(dt), cond.astype(dt),
                speech_cond.astype(dt), pad_mask,
            )).astype(np.float32)
            x = x + v * (float(ts[i + 1]) - float(ts[i]))
        x1 = x

    # strip prompt + unscale + vocode with the pipeline's vocoder
    gen_len = total - pf.shape[0]
    mel = (x1[0, pf.shape[0]: pf.shape[0] + gen_len]
           / assets.feat_cfg.feat_scale - assets.feat_cfg.feat_bias)
    mel_padded = np.zeros((t_max, f), np.float32)
    mel_padded[:gen_len] = mel
    out = pipe.vocode(mel_padded, gen_len)
    if prompt_rms < args.target_rms:
        out = out * (prompt_rms / args.target_rms)
    write_wav(args.res_wav_path, out, assets.feat_cfg.sampling_rate)
    logging.info("wrote %s (%.2fs)", args.res_wav_path,
                 len(out) / assets.feat_cfg.sampling_rate)


if __name__ == "__main__":
    main()
