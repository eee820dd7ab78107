"""Mel-fidelity parity harness: our jitted sampler vs the reference torch
model on the SAME checkpoint and SAME noise — for all four model variants.

This is the BASELINE.md acceptance instrument (mel MSE < 1e-3): it loads a
model dir into both stacks, builds identical conditioning, injects one noise
tensor into both solvers, and reports the mel MSE.  Works offline — the
reference side needs only torch (+ the mounted reference source), not
lhotse/torchaudio/vocos.

Variant coverage (ref classes):
  zipvoice                -> zipvoice.models.zipvoice.ZipVoice
  zipvoice_distill        -> zipvoice.models.zipvoice_distill.ZipVoiceDistill
                             (guidance-scale embedding, no CFG doubling)
  zipvoice_dialog         -> zipvoice.models.zipvoice_dialog.ZipVoiceDialog
                             (speaker-turn embeddings in the text embed)
  zipvoice_dialog_stereo  -> ...ZipVoiceDialogStereo (two-stream backbone,
                             2xF features)

Usage:
  python -m zipvoice_tpu.eval.parity --model-dir exp/zipvoice \
      --reference-path /root/reference [--model-name zipvoice] \
      [--num-step 16] [--seconds 5]
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import List, Optional

import numpy as np

# registry defaults live in io/model_dir.py; reproduced here for the ref side
_DIALOG_VARIANTS = ("zipvoice_dialog", "zipvoice_dialog_stereo")


def _ref_model(model_name: str, raw: dict, vocab_size: int, pad_id: int,
               spk_a_id: Optional[int], spk_b_id: Optional[int]):
    """Instantiate + return the reference torch model class for a variant."""
    if model_name == "zipvoice":
        from zipvoice.models.zipvoice import ZipVoice

        return ZipVoice(**raw, vocab_size=vocab_size, pad_id=pad_id)
    if model_name == "zipvoice_distill":
        from zipvoice.models.zipvoice_distill import ZipVoiceDistill

        return ZipVoiceDistill(**raw, vocab_size=vocab_size, pad_id=pad_id)
    kw = {}
    if spk_a_id is not None:
        kw = dict(spk_a_id=spk_a_id, spk_b_id=spk_b_id)
    if model_name == "zipvoice_dialog":
        from zipvoice.models.zipvoice_dialog import ZipVoiceDialog

        return ZipVoiceDialog(**raw, vocab_size=vocab_size, pad_id=pad_id, **kw)
    if model_name == "zipvoice_dialog_stereo":
        from zipvoice.models.zipvoice_dialog import ZipVoiceDialogStereo

        return ZipVoiceDialogStereo(
            **raw, vocab_size=vocab_size, pad_id=pad_id, **kw
        )
    raise ValueError(f"unknown model_name: {model_name}")


def run_parity(
    model_dir: str,
    reference_path: str = "/root/reference",
    num_step: int = 16,
    guidance_scale: float = 1.0,
    t_shift: float = 0.5,
    seconds: float = 5.0,
    prompt_seconds: float = 2.0,
    seed: int = 0,
    tokenizer: str = "simple",
    dtype: str = "float32",
    model_name: str = "zipvoice",
    spk_a_id: Optional[int] = None,
    spk_b_id: Optional[int] = None,
) -> float:
    """Mel MSE of our sampler vs the torch reference (f32) on the same
    checkpoint + noise.  dtype selects OUR side's compute dtype — pass
    "bfloat16" to measure the fidelity of the deployment dtype against the
    f32 reference (budget: < 1e-3 f32, < 1e-2 bf16)."""
    if reference_path not in sys.path:
        sys.path.insert(0, reference_path)
    import torch

    from zipvoice.utils.common import make_pad_mask as ref_make_pad_mask

    from zipvoice_tpu.io.model_dir import load_model_dir
    from zipvoice_tpu.models import zipvoice as zv

    assets = load_model_dir(
        model_dir=model_dir, model_name=model_name, tokenizer_name=tokenizer
    )
    cfg = assets.model_cfg
    dialog = model_name in _DIALOG_VARIANTS
    distill = model_name == "zipvoice_distill"
    stereo = model_name == "zipvoice_dialog_stereo"
    # stereo generates 2-channel features: x/speech-cond live in 2F
    f_x = cfg.feat_dim * (2 if stereo else 1)

    # reference model with the same weights
    import json
    from pathlib import Path

    raw = json.loads((Path(model_dir) / "model.json").read_text())["model"]
    ref_model = _ref_model(
        model_name, raw, cfg.vocab_size, cfg.pad_id, spk_a_id, spk_b_id
    )
    ckpt = torch.load(Path(model_dir) / "model.pt", map_location="cpu",
                      weights_only=False)
    sd = ckpt["model"] if "model" in ckpt else ckpt
    ref_model.load_state_dict(sd, strict=True)
    ref_model.eval()

    # synthetic conditioning shared by both sides
    rng = np.random.default_rng(seed)
    frame_rate = assets.feat_cfg.frame_rate
    total = int(seconds * frame_rate)
    if prompt_seconds >= seconds:
        raise ValueError(
            f"--prompt-seconds ({prompt_seconds}) must be < --seconds "
            f"({seconds}): the prompt is a prefix of the generated span"
        )
    prompt_len = int(prompt_seconds * frame_rate)
    vocab = cfg.vocab_size
    body: List[int] = [
        int(t) for t in rng.integers(1, vocab, 24)
    ]
    prompt_tokens: List[int] = [int(t) for t in rng.integers(1, vocab, 10)]
    if dialog:
        # interleave speaker-turn tokens so the spk-embedding path is live
        sa = spk_a_id if spk_a_id is not None else 360
        sb = spk_b_id if spk_b_id is not None else 361
        body = [t for t in body if t not in (sa, sb)]
        prompt_tokens = [t for t in prompt_tokens if t not in (sa, sb)]
        body = [sa] + body[:12] + [sb] + body[12:]
        prompt_tokens = [sa] + prompt_tokens[:5] + [sb] + prompt_tokens[5:]
    cat = prompt_tokens + body
    prompt_feats = (rng.standard_normal((prompt_len, f_x)) * 0.1).astype(
        np.float32
    )
    noise = rng.standard_normal((1, total, f_x)).astype(np.float32)

    # --- reference path (compose like ZipVoice.sample with injected noise);
    # the variant overrides of forward_text_embed handle spk embeddings
    with torch.no_grad():
        embed, tl = ref_model.forward_text_embed([cat])
        text_cond, pad_mask = ref_model.forward_text_condition(
            embed, tl, torch.tensor([total])
        )
        pmask = ref_make_pad_mask(torch.tensor([prompt_len]), total)
        pf = torch.zeros(1, total, f_x)
        pf[0, :prompt_len] = torch.from_numpy(prompt_feats)
        speech_cond = torch.where(pmask.unsqueeze(-1), torch.zeros(1), pf)
        ref_x1 = ref_model.solver.sample(
            x=torch.from_numpy(noise), text_condition=text_cond,
            speech_condition=speech_cond, padding_mask=pad_mask,
            num_step=num_step, guidance_scale=guidance_scale, t_shift=t_shift,
        ).numpy()[0]

    # --- our path (same exact shapes, no bucketing)
    import jax
    import jax.numpy as jnp

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    params = assets.params
    if dtype == "bfloat16":
        params = jax.tree.map(lambda a: jnp.asarray(a, jdtype), params)
    tokens_padded = zv.pad_labels([cat], cfg.pad_id)
    pf_np = np.zeros((1, total, f_x), np.float32)
    pf_np[0, :prompt_len] = prompt_feats
    common = dict(
        num_step=num_step, guidance_scale=guidance_scale, t_shift=t_shift,
    )
    if dialog:
        from zipvoice_tpu.models import dialog as dlg

        out = dlg.sample_dialog(
            params, cfg, tokens_padded, np.array([len(cat)], np.int32),
            jnp.asarray(pf_np, jdtype), np.array([prompt_len], np.int32),
            np.array([total], np.int32), jnp.asarray(noise, jdtype),
            spk_a_id=spk_a_id if spk_a_id is not None else 360,
            spk_b_id=spk_b_id if spk_b_id is not None else 361,
            **common,
        )
    else:
        out = zv.sample(
            params, cfg, tokens_padded, np.array([len(cat)], np.int32),
            jnp.asarray(pf_np, jdtype), np.array([prompt_len], np.int32),
            np.array([total], np.int32), jnp.asarray(noise, jdtype),
            distill=distill, **common,
        )
    x1 = np.asarray(out.astype(jnp.float32))[0]

    from zipvoice_tpu.eval.metrics import mel_mse

    mse = mel_mse(x1, ref_x1)
    logging.info(
        "mel parity [%s] (%s): mse=%.3e max=%.3e (target < %s)",
        model_name, dtype, mse, float(np.abs(x1 - ref_x1).max()),
        "1e-2 bf16" if dtype == "bfloat16" else "1e-3 f32",
    )
    return mse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-dir", type=str, required=True)
    p.add_argument("--model-name", type=str, default="zipvoice",
                   choices=["zipvoice", "zipvoice_distill", "zipvoice_dialog",
                            "zipvoice_dialog_stereo"])
    p.add_argument("--reference-path", type=str, default="/root/reference")
    p.add_argument("--num-step", type=int, default=16)
    p.add_argument("--guidance-scale", type=float, default=1.0)
    p.add_argument("--t-shift", type=float, default=0.5)
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--prompt-seconds", type=float, default=2.0)
    p.add_argument("--tokenizer", type=str, default="simple")
    p.add_argument("--dtype", type=str, default="both",
                   choices=["float32", "bfloat16", "both"],
                   help="our side's compute dtype (budget: <1e-3 f32, "
                        "<1e-2 bf16); 'both' reports and gates on both")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    budgets = {"float32": 1e-3, "bfloat16": 1e-2}
    dtypes = ["float32", "bfloat16"] if args.dtype == "both" else [args.dtype]
    ok = True
    for dt in dtypes:
        mse = run_parity(
            args.model_dir, args.reference_path, args.num_step,
            args.guidance_scale, args.t_shift, args.seconds,
            prompt_seconds=args.prompt_seconds,
            tokenizer=args.tokenizer, dtype=dt, model_name=args.model_name,
        )
        passed = mse < budgets[dt]
        ok = ok and passed
        print(f"mel_mse[{args.model_name}][{dt}]={mse:.3e} "
              f"{'PASS' if passed else 'FAIL'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
