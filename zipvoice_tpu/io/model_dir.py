"""Model-directory contract: {model.pt|model.safetensors, model.json, tokens.txt}.

Mirrors the reference's trained-model layout (ref train_zipvoice.py:897-899
copies model.json/tokens.txt into the exp dir; infer_zipvoice.py:519-566
reloads them plus the checkpoint).  HF auto-download is attempted only if
huggingface_hub is importable and the files are absent (the reference pulls
from k2-fsa/ZipVoice, infer_zipvoice.py:80).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional

from zipvoice_tpu.config import FeatureConfig, ZipVoiceConfig, load_model_json
from zipvoice_tpu.io.checkpoint import load_params
from zipvoice_tpu.text.tokenizer import get_tokenizer

HF_REPO = "k2-fsa/ZipVoice"

# model-name -> (HF subdir, tokenizer, sampling defaults)
# (ref infer_zipvoice.py:479-495, infer_zipvoice_dialog.py:132-144)
MODEL_REGISTRY = {
    "zipvoice": dict(
        hf_dir="zipvoice", tokenizer="emilia", num_step=16, guidance_scale=1.0,
        t_shift=0.5, distill=False,
    ),
    "zipvoice_distill": dict(
        hf_dir="zipvoice_distill", tokenizer="emilia", num_step=8,
        guidance_scale=3.0, t_shift=0.5, distill=True,
    ),
    "zipvoice_dialog": dict(
        hf_dir="zipvoice_dialog", tokenizer="dialog", num_step=16,
        guidance_scale=1.5, t_shift=0.5, distill=False,
    ),
    "zipvoice_dialog_stereo": dict(
        hf_dir="zipvoice_dialog_stereo", tokenizer="dialog", num_step=16,
        guidance_scale=1.5, t_shift=0.5, distill=False,
    ),
}


@dataclasses.dataclass
class ModelAssets:
    params: Dict
    model_cfg: ZipVoiceConfig
    feat_cfg: FeatureConfig
    tokenizer: object
    defaults: Dict


def _find_checkpoint(model_dir: Path, checkpoint_name: Optional[str]) -> Path:
    # every CLI defaults checkpoint_name to "model.pt": fall through to the
    # safetensors lookup when that default doesn't exist on disk
    if checkpoint_name and (model_dir / checkpoint_name).exists():
        return model_dir / checkpoint_name
    if checkpoint_name and checkpoint_name != "model.pt":
        raise FileNotFoundError(f"{model_dir / checkpoint_name} not found")
    for name in ("model.pt", "model.safetensors"):
        if (model_dir / name).exists():
            return model_dir / name
    raise FileNotFoundError(f"no model.pt/model.safetensors in {model_dir}")


def maybe_download(model_name: str) -> Path:
    """Download {model.pt, model.json, tokens.txt} from HF if possible."""
    from huggingface_hub import hf_hub_download  # optional dep

    sub = MODEL_REGISTRY[model_name]["hf_dir"]
    paths = [
        hf_hub_download(HF_REPO, filename=f"{sub}/{f}")
        for f in ("model.pt", "model.json", "tokens.txt")
    ]
    return Path(paths[0]).parent


def load_model_dir(
    model_dir: Optional[str] = None,
    model_name: str = "zipvoice",
    checkpoint_name: Optional[str] = None,
    tokenizer_name: Optional[str] = None,
    lang: str = "en-us",
) -> ModelAssets:
    reg = MODEL_REGISTRY[model_name]
    if model_dir is None:
        model_dir = maybe_download(model_name)
    model_dir = Path(model_dir)

    tokenizer = get_tokenizer(
        tokenizer_name or reg["tokenizer"], str(model_dir / "tokens.txt"), lang=lang
    )
    model_cfg, feat_cfg = load_model_json(
        model_dir / "model.json",
        vocab_size=tokenizer.vocab_size,
        pad_id=tokenizer.pad_id,
    )
    if reg["distill"]:
        model_cfg = dataclasses.replace(model_cfg, use_guidance_scale_embed=True)
    params = load_params(_find_checkpoint(model_dir, checkpoint_name))
    return ModelAssets(
        params=params,
        model_cfg=model_cfg,
        feat_cfg=feat_cfg,
        tokenizer=tokenizer,
        defaults=dict(reg),
    )
