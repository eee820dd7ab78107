"""Torch-checkpoint <-> JAX-pytree bridge.

The published ZipVoice checkpoints (`model.pt` / `model.safetensors`, HF repo
k2-fsa/ZipVoice) are flat torch state_dicts keyed by dotted module paths
(ref: zipvoice/utils/checkpoint.py:108-147 — a `.pt` file holds
``{"model": state_dict, ...}`` or a bare state_dict; DDP adds a ``module.``
prefix).  Our parameter pytree uses exactly those dotted names as nesting
keys, with two layout changes for TPU-friendly compute:

* Linear ``weight``: torch (out, in) -> ours (in, out)  [x @ W]
* depthwise conv ``weight``: torch (C, 1, K) -> ours (K, C)

Everything else (biases, embeddings, bypass scales, norm params) is stored
as-is, so the mapping is mechanical and exactly invertible.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Union

import numpy as np

# Keys whose 2-D "weight" must NOT be transposed (they are nn.Embedding, not
# Linear): the ZipVoice token embedding and the dialog speaker embedding
# (ref zipvoice.py:132, zipvoice_dialog.py:115).  Matched on exact module
# path ("embed" / "spk_embed"), not a loose suffix — "guidance_scale_embed"
# is a Linear and must be transposed.
_EMBEDDING_MODULES = ("embed", "spk_embed")


def _is_embedding_key(key: str) -> bool:
    parts = key.split(".")
    return (
        len(parts) >= 2
        and parts[-1] == "weight"
        and parts[-2] in _EMBEDDING_MODULES
    )


def load_torch_state_dict(path: Union[str, Path]) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.safetensors checkpoint into numpy, host-side.

    Handles the reference container formats: ``{"model": sd}``, a bare
    state_dict, and the DDP ``module.`` prefix (ref checkpoint.py:119-129).
    """
    path = Path(path)
    if path.suffix == ".safetensors":
        from safetensors.numpy import load_file  # host-side only

        sd = load_file(str(path))
        # same DDP 'module.' prefix strip as the .pt branch — a converted
        # DDP checkpoint must load identically from either container
        return {
            (k[len("module."):] if k.startswith("module.") else k): v
            for k, v in sd.items()
        }

    import torch  # host-side only; never used in the compute path

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt and isinstance(ckpt["model"], dict):
        sd = ckpt["model"]
    else:
        sd = ckpt
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module.") :]
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        out[k] = np.asarray(v)
    return out


def _is_linear_weight(key: str, arr: np.ndarray) -> bool:
    return key.endswith(".weight") and arr.ndim == 2 and not _is_embedding_key(key)


def _is_depthwise_weight(key: str, arr: np.ndarray) -> bool:
    return key.endswith("depthwise_conv.weight") and arr.ndim == 3


def state_dict_to_params(sd: Dict[str, np.ndarray]) -> Dict:
    """Flat torch state_dict -> nested param pytree (numpy leaves)."""
    root: Dict = {}
    for key, arr in sd.items():
        if _is_depthwise_weight(key, arr):
            c, one, k = arr.shape
            assert one == 1, arr.shape
            arr = np.transpose(arr[:, 0, :])  # (C, K) -> (K, C)
        elif _is_linear_weight(key, arr):
            arr = np.transpose(arr)  # (out, in) -> (in, out)
        parts = key.split(".")
        node = root
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = arr
    return root


def params_to_state_dict(params: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    """Nested param pytree -> flat torch-layout state_dict (inverse map)."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, name):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f"{name}.{k}" if name else k)
            return
        arr = np.asarray(node)
        if name.endswith("depthwise_conv.weight") and arr.ndim == 2:
            # ours (K, C) -> torch (C, 1, K)
            arr = np.transpose(arr)[:, None, :]
        elif _is_linear_weight(name, arr):
            arr = np.transpose(arr)
        flat[name] = arr

    walk(params, prefix)
    return flat


def load_params(path: Union[str, Path]) -> Dict:
    """Load a reference checkpoint file straight into a param pytree."""
    return state_dict_to_params(load_torch_state_dict(path))


def assert_tree_matches(params: Dict, reference_keys, strict: bool = True):
    """Verify every checkpoint tensor was consumed / every param was fed.

    Build-order step 1 acceptance (SURVEY.md §7.2): every tensor of the
    released model.pt must map into the pytree.
    """
    flat = set(params_to_state_dict(params).keys())
    ref = set(reference_keys)
    missing = ref - flat
    extra = flat - ref
    if strict and (missing or extra):
        raise ValueError(
            f"checkpoint mismatch: missing={sorted(missing)[:10]} "
            f"extra={sorted(extra)[:10]}"
        )
    return missing, extra
