"""Vocos vocoder (mel -> waveform) in JAX.

JAX re-implementation of the charactr/vocos-mel-24khz architecture that the
reference loads as an external torch package (ref: zipvoice/bin/
infer_zipvoice.py:249-273 — `Vocos.from_pretrained("charactr/vocos-mel-24khz")`,
`vocoder.decode(mel) -> wav`).  There is no JAX Vocos upstream, so this is a
from-scratch rebuild:

* backbone: Conv1d embed (k=7) -> LayerNorm -> 8 ConvNeXt blocks
  (depthwise k=7 + LayerNorm + pointwise MLP x3 + layer-scale gamma) ->
  final LayerNorm;
* head: Linear(dim, n_fft+2) -> split (log-magnitude, phase) ->
  mag * e^{i phase} -> ISTFT (center), via audio/stft.py's matmul ISTFT.

Weight layout follows io/checkpoint.py conventions (Linear (in, out),
depthwise (K, C)); `load_vocos_params` maps the published torch state_dict
(pytorch_model.bin / config.yaml on HF) into this tree.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.audio.stft import hann_window, istft

Params = Dict[str, object]


@dataclasses.dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    padding: str = "center"


def _layer_norm(x, weight, bias, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


def _depthwise_conv7(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """(B, T, C) depthwise conv, kernel K odd, SAME padding — grouped conv
    (XLA's conv emitter beats K-tap shift-fma on TPU, cf. nn/zipformer
    _conv_module)."""
    k = w.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w[:, None, :].astype(x.dtype), window_strides=(1,),
        padding=[(pad, pad)], dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=x.shape[-1],
    )
    return y + b


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """(B, T, Cin) standard conv, w (K, Cin, Cout), SAME padding."""
    k = w.shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + b


def init_vocos(key, cfg: VocosConfig = VocosConfig()) -> Params:
    """Random init (for tests / training from scratch)."""
    import math

    keys = jax.random.split(key, 4 + cfg.num_layers)

    def lin(k, i, o):
        bound = 1.0 / math.sqrt(i)
        kw, kb = jax.random.split(k)
        return {
            "weight": jax.random.uniform(kw, (i, o), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(kb, (o,), jnp.float32, -bound, bound),
        }

    def convnext_block(k):
        k1, k2, k3 = jax.random.split(k, 3)
        bound = 1.0 / math.sqrt(7)
        return {
            "dwconv": {
                "weight": jax.random.uniform(
                    k1, (7, cfg.dim), jnp.float32, -bound, bound
                ),
                "bias": jnp.zeros((cfg.dim,), jnp.float32),
            },
            "norm": {
                "weight": jnp.ones((cfg.dim,), jnp.float32),
                "bias": jnp.zeros((cfg.dim,), jnp.float32),
            },
            "pwconv1": lin(k2, cfg.dim, cfg.intermediate_dim),
            "pwconv2": lin(k3, cfg.intermediate_dim, cfg.dim),
            "gamma": jnp.full((cfg.dim,), 1.0 / cfg.num_layers, jnp.float32),
        }

    bound_e = 1.0 / (7 * cfg.input_channels) ** 0.5
    return {
        "backbone": {
            "embed": {
                "weight": jax.random.uniform(
                    keys[0], (7, cfg.input_channels, cfg.dim), jnp.float32,
                    -bound_e, bound_e,
                ),
                "bias": jnp.zeros((cfg.dim,), jnp.float32),
            },
            "norm": {
                "weight": jnp.ones((cfg.dim,), jnp.float32),
                "bias": jnp.zeros((cfg.dim,), jnp.float32),
            },
            "convnext": {
                str(i): convnext_block(keys[2 + i]) for i in range(cfg.num_layers)
            },
            "final_layer_norm": {
                "weight": jnp.ones((cfg.dim,), jnp.float32),
                "bias": jnp.zeros((cfg.dim,), jnp.float32),
            },
        },
        "head": {"out": lin(keys[1], cfg.dim, cfg.n_fft + 2)},
    }


def vocos_decode(
    params: Params, mel: jax.Array, cfg: VocosConfig = VocosConfig()
) -> jax.Array:
    """mel (B, T, n_mels) -> waveform (B, (T-1)*hop).

    Equivalent of torch `vocoder.decode(mel.permute(0, 2, 1))`
    (ref infer_zipvoice.py:378) but batch-time-feature layout.
    """
    bb = params["backbone"]
    x = _conv1d(mel, bb["embed"]["weight"], bb["embed"]["bias"])
    x = _layer_norm(x, bb["norm"]["weight"], bb["norm"]["bias"])
    for i in range(cfg.num_layers):
        blk = bb["convnext"][str(i)]
        res = x
        x = _depthwise_conv7(x, blk["dwconv"]["weight"], blk["dwconv"]["bias"])
        x = _layer_norm(x, blk["norm"]["weight"], blk["norm"]["bias"])
        x = jnp.dot(x, blk["pwconv1"]["weight"]) + blk["pwconv1"]["bias"]
        x = jax.nn.gelu(x, approximate=False)
        x = jnp.dot(x, blk["pwconv2"]["weight"]) + blk["pwconv2"]["bias"]
        x = res + x * blk["gamma"]
    x = _layer_norm(
        x, bb["final_layer_norm"]["weight"], bb["final_layer_norm"]["bias"]
    )

    out = jnp.dot(x, params["head"]["out"]["weight"]) + params["head"]["out"]["bias"]
    half = cfg.n_fft // 2 + 1
    log_mag, phase = out[..., :half], out[..., half:]
    # vocos ISTFTHead: exp then clip at 1e2 (safeguard against exploding mags)
    mag = jnp.clip(jnp.exp(log_mag), max=1e2)
    re = mag * jnp.cos(phase)
    im = mag * jnp.sin(phase)
    return istft(
        re, im, cfg.n_fft, cfg.hop_length,
        hann_window(cfg.n_fft, periodic=True), center=True,
    )


def load_vocos_params(state_dict: Dict[str, np.ndarray]) -> Params:
    """Map the published Vocos torch state_dict into our tree.

    Torch key examples:
      backbone.embed.weight (512,100,7) -> (7,100,512)
      backbone.convnext.0.dwconv.weight (512,1,7) -> (7,512)
      backbone.convnext.0.pwconv1.weight (1536,512) -> (512,1536)
      head.out.weight (1026,512) -> (512,1026)
      head.istft.window -> dropped (we rebuild the hann window)
    """
    root: Params = {}
    for key, arr in state_dict.items():
        arr = np.asarray(arr)
        if key.startswith("feature_extractor."):
            continue  # torch-side mel extractor; ours is audio/mel.py
        if key.endswith("istft.window"):
            continue
        if key.endswith("embed.weight") and arr.ndim == 3:
            arr = np.transpose(arr, (2, 1, 0))  # (O,I,K)->(K,I,O)
        elif key.endswith("dwconv.weight") and arr.ndim == 3:
            arr = np.transpose(arr[:, 0, :])  # (C,1,K)->(K,C)
        elif key.endswith(".weight") and arr.ndim == 2:
            arr = np.transpose(arr)
        parts = key.split(".")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root
