"""Weight-only int8 quantization for deployment.

TPU-native counterpart of the reference's dynamic-int8 ONNX export
(ref zipvoice/bin/onnx_export.py:384-400: quantize_dynamic over MatMul):
every linear weight is stored as int8 with a per-output-channel float scale;
at runtime ``nn.functional.linear`` computes ``(x @ int8_w.astype(bf16)) *
scale`` — the cast fuses into the matmul and the scale into its epilogue, so
weight HBM traffic halves vs bf16 (the bandwidth that bounds small-batch
inference) while accumulation stays in the compute dtype.

Only 2-D weights consumed by ``linear`` are quantized; embedding tables
(index lookups) and depthwise-conv kernels keep full precision, matching
the reference's MatMul-only quantization.

Fidelity closers (r5, VERDICT r4 next #5): the round-4 int8 ladder missed
the repo's 1e-3 mel-MSE yardstick (weight-only 1.09e-3 / dynamic 1.94e-3
vs bf16, INT8_RTF.json), so the cancellation-sensitive closers stay
unquantized by default — the model-level velocity/output head (its output
feeds the CFG combination and the Euler state accumulation) and the
time-embed MLPs (they seed every layer's additive conditioning; the same
set bf16 f32_closers protects, docs/parity.md).  Together they are <1 MB
of the 123M model, so the RTF cost of keeping them bf16 is nil.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

# param-tree keys whose "weight" is not a linear matmul operand, plus the
# time-embed conditioning MLPs (fidelity closers, see module docstring)
EXCLUDE_KEYS = (
    "embed", "spk_embed", "depthwise_conv",
    "time_embed", "time_emb", "guidance_scale_embed",
)

# exact path suffixes of the model-level output heads (NOT the per-layer
# module out_projs, whose paths end with e.g. ("self_attn1", "out_proj"))
EXCLUDE_PATH_SUFFIXES: Tuple[Tuple[str, ...], ...] = (
    ("fm_decoder", "out_proj"),
    ("fm_decoder", "in_proj"),
    ("text_encoder", "out_proj"),
    # two-stream (dialog-stereo) heads: ModuleList projections keyed "0"/"1"
    ("fm_decoder", "out_proj", "0"),
    ("fm_decoder", "out_proj", "1"),
    ("fm_decoder", "in_proj", "0"),
    ("fm_decoder", "in_proj", "1"),
)


def quantize_linear_int8(
    params: Dict,
    min_elems: int = 4096,
    exclude_keys: Sequence[str] = EXCLUDE_KEYS,
    exclude_path_suffixes: Sequence[Tuple[str, ...]] = EXCLUDE_PATH_SUFFIXES,
) -> Dict:
    """Replace each eligible {"weight": (in, out), ...} with
    {"weight_int8": int8, "weight_scale": (out,) float32, ...}.

    Symmetric per-output-channel quantization: scale = max|w_col| / 127.
    """

    def walk(d, path):
        if not isinstance(d, dict):
            return d
        if (
            "weight" in d
            and getattr(d["weight"], "ndim", 0) == 2
            and np.size(d["weight"]) >= min_elems
            and not any(k in path for k in exclude_keys)
            and not any(
                path[len(path) - len(suf):] == tuple(suf)
                for suf in exclude_path_suffixes
            )
        ):
            w = np.asarray(d["weight"], np.float32)
            scale = np.maximum(np.max(np.abs(w), axis=0) / 127.0, 1e-12)
            q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
            out = {k: walk(v, path + (k,)) for k, v in d.items()
                   if k != "weight"}
            out["weight_int8"] = q
            out["weight_scale"] = scale.astype(np.float32)
            return out
        return {k: walk(v, path + (k,)) for k, v in d.items()}

    return walk(params, ())


def cast_quantized_tree(params: Dict, dtype) -> "Dict":
    """Device-cast policy for an int8-quantized tree, single-sourced for
    every consumer (export, serving pipeline, RTF probe): int8 weights
    stay int8, ``weight_scale`` stays float32 (it multiplies the f32 dot
    accumulator — rounding it to bf16 first would throw away half the
    precision the int8 quantization preserved, see nn.functional.linear),
    and every other leaf goes to the compute ``dtype``."""
    import jax.numpy as jnp

    def walk(tree):
        if not isinstance(tree, dict):
            return jnp.asarray(tree, dtype)
        return {
            k: (jnp.asarray(v) if k in ("weight_int8", "weight_scale")
                else walk(v))
            for k, v in tree.items()
        }

    return walk(params)


def dequantize_linear_int8(params: Dict) -> Dict:
    """Inverse of quantize_linear_int8 (up to rounding): restores "weight"."""

    def walk(d):
        if not isinstance(d, dict):
            return d
        if "weight_int8" in d:
            out = {k: walk(v) for k, v in d.items()
                   if k not in ("weight_int8", "weight_scale")}
            out["weight"] = (
                np.asarray(d["weight_int8"], np.float32)
                * np.asarray(d["weight_scale"], np.float32)
            )
            return out
        return {k: walk(v) for k, v in d.items()}

    return walk(params)


def quantized_bytes(params: Dict) -> int:
    """Total parameter bytes of a (possibly quantized) tree."""
    import jax

    return sum(np.size(a) * np.dtype(getattr(a, "dtype", np.float32)).itemsize
               for a in jax.tree.leaves(params))
