"""Model diagnostics: per-tensor / per-activation statistics.

Equivalent of the reference's hook-based TensorDiagnostic machinery
(ref zipvoice/utils/diagnostics.py): since JAX has no module hooks, parameter
and gradient stats are computed directly over the pytree, and activation
stats come from a tapped forward that re-runs the backbone stack-by-stack.
Used by the trainers' --print-diagnostics flag.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def tensor_stats(x) -> Dict[str, float]:
    """abs-mean / rms / positive-fraction / min / max (cf. ref
    diagnostics.py get_tensor_stats :45-112)."""
    x = np.asarray(x, np.float32)
    if x.size == 0:
        return {}
    return {
        "shape": list(x.shape),
        "abs_mean": float(np.mean(np.abs(x))),
        "rms": float(np.sqrt(np.mean(x * x))),
        "pos_frac": float(np.mean(x > 0)),
        "min": float(x.min()),
        "max": float(x.max()),
    }


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, f"{prefix}.{k}" if prefix else k)
    else:
        yield prefix, tree


def param_diagnostics(params) -> Dict[str, Dict]:
    return {name: tensor_stats(leaf) for name, leaf in _walk(params)}


def grad_diagnostics(grads) -> Dict[str, Dict]:
    return param_diagnostics(grads)


def activation_diagnostics(
    params, cfg, x, t=None, padding_mask=None
) -> Dict[str, Dict]:
    """Stats of each encoder stack's output on one batch (the reference taps
    every module; stack granularity covers the same failure modes at a
    fraction of the plumbing)."""
    from zipvoice_tpu.nn.functional import (
        linear,
        swoosh_r,
        timestep_embedding,
    )
    from zipvoice_tpu.nn import zipformer as zf

    stats: Dict[str, Dict] = {}
    h = linear(params["in_proj"], x)
    stats["in_proj"] = tensor_stats(h)
    if t is not None:
        time_emb = timestep_embedding(t, cfg.time_embed_dim).astype(x.dtype)
        time_emb = linear(
            params["time_embed"]["2"],
            swoosh_r(linear(params["time_embed"]["0"], time_emb)),
        )
    else:
        time_emb = None
    for i in range(cfg.num_stacks):
        sp = params["encoders"][str(i)]
        if cfg.downsampling_factor[i] == 1:
            h = zf._encoder_stack(sp, cfg, i, h, time_emb, padding_mask)
        else:
            h = zf._downsampled_encoder_stack(
                sp, cfg, i, h, time_emb, padding_mask
            )
        stats[f"encoders.{i}"] = tensor_stats(h)
    out = linear(params["out_proj"], h)
    stats["out_proj"] = tensor_stats(out)
    return stats


def format_diagnostics(stats: Dict[str, Dict], top: Optional[int] = None) -> str:
    lines = []
    for name, s in stats.items():
        if not s:
            continue
        lines.append(
            f"{name:60s} shape={s['shape']} abs={s['abs_mean']:.3e} "
            f"rms={s['rms']:.3e} pos={s['pos_frac']:.2f} "
            f"range=[{s['min']:.3e}, {s['max']:.3e}]"
        )
    if top:
        lines = lines[:top]
    return "\n".join(lines)
