"""Model diagnostics: per-module, per-dim activation/parameter statistics.

JAX rebuild of the reference's hook-based TensorDiagnostic machinery
(ref zipvoice/utils/diagnostics.py:29-693):

* per-dim summaries — for every tensor dimension, the 11-point percentile
  profile (sorted values at i*n//10) of the per-index mean/abs/rms/positive-
  fraction reductions over all other dims (ref get_tensor_stats :45-112 and
  the TensorDiagnostic print format);
* eigenvalue summary — percentiles of the eigenvalues of the x^T x
  covariance over the channel dim, for dims up to ``max_eig_dim`` (ref
  opts.max_eig_dim, stats_type "eigs");
* attention entropy — mean softmax entropy of each attention-weights tap
  (ref zipformer.py:1297-1322 logs this at eval time).

Since JAX has no module hooks, per-module activation stats come from the
tap registry in nn/zipformer (``set_diagnostics_tap``): the backbone runs
eagerly (unscanned, unjitted) once and every submodule output is reported
by name.  Used by the trainers' --print-diagnostics flag.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

MAX_EIG_DIM = 512  # ref TensorDiagnosticOptions.max_eig_dim


def _percentiles(v: np.ndarray) -> List[float]:
    """The reference's 11-point profile: sorted values at i*n//10."""
    v = np.sort(v.ravel())
    n = v.size
    idx = np.minimum((np.arange(11) * n) // 10, n - 1)
    return [float(x) for x in v[idx]]


def dim_stats(x: np.ndarray, dim: int) -> Dict[str, List[float]]:
    """Per-index reductions over all other dims, summarized as percentiles
    (ref get_tensor_stats: 'value'/'abs'/'rms'/'positive')."""
    x = np.asarray(x, np.float32)
    other = tuple(d for d in range(x.ndim) if d != dim)
    return {
        "mean": _percentiles(np.mean(x, axis=other)),
        "abs": _percentiles(np.mean(np.abs(x), axis=other)),
        "rms": _percentiles(np.sqrt(np.mean(x * x, axis=other))),
        "pos": _percentiles(np.mean(x > 0, axis=other)),
    }


def eig_stats(x: np.ndarray, dim: int = -1,
              max_eig_dim: int = MAX_EIG_DIM) -> Optional[List[float]]:
    """Eigenvalue percentiles of the covariance over `dim` (ref stats_type
    "eigs": eigs of x^T x with x reshaped to (-1, size))."""
    x = np.asarray(x, np.float32)
    size = x.shape[dim]
    if size > max_eig_dim or size < 2:
        return None
    x2 = np.moveaxis(x, dim, -1).reshape(-1, size)
    cov = x2.T @ x2 / max(x2.shape[0], 1)
    eigs = np.linalg.eigvalsh(cov)
    return _percentiles(eigs)


def attention_entropy(weights: np.ndarray) -> float:
    """Mean softmax entropy over (batch, heads, queries) of attention
    weights (B, H, Tq, Tk) (ref zipformer.py:1297-1322)."""
    w = np.asarray(weights, np.float64)
    ent = -(w * np.log(np.clip(w, 1e-20, None))).sum(axis=-1)
    return float(ent.mean())


def tensor_stats(x, with_dims: bool = False, with_eigs: bool = False) -> Dict:
    """Scalar summary (+ optional per-dim profiles and channel-dim eigs)."""
    x = np.asarray(x, np.float32)
    if x.size == 0:
        return {}
    out: Dict = {
        "shape": list(x.shape),
        "abs_mean": float(np.mean(np.abs(x))),
        "rms": float(np.sqrt(np.mean(x * x))),
        "pos_frac": float(np.mean(x > 0)),
        "min": float(x.min()),
        "max": float(x.max()),
    }
    if with_dims and x.ndim > 1:
        out["dims"] = {d: dim_stats(x, d) for d in range(x.ndim)
                       if x.shape[d] > 1}
    if with_eigs and x.ndim > 1:
        eigs = eig_stats(x, -1)
        if eigs is not None:
            out["eigs"] = eigs
    return out


def _walk(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk(v, f"{prefix}.{k}" if prefix else k)
    else:
        yield prefix, tree


def param_diagnostics(params, with_dims: bool = False) -> Dict[str, Dict]:
    return {name: tensor_stats(leaf, with_dims=with_dims)
            for name, leaf in _walk(params)}


def grad_diagnostics(grads, with_dims: bool = False) -> Dict[str, Dict]:
    return param_diagnostics(grads, with_dims=with_dims)


def activation_diagnostics(
    params, cfg, x, t=None, padding_mask=None,
    per_module: bool = True, with_dims: bool = True, with_eigs: bool = True,
) -> Dict[str, Dict]:
    """Per-module activation stats of one backbone forward on one batch.

    Taps every submodule output (attention weights, feedforwards, conv
    modules, attention modules, per-layer outputs) via
    nn.zipformer.set_diagnostics_tap, plus the stack outputs and in/out
    projections.  Attention-weight taps additionally get an "entropy" stat.
    """
    from zipvoice_tpu.nn import zipformer as zf
    from zipvoice_tpu.nn.functional import (
        linear,
        swoosh_r,
        timestep_embedding,
    )

    stats: Dict[str, Dict] = {}

    def tap(name: str, value):
        v = np.asarray(value, np.float32)
        s = tensor_stats(v, with_dims=with_dims, with_eigs=with_eigs)
        if name.endswith("self_attn_weights"):
            s["entropy"] = attention_entropy(v)
        stats[name] = s

    scan_before = zf._SCAN_LAYERS
    if per_module:
        # unscanned layers so taps see concrete per-layer arrays
        zf.set_scan_layers(False)
        zf.set_diagnostics_tap(tap)
    try:
        h = linear(params["in_proj"], x)
        stats["in_proj"] = tensor_stats(h, with_dims=with_dims,
                                        with_eigs=with_eigs)
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
            with zf._diag_scope(f"encoders.{i}"):
                if cfg.downsampling_factor[i] == 1:
                    h = zf._encoder_stack(sp, cfg, i, h, time_emb, padding_mask)
                else:
                    h = zf._downsampled_encoder_stack(
                        sp, cfg, i, h, time_emb, padding_mask
                    )
            stats[f"encoders.{i}"] = tensor_stats(
                h, with_dims=with_dims, with_eigs=with_eigs
            )
        out = linear(params["out_proj"], h)
        stats["out_proj"] = tensor_stats(out, with_dims=with_dims,
                                         with_eigs=with_eigs)
    finally:
        if per_module:
            zf.set_diagnostics_tap(None)
            zf.set_scan_layers(scan_before)
    return stats


def format_diagnostics(stats: Dict[str, Dict], top: Optional[int] = None,
                       verbose_dims: bool = False) -> str:
    """Reference-style printout: one scalar line per tensor; channel-dim
    percentile profile + eigs when present (ref TensorDiagnostic.print_diagnostics)."""
    lines = []
    for name, s in stats.items():
        if not s:
            continue
        line = (
            f"{name:60s} shape={s['shape']} abs={s['abs_mean']:.3e} "
            f"rms={s['rms']:.3e} pos={s['pos_frac']:.2f} "
            f"range=[{s['min']:.3e}, {s['max']:.3e}]"
        )
        if "entropy" in s:
            line += f" attn_entropy={s['entropy']:.3f}"
        lines.append(line)
        dims = s.get("dims")
        if dims:
            chan = max(dims)  # channel = trailing dim
            prof = dims[chan]
            lines.append(
                f"  dim={chan} rms percentiles {_fmt(prof['rms'])} "
                f"pos {_fmt(prof['pos'])}"
            )
            if verbose_dims:
                for d, p in dims.items():
                    if d == chan:
                        continue
                    lines.append(f"  dim={d} rms percentiles {_fmt(p['rms'])}")
        if "eigs" in s:
            lines.append(f"  eigs percentiles {_fmt(s['eigs'])}")
    if top:
        lines = lines[:top]
    return "\n".join(lines)


def _fmt(vals: List[float]) -> str:
    return "[" + " ".join(f"{v:.2e}" for v in vals) + "]"
