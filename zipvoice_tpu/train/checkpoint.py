"""Training checkpoints: save/load/resume, running model average, pruning.

Rebuild of ref zipvoice/utils/checkpoint.py for the JAX stack:

* checkpoint files are torch-format state_dicts (via io/checkpoint's layout
  bridge) so our checkpoints interoperate with the reference tooling and
  published-model consumers; optimizer/bookkeeping state rides along as
  numpy pytrees in the same pickle;
* the float64 running average (`model_avg`, updated every `average_period`
  batches, ref checkpoint.py:482-513) and the pairwise differencing recipe
  `average_checkpoints_with_averaged_model` (ref :297-362) are reproduced
  exactly — that differencing is how the published checkpoints were made;
* `find_checkpoints` / `remove_checkpoints` keep-last-k pruning (ref
  :234-294, :365-400).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from zipvoice_tpu.io.checkpoint import params_to_state_dict, state_dict_to_params


def _to_numpy_tree(tree):
    return jax.tree.map(lambda a: np.asarray(a), tree)


def save_checkpoint(
    filename: str,
    params: Dict,
    model_avg: Optional[Dict] = None,
    model_ema: Optional[Dict] = None,
    opt_state: Any = None,
    sampler_state: Any = None,
    info: Optional[Dict] = None,
):
    """Save a checkpoint; `info` carries scalars like batch_idx_train, epoch,
    average_period, best losses (ref checkpoint.py:39-105).  model_ema holds
    the distillation EMA teacher (ref checkpoint.py:62-66)."""
    import torch

    ckpt: Dict[str, Any] = {
        "model": {
            k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in params_to_state_dict(_to_numpy_tree(params)).items()
        }
    }
    if model_avg is not None:
        ckpt["model_avg"] = {
            k: torch.from_numpy(np.ascontiguousarray(v).copy()).to(torch.float64)
            for k, v in params_to_state_dict(_to_numpy_tree(model_avg)).items()
        }
    if model_ema is not None:
        ckpt["model_ema"] = {
            k: torch.from_numpy(np.ascontiguousarray(v).copy())
            for k, v in params_to_state_dict(_to_numpy_tree(model_ema)).items()
        }
    if opt_state is not None:
        ckpt["opt_state"] = _to_numpy_tree(opt_state)
    if sampler_state is not None:
        ckpt["sampler"] = sampler_state
    for k, v in (info or {}).items():
        ckpt[k] = v
    tmp = f"{filename}.tmp"
    torch.save(ckpt, tmp)
    os.replace(tmp, filename)


def load_checkpoint(filename: str, load_opt: bool = True) -> Dict[str, Any]:
    """Load a checkpoint into pytrees.  Returns dict with keys:
    params, model_avg (maybe None), opt_state (maybe None), sampler, info."""
    import torch

    ckpt = torch.load(filename, map_location="cpu", weights_only=False)
    out: Dict[str, Any] = {}
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
          for k, v in ckpt.pop("model").items()}
    out["params"] = state_dict_to_params(sd)
    if "model_avg" in ckpt:
        # keep the saved dtype: the running average is accumulated AND
        # saved in float64; truncating to f32 on every resume would leak
        # amplified rounding into average_checkpoints_with_averaged_model
        # (the start/end differencing multiplies dtype error by
        # b_end/interval — 30x for checkpoints 2k steps apart at step 60k)
        sda = {
            k: np.asarray(v.numpy() if hasattr(v, "numpy") else v)
            for k, v in ckpt.pop("model_avg").items()
        }
        out["model_avg"] = state_dict_to_params(sda)
    else:
        out["model_avg"] = None
    if "model_ema" in ckpt:
        out["model_ema"] = state_dict_to_params(
            {k: np.asarray(v.numpy() if hasattr(v, "numpy") else v)
             for k, v in ckpt.pop("model_ema").items()}
        )
    else:
        out["model_ema"] = None
    out["opt_state"] = ckpt.pop("opt_state", None)
    out["sampler"] = ckpt.pop("sampler", None)
    out["info"] = ckpt
    return out


# ---------------------------------------------------------------------------
# Running average (ref checkpoint.py:452-513)
# ---------------------------------------------------------------------------


def update_averaged_model(
    model_avg: Dict, params: Dict, batch_idx_train: int, average_period: int
) -> Dict:
    """model_avg <- cur * (period/batch) + avg * (1 - period/batch); float64
    accumulation like the reference's .to(torch.float64) copy."""
    w_cur = average_period / batch_idx_train
    w_avg = 1.0 - w_cur
    return jax.tree.map(
        lambda a, p: (a.astype(np.float64) * w_avg
                      + np.asarray(p, np.float64) * w_cur),
        model_avg, _to_numpy_tree(params),
    )


def init_averaged_model(params: Dict) -> Dict:
    return jax.tree.map(lambda p: np.asarray(p, np.float64), params)


def average_checkpoints_with_averaged_model(
    filename_start: str, filename_end: str
) -> Dict:
    """avg over (start, end] = (avg_end*end - avg_start*start) / (end-start),
    computed overflow-safely (ref checkpoint.py:297-362).  Returns a param
    pytree (float32)."""
    import torch

    cs = torch.load(filename_start, map_location="cpu", weights_only=False)
    ce = torch.load(filename_end, map_location="cpu", weights_only=False)
    if "model_avg" not in cs or "model_avg" not in ce:
        # Checkpoints written without a running average (e.g. by external
        # tooling): degrade to the plain mean of the two raw weight sets
        # rather than crashing — clearly weaker than the reference recipe,
        # so warn loudly.
        import logging

        logging.warning(
            "model_avg missing in %s / %s; falling back to the plain mean of "
            "the two checkpoints' raw weights (NOT the running-average "
            "differencing recipe)", filename_start, filename_end,
        )
        avg_sd = {
            k: ((np.asarray(v.to(torch.float64).numpy())
                 + np.asarray(cs["model"][k].to(torch.float64).numpy())) / 2.0
                ).astype(np.float32)
            for k, v in ce["model"].items()
        }
        return state_dict_to_params(avg_sd)
    period = cs["average_period"]
    b_start = (cs["batch_idx_train"] // period) * period
    b_end = (ce["batch_idx_train"] // period) * period
    interval = b_end - b_start
    assert interval > 0, (b_start, b_end)
    weight_end = b_end / interval
    weight_start = 1.0 - weight_end

    avg_sd = {}
    for k, v_end in ce["model_avg"].items():
        v_end = np.asarray(v_end.to(torch.float64).numpy())
        v_start = np.asarray(cs["model_avg"][k].to(torch.float64).numpy())
        avg = (v_end + v_start * (weight_start / weight_end)) * weight_end
        avg_sd[k] = avg.astype(np.float32)
    return state_dict_to_params(avg_sd)


# ---------------------------------------------------------------------------
# Discovery / pruning (ref checkpoint.py:234-294, 365-400)
# ---------------------------------------------------------------------------


def find_checkpoints(out_dir: str, iteration: int = 0) -> List[str]:
    """List checkpoint-*.pt sorted by global batch index (desc).  With
    iteration > 0, only those >= iteration; < 0, only those <= -iteration."""
    pattern = re.compile(r"checkpoint-(\d+).pt$")
    found = []
    for f in glob.glob(os.path.join(out_dir, "checkpoint-*.pt")):
        m = pattern.search(f)
        if m:
            found.append((int(m.group(1)), f))
    if iteration > 0:
        found = [x for x in found if x[0] >= iteration]
    elif iteration < 0:
        found = [x for x in found if x[0] <= -iteration]
    return [f for _, f in sorted(found, reverse=True)]


def remove_checkpoints(out_dir: str, topk: int):
    assert topk >= 1, topk
    for f in find_checkpoints(out_dir)[topk:]:
        os.remove(f)
