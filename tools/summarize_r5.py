"""Merge the round-5 capture artifacts into one comparison table.

Reads (whichever exist):
  KERNEL_CHECK.json                 (f64-arbitrated conv_glu verdict,
                                     flip/rollw shear-adjoint probes,
                                     lane-padded kernel parity)
  PROFILE_r5_unfused.json           (first capture; mixed-edit session)
  PROFILE_r5_pa_off.json / PROFILE_r5_pa_on.json
                                    (same-session probs-apply A/B)
  PROFILE_r5_fused.json             (fused-eval with the clean r5 code)
  PROFILE_r5_convfused.json         (conv_glu kernel alone, attn unfused)
  PROFILE_train_r5.json             (full remat B=8 baseline)
  PROFILE_train_r5_clean.json / _noreg.json
                                    (same-session regularizer-share A/B)
  COST_ANALYSIS_r5.json             (XLA flops/bytes roofline, fwd vs bwd)
  (fm profiles since the glue rows also carry nfe_glue_only /
   stack_full(ds2) for the direct glue attribution)
  PROFILE_train_r5_flip.json        (expected FAIL: rev unsupported)
  PROFILE_train_r5_rollw.json       (stride=w-1 shear adjoint)
  PROFILE_train_r5_names.json / _names_b16 / _b16 / _b24
  INT8_RTF.json                     (ladder with fidelity closers)
and prints a compact table + writes R5_SUMMARY.json with the winning
eval config (lowest NFE us) and training config (lowest full-step ms
per-sample at each batch).

Usage: python tools/summarize_r5.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def _load(name):
    p = ROOT / name
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except Exception:  # noqa: BLE001 — partial artifact
        return None


def main():
    out = {"eval_nfe": {}, "train": {}, "kernel_check": None, "int8": None}

    kc = _load("KERNEL_CHECK.json")
    if kc:
        out["kernel_check"] = {
            "status": kc.get("status"),
            "conv_glu_kernel_vs_f64": kc["checks"].get("conv_glu_kernel_vs_f64"),
            "conv_glu_xla_vs_f64": kc["checks"].get("conv_glu_xla_vs_f64"),
            "bwd_shear_adj_flip": kc["checks"].get("bwd_shear_adj_flip"),
            "bwd_shear_adj_rollw": kc["checks"].get("bwd_shear_adj_rollw"),
            "probs_apply_max_err": kc["checks"].get("probs_apply_max_err"),
        }

    for tag, name in (
        ("r4_unfused", "PROFILE_r4_unfused.json"),
        ("r4_fused", "PROFILE_r4.json"),
        ("r5_first_unfused", "PROFILE_r5_unfused.json"),
        ("r5_pa_off", "PROFILE_r5_pa_off.json"),
        ("r5_pa_on", "PROFILE_r5_pa_on.json"),
        ("r5_fused", "PROFILE_r5_fused.json"),
        ("r5_conv_fused", "PROFILE_r5_convfused.json"),
    ):
        d = _load(name)
        if d and "_summary" in d:
            s = d["_summary"]
            out["eval_nfe"][tag] = {
                "nfe_us": s.get("nfe_measured_us"),
                "sampler_16step_est_ms": s.get("sampler_16step_est_ms"),
                "probs_apply": s.get("probs_apply"),
                "fused_eval": s.get("fused_eval"),
                "fused_conv": s.get("fused_conv"),
                "glue_residual_us": s.get("glue_residual_us"),
                # direct glue probes (r5 second capture adds them)
                "nfe_glue_only_us": d.get(
                    "nfe_glue_only(0layers,T1024)", {}).get("us"),
                "stack_full_ds2_us": d.get(
                    "stack_full(ds2,T1024)", {}).get("us"),
            }

    for tag, name in (
        ("r4_full_b8", "PROFILE_train_r4.json"),
        ("full_b8", "PROFILE_train_r5.json"),
        ("full_b8_flip", "PROFILE_train_r5_flip.json"),
        ("full_b8_rollw", "PROFILE_train_r5_rollw.json"),
        ("full_b8_clean", "PROFILE_train_r5_clean.json"),
        ("full_b8_noreg", "PROFILE_train_r5_noreg.json"),
        ("names_b8", "PROFILE_train_r5_names.json"),
        ("full_b16", "PROFILE_train_r5_b16.json"),
        ("full_b24", "PROFILE_train_r5_b24.json"),
        ("names_b16", "PROFILE_train_r5_names_b16.json"),
    ):
        d = _load(name)
        if d and "_summary" in d:
            s = d["_summary"]
            full = d.get("full_step", {})
            out["train"][tag] = {
                "full_step_ms": full.get("ms"),
                "mfu_full_step": s.get("mfu_full_step"),
                "bwd_over_fwd": None,
                "batch": s.get("batch"),
                "bwd_shear_adj": s.get("bwd_shear_adj"),
            }
            fwd = d.get("loss_fwd", {}).get("ms")
            fb = d.get("loss_fwd_bwd", {}).get("ms")
            if fwd and fb:
                out["train"][tag]["bwd_over_fwd"] = round(
                    (fb - fwd) / fwd, 2
                )

    out["int8"] = _load("INT8_RTF.json")
    out["cost_analysis"] = _load("COST_ANALYSIS_r5.json")

    # Winner selection excludes (a) cross-session rows — the first-capture
    # r5_first_unfused came from a mixed-edit session and layer numbers
    # jitter ~15% between tunnel sessions, so only the same-session v3
    # A/B rows may decide; and (b) instrumentation probes — full_b8_noreg
    # stubs the regularizers to identity (same analytic FLOPs, faster
    # step), so its inflated MFU is a SHARE measurement, not a runnable
    # config.  Both stay in the table for the reader.
    evals = {k: v for k, v in out["eval_nfe"].items()
             if v.get("nfe_us") and k.startswith("r5")
             and k != "r5_first_unfused"}
    if evals:
        out["best_eval"] = min(evals, key=lambda k: evals[k]["nfe_us"])
    elif out["eval_nfe"].get("r5_first_unfused", {}).get("nfe_us"):
        # no same-session A/B landed yet: fall back, and say so
        out["best_eval"] = "r5_first_unfused"
        out["best_eval_note"] = "cross-session first capture; v3 A/B pending"
    trains = {k: v for k, v in out["train"].items()
              if v.get("mfu_full_step")
              and k not in ("r4_full_b8", "full_b8_noreg")}
    if trains:
        out["best_train"] = max(
            trains, key=lambda k: trains[k]["mfu_full_step"]
        )

    (ROOT / "R5_SUMMARY.json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
