"""Merge the round-4 capture artifacts into one comparison table.

Reads (whichever exist):
  PROFILE_train_r4.json            (remat=full baseline)
  PROFILE_train_r4_dots.json       (remat=dots — the only saved-residual
                                    policy that fits v5e HBM)
  PROFILE_train_r4_xprobs.json
  PROFILE_train_r4_xprobs_ff.json  (legacy; dropped from the queue —
                                    byte-identical to xprobs, see
                                    HBM_ACCOUNTING.json)
  PROFILE_train_r4_b16.json        (remat=full at B=16)
  PROFILE_train_r4_xprobs_b16.json (legacy name, still read if present)
  PROFILE_r4.json / PROFILE_r4_unfused.json   (eval-fusion A/B)
  INT8_RTF.json
and prints a compact table + writes R4_SUMMARY.json with the winning remat
policy (lowest full-step ms at B=8) and the fused-vs-unfused NFE delta.

Usage: python tools/summarize_r4.py
"""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load(name):
    p = REPO / name
    if not p.exists():
        return None
    try:
        return json.loads(p.read_text())
    except Exception as e:  # noqa: BLE001
        return {"_error": f"{type(e).__name__}: {e}"}


def main():
    out = {"train_remat": {}, "eval_fusion": {}, "int8": None}

    for tag, fname in (
        ("full", "PROFILE_train_r4.json"),
        ("dots", "PROFILE_train_r4_dots.json"),
        ("xprobs", "PROFILE_train_r4_xprobs.json"),
        ("xprobs_ff", "PROFILE_train_r4_xprobs_ff.json"),
        ("full_b16", "PROFILE_train_r4_b16.json"),
        ("xprobs_b16", "PROFILE_train_r4_xprobs_b16.json"),
    ):
        d = _load(fname)
        if not d or "_summary" not in d:
            continue
        s = d["_summary"]
        full_ms = d.get("full_step", {}).get("ms")
        fwd_ms = d.get("loss_fwd", {}).get("ms")
        fb_ms = d.get("loss_fwd_bwd", {}).get("ms")
        row = {
            "full_step_ms": full_ms,
            "fwd_ms": fwd_ms,
            "fwd_bwd_ms": fb_ms,
            "bwd_over_fwd": (
                round((fb_ms - fwd_ms) / fwd_ms, 2)
                if fwd_ms and fb_ms else None
            ),
            "mfu_full_step": s.get("mfu_full_step"),
            "batch": s.get("batch"),
        }
        out["train_remat"][tag] = row
        print(f"remat {tag:10s} step {full_ms} ms  mfu {s.get('mfu_full_step')}"
              f"  bwd/fwd {row['bwd_over_fwd']}")

    b8 = {k: v for k, v in out["train_remat"].items() if v.get("batch") == 8
          and v.get("full_step_ms")}
    if b8:
        best = min(b8, key=lambda k: b8[k]["full_step_ms"])
        out["best_remat_b8"] = best  # top level: train_remat holds row dicts only
        print(f"best remat policy at B=8: {best}")

    fused = _load("PROFILE_r4.json")
    unfused = _load("PROFILE_r4_unfused.json")
    for tag, d in (("fused", fused), ("unfused", unfused)):
        if not d:
            continue
        nfe = next((v for k, v in d.items() if k.startswith("fm_decoder_NFE")),
                   None)
        if nfe:
            out["eval_fusion"][tag] = {
                "nfe_us": nfe.get("us"), "pct_peak": nfe.get("pct_peak"),
            }
            print(f"NFE {tag:8s} {nfe.get('us')} us  {nfe.get('pct_peak')}% peak")
    ef = out["eval_fusion"]
    if ("fused" in ef and "unfused" in ef
            and ef["unfused"]["nfe_us"] and ef["fused"]["nfe_us"]):
        out["eval_fusion"]["speedup"] = round(
            ef["unfused"]["nfe_us"] / ef["fused"]["nfe_us"], 3
        )
        print(f"fusion speedup: {out['eval_fusion']['speedup']}x")

    out["int8"] = _load("INT8_RTF.json")
    hbm = _load("HBM_ACCOUNTING.json")
    if hbm:
        out["hbm_accounting"] = {
            "backend": hbm.get("backend"),
            "policies": {k: {kk: v.get(kk) for kk in
                             ("temp_gib", "fits_v5e_16gib")}
                         for k, v in hbm.get("policies", {}).items()
                         if isinstance(v, dict)},
        }
    (REPO / "R4_SUMMARY.json").write_text(json.dumps(out, indent=2))
    print("wrote R4_SUMMARY.json")


if __name__ == "__main__":
    main()
