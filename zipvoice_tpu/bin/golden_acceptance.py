"""Golden acceptance CLI: certify the stack against released checkpoints.

The one command to run when the real ``k2-fsa/ZipVoice`` weights are
available (network or pre-downloaded dirs); writes a machine-readable
GOLDEN.json covering, per variant: strict checkpoint-tree match, tokenizer
contract + golden token ids, and f32/bf16 mel parity vs the torch reference
(ref infer_zipvoice.py:519-566 is the certified behavior).

Usage:
  # download from HF (needs network + huggingface_hub):
  python -m zipvoice_tpu.bin.golden_acceptance --models all --output GOLDEN.json

  # or with local model dirs ({model.pt, model.json, tokens.txt} each):
  python -m zipvoice_tpu.bin.golden_acceptance \
      --models zipvoice,zipvoice_distill \
      --model-dirs /ckpt/zipvoice,/ckpt/zipvoice_distill
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from pathlib import Path

from zipvoice_tpu.eval.golden import golden_acceptance
from zipvoice_tpu.io.model_dir import MODEL_REGISTRY

DEFAULT_FIXTURE = str(
    Path(__file__).resolve().parent.parent.parent
    / "tests" / "fixtures" / "token_goldens.json"
)


def _dry_run(names, dirs, args) -> int:
    """Rehearse the acceptance without weights (VERDICT r3 next #7): verify
    every file the real run would read, report exactly what's missing, and
    print the mechanical invocation for when weights are staged."""
    from zipvoice_tpu.io.model_dir import HF_REPO

    report = {"mode": "dry-run", "models": {}}
    ok = True
    for name, d in zip(names, dirs):
        entry = {"files": {}}
        if name not in MODEL_REGISTRY:
            entry["source"] = (
                f"UNKNOWN model '{name}' (known: {', '.join(MODEL_REGISTRY)})"
            )
            ok = False
            report["models"][name] = entry
            continue
        if d is None:
            sub = MODEL_REGISTRY[name]["hf_dir"]
            entry["source"] = f"hf://{HF_REPO}/{sub}/" + "{model.pt,model.json,tokens.txt}"
            try:
                import huggingface_hub  # noqa: F401

                entry["hf_hub"] = "importable"
            except ImportError:
                entry["hf_hub"] = "MISSING (pass --model-dirs or install)"
                ok = False
        else:
            entry["source"] = str(Path(d).resolve())
            for f in ("model.json", "tokens.txt"):
                entry["files"][f] = (
                    "ok" if (Path(d) / f).exists() else "MISSING"
                )
            have_ckpt = any(
                (Path(d) / c).exists()
                for c in ("model.pt", "model.safetensors")
            )
            entry["files"]["model.pt|model.safetensors"] = (
                "ok" if have_ckpt else "MISSING"
            )
            ok = ok and all(v == "ok" for v in entry["files"].values())
        report["models"][name] = entry
    report["fixture"] = (
        "ok" if Path(args.fixture).exists() else f"MISSING: {args.fixture}"
    )
    report["reference"] = (
        "ok" if Path(args.reference_path).exists()
        else f"absent: {args.reference_path} (parity will report gated)"
    )
    ok = ok and Path(args.fixture).exists()
    dirs_arg = (
        " --model-dirs " + ",".join("" if d is None else str(d) for d in dirs)
        if any(d is not None for d in dirs) else ""
    )
    report["invocation"] = (
        f"python -m zipvoice_tpu.bin.golden_acceptance"
        f" --models {','.join(names)}{dirs_arg}"
        f" --reference-path {args.reference_path}"
        f" --seconds {args.seconds} --output {args.output}"
    )
    report["expected_output_schema"] = "docs/parity.md#goldenjson-schema"
    report["status"] = "ready" if ok else "not-ready"
    print(json.dumps(report, indent=2))
    return 0 if ok else 1


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", type=str, default="all",
                   help="comma list of variants, or 'all'")
    p.add_argument("--model-dirs", type=str, default=None,
                   help="comma list of local model dirs aligned with "
                        "--models; omit to download from HF")
    p.add_argument("--reference-path", type=str, default="/root/reference")
    p.add_argument("--seconds", type=float, default=5.0)
    p.add_argument("--fixture", type=str, default=DEFAULT_FIXTURE,
                   help="golden token-id fixture (json)")
    p.add_argument("--output", type=str, default="GOLDEN.json")
    p.add_argument("--dry-run", action="store_true",
                   help="verify the file manifest the real run would read "
                        "and print the exact invocation, without loading "
                        "weights or computing parity")
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    names = (
        list(MODEL_REGISTRY) if args.models == "all"
        else args.models.split(",")
    )
    # empty entries mean "download from HF" — lets a mixed local/HF list
    # round-trip through the dry-run's printed invocation
    dirs = (
        [d or None for d in args.model_dirs.split(",")]
        if args.model_dirs else [None] * len(names)
    )
    if len(dirs) != len(names):
        p.error("--model-dirs must align with --models")

    if args.dry_run:
        sys.exit(_dry_run(names, dirs, args))

    reports = []
    for name, d in zip(names, dirs):
        if name not in MODEL_REGISTRY:
            p.error(f"unknown model: {name}")
        try:
            rep = golden_acceptance(
                name, d, args.reference_path, args.seconds,
                fixture_path=args.fixture,
            )
        except Exception as e:  # noqa: BLE001 — report, keep certifying rest
            logging.exception("golden acceptance errored for %s", name)
            rep = {"model_name": name, "status": "error", "error": repr(e)}
        reports.append(rep)
        logging.info("%s: %s", name, rep["status"])

    summary = {
        "overall": (
            "fail" if any(r["status"] in ("fail", "error") for r in reports)
            else "pass"
        ),
        "reports": reports,
    }
    Path(args.output).write_text(json.dumps(summary, indent=2))
    print(json.dumps({r["model_name"]: r["status"] for r in reports}))
    sys.exit(0 if summary["overall"] == "pass" else 1)


if __name__ == "__main__":
    main()
