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
    args = p.parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    names = (
        list(MODEL_REGISTRY) if args.models == "all"
        else args.models.split(",")
    )
    dirs = args.model_dirs.split(",") if args.model_dirs else [None] * len(names)
    if len(dirs) != len(names):
        p.error("--model-dirs must align with --models")

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
