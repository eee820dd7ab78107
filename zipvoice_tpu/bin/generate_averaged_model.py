"""Offline checkpoint averaging — parity with
`zipvoice.bin.generate_averaged_model` (ref :164-210).

Produces the published-checkpoint recipe artifacts, e.g.
epoch-11-avg-4.pt = average over epochs (7, 11] via the running-average
differencing formula (ref checkpoint.py:297-362, egs run_emilia.sh:47-55).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--exp-dir", type=str, required=True)
    p.add_argument("--epoch", type=int, default=None,
                   help="end epoch (uses epoch-N.pt files)")
    p.add_argument("--iter", type=int, default=None,
                   help="end iteration (uses checkpoint-N.pt files)")
    p.add_argument("--avg", type=int, required=True,
                   help="number of checkpoints in the average window")
    p.add_argument("--out", type=str, default=None,
                   help="output path (default exp-dir/{epoch|iter}-N-avg-K.pt)")
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.train.checkpoint import (
        average_checkpoints_with_averaged_model,
        find_checkpoints,
        save_checkpoint,
    )

    exp = Path(args.exp_dir)
    if args.iter is not None:
        ckpts = find_checkpoints(str(exp), iteration=-args.iter)
        assert len(ckpts) > args.avg, (len(ckpts), args.avg)
        end, start = ckpts[0], ckpts[args.avg]
        tag = f"iter-{args.iter}-avg-{args.avg}"
    else:
        assert args.epoch is not None
        end = str(exp / f"epoch-{args.epoch}.pt")
        start = str(exp / f"epoch-{args.epoch - args.avg}.pt")
        tag = f"epoch-{args.epoch}-avg-{args.avg}"

    logging.info("averaging (%s, %s]", start, end)
    params = average_checkpoints_with_averaged_model(start, end)
    out = args.out or str(exp / f"{tag}.pt")
    save_checkpoint(out, params)
    logging.info("saved %s", out)


if __name__ == "__main__":
    main()
