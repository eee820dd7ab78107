"""Shared pieces of the training CLIs (data/args wiring)."""

from __future__ import annotations

import argparse

UNROLL_LAYERS_HELP = (
    "trace every encoder layer separately instead of lax.scan-of-layers.  "
    "Measured on v5e at 123M/B=8: 122.6 vs 128.1 ms/step (~4.5%% faster) "
    "for a ~2.5x longer one-time compile — the flash attention backward "
    "makes scan-of-remat nearly free; only worth it for very long "
    "production runs"
)

REMAT_POLICY_HELP = (
    "activation rematerialization policy for the backward pass (see "
    "nn.zipformer.set_remat_policy); 'full' = recompute everything "
    "(minimum memory, the default — and the measured on-chip optimum: "
    "the backward is bandwidth-bound, so saved-activation policies gain "
    "nothing; docs/training.md 'Remat policies and HBM accounting'), "
    "'xprobs' = save layer activations, replaying only the attention "
    "probs kernel; 'xprobs_ff' is a measured no-op vs 'xprobs' kept for "
    "the A/B artifact"
)


def add_common_args(p: argparse.ArgumentParser, base_lr: float = 0.02):
    p.add_argument("--train-manifest", type=str, required=True)
    p.add_argument("--dev-manifest", type=str, default=None)
    p.add_argument("--token-file", type=str, required=True)
    p.add_argument("--lang", type=str, default="en-us")
    p.add_argument("--max-duration", type=float, default=200.0)
    p.add_argument("--max-len", type=float, default=30.0)
    p.add_argument("--min-len", type=float, default=1.0)
    p.add_argument("--model-config", type=str, required=True)
    p.add_argument("--checkpoint", type=str, default=None,
                   help="initial checkpoint (finetune / distill teacher)")
    p.add_argument("--exp-dir", type=str, required=True)
    p.add_argument("--num-epochs", type=int, default=11)
    p.add_argument("--num-iters", type=int, default=0,
                   help="stop after this many steps (0 = epoch-driven)")
    p.add_argument("--start-epoch", type=int, default=1)
    p.add_argument("--base-lr", type=float, default=base_lr)
    p.add_argument("--lr-batches", type=float, default=7500)
    p.add_argument("--lr-epochs", type=float, default=10)
    p.add_argument("--lr-hours", type=float, default=0)
    p.add_argument("--condition-drop-ratio", type=float, default=0.2)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--save-every-n", type=int, default=5000)
    p.add_argument("--keep-last-k", type=int, default=30)
    p.add_argument("--average-period", type=int, default=200)
    p.add_argument("--valid-interval", type=int, default=10000)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-regularizers", action="store_true",
                   help="disable training-time stochastic regularizers")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(mesh then spans all hosts; batches shard per host)")
    p.add_argument("--unroll-layers", action="store_true",
                   help=UNROLL_LAYERS_HELP)
    p.add_argument("--remat-policy", type=str, default=None,
                   choices=["full", "all", "dots", "xprobs", "xprobs_ff"],
                   help=REMAT_POLICY_HELP)
    return p


def maybe_init_distributed(args):
    from zipvoice_tpu.models.pipeline import enable_compilation_cache

    enable_compilation_cache()
    if getattr(args, "unroll_layers", False):
        from zipvoice_tpu.nn.zipformer import set_scan_layers

        set_scan_layers(False)
    if getattr(args, "remat_policy", None):
        from zipvoice_tpu.nn.zipformer import set_remat_policy

        set_remat_policy(
            None if args.remat_policy == "full" else args.remat_policy
        )
    if getattr(args, "distributed", False):
        import jax

        jax.distributed.initialize()


def build_data(args, tokenizer, feat_cfg, pad_id, num_channels: int = 1,
               skip_dev: bool = False):
    import jax

    from zipvoice_tpu.data.dataset import (
        DurationBucketSampler,
        OnDeviceFbankCollator,
        read_tsv_manifest,
    )

    train_utts = read_tsv_manifest(args.train_manifest)
    sampler = DurationBucketSampler(
        train_utts, max_duration=args.max_duration, max_len=args.max_len,
        min_len=args.min_len, seed=args.seed,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    collate = OnDeviceFbankCollator(tokenizer, feat_cfg, pad_id=pad_id)
    dev_batches = None
    if args.dev_manifest and not skip_dev:
        dev_utts = read_tsv_manifest(args.dev_manifest)
        dev_sampler = DurationBucketSampler(
            dev_utts, max_duration=args.max_duration, shuffle=False,
            max_len=args.max_len, min_len=args.min_len,
            process_index=jax.process_index(),
            process_count=jax.process_count(),
        )
        dev_batches = [collate(b) for b in dev_sampler]
    return sampler, collate, dev_batches


def copy_model_dir_contract(args, exp_dir):
    """Copy model.json/tokens.txt into the exp dir (ref train_zipvoice.py:
    897-899) so the trained dir satisfies the model-dir contract."""
    import jax

    from pathlib import Path

    if jax.process_index() == 0:
        exp = Path(exp_dir)
        exp.mkdir(parents=True, exist_ok=True)
        (exp / "model.json").write_text(Path(args.model_config).read_text())
        (exp / "tokens.txt").write_text(Path(args.token_file).read_text())
