"""Flow-matching TTS training CLI — parity with `zipvoice.bin.train_zipvoice`.

Data comes from TSV manifests (id\\ttext\\twav_path[\\tstart\\tend]);
fbank features are computed on device (no lhotse precompute stage).

Example:
  python -m zipvoice_tpu.bin.train_zipvoice \
      --train-manifest data/train.tsv --dev-manifest data/dev.tsv \
      --token-file data/tokens.txt --tokenizer emilia \
      --model-config conf/zipvoice_base.json --exp-dir exp/zipvoice \
      --num-epochs 11 --max-duration 250 --base-lr 0.02 --lr-hours 30000
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    # data
    p.add_argument("--train-manifest", type=str, required=True)
    p.add_argument("--dev-manifest", type=str, default=None)
    p.add_argument("--token-file", type=str, required=True)
    p.add_argument("--tokenizer", type=str, default="emilia",
                   choices=["emilia", "espeak", "dialog", "libritts", "simple"])
    p.add_argument("--lang", type=str, default="en-us")
    p.add_argument("--max-duration", type=float, default=200.0,
                   help="max batch size in seconds of audio per host")
    p.add_argument("--max-len", type=float, default=30.0,
                   help="drop utterances longer than this (seconds)")
    p.add_argument("--min-len", type=float, default=1.0)
    # model
    p.add_argument("--model-config", type=str, required=True,
                   help="model.json (architecture + feature sections)")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="initial checkpoint (e.g. for finetuning)")
    # training
    p.add_argument("--exp-dir", type=str, default="exp/zipvoice")
    p.add_argument("--num-epochs", type=int, default=11)
    p.add_argument("--start-epoch", type=int, default=1,
                   help="resume from exp-dir/epoch-{start_epoch-1}.pt if >1")
    p.add_argument("--base-lr", type=float, default=0.02)
    p.add_argument("--lr-batches", type=float, default=7500)
    p.add_argument("--lr-epochs", type=float, default=10)
    p.add_argument("--lr-hours", type=float, default=0,
                   help="if >0, key the Eden epoch term to hours of speech")
    p.add_argument("--condition-drop-ratio", type=float, default=0.2)
    p.add_argument("--finetune", action="store_true",
                   help="fine-tuning mode: fixed LR schedule and regularizer "
                        "schedules pinned past their ramps "
                        "(ref train_zipvoice.py:204-210,564-565,967-968)")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--save-every-n", type=int, default=5000)
    p.add_argument("--keep-last-k", type=int, default=30)
    p.add_argument("--average-period", type=int, default=200)
    p.add_argument("--valid-interval", type=int, default=10000)
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--num-steps-per-epoch", type=int, default=0,
                   help="cap steps per epoch (0 = full manifest)")
    p.add_argument("--inf-check", action="store_true",
                   help="detect non-finite losses/params during training")
    p.add_argument("--print-diagnostics", action="store_true",
                   help="run activation/param diagnostics on one batch, exit")
    p.add_argument("--scan-oom", action="store_true",
                   help="run the largest-duration batch first to surface OOMs")
    p.add_argument("--no-regularizers", action="store_true",
                   help="disable training-time stochastic regularizers")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    from zipvoice_tpu.bin._train_common import (
        REMAT_POLICY_HELP,
        UNROLL_LAYERS_HELP,
    )

    p.add_argument("--unroll-layers", action="store_true",
                   help=UNROLL_LAYERS_HELP)
    p.add_argument("--remat-policy", type=str, default=None,
                   choices=["full", "all", "dots", "xprobs", "xprobs_ff"],
                   help=REMAT_POLICY_HELP)
    return p


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.bin._train_common import (
        build_data,
        copy_model_dir_contract,
        maybe_init_distributed,
    )

    maybe_init_distributed(args)

    import jax

    from zipvoice_tpu.config import load_model_json
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.parallel.mesh import make_mesh
    from zipvoice_tpu.text.tokenizer import get_tokenizer
    from zipvoice_tpu.train.checkpoint import load_checkpoint
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig
    from zipvoice_tpu.train.trainer import Trainer, TrainerOptions

    tokenizer = get_tokenizer(args.tokenizer, args.token_file, lang=args.lang)
    model_cfg, feat_cfg = load_model_json(
        args.model_config, vocab_size=tokenizer.vocab_size,
        pad_id=tokenizer.pad_id,
    )

    sampler, collate, dev_batches = build_data(
        args, tokenizer, feat_cfg, pad_id=model_cfg.pad_id
    )

    # model + optimizer
    params = init_zipvoice(jax.random.PRNGKey(args.seed), model_cfg)
    if args.checkpoint:
        params = load_checkpoint(args.checkpoint, load_opt=False)["params"]

    mesh = make_mesh()
    trainer = Trainer(
        model_cfg=model_cfg,
        params=params,
        opt=scaled_adam(clipping_scale=2.0),
        train_cfg=TrainConfig(
            base_lr=args.base_lr,
            lr_batches=args.lr_batches,
            lr_epochs=args.lr_epochs,
            condition_drop_ratio=args.condition_drop_ratio,
            compute_dtype=args.dtype,
            schedule="fixed" if args.finetune else "eden",
            use_regularizers=not args.no_regularizers,
        ),
        options=TrainerOptions(
            exp_dir=args.exp_dir,
            num_epochs=args.num_epochs,
            start_epoch=args.start_epoch,
            save_every_n=args.save_every_n,
            keep_last_k=args.keep_last_k,
            average_period=args.average_period,
            valid_interval=args.valid_interval,
            log_interval=args.log_interval,
            seed=args.seed,
            lr_hours=args.lr_hours,
            frame_rate=feat_cfg.frame_rate,
            max_duration=args.max_duration,
            inf_check=args.inf_check,
            batch_count_offset=100000.0 if args.finetune else 0.0,
        ),
        mesh=mesh,
    )

    if args.print_diagnostics:
        # stat taps on one batch, then exit (ref train_zipvoice.py:219-224)
        import numpy as np

        from zipvoice_tpu.utils.diagnostics import (
            activation_diagnostics,
            format_diagnostics,
            param_diagnostics,
        )

        batch = collate(next(iter(sampler)))
        print(format_diagnostics(param_diagnostics(params)))
        b, t, f = batch["features"].shape
        fm_in = np.concatenate([batch["features"]] * 3, axis=-1)
        stats = activation_diagnostics(
            params["fm_decoder"], model_cfg.fm_decoder_config(), fm_in,
            t=np.full((b,), 0.5, np.float32),
        )
        print(format_diagnostics(stats))
        return

    if args.scan_oom:
        # fwd+bwd+update the most pessimistic (longest total duration) batch
        # first (ref train_zipvoice.py:808-858 find_pessimistic_batches —
        # which does NOT mutate the model), then restore params/opt state
        # from host snapshots so the recipe is unchanged
        batches = sampler.pessimistic_batches(1)
        if batches:
            logging.info("scan-oom: running the largest batch")
            params_snap = jax.device_get(trainer.params)
            opt_snap = jax.device_get(trainer.opt_state)
            trainer.step_and_log(collate(batches[0]))
            trainer.params = jax.device_put(params_snap)
            trainer.opt_state = jax.device_put(opt_snap)
            trainer.batch_idx_train = 0
            # the probe batch must not leak into the hours-keyed LR
            # schedule or the running loss
            trainer.seen_seconds = 0.0
            trainer.tracker = type(trainer.tracker)()
            logging.info("scan-oom: ok (model state restored)")

    exp = Path(args.exp_dir)
    if args.start_epoch > 1:
        resume_path = exp / f"epoch-{args.start_epoch - 1}.pt"
        if resume_path.exists():
            sampler_state = trainer.resume(str(resume_path))
            if sampler_state:
                sampler.load_state_dict(sampler_state)
            logging.info("resumed from %s", resume_path)

    copy_model_dir_contract(args, exp)

    from zipvoice_tpu.data.prefetch import PrefetchBatches

    for epoch in range(args.start_epoch, args.num_epochs + 1):
        trainer.epoch = epoch
        sampler.set_epoch(epoch)
        logging.info("epoch %d: %d batches", epoch, len(sampler))
        # wav decode + fbank collation overlap the device step (the native IO
        # runtime releases the GIL, so one producer thread hides the latency)
        batches = PrefetchBatches(sampler, collate, depth=2)
        try:
            for i, batch in enumerate(batches):
                if args.num_steps_per_epoch and i >= args.num_steps_per_epoch:
                    break
                trainer.step_and_log(
                    batch, dev_batches, sampler_state_fn=batches.state_dict
                )
        finally:
            batches.close()  # release the producer on early break/exception
        trainer.save(str(exp / f"epoch-{epoch}.pt"), batches.state_dict())
        logging.info("saved epoch-%d.pt", epoch)


if __name__ == "__main__":
    main()
