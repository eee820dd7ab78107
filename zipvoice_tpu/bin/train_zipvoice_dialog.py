"""Dialog fine-tuning CLI — parity with `zipvoice.bin.train_zipvoice_dialog`.

Fine-tunes a trained base ZipVoice checkpoint into ZipVoice-Dialog: the
vocab is extended for the [S1]/[S2] turn tokens (the dialog tokens.txt has
+28 rows vs the base vocab, ref train_zipvoice_dialog.py:783-788), a fresh
speaker embedding is added, the LR schedule is fixed (ref :816), and the
loss masks the feature *suffix* (see models/dialog.py).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

from zipvoice_tpu.bin._train_common import (
    add_common_args,
    build_data,
    copy_model_dir_contract,
)


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, base_lr=0.0001)
    p.add_argument("--tokenizer", type=str, default="dialog")
    p.add_argument("--finetune-batch-count-offset", type=float, default=100000,
                   help="schedule offset so regularizers start relaxed "
                        "(ref train_zipvoice.py:564-565)")
    return p


def main(stereo: bool = False):
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.bin._train_common import maybe_init_distributed

    maybe_init_distributed(args)

    import jax

    from zipvoice_tpu.config import load_model_json
    from zipvoice_tpu.models.dialog import (
        duplicate_projections_stereo,
        extend_vocab_params,
        init_zipvoice_dialog,
        init_zipvoice_dialog_stereo,
    )
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

    if stereo:
        params = init_zipvoice_dialog_stereo(
            jax.random.PRNGKey(args.seed), model_cfg
        )
        if args.checkpoint:
            loaded = load_checkpoint(args.checkpoint, load_opt=False)["params"]
            # init from a (mono) dialog checkpoint with projection surgery
            # (ref train_zipvoice_dialog_stereo.py:785-791)
            loaded = duplicate_projections_stereo(loaded, model_cfg.feat_dim)
            params = extend_vocab_params(params, loaded)
    else:
        params = init_zipvoice_dialog(jax.random.PRNGKey(args.seed), model_cfg)
        if args.checkpoint:
            # init from the base ZipVoice checkpoint with vocab extension
            # (ref train_zipvoice_dialog.py:783-788, checkpoint.py:149-172)
            loaded = load_checkpoint(args.checkpoint, load_opt=False)["params"]
            params = extend_vocab_params(params, loaded)

    # stereo validates through the mixed-objective pathway: don't let
    # build_data eagerly decode+fbank the whole dev manifest with the mono
    # collator only to discard it
    sampler, collate, dev_batches = build_data(
        args, tokenizer, feat_cfg, model_cfg.pad_id, skip_dev=stereo
    )
    if stereo:
        from zipvoice_tpu.data.dataset import OnDeviceFbankCollator

        collate = OnDeviceFbankCollator(
            tokenizer, feat_cfg, pad_id=model_cfg.pad_id, three_channel=True
        )

    mesh = make_mesh()
    opt = scaled_adam(clipping_scale=2.0)
    base_train_cfg = TrainConfig(
        base_lr=args.base_lr,
        condition_drop_ratio=args.condition_drop_ratio,
        compute_dtype=args.dtype,
        schedule="fixed",  # FixedLRScheduler (ref :816)
        use_regularizers=not args.no_regularizers,
        loss="dialog",
        stereo=False,
    )
    trainer = Trainer(
        model_cfg=model_cfg,
        params=params,
        opt=opt,
        train_cfg=base_train_cfg,
        options=TrainerOptions(
            exp_dir=args.exp_dir, num_epochs=args.num_epochs,
            start_epoch=args.start_epoch, save_every_n=args.save_every_n,
            keep_last_k=args.keep_last_k, average_period=args.average_period,
            valid_interval=args.valid_interval, log_interval=args.log_interval,
            seed=args.seed, lr_hours=args.lr_hours,
            frame_rate=feat_cfg.frame_rate,
            max_duration=args.max_duration,
            batch_count_offset=args.finetune_batch_count_offset,
        ),
        mesh=mesh,
    )
    if stereo:
        # two objectives alternate per batch: two-channel CFM + speaker-
        # exclusive energy loss (se_weight=1) vs mixed-mono CFM
        # (ref train_zipvoice_dialog_stereo.py:380, :507)
        import dataclasses as _dc

        from zipvoice_tpu.train.step import make_train_step

        two_ch_fn = make_train_step(
            model_cfg, opt,
            _dc.replace(base_train_cfg, stereo=True, se_weight=1.0),
            mesh=mesh,
        )
        mixed_fn = trainer.step_fn

    copy_model_dir_contract(args, args.exp_dir)
    exp = Path(args.exp_dir)

    # resume fine-tune state like the base trainer (without this,
    # --start-epoch N restarted from the ORIGINAL --checkpoint with a fresh
    # optimizer, silently discarding epochs 1..N-1 of fine-tuning)
    sampler_state = None
    if args.start_epoch > 1:
        resume_path = exp / f"epoch-{args.start_epoch - 1}.pt"
        if resume_path.exists():
            sampler_state = trainer.resume(str(resume_path))
            import logging

            logging.info("resumed from %s", resume_path)
    if sampler_state:
        sampler.load_state_dict(sampler_state)

    from zipvoice_tpu.data.prefetch import PrefetchBatches

    for epoch in range(args.start_epoch, args.num_epochs + 1):
        trainer.epoch = epoch
        if not (sampler_state and epoch == args.start_epoch):
            sampler.set_epoch(epoch)
        sampler_state = None
        batches = PrefetchBatches(sampler, collate, depth=2)
        try:
            for i, batch in enumerate(batches):
                if stereo:
                    # alternate 2-channel / mixed objectives per batch
                    # (ref train_zipvoice_dialog_stereo.py:507, :355-358)
                    use_two = i % 2 == 1
                    f = model_cfg.feat_dim
                    feats = batch["features"]
                    batch = dict(batch)
                    batch["features"] = (
                        feats[:, :, : 2 * f] if use_two else feats[:, :, 2 * f :]
                    )
                    trainer.active_step_fn = two_ch_fn if use_two else mixed_fn
                    trainer.step_and_log(batch, dev_batches,
                                         sampler_state_fn=batches.state_dict)
                else:
                    trainer.step_and_log(batch, dev_batches,
                                         sampler_state_fn=batches.state_dict)
                if args.num_iters and trainer.batch_idx_train >= args.num_iters:
                    break
        finally:
            batches.close()  # release the producer on early break OR raise
        trainer.save(str(exp / f"epoch-{epoch}.pt"), batches.state_dict())
        if args.num_iters and trainer.batch_idx_train >= args.num_iters:
            break


if __name__ == "__main__":
    main(stereo=False)
