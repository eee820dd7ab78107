"""Distillation training CLI — parity with `zipvoice.bin.train_zipvoice_distill`.

Two stages (ref train_zipvoice_distill.py, egs run_emilia.sh:59-105):

* --distill-stage first:  teacher = trained base ZipVoice checkpoint (CFG
  path); student = guidance-embedded copy; 60k iters @ lr 5e-4.
* --distill-stage second: teacher = EMA(student) (decay 0.9999); init from
  the averaged stage-1 checkpoint; 2k iters @ lr 1e-4.

Only the student's fm_decoder trains.  Checkpoints hold the student under
"model" and the teacher under "model_ema" like the reference.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from zipvoice_tpu.bin._train_common import (
    add_common_args,
    build_data,
    copy_model_dir_contract,
)


def get_parser():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, base_lr=0.0005)
    p.add_argument("--tokenizer", type=str, default="emilia")
    p.add_argument("--distill-stage", type=str, default="first",
                   choices=["first", "second"])
    p.add_argument("--teacher-checkpoint", type=str, required=True,
                   help="stage first: trained base ZipVoice ckpt; "
                        "stage second: averaged stage-1 student ckpt")
    return p


def _merge_into_fresh(fresh, loaded):
    """Copy every loaded tensor whose name+shape matches into the fresh tree
    (the distill student adds guidance_scale_embed, which stays fresh)."""
    from zipvoice_tpu.io.checkpoint import (
        params_to_state_dict,
        state_dict_to_params,
    )
    import jax

    f = params_to_state_dict(jax.tree.map(np.asarray, fresh))
    ld = params_to_state_dict(jax.tree.map(np.asarray, loaded))
    out = dict(f)
    for k, v in ld.items():
        if k in f and f[k].shape == v.shape:
            out[k] = v
    return state_dict_to_params(out)


def main():
    args = get_parser().parse_args()
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

    from zipvoice_tpu.bin._train_common import maybe_init_distributed

    maybe_init_distributed(args)

    import jax

    from zipvoice_tpu.config import load_model_json
    from zipvoice_tpu.models.distill import distill_config, init_zipvoice_distill
    from zipvoice_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from zipvoice_tpu.text.tokenizer import get_tokenizer
    from zipvoice_tpu.train.checkpoint import (
        init_averaged_model,
        load_checkpoint,
        remove_checkpoints,
        save_checkpoint,
        update_averaged_model,
    )
    from zipvoice_tpu.train.distill_step import (
        draw_t_schedule,
        make_distill_train_step,
    )
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig

    tokenizer = get_tokenizer(args.tokenizer, args.token_file, lang=args.lang)
    base_cfg, feat_cfg = load_model_json(
        args.model_config, vocab_size=tokenizer.vocab_size,
        pad_id=tokenizer.pad_id,
    )
    student_cfg = distill_config(base_cfg)

    loaded = load_checkpoint(args.teacher_checkpoint, load_opt=False)["params"]
    student = _merge_into_fresh(
        init_zipvoice_distill(jax.random.PRNGKey(args.seed), base_cfg), loaded
    )
    if args.distill_stage == "first":
        teacher = loaded  # fixed base-model teacher (CFG path)
    else:
        teacher = jax.tree.map(np.asarray, student)  # EMA starts at student

    sampler, collate, _ = build_data(args, tokenizer, feat_cfg, base_cfg.pad_id)

    mesh = make_mesh()
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(student)
    step_fn = make_distill_train_step(
        student_cfg, opt,
        TrainConfig(base_lr=args.base_lr, compute_dtype=args.dtype,
                    use_regularizers=False),
        stage=args.distill_stage,
        teacher_cfg=base_cfg if args.distill_stage == "first" else student_cfg,
        mesh=mesh,
    )
    # float64 running average of the student, maintained every
    # --average-period steps like the base trainer (the reference keeps
    # model_avg during distillation too — that is how the published
    # iter-60000-avg-7 stage-1 checkpoint exists, ref egs/zipvoice/
    # run_emilia.sh:77-85, train_zipvoice_distill.py).
    model_avg = init_averaged_model(student) if jax.process_index() == 0 else None

    student = replicate(mesh, student)
    teacher = replicate(mesh, teacher)
    opt_state = replicate(mesh, opt_state)

    copy_model_dir_contract(args, args.exp_dir)
    exp = Path(args.exp_dir)
    host_rng = np.random.default_rng(args.seed)
    step_idx = 0
    max_iters = args.num_iters or (60000 if args.distill_stage == "first" else 2000)

    from zipvoice_tpu.data.prefetch import PrefetchBatches

    for epoch in range(args.start_epoch, args.num_epochs + 1):
        sampler.set_epoch(epoch)
        batches = PrefetchBatches(sampler, collate, depth=2)
        try:
            for host_batch in batches:
                step_idx += 1
                batch = shard_batch(mesh, host_batch)
                rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), step_idx)
                t_triple = np.asarray(draw_t_schedule(host_rng), np.float32)
                student, teacher, opt_state, metrics = step_fn(
                    student, teacher, opt_state, batch, rng,
                    np.int32(step_idx), t_triple,
                )
                if step_idx % args.log_interval == 0:
                    logging.info(
                        "step %d loss %.4f ref_loss %.4f", step_idx,
                        float(metrics["loss"]), float(metrics["ref_loss"]),
                    )
                if (step_idx % args.average_period == 0
                        and jax.process_index() == 0):
                    model_avg = update_averaged_model(
                        model_avg, student, step_idx, args.average_period
                    )
                if step_idx % args.save_every_n == 0 and jax.process_index() == 0:
                    save_checkpoint(
                        str(exp / f"checkpoint-{step_idx}.pt"), student,
                        model_avg=model_avg,
                        model_ema=teacher if args.distill_stage == "second" else None,
                        opt_state=opt_state,
                        info={"batch_idx_train": step_idx,
                              "average_period": args.average_period},
                    )
                    remove_checkpoints(str(exp), args.keep_last_k)
                if step_idx >= max_iters:
                    break
        finally:
            batches.close()  # release the producer on early break OR raise
        if step_idx >= max_iters:
            break

    if jax.process_index() == 0:
        save_checkpoint(
            str(exp / f"iter-{step_idx}.pt"), student, model_avg=model_avg,
            opt_state=None,
            info={"batch_idx_train": step_idx,
                  "average_period": args.average_period},
        )
        logging.info("saved iter-%d.pt", step_idx)


if __name__ == "__main__":
    main()
