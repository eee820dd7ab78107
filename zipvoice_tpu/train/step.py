"""Data-parallel flow-matching training step (single compiled program).

Equivalent of the reference's inner loop (ref zipvoice/bin/train_zipvoice.py:
498-675 / compute_fbank_loss :432-487) redesigned for TPU:

* one jit covers: t/noise sampling, condition masks, text encoder, fm_decoder
  forward, backward, ScaledAdam update — no GradScaler (bf16 needs none);
* batch is sharded over the ``data`` mesh axis; params/optimizer state are
  replicated (or, with a ``model`` axis and templates, tensor-parallel over
  the feedforward dims); XLA inserts the collectives over ICI from the
  sharding annotations (the DDP/NCCL equivalent, SURVEY.md §2.10);
* randomness is an explicit jax.random key (the reference uses global torch
  RNG), split per step on host.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models.zipvoice import compute_fm_loss
from zipvoice_tpu.parallel.mesh import batch_sharding, replicated
from zipvoice_tpu.train.lr_schedule import eden_lr, fixed_lr
from zipvoice_tpu.train.scaled_adam import ScaledAdam, apply_updates


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    base_lr: float = 0.02
    lr_batches: float = 7500.0
    lr_epochs: float = 10.0
    warmup_batches: float = 500.0
    condition_drop_ratio: float = 0.2
    compute_dtype: str = "bfloat16"  # "float32" | "bfloat16"
    schedule: str = "eden"  # "eden" | "fixed"
    remat: bool = False  # jax.checkpoint the loss for long sequences
    # training-time stochastic regularizers (dropout, layerdrop, balancers,
    # whitening, ... — the reference scaling kit).  Schedule values are
    # computed host-side per step and fed as traced scalars.
    use_regularizers: bool = True
    # loss variant: "base" (interior-span condition mask) or "dialog"
    # (suffix mask + speaker embeddings); "dialog" with stereo=True adds the
    # speaker-exclusive energy loss weighted by se_weight
    loss: str = "base"
    stereo: bool = False
    se_weight: float = 0.0


def make_train_step(
    model_cfg: ZipVoiceConfig,
    opt: ScaledAdam,
    train_cfg: TrainConfig = TrainConfig(),
    mesh=None,
    params_template=None,
    opt_state_template=None,
):
    """Build the jitted train step.

    step(params, opt_state, batch, rng, step_idx, epoch) ->
        (params, opt_state, metrics)

    batch dict: tokens (B, S) int32, tokens_lens (B,), features (B, T, F),
    features_lens (B,).  All shapes static per bucket.

    With a 2-D mesh (``model`` axis > 1) pass params_template and
    opt_state_template (any pytrees with the right structure, e.g. the real
    params/opt state): the feedforward linears and their Adam moments shard
    over the model axis (tensor parallel) while the batch shards over data —
    GSPMD derives the collectives from the annotations.
    """
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32

    def loss_fn(params, batch, rng, schedules):
        k_t, k_noise, k_mask = jax.random.split(rng, 3)
        features = batch["features"].astype(dtype)
        b = features.shape[0]
        # t ~ U(0,1) per utterance (ref train_zipvoice.py:471).  Both t and
        # the CFM noise are DRAWN in f32 like the reference (467, 471): a
        # bf16 draw quantizes t to an 8-bit mantissa (1/256 spacing near 1)
        # and coarsens the noise tails before the model ever sees them —
        # the compute dtype applies downstream (the loss casts the x_t mix;
        # forward_fm_decoder keeps t itself f32 for the time embedding).
        t = jax.random.uniform(k_t, (b, 1, 1), jnp.float32)
        noise = jax.random.normal(
            k_noise, features.shape, jnp.float32
        ).astype(dtype)
        cparams = jax.tree.map(lambda a: a.astype(dtype), params)
        if train_cfg.loss == "dialog":
            from zipvoice_tpu.models.dialog import compute_fm_loss_dialog

            return compute_fm_loss_dialog(
                cparams, model_cfg, batch["tokens"], batch["tokens_lens"],
                features, batch["features_lens"], noise, t, k_mask,
                condition_drop_ratio=train_cfg.condition_drop_ratio,
                se_weight=train_cfg.se_weight, stereo=train_cfg.stereo,
                schedules=schedules,
            )
        return compute_fm_loss(
            cparams,
            model_cfg,
            batch["tokens"],
            batch["tokens_lens"],
            features,
            batch["features_lens"],
            noise,
            t,
            k_mask,
            condition_drop_ratio=train_cfg.condition_drop_ratio,
            schedules=schedules,
        )

    if train_cfg.remat:
        loss_fn = jax.checkpoint(loss_fn)

    def train_step(params, opt_state, batch, rng, step_idx, epoch, schedules=None):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng, schedules)
        if train_cfg.schedule == "eden":
            lr = eden_lr(
                train_cfg.base_lr, step_idx, epoch,
                lr_batches=train_cfg.lr_batches,
                lr_epochs=train_cfg.lr_epochs,
                warmup_batches=train_cfg.warmup_batches,
            )
        else:
            lr = fixed_lr(train_cfg.base_lr)
        updates, opt_state, diag = opt.update(grads, opt_state, params, lr,
                                              with_diagnostics=True)
        params = apply_updates(params, updates)
        # diag: clip factor + dominant-gradient leaf (ref optim.py:615-748);
        # the trainer names the tensor when clipping becomes extreme
        metrics = {"loss": loss.astype(jnp.float32), "lr": lr, **diag}
        return params, opt_state, metrics

    if mesh is None:
        # donate params/opt state exactly like the mesh path: the optimizer
        # rewrites every buffer anyway, so XLA updates in place instead of
        # holding a second copy of ~4x model size in HBM (CPU ignores this)
        return jax.jit(train_step, donate_argnums=(0, 1))

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    batch_shardings = {
        "tokens": data, "tokens_lens": data, "features": data,
        "features_lens": data,
    }
    if "seq" in mesh.axis_names and dict(mesh.shape).get("seq", 1) > 1:
        # sequence-parallel training: the frame axis of the features shards
        # over the seq axis (GSPMD inserts attention all-gathers + conv
        # halos in fwd AND bwd; grads all-reduce over data x seq)
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch_shardings["features"] = NamedSharding(
            mesh, P("data", "seq", None)
        )

    use_tp = (
        "model" in mesh.axis_names
        and mesh.shape["model"] > 1
        and params_template is not None
        and opt_state_template is not None
    )
    if use_tp:
        from zipvoice_tpu.parallel.mesh import (
            tp_opt_state_shardings,
            tp_param_shardings,
        )

        p_shard = tp_param_shardings(mesh, params_template)
        s_shard = tp_opt_state_shardings(mesh, opt_state_template, p_shard)
    else:
        p_shard = s_shard = repl

    jitted = jax.jit(
        train_step,
        in_shardings=(p_shard, s_shard, batch_shardings, repl, repl, repl,
                      repl),
        out_shardings=(p_shard, s_shard, repl),
        donate_argnums=(0, 1),
    )

    def run(params, opt_state, batch, rng, step_idx, epoch, schedules=None):
        return jitted(params, opt_state, batch, rng, step_idx, epoch, schedules)

    run.jitted = jitted  # exposed for AOT lowering / HLO inspection
    return run


def make_eval_step(model_cfg: ZipVoiceConfig, train_cfg: TrainConfig = TrainConfig(),
                   mesh=None):
    """Validation loss, stratified over 4 fixed timesteps per utterance
    (ref train_zipvoice.py:473-477 uses deterministic eval t)."""
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32

    def eval_step(params, batch, rng):
        features = batch["features"].astype(dtype)
        b = features.shape[0]
        cparams = jax.tree.map(lambda a: a.astype(dtype), params)
        losses = []
        for i, tv in enumerate((0.1, 0.35, 0.65, 0.9)):
            k_noise, k_mask = jax.random.split(jax.random.fold_in(rng, i))
            t = jnp.full((b, 1, 1), tv, dtype)
            noise = jax.random.normal(k_noise, features.shape, dtype)
            if train_cfg.loss == "dialog":
                # validation must use the TRAINING objective (speaker
                # embeddings + suffix mask), like the reference
                from zipvoice_tpu.models.dialog import compute_fm_loss_dialog

                losses.append(
                    compute_fm_loss_dialog(
                        cparams, model_cfg, batch["tokens"],
                        batch["tokens_lens"], features,
                        batch["features_lens"], noise, t, k_mask,
                        condition_drop_ratio=0.0,
                        se_weight=train_cfg.se_weight,
                        stereo=train_cfg.stereo,
                    )
                )
            else:
                losses.append(
                    compute_fm_loss(
                        cparams, model_cfg, batch["tokens"],
                        batch["tokens_lens"], features,
                        batch["features_lens"], noise, t, k_mask,
                        condition_drop_ratio=0.0,
                    )
                )
        return jnp.mean(jnp.stack(losses)).astype(jnp.float32)

    if mesh is None:
        return jax.jit(eval_step)
    repl = replicated(mesh)
    data = batch_sharding(mesh)
    batch_shardings = {
        "tokens": data, "tokens_lens": data, "features": data,
        "features_lens": data,
    }
    return jax.jit(
        eval_step, in_shardings=(repl, batch_shardings, repl),
        out_shardings=repl,
    )
