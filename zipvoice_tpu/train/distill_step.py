"""Distillation training step (ref zipvoice/bin/train_zipvoice_distill.py).

One jitted program: teacher 2-hop targets + student hop + masked ScaledAdam
update (+ EMA teacher update in stage 2).  Only fm_decoder gradients flow
(ref :967-975).  The per-step (t, d_fix, d_ema) triple is drawn host-side
like the reference (ref :420-429) and passed as traced scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models.distill import compute_distill_loss, ema_update
from zipvoice_tpu.parallel.mesh import batch_sharding, replicated
from zipvoice_tpu.train.scaled_adam import ScaledAdam, apply_updates
from zipvoice_tpu.train.step import TrainConfig


def draw_t_schedule(rng: np.random.Generator):
    """Host-side (t, d_fix, d_ema) draw (ref :420-429)."""
    t_value = rng.random()
    d_fix = rng.uniform(0.0, min(0.3, 1.0 - t_value))
    d_ema = rng.uniform(0.0, min(0.3, 1.0 - t_value - d_fix))
    return np.float32(t_value), np.float32(d_fix), np.float32(d_ema)


def make_distill_train_step(
    student_cfg: ZipVoiceConfig,
    opt: ScaledAdam,
    train_cfg: TrainConfig,
    stage: str = "first",
    teacher_cfg: ZipVoiceConfig = None,
    mesh=None,
):
    """step(student, teacher, opt_state, batch, rng, step_idx, t_triple) ->
    (student, teacher, opt_state, metrics)."""
    dtype = jnp.bfloat16 if train_cfg.compute_dtype == "bfloat16" else jnp.float32
    teacher_cfg = teacher_cfg or student_cfg

    def loss_fn(student_params, teacher_params, batch, rng, t_triple):
        features = batch["features"].astype(dtype)
        sp = jax.tree.map(lambda a: a.astype(dtype), student_params)
        tp = jax.tree.map(lambda a: a.astype(dtype), teacher_params)
        loss, ref_loss = compute_distill_loss(
            sp, tp, student_cfg, batch["tokens"], batch["tokens_lens"],
            features, batch["features_lens"], rng,
            t_value=t_triple[0], t_delta_fix=t_triple[1],
            t_delta_ema=t_triple[2], stage=stage,
        )
        return loss, ref_loss

    def train_step(student_params, teacher_params, opt_state, batch, rng,
                   step_idx, t_triple):
        (loss, ref_loss), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            student_params, teacher_params, batch, rng, t_triple
        )
        # only fm_decoder trains (ref :967-975)
        grads = {
            k: (v if k == "fm_decoder" else jax.tree.map(jnp.zeros_like, v))
            for k, v in grads.items()
        }
        lr = jnp.asarray(train_cfg.base_lr, jnp.float32)
        updates, opt_state = opt.update(grads, opt_state, student_params, lr)
        student_params = apply_updates(student_params, updates)
        if stage == "second":
            teacher_params = ema_update(teacher_params, student_params, 0.9999)
        metrics = {
            "loss": loss.astype(jnp.float32),
            "ref_loss": ref_loss.astype(jnp.float32),
            "lr": lr,
        }
        return student_params, teacher_params, opt_state, metrics

    if mesh is None:
        # match the mesh path: student/teacher/opt buffers rewritten in place
        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    batch_shardings = {
        "tokens": data, "tokens_lens": data, "features": data,
        "features_lens": data,
    }
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, repl, batch_shardings, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl),
        donate_argnums=(0, 1, 2),
    )
