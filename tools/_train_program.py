"""Shared profiling/accounting build of the training fwd+bwd program.

Mirrors ``train/step.py``'s loss_fn exactly (same RNG splits, masks,
condition_drop_ratio, compute dtype) so ``profile_train.py`` and
``hbm_accounting.py`` measure the program training actually runs.
Single-sourced here so a change to the training loss cannot silently
diverge from the profiling and HBM-accounting artifacts.
"""

from __future__ import annotations


def make_loss_and_fwd_bwd(cfg, dtype):
    """Returns (loss_fn, fwd_bwd) closures over ``cfg``/``dtype``.

    ``fwd_bwd`` consumes every gradient leaf (abs-sum folded into the
    returned loss at zero weight) so the backward cannot be dead-code
    eliminated when only the loss is read back.
    """
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.models.zipvoice import compute_fm_loss

    def loss_fn(p, batch_, rng_, schedules):
        k_t, k_noise, k_mask = jax.random.split(rng_, 3)
        features = batch_["features"].astype(dtype)
        bb = features.shape[0]
        tt = jax.random.uniform(k_t, (bb, 1, 1), dtype)
        noise = jax.random.normal(k_noise, features.shape, dtype)
        cparams = jax.tree.map(lambda a: a.astype(dtype), p)
        return compute_fm_loss(
            cparams, cfg, batch_["tokens"], batch_["tokens_lens"], features,
            batch_["features_lens"], noise, tt, k_mask,
            condition_drop_ratio=0.2, schedules=schedules,
        )

    def fwd_bwd(p, b_, k_, s_):
        loss, g = jax.value_and_grad(loss_fn)(p, b_, k_, s_)
        gsum = sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                   for l in jax.tree.leaves(g))
        return loss + 0.0 * gsum.astype(loss.dtype), gsum

    return loss_fn, fwd_bwd
