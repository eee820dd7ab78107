"""Multi-chip dry run: jit the full DP training step over an n-device mesh
and execute one step on tiny shapes.  Used by __graft_entry__.dryrun_multichip
(driver runs it with xla_force_host_platform_device_count=N on CPU)."""

from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import os

    import jax

    # Prefer a virtual CPU mesh when the env doesn't already provide enough
    # devices.  Must happen before backend init; if backends are already up
    # (config.update raises), fall through to whatever devices exist.
    try:
        jax.config.update("jax_platforms", "cpu")
        if "--xla_force_host_platform_device_count" not in os.environ.get(
            "XLA_FLAGS", ""
        ):
            jax.config.update("jax_num_cpu_devices", n_devices)
    except RuntimeError:
        pass

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}"
    )

    import jax.numpy as jnp

    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig, make_train_step

    cfg = ZipVoiceConfig(
        fm_decoder_downsampling_factor=(1, 2, 1),
        fm_decoder_num_layers=(1, 1, 1),
        fm_decoder_cnn_module_kernel=(9, 7, 9),
        fm_decoder_feedforward_dim=96,
        fm_decoder_num_heads=2,
        fm_decoder_dim=64,
        text_encoder_num_layers=1,
        text_encoder_feedforward_dim=48,
        text_encoder_cnn_module_kernel=5,
        text_encoder_num_heads=2,
        text_encoder_dim=48,
        time_embed_dim=32,
        text_embed_dim=48,
        query_head_dim=8,
        value_head_dim=8,
        pos_head_dim=4,
        pos_dim=48,
        feat_dim=16,
        vocab_size=40,
        pad_id=0,
    )
    # 2-D data x model mesh when enough devices: DP over the data axis plus
    # tensor-parallel feedforward shards over the model axis
    n_model = 2 if n_devices >= 4 and n_devices % 2 == 0 else 1
    mesh = make_mesh(n_data=n_devices // n_model, n_model=n_model)

    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(params)
    if n_model == 1:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)

    b, s, t = n_devices * 2, 12, 32
    rng = np.random.default_rng(0)
    batch = shard_batch(
        mesh,
        {
            "tokens": rng.integers(1, cfg.vocab_size, (b, s)).astype(np.int32),
            "tokens_lens": np.full((b,), s - 2, np.int32),
            "features": rng.standard_normal((b, t, cfg.feat_dim)).astype(
                np.float32
            ),
            "features_lens": np.full((b,), t - 3, np.int32),
        },
    )

    # bf16 exercises the production mixed-precision path
    step = make_train_step(
        cfg, opt, TrainConfig(compute_dtype="bfloat16"), mesh=mesh,
        params_template=params, opt_state_template=opt_state,
    )
    params, opt_state, metrics = step(
        params, opt_state, batch, jax.random.PRNGKey(1),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32),
    )
    loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    kind = f"dp={n_devices // n_model} x tp={n_model}" if n_model > 1 else "dp"
    print(f"dryrun ok: {n_devices} devices ({kind}), loss={loss:.4f}")

    # sequence-parallel inference: full sampler with the frame axis sharded
    # over all devices (attention all-gathers + conv halos via GSPMD)
    from zipvoice_tpu.models import zipvoice as zv
    from zipvoice_tpu.parallel.mesh import make_seq_mesh, sp_sample_jit

    smesh = make_seq_mesh(n_devices)
    t_sp = 16 * n_devices  # divisible by the mesh and the 2x downsample
    sp_tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, s)), jnp.int32)
    sp_fn = sp_sample_jit(
        lambda p, tok, tl, pf, pl, fl, nz: zv.sample(
            p, cfg, tok, tl, pf, pl, fl, nz, num_step=2, guidance_scale=1.0,
            t_shift=0.5,
        ),
        smesh,
    )
    out = sp_fn(
        init_zipvoice(jax.random.PRNGKey(0), cfg),
        sp_tokens,
        jnp.asarray([s - 2], jnp.int32),
        jnp.asarray(rng.standard_normal((1, t_sp, cfg.feat_dim)) * 0.1,
                    jnp.float32),
        jnp.asarray([t_sp // 4], jnp.int32),
        jnp.asarray([t_sp], jnp.int32),
        jnp.asarray(rng.standard_normal((1, t_sp, cfg.feat_dim)), jnp.float32),
    )
    assert np.isfinite(np.asarray(out, np.float32)).all()
    print(f"dryrun ok: sequence-parallel sampler over {n_devices} devices")

    # sequence-parallel TRAINING: dp x sp mesh with the frame axis of the
    # features sharded over ``seq`` (the test_sp_train_step_matches_dp path,
    # tests/test_sequence_parallel.py:81 — here executed as the driver-
    # recorded multichip artifact, VERDICT r3 next #4)
    if n_devices >= 4 and n_devices % 2 == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from zipvoice_tpu.parallel.mesh import make_dp_sp_mesh

        n_sp = 2
        spmesh = make_dp_sp_mesh(n_devices // n_sp, n_sp)
        sp_params = replicate(spmesh, init_zipvoice(jax.random.PRNGKey(0), cfg))
        sp_opt_state = replicate(spmesh, opt.init(
            init_zipvoice(jax.random.PRNGKey(0), cfg)))
        sp_batch = shard_batch(spmesh, {
            "tokens": rng.integers(1, cfg.vocab_size, (b, s)).astype(np.int32),
            "tokens_lens": np.full((b,), s - 2, np.int32),
            "features_lens": np.full((b,), t - 3, np.int32),
        })
        sp_batch["features"] = jax.device_put(
            rng.standard_normal((b, t, cfg.feat_dim)).astype(np.float32),
            NamedSharding(spmesh, P("data", "seq", None)),
        )
        sp_step = make_train_step(
            cfg, opt, TrainConfig(compute_dtype="bfloat16"), mesh=spmesh,
        )
        _, _, sp_metrics = sp_step(
            sp_params, sp_opt_state, sp_batch, jax.random.PRNGKey(1),
            jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32),
        )
        sp_loss = float(sp_metrics["loss"])
        assert np.isfinite(sp_loss), sp_loss
        print(
            f"dryrun ok: sequence-parallel train step "
            f"(dp={n_devices // n_sp} x sp={n_sp}), loss={sp_loss:.4f}"
        )

    # checkpoint gating: only process 0 writes (ref utils/checkpoint.py:79-80
    # rank gate).  Simulate a non-zero process index and assert Trainer.save
    # is a no-op; restore and assert process 0 does write.
    import tempfile
    from pathlib import Path
    from unittest import mock

    from zipvoice_tpu.train.trainer import Trainer, TrainerOptions

    with tempfile.TemporaryDirectory() as td:
        trainer = Trainer(
            cfg, init_zipvoice(jax.random.PRNGKey(0), cfg), opt,
            TrainConfig(compute_dtype="bfloat16"), TrainerOptions(exp_dir=td),
        )
        gated = Path(td) / "gated.pt"
        with mock.patch.object(jax, "process_index", lambda: 1):
            trainer.save(str(gated))
        assert not gated.exists(), "non-zero process wrote a checkpoint"
        trainer.save(str(gated))
        assert gated.exists(), "process 0 failed to write a checkpoint"
    print("dryrun ok: checkpoint writes gated to process_index 0")
