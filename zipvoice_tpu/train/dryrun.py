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
