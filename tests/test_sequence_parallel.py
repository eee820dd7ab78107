"""Sequence (time) parallelism: the full CFG Euler sampler with the frame
axis sharded over an 8-device mesh must equal the unsharded sampler, with
GSPMD inserting the attention all-gathers and conv halo exchanges.

Beyond the reference (no SP exists there — SURVEY §5.7); this is the
TPU-native path to longer-than-30s single-utterance synthesis."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models import zipvoice as zv
from zipvoice_tpu.parallel.mesh import make_seq_mesh, sp_sample_jit

TINY = dict(
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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sp_sample_matches_unsharded():
    cfg = ZipVoiceConfig(**TINY)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    b, t = 2, 128  # t divisible by 8 devices and the 2x interior downsample
    tokens = jnp.asarray(rng.integers(1, cfg.vocab_size, (b, 24)), jnp.int32)
    tlens = jnp.asarray([20, 16], jnp.int32)
    pf = jnp.asarray(rng.standard_normal((b, t, cfg.feat_dim)) * 0.1,
                     jnp.float32)
    plens = jnp.asarray([40, 32], jnp.int32)
    flens = jnp.asarray([128, 100], jnp.int32)
    noise = jnp.asarray(rng.standard_normal((b, t, cfg.feat_dim)), jnp.float32)

    def run(p, tok, tl, pf, pl, fl, nz):
        return zv.sample(p, cfg, tok, tl, pf, pl, fl, nz, num_step=2,
                         guidance_scale=1.0, t_shift=0.5)

    ref = np.asarray(
        jax.jit(run)(params, tokens, tlens, pf, plens, flens, noise),
        np.float32,
    )

    mesh = make_seq_mesh(8)
    sp_fn = sp_sample_jit(run, mesh)
    out = np.asarray(
        sp_fn(params, tokens, tlens, pf, plens, flens, noise), np.float32
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)

    # the compiled program must actually communicate over the seq axis
    hlo = sp_fn.lower(
        params, tokens, tlens, pf, plens, flens, noise
    ).compile().as_text()
    assert "all-gather" in hlo  # attention k/pe gathers
    assert "collective-permute" in hlo  # conv halo exchange


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_sp_train_step_matches_dp():
    """One training step on a data x seq mesh (dp=2 x sp=4) must produce the
    same loss and updated params as the plain dp mesh."""
    from zipvoice_tpu.parallel.mesh import (
        make_dp_sp_mesh,
        make_mesh,
        replicate,
        shard_batch,
    )
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.step import TrainConfig, make_train_step

    cfg = ZipVoiceConfig(**TINY)
    rng = np.random.default_rng(0)
    b, s, t = 8, 12, 64
    batch_np = {
        "tokens": rng.integers(1, cfg.vocab_size, (b, s)).astype(np.int32),
        "tokens_lens": np.full((b,), s - 2, np.int32),
        "features": rng.standard_normal((b, t, cfg.feat_dim)).astype(
            np.float32
        ),
        "features_lens": np.full((b,), t - 3, np.int32),
    }
    opt = scaled_adam(clipping_scale=2.0)
    tc = TrainConfig(compute_dtype="float32", use_regularizers=False)
    key = jax.random.PRNGKey(3)

    def one_step(mesh):
        params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
        opt_state = opt.init(params)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        step = make_train_step(cfg, opt, tc, mesh=mesh)
        batch = shard_batch(mesh, {k: v.copy() for k, v in batch_np.items()})
        if "seq" in mesh.axis_names:
            from jax.sharding import NamedSharding, PartitionSpec as P

            batch["features"] = jax.device_put(
                batch_np["features"].copy(),
                NamedSharding(mesh, P("data", "seq", None)),
            )
        p2, _, m = step(params, opt_state, batch, key,
                        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32))
        return float(m["loss"]), p2

    loss_dp, p_dp = one_step(make_mesh(n_data=8, n_model=1))
    loss_sp, p_sp = one_step(make_dp_sp_mesh(2, 4))
    assert abs(loss_dp - loss_sp) < 1e-5, (loss_dp, loss_sp)
    flat_dp = jax.tree.leaves(p_dp)
    flat_sp = jax.tree.leaves(p_sp)
    for a, b_ in zip(flat_dp, flat_sp):
        # atol 1e-4: GSPMD decomposes the depthwise conv with halo
        # exchanges under the seq sharding, changing the f32 accumulation
        # order vs the unsharded grouped conv; ScaledAdam's RMS scaling
        # amplifies the tiny forward/backward drift into the updates
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32), atol=1e-4)
