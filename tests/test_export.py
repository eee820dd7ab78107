"""jax.export round trip of the deployment programs (tiny model, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models import zipvoice as zv

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


def test_export_sampler_roundtrip(tmp_path):
    from jax import export as jexport

    cfg = ZipVoiceConfig(**TINY)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)
    s, t, f = 12, 32, cfg.feat_dim

    def sampler(tokens, tokens_lens, pf, pfl, fl, noise):
        return zv.sample(params, cfg, tokens, tokens_lens, pf, pfl, fl,
                         noise, num_step=2, guidance_scale=1.0, t_shift=0.5)

    spec = lambda shape, dt=jnp.float32: jax.ShapeDtypeStruct(shape, dt)  # noqa: E731
    exp = jexport.export(jax.jit(sampler))(
        spec((1, s), jnp.int32), spec((1,), jnp.int32), spec((1, t, f)),
        spec((1,), jnp.int32), spec((1,), jnp.int32), spec((1, t, f)),
    )
    data = exp.serialize()
    (tmp_path / "sampler.stablehlo").write_bytes(data)

    back = jexport.deserialize(
        bytearray((tmp_path / "sampler.stablehlo").read_bytes())
    )
    rng = np.random.default_rng(0)
    args = (
        rng.integers(1, 40, (1, s)).astype(np.int32),
        np.array([10], np.int32),
        (rng.standard_normal((1, t, f)) * 0.1).astype(np.float32),
        np.array([8], np.int32),
        np.array([28], np.int32),
        rng.standard_normal((1, t, f)).astype(np.float32),
    )
    direct = np.asarray(jax.jit(sampler)(*args))
    loaded = np.asarray(back.call(*args))
    np.testing.assert_allclose(loaded, direct, atol=1e-5)
