"""Fused ConvolutionModule kernel (ops/convglu.py) vs the XLA eval path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zipvoice_tpu.ops.convglu import conv_glu_swoosh_out


def _xla_ref(proj, w, b, mask, w_out, b_out):
    """Mirror of nn/zipformer._conv_module after in_proj (eval mode)."""
    from zipvoice_tpu.nn.functional import swoosh_r

    c = proj.shape[-1] // 2
    v, s = proj[..., :c], proj[..., c:]
    v = v * jax.nn.sigmoid(s)
    if mask is not None:
        v = jnp.where(mask[:, :, None], 0.0, v)
    pad = w.shape[0] // 2
    out = jax.lax.conv_general_dilated(
        v, w[:, None, :], window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )
    out = out + b
    y = swoosh_r(out)
    r = y @ w_out
    return r + b_out if b_out is not None else r


@pytest.mark.parametrize("kernel", [7, 15, 31])
@pytest.mark.parametrize("with_mask", [False, True])
def test_conv_glu_fused_matches_xla(kernel, with_mask):
    b, t, c, d = 2, 96, 32, 24
    rng = np.random.default_rng(kernel)
    proj = jnp.asarray(rng.standard_normal((b, t, 2 * c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kernel, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((c, d)) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    mask = (
        jnp.asarray(np.arange(t)[None, :] >= np.array([t, t - 30])[:, None])
        if with_mask
        else None
    )
    ref = np.asarray(_xla_ref(proj, w, bias, mask, w_out, b_out))
    out = np.asarray(conv_glu_swoosh_out(
        proj, w, bias, mask, w_out, b_out, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_conv_glu_fused_no_out_bias():
    b, t, c, d = 1, 40, 16, 16
    rng = np.random.default_rng(5)
    proj = jnp.asarray(rng.standard_normal((b, t, 2 * c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((5, c)) * 0.2, jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((c, d)) * 0.2, jnp.float32)
    ref = np.asarray(_xla_ref(proj, w, bias, None, w_out, None))
    out = np.asarray(conv_glu_swoosh_out(
        proj, w, bias, None, w_out, None, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_conv_glu_fused_bf16():
    """bf16 proj (the eval compute dtype): f32 internals keep the result
    close to the f32 reference."""
    b, t, c, d = 2, 64, 32, 32
    rng = np.random.default_rng(9)
    proj32 = rng.standard_normal((b, t, 2 * c)).astype(np.float32)
    w = jnp.asarray(rng.standard_normal((9, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((c, d)) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    ref = np.asarray(_xla_ref(jnp.asarray(proj32), w, bias, None, w_out,
                              b_out))
    out = np.asarray(conv_glu_swoosh_out(
        jnp.asarray(proj32, jnp.bfloat16), w, bias, None,
        w_out, b_out, interpret=True)).astype(np.float32)
    assert np.abs(out - ref).max() < 0.15  # bf16 input + bf16 GEMM operand


@pytest.mark.parametrize("t", [256, 384, 512])
def test_conv_glu_fused_multi_tile(t):
    """Time-tiled path: halo rows cross tile boundaries (K=31 > pad=15
    reaches into neighbor tiles), edges zeroed, t=384 forces the 128-tile,
    t=512 the 256-tile."""
    b, c, d, kernel = 2, 32, 24, 31
    rng = np.random.default_rng(t)
    proj = jnp.asarray(rng.standard_normal((b, t, 2 * c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kernel, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((c, d)) * 0.2, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.arange(t)[None, :] >= np.array([t, t - 37])[:, None]
    )
    ref = np.asarray(_xla_ref(proj, w, bias, mask, w_out, b_out))
    out = np.asarray(conv_glu_swoosh_out(
        proj, w, bias, mask, w_out, b_out, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_conv_glu_fused_non_multiple_pad_slice():
    """t not a multiple of 128 pads-and-slices; the zero pad reproduces the
    SAME-conv boundary exactly."""
    b, t, c, d, kernel = 1, 200, 32, 24, 15
    rng = np.random.default_rng(9)
    proj = jnp.asarray(rng.standard_normal((b, t, 2 * c)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kernel, c)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((c,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((c, d)) * 0.2, jnp.float32)
    out = conv_glu_swoosh_out(proj, w, bias, None, w_out, None,
                              interpret=True)
    assert out.shape == (b, t, d)
    ref = np.asarray(_xla_ref(proj, w, bias, None, w_out, None))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)
