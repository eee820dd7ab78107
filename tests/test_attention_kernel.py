"""Fused rel-pos attention kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zipvoice_tpu.nn.functional import masked_softmax
from zipvoice_tpu.nn.zipformer import _rel_shift
from zipvoice_tpu.ops.attention import rel_attention_probs


def _xla_path(q, k, pq, pe, mask):
    t = q.shape[1]
    attn = jnp.einsum("bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32)
    pos = jnp.einsum("bthd,nhd->bhtn", pq, pe, preferred_element_type=jnp.float32)
    attn = attn + _rel_shift(pos, t)
    return masked_softmax(attn, mask)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_attention_matches_xla(with_mask):
    b, t, h, qd, pd = 2, 256, 4, 32, 4
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    mask = (
        jnp.asarray(np.arange(t)[None, :] >= np.array([t, 150])[:, None])
        if with_mask
        else None
    )
    ref = np.asarray(_xla_path(q, k, pq, pe, mask))
    out = np.asarray(
        rel_attention_probs(q, k, pq, pe, mask, out_dtype=jnp.float32,
                            interpret=True)
    )
    err = np.abs(ref - out).max()
    assert err < 1e-5, err
    # rows sum to 1 (incl. fully-masked rows -> uniform)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_fused_attention_gradients_match_xla():
    """custom-VJP backward (XLA twin) == autodiff of the XLA path."""
    b, t, h, qd, pd = 1, 128, 2, 8, 4
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([100])[:, None])

    def loss_fused(q, k, pq, pe):
        p = rel_attention_probs(q, k, pq, pe, mask, out_dtype=jnp.float32,
                                interpret=True)
        return jnp.sum(jnp.sin(p))

    def loss_xla(q, k, pq, pe):
        p = _xla_path(q, k, pq, pe, mask)
        return jnp.sum(jnp.sin(p))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    for a, b_ in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)
