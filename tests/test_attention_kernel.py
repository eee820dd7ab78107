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


def test_fused_attention_penalty_gradients_match_xla():
    """Fused ds kernel with the score failsafe == XLA penalize_abs_values_gt
    applied to the pre-mask scores (ref zipformer.py:1254-1269)."""
    from zipvoice_tpu.nn.regularizers import penalize_abs_values_gt

    b, t, h, qd, pd = 1, 128, 2, 8, 4
    rng = np.random.default_rng(2)
    # scale q/k up so |scores| > 25 actually occurs
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)) * 2.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)) * 2.5, jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([100])[:, None])
    pen = jnp.asarray(1.0e-2, jnp.float32)  # large penalty -> visible grads

    def loss_fused(q, k, pq, pe):
        p = rel_attention_probs(q, k, pq, pe, mask, out_dtype=jnp.float32,
                                interpret=True, score_penalty=pen,
                                penalty_limit=25.0)
        return jnp.sum(jnp.sin(p))

    def loss_xla(q, k, pq, pe):
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32)
        pos = jnp.einsum("bthd,nhd->bhtn", pq, pe,
                         preferred_element_type=jnp.float32)
        s = s + _rel_shift(pos, t)
        s = penalize_abs_values_gt(s, jnp.asarray(True), limit=25.0,
                                   penalty=float(pen))
        p = masked_softmax(s, mask)
        return jnp.sum(jnp.sin(p))

    # sanity: the penalty actually fires on these inputs
    s_chk = np.asarray(jnp.einsum("bthd,bshd->bhts", q, k))
    assert (np.abs(s_chk) > 25.0).any()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    for a, b_ in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5)


@pytest.mark.parametrize("gates_on", [False, True])
def test_training_attention_fused_matches_xla_path(monkeypatch, gates_on):
    """zipformer._attention_weights with a TrainCtx: the fused branch (pq
    gating + in-kernel failsafe) must match the XLA branch forward AND
    gradients when every stochastic gate resolves identically."""
    from types import SimpleNamespace

    import zipvoice_tpu.ops.attention as att
    from zipvoice_tpu.nn import zipformer as zf

    b, t, d, h, qd, pd = 1, 128, 16, 2, 8, 4
    rng = np.random.default_rng(3)
    cfg = SimpleNamespace(num_heads=h, query_head_dim=qd, pos_head_dim=pd)
    # scale in_proj up so |scores| can exceed the failsafe limit
    p = {
        "in_proj": {
            "weight": jnp.asarray(
                rng.standard_normal((d, (2 * qd + pd) * h)), jnp.float32),
            "bias": jnp.zeros(((2 * qd + pd) * h,), jnp.float32),
        },
        "linear_pos": {
            "weight": jnp.asarray(
                rng.standard_normal((d, pd * h)) * 0.3, jnp.float32),
        },
    }
    x = jnp.asarray(rng.standard_normal((b, t, d)) * 2.0, jnp.float32)
    pos_emb = jnp.asarray(rng.standard_normal((2 * t - 1, d)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([100])[:, None])
    schedules = {"whiten_3": 3.0, "pos_emb_skip_rate": 0.07}

    class FixedGateCtx(zf.TrainCtx):
        def gate(self, prob):
            self.next_key()  # consume, like the real gate
            return jnp.asarray(gates_on)

    real = att.rel_attention_probs_any

    def interp(*a, **kw):
        kw["interpret"] = True
        return real(*a, **kw)

    def loss(p, x, fused):
        monkeypatch.setattr(att, "rel_attention_probs_any", interp)
        zf.set_fused_attention(fused)
        try:
            ctx = FixedGateCtx(jax.random.PRNGKey(7), schedules)
            w = zf._attention_weights(p, cfg, x, pos_emb, mask, ctx)
        finally:
            zf.set_fused_attention(None)
            monkeypatch.setattr(att, "rel_attention_probs_any", real)
        return jnp.sum(jnp.sin(w * 3.0))

    (l_f, g_f) = jax.value_and_grad(loss, argnums=(0, 1))(p, x, True)
    (l_x, g_x) = jax.value_and_grad(loss, argnums=(0, 1))(p, x, False)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-6)
    flat_f = jax.tree_util.tree_leaves(g_f)
    flat_x = jax.tree_util.tree_leaves(g_x)
    for a, b_ in zip(flat_f, flat_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=5e-4, atol=5e-5)


def test_fused_attention_bf16_inputs():
    """bf16 q/k/pq/pe (the training compute dtype): forward stays close to the
    f32 XLA path (softmax accumulates f32 in-kernel) and the backward emits
    finite bf16-consumable cotangents."""
    b, t, h, qd, pd = 1, 128, 2, 8, 4
    rng = np.random.default_rng(4)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)
    q, k = mk(b, t, h, qd), mk(b, t, h, qd)
    pq, pe = mk(b, t, h, pd), mk(2 * t - 1, h, pd)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([90])[:, None])

    out = rel_attention_probs(q, k, pq, pe, mask, out_dtype=jnp.bfloat16,
                              interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(_xla_path(*(a.astype(jnp.float32) for a in (q, k, pq, pe)),
                               mask))
    assert np.abs(np.asarray(out, np.float32) - ref).max() < 8e-3

    def loss(q, k, pq, pe):
        p = rel_attention_probs(q, k, pq, pe, mask, out_dtype=jnp.bfloat16,
                                interpret=True,
                                score_penalty=jnp.asarray(1e-4, jnp.float32))
        return jnp.sum(p.astype(jnp.float32) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    for a in grads:
        assert a.dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(a, np.float32)).all()


@pytest.mark.parametrize("t", [192, 130])
def test_fused_attention_padded_matches_xla(t):
    """Unaligned t runs the pad-and-slice wrapper: forward AND gradients
    must match the XLA path exactly (padded keys masked, padded rows and
    their cotangents discarded by the pad VJP)."""
    from zipvoice_tpu.ops.attention import rel_attention_probs_any

    b, h, qd, pd = 2, 2, 8, 4
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([t, t - 37])[:, None])

    ref = np.asarray(_xla_path(q, k, pq, pe, mask))
    out = np.asarray(
        rel_attention_probs_any(q, k, pq, pe, mask, out_dtype=jnp.float32,
                                interpret=True)
    )
    assert np.abs(ref - out).max() < 1e-5
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)

    w = jnp.asarray(rng.standard_normal(ref.shape), jnp.float32)

    def loss_fused(q, k, pq, pe):
        return jnp.sum(
            rel_attention_probs_any(q, k, pq, pe, mask,
                                    out_dtype=jnp.float32, interpret=True) * w
        )

    def loss_xla(q, k, pq, pe):
        return jnp.sum(_xla_path(q, k, pq, pe, mask) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    for a, b_ in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)


@pytest.mark.parametrize("t", [130])
def test_fused_attention_padded_penalty_grads_match_xla(t):
    """The failsafe score penalty at unaligned t: wrapper-pad phantom
    columns must contribute NO penalty gradient (their pre-mask scores hit
    real pe rows and can exceed the limit), while all real columns —
    including user-masked ones — keep the XLA path's pre-mask penalty."""
    from zipvoice_tpu.nn.regularizers import penalize_abs_values_gt
    from zipvoice_tpu.ops.attention import rel_attention_probs_any

    b, h, qd, pd = 2, 2, 8, 4
    rng = np.random.default_rng(5)
    # scale up pq/pe so plenty of pre-mask scores exceed the 2.0 limit,
    # including phantom-column scores
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)) * 3.0, jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)) * 3.0, jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([t, t - 37])[:, None])
    w = jnp.asarray(rng.standard_normal((b, h, t, t)), jnp.float32)
    pen = jnp.asarray(0.05, jnp.float32)
    limit = 2.0

    def loss_fused(q, k, pq, pe):
        p = rel_attention_probs_any(
            q, k, pq, pe, mask, out_dtype=jnp.float32, interpret=True,
            score_penalty=pen, penalty_limit=limit,
        )
        return jnp.sum(p * w)

    def loss_xla(q, k, pq, pe):
        attn = jnp.einsum("bthd,bshd->bhts", q, k,
                          preferred_element_type=jnp.float32)
        pos = jnp.einsum("bthd,nhd->bhtn", pq, pe,
                         preferred_element_type=jnp.float32)
        scores = attn + _rel_shift(pos, t)
        scores = penalize_abs_values_gt(
            scores, jnp.asarray(True), limit=limit, penalty=float(pen)
        )
        return jnp.sum(masked_softmax(scores, mask) * w)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, pq, pe)
    for name, a, b_ in zip("q k pq pe".split(), g_fused, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5,
            err_msg=f"grad mismatch for {name}",
        )
