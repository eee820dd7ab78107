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


# ---------------------------------------------------------------------------
# Fused APPLY kernel: softmax(scores) @ v without materializing probs.
# ---------------------------------------------------------------------------


def _xla_apply(q, k, pq, pe, mask, v, const_gate=None):
    """XLA twin of rel_attention_apply: probs (optionally const-attention
    replaced, detached like ref zipformer.py:545-556) contracted with v."""
    p = _xla_path(q, k, pq, pe, mask)
    if const_gate is not None:
        binary = jax.lax.stop_gradient((p > 0.0).astype(p.dtype))
        const = binary / jnp.maximum(binary.sum(-1, keepdims=True), 1e-20)
        p = jnp.where(const_gate, const, p)
    return jnp.einsum("bhts,bshd->bthd", p, v,
                      preferred_element_type=jnp.float32)


@pytest.mark.parametrize("with_mask", [False, True])
def test_apply_forward_matches_xla(with_mask):
    from zipvoice_tpu.ops.attention import rel_attention_apply

    b, t, h, qd, pd, vd = 2, 256, 4, 32, 4, 12
    rng = np.random.default_rng(10)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    mask = (
        jnp.asarray(np.arange(t)[None, :] >= np.array([t, 150])[:, None])
        if with_mask
        else None
    )
    ref = np.asarray(_xla_apply(q, k, pq, pe, mask, v))
    out = np.asarray(rel_attention_apply(
        q, k, pq, pe, mask, v, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_apply_head0_wide_value():
    """The nonlin-attention shape: H=1, wide value dim (hidden=3D/4)."""
    from zipvoice_tpu.ops.attention import rel_attention_apply

    b, t, qd, pd, vd = 2, 128, 8, 4, 96
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((b, t, 1, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, 1, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, 1, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, 1, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, 1, vd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([t, 100])[:, None])
    ref = np.asarray(_xla_apply(q, k, pq, pe, mask, v))
    out = np.asarray(rel_attention_apply(
        q, k, pq, pe, mask, v, out_dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_apply_gradients_match_xla():
    """Flash-style backward (dq/dk/dpq/dpe/dv, no (T,T) in HBM) == autodiff
    of the XLA twin."""
    from zipvoice_tpu.ops.attention import rel_attention_apply

    b, t, h, qd, pd, vd = 1, 128, 2, 8, 4, 12
    rng = np.random.default_rng(12)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([100])[:, None])

    def loss_fused(q, k, pq, pe, v):
        o = rel_attention_apply(q, k, pq, pe, mask, v, out_dtype=jnp.float32,
                                interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, pq, pe, v):
        return jnp.sum(jnp.sin(_xla_apply(q, k, pq, pe, mask, v)))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    for name, a, b_ in zip("q k pq pe v".split(), g_fused, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5,
            err_msg=f"apply grad mismatch for {name}",
        )


def test_apply_const_gate_matches_xla():
    """const-attention branch: forward replaced by the normalized support
    indicator; backward detached from the scores but dv still flows."""
    from zipvoice_tpu.ops.attention import rel_attention_apply

    b, t, qd, pd, vd = 1, 128, 8, 4, 16
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((b, t, 1, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, 1, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, 1, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, 1, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, 1, vd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([90])[:, None])
    gate = jnp.asarray(1.0, jnp.float32)

    def loss_fused(q, k, pq, pe, v):
        o = rel_attention_apply(q, k, pq, pe, mask, v, out_dtype=jnp.float32,
                                interpret=True, const_gate=gate)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, pq, pe, v):
        o = _xla_apply(q, k, pq, pe, mask, v, const_gate=jnp.asarray(True))
        return jnp.sum(jnp.sin(o))

    (lf, gf) = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        q, k, pq, pe, v)
    (lx, gx) = jax.value_and_grad(loss_xla, argnums=(0, 1, 2, 3, 4))(
        q, k, pq, pe, v)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-6)
    # scores detached -> q/k/pq/pe grads all zero; v grad matches
    for name, a in zip("q k pq pe".split(), gf[:4]):
        assert np.abs(np.asarray(a)).max() == 0.0, name
    for name, a, b_ in zip("q k pq pe v".split(), gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5,
            err_msg=f"const-gate grad mismatch for {name}",
        )


def test_apply_penalty_gradients_match_xla():
    """The score-failsafe penalty rides the apply backward exactly like
    penalize_abs_values_gt on the shared pre-mask scores."""
    from zipvoice_tpu.nn.regularizers import penalize_abs_values_gt
    from zipvoice_tpu.ops.attention import rel_attention_apply

    b, t, h, qd, pd, vd = 1, 128, 2, 8, 4, 12
    rng = np.random.default_rng(14)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)) * 2.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)) * 2.5, jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([100])[:, None])
    pen = jnp.asarray(1.0e-2, jnp.float32)

    s_chk = np.asarray(jnp.einsum("bthd,bshd->bhts", q, k))
    assert (np.abs(s_chk) > 25.0).any()

    def loss_fused(q, k, pq, pe, v):
        o = rel_attention_apply(q, k, pq, pe, mask, v, out_dtype=jnp.float32,
                                interpret=True, score_penalty=pen,
                                penalty_limit=25.0)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, pq, pe, v):
        s = jnp.einsum("bthd,bshd->bhts", q, k,
                       preferred_element_type=jnp.float32)
        pos = jnp.einsum("bthd,nhd->bhtn", pq, pe,
                         preferred_element_type=jnp.float32)
        s = s + _rel_shift(pos, t)
        s = penalize_abs_values_gt(s, jnp.asarray(True), limit=25.0,
                                   penalty=float(pen))
        p = masked_softmax(s, mask)
        o = jnp.einsum("bhts,bshd->bthd", p, v,
                       preferred_element_type=jnp.float32)
        return jnp.sum(jnp.sin(o))

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    for name, a, b_ in zip("q k pq pe v".split(), g_fused, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-5,
            err_msg=f"penalty grad mismatch for {name}",
        )


@pytest.mark.parametrize("t", [192, 130])
def test_apply_padded_matches_xla(t):
    """Unaligned t through rel_attention_apply_any: forward + gradients."""
    from zipvoice_tpu.ops.attention import rel_attention_apply_any

    b, h, qd, pd, vd = 2, 2, 8, 4, 12
    rng = np.random.default_rng(15)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([t, t - 37])[:, None])

    def loss_fused(q, k, pq, pe, v):
        o = rel_attention_apply_any(q, k, pq, pe, mask, v,
                                    out_dtype=jnp.float32, interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, pq, pe, v):
        return jnp.sum(jnp.sin(_xla_apply(q, k, pq, pe, mask, v)))

    np.testing.assert_allclose(
        float(loss_fused(q, k, pq, pe, v)), float(loss_xla(q, k, pq, pe, v)),
        rtol=1e-6)
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    for name, a, b_ in zip("q k pq pe v".split(), g_fused, g_xla):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5,
            err_msg=f"padded apply grad mismatch for {name}",
        )


# ---------------------------------------------------------------------------
# Layer-level integration of the fused apply path.
# ---------------------------------------------------------------------------


def _small_layer(seed=0):
    from zipvoice_tpu.config import ZipformerConfig
    from zipvoice_tpu.nn import zipformer as zf
    from zipvoice_tpu.nn.functional import compact_rel_positional_encoding

    cfg = ZipformerConfig(
        in_dim=16, out_dim=16, downsampling_factor=(1,),
        num_encoder_layers=1, cnn_module_kernel=3, encoder_dim=16,
        query_head_dim=8, pos_head_dim=4, value_head_dim=8, num_heads=2,
        feedforward_dim=32, pos_dim=8, use_time_embed=True,
        time_embed_dim=8,
    )
    t = 128
    key = jax.random.PRNGKey(seed)
    p = zf._init_layer(key, cfg, kernel=3)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((2, t, 16)), jnp.float32)
    time_emb = jnp.asarray(rng.standard_normal((2, 16)), jnp.float32)
    pos_emb = compact_rel_positional_encoding(t, cfg.pos_dim)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([t, 100])[:, None])
    return cfg, p, x, time_emb, pos_emb, mask


def _interp_patch(monkeypatch):
    import zipvoice_tpu.ops.attention as att
    import zipvoice_tpu.ops.convglu as cg

    real_cg = cg.conv_glu_swoosh_out

    def cg_i(*a, **kw):
        kw["interpret"] = True
        return real_cg(*a, **kw)

    monkeypatch.setattr(cg, "conv_glu_swoosh_out", cg_i)

    real_probs = att.rel_attention_probs_any
    real_apply = att.rel_attention_apply_any
    real_consume = att.rel_attention_consume
    real_pc = att.rel_attention_probs_consume
    real_h0 = att.rel_attention_head0_consume

    def probs_i(*a, **kw):
        kw["interpret"] = True
        return real_probs(*a, **kw)

    def apply_i(*a, **kw):
        kw["interpret"] = True
        return real_apply(*a, **kw)

    def consume_i(*a, **kw):
        kw["interpret"] = True
        return real_consume(*a, **kw)

    def pc_i(*a, **kw):
        kw["interpret"] = True
        return real_pc(*a, **kw)

    def h0_i(*a, **kw):
        kw["interpret"] = True
        return real_h0(*a, **kw)

    real_pa = att.rel_attention_probs_apply

    def pa_i(*a, **kw):
        kw["interpret"] = True
        return real_pa(*a, **kw)

    monkeypatch.setattr(att, "rel_attention_probs_any", probs_i)
    monkeypatch.setattr(att, "rel_attention_apply_any", apply_i)
    monkeypatch.setattr(att, "rel_attention_consume", consume_i)
    monkeypatch.setattr(att, "rel_attention_probs_consume", pc_i)
    monkeypatch.setattr(att, "rel_attention_head0_consume", h0_i)
    monkeypatch.setattr(att, "rel_attention_probs_apply", pa_i)


def test_layer_fused_kernel_matches_xla_eval(monkeypatch):
    """Whole encoder layer, eval mode: the fused probs kernel == the XLA
    einsum path end-to-end through every consumer."""
    from zipvoice_tpu.nn import zipformer as zf

    cfg, p, x, time_emb, pos_emb, mask = _small_layer()
    _interp_patch(monkeypatch)

    def run(fused):
        zf.set_fused_attention(fused)
        try:
            return zf._encoder_layer(p, cfg, x, pos_emb, time_emb, mask, None)
        finally:
            zf.set_fused_attention(None)

    out_f = np.asarray(run(True))
    out_x = np.asarray(run(False))
    np.testing.assert_allclose(out_f, out_x, atol=2e-5)


@pytest.mark.parametrize("gates_on", [False, True])
def test_layer_fused_apply_matches_xla_training(monkeypatch, gates_on):
    """Whole encoder layer with a TrainCtx: identical RNG stream on both
    paths -> identical stochastics; fused apply must match forward AND
    gradients (incl. the detached const-attention branch and the score
    failsafe riding exactly one consumer)."""
    from zipvoice_tpu.nn import zipformer as zf
    from zipvoice_tpu.train.schedules import zipformer_schedules

    cfg, p, x, time_emb, pos_emb, mask = _small_layer(seed=1)
    _interp_patch(monkeypatch)
    s = dict(zipformer_schedules(100.0, cfg), layerdrop=((0.01,),))

    class FixedGateCtx(zf.TrainCtx):
        def gate(self, prob):
            self.next_key()
            return jnp.asarray(gates_on)

    def loss(p, x, fused_apply):
        zf.set_fused_attention(True)
        zf.set_fused_apply(fused_apply)
        try:
            ctx = FixedGateCtx(jax.random.PRNGKey(3), s)
            out = zf._encoder_layer(p, cfg, x, pos_emb, time_emb, mask, ctx)
        finally:
            zf.set_fused_attention(None)
            zf.set_fused_apply(True)
        return jnp.sum(jnp.sin(out))

    (l_f, g_f) = jax.value_and_grad(loss, argnums=(0, 1))(p, x, True)
    (l_x, g_x) = jax.value_and_grad(loss, argnums=(0, 1))(p, x, False)
    np.testing.assert_allclose(float(l_f), float(l_x), rtol=1e-5)
    paths_f = jax.tree_util.tree_leaves_with_path(g_f)
    paths_x = jax.tree_util.tree_leaves_with_path(g_x)
    for (pa, a), (pb, b_) in zip(paths_f, paths_x):
        a, b_ = np.asarray(a), np.asarray(b_)
        if not gates_on:
            np.testing.assert_allclose(
                a, b_, rtol=5e-4, atol=5e-5,
                err_msg=f"layer grad mismatch at {jax.tree_util.keystr(pa)}",
            )
            continue
        # gates_on fires every balancer/whiten: their VJPs contain sign(x)
        # and thresholded per-channel statistics, so an O(1e-7) forward
        # difference between the kernel and XLA softmax can discretely flip
        # a few elements' gradient contributions (measured: the XLA path vs
        # ITSELF at x+3e-7 jumps 0.019 in conv bias grads).  Bound the
        # *aggregate* deviation instead of elementwise equality.
        denom = max(float(np.linalg.norm(a)), float(np.linalg.norm(b_)), 1e-6)
        rel = float(np.linalg.norm(a - b_)) / denom
        assert rel < 0.08, (
            f"layer grad mismatch at {jax.tree_util.keystr(pa)}: "
            f"relative L2 {rel:.4f}"
        )


@pytest.mark.parametrize("t", [128, 130])
def test_consume_gradients_match_xla(t):
    """rel_attention_consume: forward contracts shared stop-gradient probs;
    flash backward == autodiff of the transparent XLA formulation, for
    aligned and unaligned t (padding handled inside the backward)."""
    from zipvoice_tpu.ops.attention import (
        rel_attention_consume,
        rel_attention_probs_any,
    )

    b, h, qd, pd, vd = 1, 2, 8, 4, 12
    rng = np.random.default_rng(20)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([t - 17])[:, None])

    def loss_consume(q, k, pq, pe, v):
        probs = jax.lax.stop_gradient(
            rel_attention_probs_any(q, k, pq, pe, mask,
                                    out_dtype=jnp.float32, interpret=True)
        )
        o = rel_attention_consume(q, k, pq, pe, mask, probs, v,
                                  interpret=True)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, pq, pe, v):
        return jnp.sum(jnp.sin(_xla_apply(q, k, pq, pe, mask, v)))

    np.testing.assert_allclose(
        float(loss_consume(q, k, pq, pe, v)), float(loss_xla(q, k, pq, pe, v)),
        rtol=1e-6)
    g_c = jax.grad(loss_consume, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4))(q, k, pq, pe, v)
    for name, a, b_ in zip("q k pq pe v".split(), g_c, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-5,
            err_msg=f"consume grad mismatch for {name}",
        )


def test_train_step_with_consume_path(monkeypatch):
    """Full make_train_step with the fused consume path forced on (interpret
    mode): proves the flash backward composes with lax.scan-of-remat layers,
    the regularizer schedules, and ScaledAdam inside one jit — the exact
    production training configuration on TPU."""
    import zipvoice_tpu.ops.attention as att
    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.nn import zipformer as zf
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.schedules import zipvoice_schedules
    from zipvoice_tpu.train.step import TrainConfig, make_train_step

    _interp_patch(monkeypatch)
    cfg = ZipVoiceConfig(
        fm_decoder_downsampling_factor=(1,), fm_decoder_num_layers=(2,),
        fm_decoder_cnn_module_kernel=(3,), fm_decoder_feedforward_dim=32,
        fm_decoder_num_heads=2, fm_decoder_dim=16,
        text_encoder_num_layers=1, text_encoder_feedforward_dim=16,
        text_encoder_cnn_module_kernel=3, text_encoder_num_heads=2,
        text_encoder_dim=16, time_embed_dim=8, text_embed_dim=16,
        query_head_dim=4, value_head_dim=4, pos_head_dim=2, pos_dim=4,
        feat_dim=8, vocab_size=12, pad_id=0,
    )
    rng = np.random.default_rng(0)
    t = 128  # >= TILE so the fused path engages
    batch = {
        "tokens": rng.integers(1, 12, (2, 8)).astype(np.int32),
        "tokens_lens": np.full((2,), 6, np.int32),
        "features": rng.standard_normal((2, t, 8)).astype(np.float32),
        "features_lens": np.full((2,), t, np.int32),
    }
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, TrainConfig(compute_dtype="float32",
                                                 use_regularizers=True))
    sched = zipvoice_schedules(100.0, cfg)

    zf.set_fused_attention(True)
    try:
        p1, o1, m1 = step(params, opt_state, batch, jax.random.PRNGKey(1),
                          np.int32(1), np.float32(0), sched)
        loss_fused = float(m1["loss"])
    finally:
        zf.set_fused_attention(None)

    # the step donates params/opt_state buffers — rebuild identical inputs
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    opt_state = opt.init(params)
    p2, o2, m2 = step(params, opt_state, batch, jax.random.PRNGKey(1),
                      np.int32(1), np.float32(0), sched)
    loss_xla = float(m2["loss"])
    assert np.isfinite(loss_fused)
    np.testing.assert_allclose(loss_fused, loss_xla, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(p1),
                     jax.tree_util.tree_leaves(p2)):
        a, b_ = np.asarray(a), np.asarray(b_)
        denom = max(float(np.linalg.norm(a)), float(np.linalg.norm(b_)), 1e-6)
        assert float(np.linalg.norm(a - b_)) / denom < 0.02


# ---------------------------------------------------------------------------
# Eval-only fused variants: probs kernel with fused first consumer, and the
# tile-wise head-0 nonlin contraction (round-4 inference-MFU work).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("t", [256, 200])
@pytest.mark.parametrize("with_mask", [False, True])
def test_probs_consume_matches_xla(t, with_mask):
    from zipvoice_tpu.ops.attention import rel_attention_probs_consume

    b, h, qd, pd, vd = 2, 4, 32, 4, 12
    rng = np.random.default_rng(20)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    mask = (
        jnp.asarray(np.arange(t)[None, :] >= np.array([t, t - 60])[:, None])
        if with_mask
        else None
    )
    probs_ref = np.asarray(_xla_path(q, k, pq, pe, mask))
    out_ref = np.asarray(_xla_apply(q, k, pq, pe, mask, v))
    probs, out = rel_attention_probs_consume(
        q, k, pq, pe, mask, v, out_dtype=jnp.float32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(probs), probs_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-5)


@pytest.mark.parametrize("t", [256, 200])
@pytest.mark.parametrize("with_mask", [False, True])
def test_head0_consume_matches_xla(t, with_mask):
    from zipvoice_tpu.ops.attention import rel_attention_head0_consume

    b, h, qd, pd, c = 2, 4, 32, 4, 96
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    mask = (
        jnp.asarray(np.arange(t)[None, :] >= np.array([t, t - 60])[:, None])
        if with_mask
        else None
    )
    head0 = _xla_path(q, k, pq, pe, mask)[:, 0]
    ref = np.asarray(jnp.einsum("bts,bsc->btc", head0, v,
                                preferred_element_type=jnp.float32))
    out = np.asarray(rel_attention_head0_consume(
        q, k, pq, pe, mask, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_layer_fused_eval_deferred_probs_matches_xla(monkeypatch):
    """Whole encoder layer, eval mode, three ways: the deferred-probs fused
    path (_EvalAttn: head-0 tile recompute + probs materialized at
    SelfAttention-1), the round-2 probs-kernel-at-top path, and the plain
    XLA path must all agree."""
    from zipvoice_tpu.nn import zipformer as zf

    cfg, p, x, time_emb, pos_emb, mask = _small_layer()
    _interp_patch(monkeypatch)

    def run(fused, fused_eval):
        zf.set_fused_attention(fused)
        zf.set_fused_eval(fused_eval)
        try:
            return zf._encoder_layer(p, cfg, x, pos_emb, time_emb, mask, None)
        finally:
            zf.set_fused_attention(None)
            zf.set_fused_eval(True)

    out_deferred = np.asarray(run(True, True))
    out_top = np.asarray(run(True, False))
    out_x = np.asarray(run(False, False))
    np.testing.assert_allclose(out_deferred, out_x, atol=2e-5)
    np.testing.assert_allclose(out_top, out_x, atol=2e-5)


@pytest.mark.parametrize("vd,h", [(12, 4), (288, 1), (8, 2)])
def test_probs_apply_matches_einsum(vd, h):
    """rel_attention_probs_apply (the r5 lane-padded shared-probs consume)
    must equal the XLA einsum exactly on the real lanes — padding adds
    only exact-zero lanes that are sliced off."""
    from zipvoice_tpu.ops.attention import rel_attention_probs_apply

    b, t = 2, 128
    rng = np.random.default_rng(31)
    logits = rng.standard_normal((b, h, t, t)).astype(np.float32)
    probs = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    )
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    ref = np.asarray(jnp.einsum("bhts,bshd->bthd", probs, v,
                                preferred_element_type=jnp.float32))
    out = np.asarray(rel_attention_probs_apply(probs, v, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("t", [1152, 1408])
def test_probs_apply_odd_128_bucket_above_1024(t):
    """Regression (r5): for T>1024 the row tile must DIVIDE T.  The old
    fixed tt=256 left rows >=1024 of every (b, h) block UNWRITTEN for the
    odd-multiple-of-128 frame buckets (1152, 1408, ...) that serving's
    frame_bucket=128 produces for ~12 s requests — uninitialized memory
    in the default probs-apply path."""
    from zipvoice_tpu.ops.attention import rel_attention_probs_apply

    b, h, vd = 1, 2, 12
    rng = np.random.default_rng(37)
    logits = rng.standard_normal((b, h, t, t)).astype(np.float32)
    probs = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    )
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    ref = np.asarray(jnp.einsum("bhts,bshd->bthd", probs, v,
                                preferred_element_type=jnp.float32))
    out = np.asarray(rel_attention_probs_apply(probs, v, interpret=True))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_probs_apply_grads_match_einsum():
    """rel_attention_probs_apply is differentiable (einsum-adjoint VJP):
    grad-of-eval paths (e.g. a schedules=None loss) must not error and
    must match the plain einsum's gradients."""
    from zipvoice_tpu.ops.attention import rel_attention_probs_apply

    b, h, t, vd = 1, 2, 128, 12
    rng = np.random.default_rng(33)
    logits = rng.standard_normal((b, h, t, t)).astype(np.float32)
    probs = jnp.asarray(
        np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    )
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)

    def loss_k(p_, v_):
        return jnp.sum(
            jnp.sin(rel_attention_probs_apply(p_, v_, interpret=True))
        )

    def loss_x(p_, v_):
        return jnp.sum(jnp.sin(jnp.einsum(
            "bhts,bshd->bthd", p_, v_,
            preferred_element_type=jnp.float32)))

    gk = jax.grad(loss_k, argnums=(0, 1))(probs, v)
    gx = jax.grad(loss_x, argnums=(0, 1))(probs, v)
    for a, b_ in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
