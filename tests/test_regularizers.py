"""Gradient parity of the custom-VJP regularizers vs the reference torch
autograd functions (same input, same upstream cotangent)."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from zipvoice_tpu.nn import regularizers as reg
from zipvoice_tpu.train.schedules import PiecewiseLinear, zipformer_schedules


def _grad_of(fn, x, cotangent):
    _, vjp = jax.vjp(fn, jnp.asarray(x))
    return np.asarray(vjp(jnp.asarray(cotangent))[0])


@requires_reference
def test_balancer_grad_parity(reference_path):
    import torch

    from zipvoice.models.modules.scaling import Balancer

    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 9, 16), dtype=np.float32) * 2.0
    ct = rng.standard_normal((6, 9, 16), dtype=np.float32)

    mod = Balancer(16, channel_dim=-1, min_positive=0.45, max_positive=0.55,
                   min_abs=0.2, max_abs=4.0, grad_scale=0.04, prob=1.0)
    mod.train()
    xt = torch.tensor(x, requires_grad=True)
    y = mod(xt)
    y.backward(gradient=torch.tensor(ct))
    ref_grad = xt.grad.numpy()

    ours = _grad_of(
        lambda v: reg.balancer(
            v, jnp.asarray(True), min_positive=0.45, max_positive=0.55,
            min_abs=0.2, max_abs=4.0, grad_scale=0.04,
        ),
        x, ct,
    )
    err = np.abs(ours - ref_grad).max()
    assert err < 1e-5, f"balancer grad err {err}"


@requires_reference
def test_whiten_grad_parity(reference_path):
    import torch

    from zipvoice.models.modules.scaling import Whiten

    rng = np.random.default_rng(1)
    # correlated data so the metric exceeds the limit and the penalty fires
    base = rng.standard_normal((40, 4), dtype=np.float32)
    mix = rng.standard_normal((4, 16), dtype=np.float32)
    x = (base @ mix).astype(np.float32)
    ct = rng.standard_normal((40, 16), dtype=np.float32)

    mod = Whiten(num_groups=2, whitening_limit=1.1, prob=1.0, grad_scale=0.02)
    mod.train()
    xt = torch.tensor(x, requires_grad=True)
    y = mod(xt)
    y.backward(gradient=torch.tensor(ct))
    ref_grad = xt.grad.numpy()

    ours = _grad_of(
        lambda v: reg.whiten(v, jnp.asarray(True), num_groups=2,
                             whitening_limit=1.1, grad_scale=0.02),
        x, ct,
    )
    err = np.abs(ours - ref_grad).max()
    assert err < 1e-4, f"whiten grad err {err}"


@requires_reference
def test_whiten_noop_below_limit(reference_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((100, 16), dtype=np.float32)  # white data
    ct = rng.standard_normal((100, 16), dtype=np.float32)
    ours = _grad_of(
        lambda v: reg.whiten(v, jnp.asarray(True), num_groups=2,
                             whitening_limit=100.0, grad_scale=0.02),
        x, ct,
    )
    np.testing.assert_allclose(ours, ct, atol=1e-7)


@requires_reference
def test_penalize_abs_grad_parity(reference_path):
    import torch

    from zipvoice.models.modules.scaling import penalize_abs_values_gt

    rng = np.random.default_rng(3)
    x = (rng.standard_normal((5, 7), dtype=np.float32) * 30).astype(np.float32)
    ct = rng.standard_normal((5, 7), dtype=np.float32)
    xt = torch.tensor(x, requires_grad=True)
    y = penalize_abs_values_gt(xt, limit=25.0, penalty=1.0e-04)
    y.backward(gradient=torch.tensor(ct))
    ref_grad = xt.grad.numpy()

    ours = _grad_of(
        lambda v: reg.penalize_abs_values_gt(v, jnp.asarray(True), 25.0, 1e-4),
        x, ct,
    )
    np.testing.assert_allclose(ours, ref_grad, atol=1e-6)


@requires_reference
def test_limit_param_value_grad_parity(reference_path):
    import torch

    from zipvoice.models.modules.scaling import LimitParamValue

    rng = np.random.default_rng(4)
    x = rng.uniform(-2, 2, (32,)).astype(np.float32)
    ct = rng.standard_normal((32,)).astype(np.float32)
    xt = torch.tensor(x, requires_grad=True)
    y = LimitParamValue.apply(xt, -1.0, 1.0)
    y.backward(gradient=torch.tensor(ct))
    ref_grad = xt.grad.numpy()

    ours = _grad_of(
        lambda v: reg.limit_param_value(v, jnp.asarray(True), -1.0, 1.0),
        x, ct,
    )
    np.testing.assert_allclose(ours, ref_grad, atol=1e-7)


@requires_reference
def test_piecewise_linear_matches_reference(reference_path):
    from zipvoice.models.modules.scaling import PiecewiseLinear as RefPL

    ref = RefPL((0.0, 0.3), (4000.0, 0.05), (16000.0, 0.0))
    ours = PiecewiseLinear((0.0, 0.3), (4000.0, 0.05), (16000.0, 0.0))
    for x in [-5.0, 0.0, 1000.0, 4000.0, 9000.0, 16000.0, 1e6]:
        assert abs(ref(x) - ours(x)) < 1e-9, x


def test_zipformer_schedules_pytree():
    from zipvoice_tpu.config import ZipVoiceConfig

    cfg = ZipVoiceConfig().fm_decoder_config()
    s0 = zipformer_schedules(0.0, cfg)
    s1 = zipformer_schedules(50000.0, cfg)
    assert s0["dropout"] == 0.3 and abs(s1["dropout"] - 0.1) < 1e-9
    assert s0["attention_skip_rate"] == 0.2 and s1["attention_skip_rate"] == 0.0
    assert len(s0["layerdrop"]) == cfg.num_stacks
    assert all(
        len(st) == n for st, n in zip(s0["layerdrop"], cfg.num_encoder_layers)
    )
    # early layerdrop is high (0.5), late is small
    assert s0["layerdrop"][0][0] == 0.5
    assert s1["layerdrop"][0][0] < 0.1


def test_dropout_shared():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((4, 8, 16))
    y = reg.dropout_shared(x, key, 0.5, shared_dim=1)
    y = np.asarray(y)
    # mask shared across time: each (b, c) is all-zero or all-2.0
    col = y[:, 0, :]
    assert ((y == 0) | (y == 2.0)).all()
    assert np.array_equal(y[:, 1, :], col)
    y0 = np.asarray(reg.dropout_shared(x, key, 0.0, shared_dim=1))
    np.testing.assert_allclose(y0, np.ones_like(y0))
