"""ScaledAdam parity vs the reference torch optimizer on identical gradient
sequences, plus Eden schedule parity and a convergence smoke test."""

import numpy as np
import pytest

from tests.conftest import requires_reference

import jax
import jax.numpy as jnp

from zipvoice_tpu.train.lr_schedule import eden_lr
from zipvoice_tpu.train.scaled_adam import apply_updates, scaled_adam


def _make_params(rng):
    return {
        "w": rng.standard_normal((16, 8)).astype(np.float32) * 0.5,
        "b": rng.standard_normal((8,)).astype(np.float32) * 0.1,
        "s": np.float32(rng.standard_normal()),
    }


@requires_reference
@pytest.mark.parametrize("clipping", [None, 2.0])
def test_scaled_adam_matches_reference(reference_path, clipping):
    import torch

    from zipvoice.utils.optim import ScaledAdam as RefScaledAdam

    rng = np.random.default_rng(0)
    init = _make_params(rng)
    n_steps = 130  # crosses size_update_period, irregular (10,20,40) and
    # periodic (100) clipping-threshold updates
    grads = [
        {k: rng.standard_normal(np.shape(v)).astype(np.float32)
         for k, v in init.items()}
        for _ in range(n_steps)
    ]
    lr = 0.03

    # --- torch reference
    tp = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in init.items()}
    ref_opt = RefScaledAdam(
        [{"params": [tp["w"], tp["b"], tp["s"]]}],
        lr=lr,
        clipping_scale=clipping,
    )
    for g in grads:
        for k in tp:
            tp[k].grad = torch.tensor(g[k])
        ref_opt.step()
        ref_opt.zero_grad()

    # --- ours
    params = {k: jnp.asarray(v) for k, v in init.items()}
    opt = scaled_adam(clipping_scale=clipping)
    state = opt.init(params)

    @jax.jit
    def step(params, state, g):
        updates, state = opt.update(g, state, params, lr)
        return apply_updates(params, updates), state

    for g in grads:
        params, state = step(params, state, {k: jnp.asarray(v) for k, v in g.items()})

    for k in init:
        ref_val = tp[k].detach().numpy()
        our_val = np.asarray(params[k])
        err = np.abs(ref_val - our_val).max()
        assert err < 1e-4, f"{k}: err {err}"


@requires_reference
def test_eden_matches_reference(reference_path):
    import torch

    from zipvoice.utils.lr_scheduler import Eden as RefEden
    from zipvoice.utils.optim import ScaledAdam as RefScaledAdam

    p = torch.nn.Parameter(torch.zeros(4, 4))
    opt = RefScaledAdam([{"params": [p]}], lr=0.05, clipping_scale=None)
    sched = RefEden(opt, lr_batches=5000, lr_epochs=4, warmup_batches=500)
    for batch in [0, 100, 499, 500, 2000, 10000]:
        for epoch in [0, 1, 3, 10]:
            sched.batch = batch
            sched.epoch = epoch
            ref = sched.get_lr()[0]
            ours = float(
                eden_lr(0.05, batch, epoch, lr_batches=5000, lr_epochs=4,
                        warmup_batches=500)
            )
            assert abs(ref - ours) < 1e-7 * max(1.0, abs(ref)), (batch, epoch)


def test_scaled_adam_converges():
    """Small least-squares problem must converge (analogue of the reference's
    inline _test_scaled_adam, ref optim.py:757-868)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((256, 10)).astype(np.float32)
    w_true = rng.standard_normal((10, 1)).astype(np.float32)
    y = x @ w_true

    params = {"w": jnp.zeros((10, 1)) + 0.01, "logs": jnp.zeros(())}
    opt = scaled_adam(clipping_scale=2.0)
    state = opt.init(params)

    def loss_fn(p):
        pred = x @ p["w"] * jnp.exp(p["logs"])
        return jnp.mean((pred - y) ** 2)

    @jax.jit
    def step(params, state):
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, state = opt.update(g, state, params, 0.05)
        return apply_updates(params, updates), state, loss

    losses = []
    for _ in range(400):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < 0.01 * losses[0], (losses[0], losses[-1])


def test_gradient_dominating_parameter_diag():
    """update(with_diagnostics=True) names the tensor dominating the
    rms-scaled gradient norm (ref optim.py:633-748) and reports the clip
    factor; the default 2-tuple signature is unchanged."""
    import numpy as np

    from zipvoice_tpu.train.scaled_adam import leaf_names, scaled_adam

    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.standard_normal((8, 8)), jnp.float32),
        "b": {"w": jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)},
    }
    opt = scaled_adam(clipping_scale=2.0)
    state = opt.init(params)

    # warm param_rms with one normal step (rms starts at init-time values)
    g0 = jax.tree.map(lambda p: 0.01 * jnp.ones_like(p), params)
    _, state = opt.update(g0, state, params, 0.01)

    grads = {
        "a": jnp.full((8, 8), 1e-4, jnp.float32),
        "b": {"w": jnp.full((4, 4), 10.0, jnp.float32)},  # dominant
    }
    updates, state2, diag = opt.update(grads, state, params, 0.01,
                                       with_diagnostics=True)
    names = leaf_names(params)
    assert names[int(diag["grad_dominant_idx"])] == "b.w"
    assert float(diag["grad_dominant_frac"]) > 0.99
    assert 0.0 <= float(diag["grad_clip"]) <= 1.0
    # same updates as the plain signature
    updates_plain, _ = opt.update(grads, state, params, 0.01)
    for u1, u2 in zip(jax.tree.leaves(updates), jax.tree.leaves(updates_plain)):
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
