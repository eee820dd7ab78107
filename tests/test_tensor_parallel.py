"""DP x TP train step on the virtual 8-device mesh: same math as DP-only,
with the feedforward params/moments actually sharded over the model axis."""

import numpy as np

import jax
import jax.numpy as jnp

from zipvoice_tpu.config import ZipVoiceConfig
from zipvoice_tpu.models.zipvoice import init_zipvoice
from zipvoice_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    tp_param_shardings,
)
from zipvoice_tpu.train.scaled_adam import scaled_adam
from zipvoice_tpu.train.step import TrainConfig, make_train_step

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


def _batch(cfg, b=8):
    rng = np.random.default_rng(0)
    s, t = 12, 32
    return {
        "tokens": rng.integers(1, cfg.vocab_size, (b, s)).astype(np.int32),
        "tokens_lens": np.full((b,), s - 2, np.int32),
        "features": rng.standard_normal((b, t, cfg.feat_dim)).astype(np.float32),
        "features_lens": np.full((b,), t - 3, np.int32),
    }


def _run(mesh, cfg, tp):
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(params)
    if not tp:
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
    step = make_train_step(
        cfg, opt, TrainConfig(compute_dtype="float32"), mesh=mesh,
        params_template=params if tp else None,
        opt_state_template=opt_state if tp else None,
    )
    batch = shard_batch(mesh, _batch(cfg))
    params, opt_state, m = step(
        params, opt_state, batch, jax.random.PRNGKey(1),
        jnp.zeros((), jnp.int32), jnp.zeros((), jnp.float32),
    )
    return params, float(m["loss"])


def test_tp_step_matches_dp_step():
    cfg = ZipVoiceConfig(**TINY)
    mesh_dp = make_mesh(n_data=8)
    p_dp, l_dp = _run(mesh_dp, cfg, tp=False)
    mesh_tp = make_mesh(n_data=4, n_model=2)
    p_tp, l_tp = _run(mesh_tp, cfg, tp=True)

    np.testing.assert_allclose(l_tp, l_dp, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                    jax.tree_util.tree_leaves(p_tp)):
        # atol 1e-4: sharded-vs-replicated accumulation order differs for
        # the grouped depthwise conv (see test_sequence_parallel.py)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)

    # the feedforward weights really live sharded over the model axis
    found = False
    for kp, leaf in jax.tree_util.tree_flatten_with_path(p_tp)[0]:
        path = "/".join(getattr(k, "key", str(k)) for k in kp)
        if "feed_forward" in path and path.endswith("in_proj/weight"):
            assert "model" in str(leaf.sharding.spec), (path, leaf.sharding)
            found = True
    assert found


def test_tp_sharding_map_structure():
    cfg = ZipVoiceConfig(**TINY)
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    shardings = tp_param_shardings(mesh, params)
    n_sharded = sum(
        1 for s in jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda x: hasattr(x, "spec"))
        if "model" in str(s.spec)
    )
    # 3 FF modules x 2 tensors+1 bias per fm layer (3 layers) + text encoder
    assert n_sharded >= 9, n_sharded


def test_tp_scan_stacking_does_not_regather_weights():
    """VERDICT weak #6 resolution: with TP shardings, the scanned-layer
    jnp.stack keeps FF weights at LOCAL shard shape — the compiled train
    step contains zero all-gathers (TP output reductions + DP grad sync are
    all-reduces), i.e. no trace-time re-gather of sharded weights."""
    import re

    from zipvoice_tpu.nn import zipformer as zf

    cfg = ZipVoiceConfig(**dict(TINY, fm_decoder_num_layers=(2, 2, 2)))
    mesh = make_mesh(n_data=4, n_model=2)
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    shardings = tp_param_shardings(mesh, params)
    params = jax.tree.map(
        lambda a, s: jax.device_put(np.asarray(a), s), params, shardings
    )
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(params)
    batch = shard_batch(mesh, _batch(cfg))

    scan_before = zf._SCAN_LAYERS
    zf.set_scan_layers(True)
    try:
        step = make_train_step(
            cfg, opt, TrainConfig(compute_dtype="float32"), mesh=mesh,
            params_template=params, opt_state_template=opt_state,
        )
        hlo = step.jitted.lower(
            params, opt_state, batch, jax.random.PRNGKey(0),
            np.int32(1), np.float32(0), None,
        ).compile().as_text()
    finally:
        zf.set_scan_layers(scan_before)

    assert len(re.findall(r"all-gather", hlo)) == 0
    # stacked fm_decoder FF weights appear at local shard shape
    # (layers=2, d=64, ff=96/2): (2,64,48) present, full (2,64,96) absent
    assert re.search(r"f32\[2,64,48\]", hlo)
    assert not re.search(r"f32\[2,64,96\]", hlo)
