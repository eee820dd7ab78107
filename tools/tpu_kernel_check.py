"""Numerical parity of the COMPILED Pallas kernels on real TPU.

The CPU test suite exercises the kernels in interpret mode; this script
asserts the Mosaic-compiled forward AND backward against the XLA twin on
the actual chip (guards against lowering bugs interpret mode cannot see).
Run on a TPU host:  python tools/tpu_kernel_check.py
Writes KERNEL_CHECK.json at the repo root.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.nn.functional import masked_softmax
    from zipvoice_tpu.nn.zipformer import _rel_shift
    from zipvoice_tpu.ops.attention import (
        rel_attention_consume,
        rel_attention_probs_any,
    )
    from zipvoice_tpu.audio.mel import vocos_log_mel
    from zipvoice_tpu.config import FeatureConfig
    from zipvoice_tpu.ops.melspec import TILE, fused_log_mel

    report = {"device": str(jax.devices()[0]), "checks": {}}

    def xla_probs(q, k, pq, pe, mask):
        t = q.shape[1]
        attn = jnp.einsum("bthd,bshd->bhts", q, k,
                          preferred_element_type=jnp.float32)
        pos = jnp.einsum("bthd,nhd->bhtn", pq, pe,
                         preferred_element_type=jnp.float32)
        return masked_softmax(attn + _rel_shift(pos, t), mask)

    rng = np.random.default_rng(0)
    b, t, h, qd, pd, vd = 2, 384, 4, 32, 4, 12  # unaligned t -> pad wrapper
    q = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, qd)), jnp.float32)
    pq = jnp.asarray(rng.standard_normal((b, t, h, pd)), jnp.float32)
    pe = jnp.asarray(rng.standard_normal((2 * t - 1, h, pd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, vd)), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] >= np.array([t, t - 57])[:, None])

    # --- forward probs (compiled kernel vs XLA twin, both on TPU)
    p_kernel = np.asarray(jax.jit(
        lambda *a: rel_attention_probs_any(*a, out_dtype=jnp.float32)
    )(q, k, pq, pe, mask), np.float32)
    p_xla = np.asarray(jax.jit(xla_probs)(q, k, pq, pe, mask), np.float32)
    fwd_err = float(np.abs(p_kernel - p_xla).max())
    report["checks"]["probs_fwd_max_err"] = fwd_err
    assert fwd_err < 2e-5, fwd_err

    # --- flash backward (consume) vs XLA autodiff, compiled on TPU
    def loss_consume(q, k, pq, pe, v):
        probs = jax.lax.stop_gradient(
            rel_attention_probs_any(q, k, pq, pe, mask,
                                    out_dtype=jnp.float32)
        )
        o = rel_attention_consume(q, k, pq, pe, mask, probs, v)
        return jnp.sum(jnp.sin(o))

    def loss_xla(q, k, pq, pe, v):
        p = xla_probs(q, k, pq, pe, mask)
        o = jnp.einsum("bhts,bshd->bthd", p, v,
                       preferred_element_type=jnp.float32)
        return jnp.sum(jnp.sin(o))

    # Compared RELATIVE to the default-precision XLA twin.  Measured on
    # v5e: |consume - xla_default| ~ 2e-5 relative (the kernels and XLA's
    # default f32 matmuls agree tightly), while
    # default_matmul_precision('highest') deviates from BOTH by ~7e-4
    # relative on this platform — the 'highest' multi-pass lowering is the
    # outlier, not a valid oracle here.
    g_c = jax.jit(jax.grad(loss_consume, argnums=(0, 1, 2, 3, 4)))(
        q, k, pq, pe, v)
    g_x = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4)))(
        q, k, pq, pe, v)
    for name, a, b_ in zip("q k pq pe v".split(), g_c, g_x):
        a, b_ = np.asarray(a), np.asarray(b_)
        rel = float(np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6))
        report["checks"][f"consume_grad_{name}_rel_err"] = rel
        assert rel < 2e-3, (name, rel)

    # --- round-4 eval fusions, compiled vs their XLA twins -----------------
    from zipvoice_tpu.ops.attention import (
        rel_attention_head0_consume,
        rel_attention_probs_consume,
    )

    p2_kernel, o_kernel = jax.jit(
        lambda *a: rel_attention_probs_consume(*a, out_dtype=jnp.float32)
    )(q, k, pq, pe, mask, v)
    o_xla = jnp.einsum("bhts,bshd->bthd", jnp.asarray(p_xla), v,
                       preferred_element_type=jnp.float32)
    pc_probs_err = float(np.abs(np.asarray(p2_kernel) - p_xla).max())
    pc_out_err = float(np.abs(np.asarray(o_kernel) - np.asarray(o_xla)).max())
    report["checks"]["probs_consume_probs_max_err"] = pc_probs_err
    report["checks"]["probs_consume_out_max_err"] = pc_out_err
    assert pc_probs_err < 2e-5, pc_probs_err
    assert pc_out_err < 1e-4, pc_out_err

    c_wide = 192
    v_wide = jnp.asarray(rng.standard_normal((b, t, c_wide)), jnp.float32)
    h0_kernel = np.asarray(jax.jit(rel_attention_head0_consume)(
        q, k, pq, pe, mask, v_wide), np.float32)
    h0_xla = np.asarray(jnp.einsum(
        "bts,bsc->btc", jnp.asarray(p_xla[:, 0]), v_wide,
        preferred_element_type=jnp.float32), np.float32)
    h0_err = float(np.abs(h0_kernel - h0_xla).max())
    report["checks"]["head0_consume_max_err"] = h0_err
    assert h0_err < 1e-4, h0_err

    from zipvoice_tpu.nn.functional import swoosh_r
    from zipvoice_tpu.ops.convglu import conv_glu_swoosh_out

    cc, dd, kk = 192, 128, 31
    proj = jnp.asarray(rng.standard_normal((b, t, 2 * cc)) * 0.5, jnp.float32)
    w_dw = jnp.asarray(rng.standard_normal((kk, cc)) * 0.2, jnp.float32)
    b_dw = jnp.asarray(rng.standard_normal((cc,)) * 0.1, jnp.float32)
    w_out = jnp.asarray(rng.standard_normal((cc, dd)) * 0.1, jnp.float32)
    b_out = jnp.asarray(rng.standard_normal((dd,)) * 0.1, jnp.float32)

    def conv_xla(proj):
        vv, ss = jnp.split(proj, 2, axis=-1)
        vv = vv * jax.nn.sigmoid(ss)
        vv = jnp.where(mask[:, :, None], 0.0, vv)
        out = jax.lax.conv_general_dilated(
            vv, w_dw[:, None, :], window_strides=(1,),
            padding=((kk // 2, kk // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=cc,
        ) + b_dw
        return swoosh_r(out) @ w_out + b_out

    cg_kernel = np.asarray(jax.jit(
        lambda p: conv_glu_swoosh_out(p, w_dw, b_dw, mask, w_out, b_out)
    )(proj), np.float32)
    cg_xla = np.asarray(jax.jit(conv_xla)(proj), np.float32)
    cg_err = float(np.abs(cg_kernel - cg_xla).max())
    report["checks"]["conv_glu_max_err"] = cg_err
    assert cg_err < 1e-4, cg_err

    # same kernel at t=512 — exercises the 256-row time tile (t=384 above
    # runs the 128-tile config; both must compile and agree on chip)
    proj512 = jnp.asarray(
        rng.standard_normal((b, 512, 2 * cc)) * 0.5, jnp.float32)
    mask512 = jnp.asarray(
        np.arange(512)[None, :] >= np.array([512, 512 - 57])[:, None])

    def conv_xla_512(p):
        vv, ss = jnp.split(p, 2, axis=-1)
        vv = vv * jax.nn.sigmoid(ss)
        vv = jnp.where(mask512[:, :, None], 0.0, vv)
        out = jax.lax.conv_general_dilated(
            vv, w_dw[:, None, :], window_strides=(1,),
            padding=((kk // 2, kk // 2),),
            dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=cc,
        ) + b_dw
        return swoosh_r(out) @ w_out + b_out

    cg512_kernel = np.asarray(jax.jit(
        lambda p: conv_glu_swoosh_out(p, w_dw, b_dw, mask512, w_out, b_out)
    )(proj512), np.float32)
    cg512_err = float(np.abs(
        cg512_kernel - np.asarray(jax.jit(conv_xla_512)(proj512), np.float32)
    ).max())
    report["checks"]["conv_glu_t512_max_err"] = cg512_err
    assert cg512_err < 1e-4, cg512_err

    # --- fused mel kernel vs the XLA vocos path (same framing as
    # tests/test_melspec_kernel.py, compiled instead of interpreted)
    n_fft, hop = 1024, 256
    frames = 2 * TILE
    raw = (rng.standard_normal((2, frames * hop)) * 0.1).astype(np.float32)
    need = (frames - 1) * hop + n_fft
    wc = np.pad(raw, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    wc = wc[:, :need]
    m_fused = np.asarray(fused_log_mel(jnp.asarray(wc)), np.float32)
    m_xla = np.asarray(
        vocos_log_mel(jnp.asarray(raw), FeatureConfig()), np.float32
    )
    n = min(m_fused.shape[1], m_xla.shape[1])
    mel_err = float(np.abs(m_fused[:, :n] - m_xla[:, :n]).max())
    report["checks"]["melspec_max_err"] = mel_err
    assert mel_err < 1e-3, mel_err

    report["status"] = "pass"
    out = Path(__file__).resolve().parents[1] / "KERNEL_CHECK.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
