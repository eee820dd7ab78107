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

    # --- flip-mode shear adjoint (r5): same consume grads with the
    # anti-identity matmul reversals replaced by lax.rev on sublanes.
    # Mosaic support for a sublane rev is a hardware question — a lowering
    # failure is recorded (the mode then stays off) instead of failing the
    # whole check.
    from zipvoice_tpu.ops.attention import set_bwd_shear_adj

    for mode in ("flip", "rollw"):
        try:
            set_bwd_shear_adj(mode)
            g_f = jax.jit(jax.grad(loss_consume, argnums=(0, 1, 2, 3, 4)))(
                q, k, pq, pe, v)
            for name, a, b_ in zip("q k pq pe v".split(), g_f, g_x):
                a, b_ = np.asarray(a), np.asarray(b_)
                rel = float(
                    np.abs(a - b_).max() / max(np.abs(b_).max(), 1e-6)
                )
                report["checks"][f"{mode}_grad_{name}_rel_err"] = rel
                assert rel < 2e-3, (mode, name, rel)
            report["checks"][f"bwd_shear_adj_{mode}"] = "ok"
        except AssertionError:
            raise
        except Exception as e:  # noqa: BLE001 — lowering not supported
            report["checks"][f"bwd_shear_adj_{mode}"] = (
                f"unsupported: {type(e).__name__}: {str(e)[:200]}"
            )
        finally:
            set_bwd_shear_adj("matmul")

    # --- r5 lane-padded shared-probs consume (rel_attention_probs_apply)
    from zipvoice_tpu.ops.attention import rel_attention_probs_apply

    t128 = 256
    q2, k2 = q[:, :t128], k[:, :t128]
    pq2, pe2 = pq[:, :t128], pe[t - t128 : t + t128 - 1]
    mask2 = mask[:, :t128]
    v2 = v[:, :t128]
    p2 = np.asarray(jax.jit(
        lambda *a: rel_attention_probs_any(*a, out_dtype=jnp.float32)
    )(q2, k2, pq2, pe2, mask2), np.float32)
    pa_kernel = np.asarray(jax.jit(rel_attention_probs_apply)(
        jnp.asarray(p2), v2), np.float32)
    pa_xla = np.asarray(jnp.einsum(
        "bhts,bshd->bthd", jnp.asarray(p2), v2,
        preferred_element_type=jnp.float32), np.float32)
    pa_err = float(np.abs(pa_kernel - pa_xla).max())
    report["checks"]["probs_apply_max_err"] = pa_err
    assert pa_err < 1e-4, pa_err

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

    def conv_f64(proj_, mask_):
        """Host f64 ground truth for the fused conv module middle — the
        arbiter between the Pallas kernel and the XLA twin (the r4 capture
        measured them 1.39e-3 apart on chip with no way to tell which side
        was wrong; VERDICT r4 next #1a).  Same math as conv_glu_swoosh_out
        and nn/zipformer._conv_module (ref zipformer.py:1638-1680)."""
        p = np.asarray(proj_, np.float64)
        vv, ss = p[..., :cc], p[..., cc:]
        vv = vv / (1.0 + np.exp(-ss))
        vv = np.where(np.asarray(mask_)[:, :, None], 0.0, vv)
        pad = kk // 2
        vp = np.pad(vv, ((0, 0), (pad, pad), (0, 0)))
        w64 = np.asarray(w_dw, np.float64)
        out = sum(
            w64[i] * vp[:, i : i + p.shape[1]] for i in range(kk)
        ) + np.asarray(b_dw, np.float64)
        y = (
            np.logaddexp(0.0, out - 1.0) - 0.08 * out - 0.313261687
        )
        return y @ np.asarray(w_out, np.float64) + np.asarray(
            b_out, np.float64
        )

    def check_conv(tag, proj_, mask_):
        """Compare the compiled kernel AND its XLA twin against f64.

        The pass criterion is relative: the kernel must be no farther from
        the f64 truth than ~2x the XLA production path (both run MXU
        matmuls/convs at default precision, so a shared f32->bf16-passes
        rounding floor is expected and acceptable; a LOWERING bug shows up
        as kernel_err >> xla_err)."""

        def conv_xla(p):
            vv, ss = jnp.split(p, 2, axis=-1)
            vv = vv * jax.nn.sigmoid(ss)
            vv = jnp.where(mask_[:, :, None], 0.0, vv)
            out = jax.lax.conv_general_dilated(
                vv, w_dw[:, None, :], window_strides=(1,),
                padding=((kk // 2, kk // 2),),
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=cc,
            ) + b_dw
            return swoosh_r(out) @ w_out + b_out

        cg_kernel = np.asarray(jax.jit(
            lambda p: conv_glu_swoosh_out(p, w_dw, b_dw, mask_, w_out, b_out)
        )(proj_), np.float32)
        cg_xla = np.asarray(jax.jit(conv_xla)(proj_), np.float32)
        truth = conv_f64(proj_, mask_)
        err_kernel = float(np.abs(cg_kernel - truth).max())
        err_xla = float(np.abs(cg_xla - truth).max())
        report["checks"][f"conv_glu{tag}_kernel_vs_f64"] = err_kernel
        report["checks"][f"conv_glu{tag}_xla_vs_f64"] = err_xla
        report["checks"][f"conv_glu{tag}_kernel_vs_xla"] = float(
            np.abs(cg_kernel - cg_xla).max()
        )
        assert err_kernel < max(2.0 * err_xla, 5e-5), (
            tag, err_kernel, err_xla,
        )

    check_conv("", proj, mask)

    # same kernel at t=512 — exercises the 256-row time tile (t=384 above
    # runs the 128-tile config; both must compile and agree on chip)
    proj512 = jnp.asarray(
        rng.standard_normal((b, 512, 2 * cc)) * 0.5, jnp.float32)
    mask512 = jnp.asarray(
        np.arange(512)[None, :] >= np.array([512, 512 - 57])[:, None])
    check_conv("_t512", proj512, mask512)

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
