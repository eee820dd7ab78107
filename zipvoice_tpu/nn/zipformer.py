"""TTSZipformer backbone as pure JAX functions (TPU-native rebuild).

Re-designs the reference backbone (ref: zipvoice/models/modules/zipformer.py)
for XLA/TPU:

* batch-first (B, T, C) layout everywhere (the reference is seq-first);
* eval-mode semantics are the baseline: the training-only stochastic
  regularizers (layerdrop, skip-rates, const-attention, Balancer, Whiten)
  are identities in the forward pass (ref scaling.py:632-641, 884) and are
  reintroduced for training in zipvoice_tpu/train/;
* the Transformer-XL-style relative-position "as_strided" trick
  (ref zipformer.py:1239-1248) becomes a zero-FLOP pad/reshape rel-shift;
* all parameter trees mirror the torch state_dict names (dots -> nesting) so
  released checkpoints map 1:1 (see zipvoice_tpu/io/checkpoint.py); Linear
  weights are stored transposed, (in, out).

Shape/dtype notes: attention probabilities and normalization statistics are
float32; everything else follows the input dtype (bf16 on TPU for speed).
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from zipvoice_tpu.config import ZipformerConfig
from zipvoice_tpu.ops.attention import TILE as _ATTN_TILE
from zipvoice_tpu.nn.functional import (
    bias_norm,
    compact_rel_positional_encoding,
    linear,
    masked_softmax,
    swoosh_l,
    swoosh_r,
    timestep_embedding,
)

Params = Dict[str, object]

# Fused Pallas attention-probabilities kernel (ops/attention.py): None = auto
# (use on TPU for T % 128 == 0 eval-mode calls), True/False = force.
_FUSED_ATTENTION: Optional[bool] = None

# Training-only: flash-style attention backward.  Forward shares ONE
# kernel-materialized (B, H, T, T) probability tensor across the three
# consumers (nonlin head-0 + both SelfAttention modules, ref
# zipformer.py:1359-1396, 1499-1544) — measured faster than per-consumer
# recompute at every batch size; backward recomputes probabilities tile-wise
# per consumer (ops.attention.rel_attention_consume), so no (T, T) tensor
# (neither probs cotangents nor ds) is ever materialized in the backward.
# Measured fwd+bwd at 123M/B=8/T=1024 on v5e: 195 ms -> ~146 ms.
# Eval keeps the round-2 probs-kernel path (faster forward).
_FUSED_APPLY: bool = True


def set_fused_apply(enabled: bool):
    """Trace-time binding: the flag is not part of any jit cache key, so a
    toggle clears the jit caches to force retraces (test/tool toggle only —
    see ops/attention.set_shear_mode)."""
    global _FUSED_APPLY
    if enabled != _FUSED_APPLY:
        _FUSED_APPLY = enabled
        jax.clear_caches()

# Eval-only: defer the probs kernel to the SelfAttention-1 call site and
# fuse its probs @ v contraction into the kernel epilogue
# (ops.attention.rel_attention_probs_consume); NonlinAttention recomputes
# its head-0 probabilities tile-wise instead of slicing the materialized
# tensor (rel_attention_head0_consume).  Same math (scores depend only on
# the layer input); removes one full (B, H, T, T) HBM read + the head-0
# slice read per layer.  SelfAttention-2 keeps the shared-probs read.
#
# DEFAULT OFF: the round-4 on-chip A/B measured the fusions as a net LOSS
# (R4_SUMMARY.json eval_fusion: fused NFE 3928.7 us vs unfused 3707.9,
# speedup 0.944x — the deferred-probs consumers ran at 6-11% of peak), so
# the shared-probs path ships as the default until a capture shows the
# fused path winning.  Toggle for A/Bs via set_fused_eval / profile_fm.
_FUSED_EVAL: bool = False


def set_fused_eval(enabled: bool):
    """Trace-time binding; clears jit caches on change (see set_fused_apply)."""
    global _FUSED_EVAL
    if enabled != _FUSED_EVAL:
        _FUSED_EVAL = enabled
        jax.clear_caches()


# Eval-only: fuse the ConvolutionModule middle (GLU gate -> depthwise conv
# -> SwooshR -> out projection) into one Pallas kernel (ops/convglu.py) —
# collapses ~6 HBM tensor passes to read-proj + write-out.
#
# DEFAULT OFF, same round-4 evidence as _FUSED_EVAL (the unfused NFE was
# the measured winner, and the r4 on-chip kernel check flagged a 1.39e-3
# disagreement vs the XLA twin — see tools/tpu_kernel_check.py, which now
# bounds kernel AND oracle against an f64 ground truth).
_FUSED_CONV: bool = False


def set_fused_conv(enabled: bool):
    """Trace-time binding; clears jit caches on change (see set_fused_apply)."""
    global _FUSED_CONV
    if enabled != _FUSED_CONV:
        _FUSED_CONV = enabled
        jax.clear_caches()


# Eval-only: consume the materialized shared probs with the lane-padded
# Pallas matmul (ops.attention.rel_attention_probs_apply) instead of the
# 12-lane-minor XLA einsum in the two SelfAttention modules.  A/B'd at NFE
# level by tools/profile_fm.py --probs-apply (the r5 first capture showed
# per-stack mixed results under cross-session jitter: ds2 162->116 us,
# ds1/ds4 slightly worse — the same-session A/B decides the default).
_PROBS_APPLY: bool = True


def set_probs_apply(enabled: bool):
    """Trace-time binding; clears jit caches on change (see set_fused_apply)."""
    global _PROBS_APPLY
    if enabled != _PROBS_APPLY:
        _PROBS_APPLY = enabled
        jax.clear_caches()


# lax.scan over a stack's layers (identical structure): one layer trace per
# stack instead of num_layers -> much faster compiles, identical numerics.
_SCAN_LAYERS: bool = True


def set_scan_layers(enabled: bool):
    """Trace-time binding; clears jit caches on change (see set_fused_apply)."""
    global _SCAN_LAYERS
    if enabled != _SCAN_LAYERS:
        _SCAN_LAYERS = enabled
        jax.clear_caches()


_REMAT_POLICY: Optional[str] = None


def set_remat_policy(name: Optional[str]):
    """Rematerialization policy for the scanned layer blocks:

    * None — full remat: save nothing, recompute the whole layer forward in
      the backward (minimum memory).
    * 'all' — no remat: the scan saves EVERY intermediate, including each
      layer's (B, H, T, T) attention probabilities (64 MB/ds1-layer at
      B=8/T=1024) — the probs HBM traffic is why this measured ~even with
      full remat in r3 (None 157.9 ms vs 'all' 159.8 at 123M/B=8/T=1024).
    * 'dots' — save matmul outputs, recompute elementwise (164.5 ms r3:
      also drowns in big-tensor traffic).
    * 'xprobs' — save everything EXCEPT the named 'attn_probs' tensor.
      On TPU this differs from 'all' only by one probs-kernel replay per
      layer backward: the flash consumer custom-VJPs keep (q, k, pq, pe)
      as residuals, never the probs, so the quadratic tensor is not in
      the saved set of EITHER policy.
    * 'xprobs_ff' — additionally names 'ff_hidden'/'conv_mid'/
      'nonlin_mid' as not-saveable.  MEASURED NO-OP vs 'xprobs'
      (HBM_ACCOUNTING.json: byte-identical buffer assignment): the
      backward's residuals for Swoosh/GLU chains are the untagged
      PRE-activations (Swoosh grads are functions of the input, and jax's
      partial-eval already prefers saving the pre-activation and
      replaying the elementwise tail), so excluding the post-activation
      names removes nothing.  Kept selectable so the A/B artifact can
      demonstrate that on chip; see docs/training.md "Remat policies and
      HBM accounting".
    * 'names' — save ONLY the tagged residuals (attn_probs + the ff/conv/
      nonlin mids), recompute everything else.  The r4 accounting left a
      void between dots (9.9 GiB, measured slower than full remat) and
      xprobs (17.8 GiB, OOM on v5e); this saves the tensors whose replay
      is the expensive part of the layer forward (the Pallas probs kernel
      and the wide in_proj GEMM outputs) while skipping the untagged
      bulk — sized by tools/hbm_accounting.py, measured by
      tools/profile_train.py --remat names (VERDICT r4 next #2).

    Measured via tools/profile_train.py (PROFILE_train_r4*.json) and
    tools/hbm_accounting.py (HBM_ACCOUNTING.json).
    """
    global _REMAT_POLICY
    assert name in (None, "all", "dots", "xprobs", "xprobs_ff", "names"), name
    if name != _REMAT_POLICY:
        _REMAT_POLICY = name
        jax.clear_caches()


def _layer_checkpoint(fn):
    from jax.ad_checkpoint import checkpoint_policies as cp

    if _REMAT_POLICY == "all":
        # save every residual (no remat): trades HBM for skipping the
        # backward's full layer-forward recompute — only viable when the
        # per-layer activations of the whole stack fit alongside params +
        # optimizer state (measure before enabling)
        return fn
    if _REMAT_POLICY == "dots":
        return jax.checkpoint(fn, policy=cp.dots_saveable)
    if _REMAT_POLICY == "xprobs":
        return jax.checkpoint(
            fn, policy=cp.save_anything_except_these_names("attn_probs")
        )
    if _REMAT_POLICY == "xprobs_ff":
        return jax.checkpoint(
            fn,
            policy=cp.save_anything_except_these_names(
                "attn_probs", "ff_hidden", "conv_mid", "nonlin_mid"
            ),
        )
    if _REMAT_POLICY == "names":
        return jax.checkpoint(
            fn,
            policy=cp.save_only_these_names(
                "attn_probs", "ff_hidden", "conv_mid", "nonlin_mid"
            ),
        )
    return jax.checkpoint(fn)


def set_fused_attention(enabled: Optional[bool]):
    """Trace-time binding; clears jit caches on change (see set_fused_apply)."""
    global _FUSED_ATTENTION
    if enabled != _FUSED_ATTENTION:
        _FUSED_ATTENTION = enabled
        jax.clear_caches()


# --- diagnostics tap: when set, per-module outputs are reported by name
# (the JAX counterpart of the reference's forward hooks, ref
# diagnostics.py:570-693).  Intended for eager (un-jitted, un-scanned) runs —
# see utils/diagnostics.activation_diagnostics.
_DIAG_TAP = None
_DIAG_PREFIX: list = []


def set_diagnostics_tap(fn) -> None:
    """fn(name: str, value: jax.Array) or None to disable."""
    global _DIAG_TAP
    _DIAG_TAP = fn


class _diag_scope:
    """Pushes a name segment onto the tap prefix (no-op when tap unset)."""

    def __init__(self, name: str):
        self.name = name

    def __enter__(self):
        if _DIAG_TAP is not None:
            _DIAG_PREFIX.append(self.name)

    def __exit__(self, *exc):
        if _DIAG_TAP is not None:
            _DIAG_PREFIX.pop()
        return False


def _tap(name: str, x):
    if _DIAG_TAP is not None:
        _DIAG_TAP(".".join(_DIAG_PREFIX + [name]), x)


def _fused_attention_wanted(t: int, ctx) -> bool:
    # below one TILE-row tile the pad waste beats the fusion win (and the
    # text-encoder stack at ~32 tokens is cheap either way); any t >= TILE
    # runs the kernel via the pad-and-slice wrapper in ops/attention.py
    if t < _ATTN_TILE:
        return False
    if _FUSED_ATTENTION is not None:
        return _FUSED_ATTENTION
    # "axon" is a remote-attached TPU platform; Mosaic kernels run on both
    return jax.default_backend() in ("tpu", "axon")


# ---------------------------------------------------------------------------
# Initialization (matches torch default statistics; see io/checkpoint.py for
# loading released checkpoints instead).
# ---------------------------------------------------------------------------


def _init_linear(key, in_dim: int, out_dim: int, bias: bool = True,
                 initial_scale: float = 1.0) -> Params:
    """torch nn.Linear default init (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(in)))
    with the ScaledLinear initial_scale convention (ref scaling.py:460-482)."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p: Params = {
        "weight": jax.random.uniform(
            kw, (in_dim, out_dim), jnp.float32, -bound, bound
        ) * initial_scale
    }
    if bias:
        if initial_scale == 1.0:
            p["bias"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -bound, bound)
        else:
            s = 0.1 * initial_scale
            p["bias"] = jax.random.uniform(kb, (out_dim,), jnp.float32, -s, s)
    return p


def _init_attention_weights(key, cfg: ZipformerConfig) -> Params:
    """RelPositionMultiheadAttentionWeights params (ref zipformer.py:1081-1147)."""
    k1, k2 = jax.random.split(key)
    d = cfg.encoder_dim
    in_proj_dim = (2 * cfg.query_head_dim + cfg.pos_head_dim) * cfg.num_heads
    return {
        "in_proj": _init_linear(
            k1, d, in_proj_dim, bias=True,
            initial_scale=cfg.query_head_dim**-0.25,
        ),
        "linear_pos": _init_linear(
            k2, cfg.pos_dim, cfg.num_heads * cfg.pos_head_dim, bias=False,
            initial_scale=0.05,
        ),
    }


def _init_self_attention(key, cfg: ZipformerConfig) -> Params:
    """SelfAttention params (ref zipformer.py:1336-1357)."""
    k1, k2 = jax.random.split(key)
    d = cfg.encoder_dim
    vd = cfg.num_heads * cfg.value_head_dim
    return {
        "in_proj": _init_linear(k1, d, vd, bias=True),
        "out_proj": _init_linear(k2, vd, d, bias=True, initial_scale=0.05),
    }


def _init_feedforward(key, cfg: ZipformerConfig, ff_dim: int) -> Params:
    """FeedforwardModule params; out_proj is the fused SwooshL+Linear whose
    weight/bias live directly on the module (ref zipformer.py:1402-1424)."""
    k1, k2 = jax.random.split(key)
    d = cfg.encoder_dim
    return {
        "in_proj": _init_linear(k1, d, ff_dim, bias=True),
        "out_proj": _init_linear(k2, ff_dim, d, bias=True, initial_scale=0.1),
    }


def _init_nonlin_attention(key, cfg: ZipformerConfig) -> Params:
    """NonlinAttention params (ref zipformer.py:1452-1497)."""
    k1, k2 = jax.random.split(key)
    d = cfg.encoder_dim
    hidden = 3 * d // 4
    return {
        "in_proj": _init_linear(k1, d, hidden * 3, bias=True),
        "out_proj": _init_linear(k2, hidden, d, bias=True, initial_scale=0.05),
    }


def _init_conv_module(key, cfg: ZipformerConfig, kernel: int) -> Params:
    """ConvolutionModule params (ref zipformer.py:1557-1636).  The depthwise
    conv weight is stored as (kernel, channels) (torch: (C, 1, K))."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d = cfg.encoder_dim
    bound = 1.0 / math.sqrt(kernel)  # torch Conv1d fan_in = K for depthwise
    return {
        "in_proj": _init_linear(k1, d, 2 * d, bias=True),
        "depthwise_conv": {
            "weight": jax.random.uniform(k2, (kernel, d), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(k3, (d,), jnp.float32, -bound, bound),
        },
        "out_proj": _init_linear(k4, d, d, bias=True, initial_scale=0.05),
    }


def _init_layer(key, cfg: ZipformerConfig, kernel: int) -> Params:
    """Zipformer2EncoderLayer params (ref zipformer.py:316-462)."""
    keys = jax.random.split(key, 10)
    d = cfg.encoder_dim
    ff = cfg.feedforward_dim
    p: Params = {
        "bypass": {"bypass_scale": jnp.full((d,), 0.5, jnp.float32)},
        "bypass_mid": {"bypass_scale": jnp.full((d,), 0.5, jnp.float32)},
        "self_attn_weights": _init_attention_weights(keys[0], cfg),
        "self_attn1": _init_self_attention(keys[1], cfg),
        "self_attn2": _init_self_attention(keys[2], cfg),
        "feed_forward1": _init_feedforward(keys[3], cfg, (ff * 3) // 4),
        "feed_forward2": _init_feedforward(keys[4], cfg, ff),
        "feed_forward3": _init_feedforward(keys[5], cfg, (ff * 5) // 4),
        "nonlin_attention": _init_nonlin_attention(keys[6], cfg),
        "norm": {
            "log_scale": jnp.asarray(1.0, jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32),
        },
    }
    if cfg.use_conv:
        p["conv_module1"] = _init_conv_module(keys[7], cfg, kernel)
        p["conv_module2"] = _init_conv_module(keys[8], cfg, kernel)
    return p


def _init_encoder_stack(key, cfg: ZipformerConfig, stack: int) -> Params:
    """Zipformer2Encoder (+ optional Downsampled wrapper) for one stack."""
    num_layers = cfg.num_encoder_layers[stack]
    kernel = cfg.cnn_module_kernel[stack]
    keys = jax.random.split(key, num_layers + 1)
    enc: Params = {
        "layers": {str(i): _init_layer(keys[i], cfg, kernel) for i in range(num_layers)}
    }
    if cfg.use_time_embed:
        # Sequential(SwooshR, Linear) -> torch key 'time_emb.1'
        enc["time_emb"] = {
            "1": _init_linear(keys[-1], cfg.time_embed_dim, cfg.encoder_dim)
        }
    ds = cfg.downsampling_factor[stack]
    if ds == 1:
        return enc
    return {
        "downsample": {"bias": jnp.zeros((ds,), jnp.float32)},
        "encoder": enc,
        "out_combiner": {"bypass_scale": jnp.full((cfg.encoder_dim,), 0.5, jnp.float32)},
    }


def init_tts_zipformer(key, cfg: ZipformerConfig) -> Params:
    """Initialize a TTSZipformer parameter tree (ref zipformer.py:109-240)."""
    n = cfg.num_stacks
    keys = jax.random.split(key, n + 5)
    p: Params = {
        "in_proj": _init_linear(keys[0], cfg.in_dim, cfg.encoder_dim),
        "out_proj": _init_linear(keys[1], cfg.encoder_dim, cfg.out_dim),
        "encoders": {str(i): _init_encoder_stack(keys[2 + i], cfg, i) for i in range(n)},
    }
    if cfg.use_time_embed:
        t = cfg.time_embed_dim
        p["time_embed"] = {
            "0": _init_linear(keys[n + 2], t, t * 2),
            "2": _init_linear(keys[n + 3], t * 2, t),
        }
    if cfg.use_guidance_scale_embed:
        p["guidance_scale_embed"] = _init_linear(
            keys[n + 4], cfg.guidance_scale_embed_dim, cfg.time_embed_dim,
            bias=False, initial_scale=0.1,
        )
    return p


def init_tts_zipformer_two_stream(
    key, cfg: ZipformerConfig, in_dims, out_dims
) -> Params:
    """TTSZipformerTwoStream init: shared stacks, two in/out projection pairs
    selected by input dim (ref zipformer_two_stream.py:92-217).  cfg.in_dim /
    cfg.out_dim are ignored in favor of the (stream0, stream1) dims."""
    k0, k1, k2, k3, kbase = jax.random.split(key, 5)
    p = init_tts_zipformer(kbase, cfg)
    p["in_proj"] = {
        "0": _init_linear(k0, in_dims[0], cfg.encoder_dim),
        "1": _init_linear(k1, in_dims[1], cfg.encoder_dim),
    }
    p["out_proj"] = {
        "0": _init_linear(k2, cfg.encoder_dim, out_dims[0]),
        "1": _init_linear(k3, cfg.encoder_dim, out_dims[1]),
    }
    return p


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


class TrainCtx:
    """Training-mode context: RNG + schedule values.

    Replaces the reference's module-attribute plumbing (batch_count writes,
    python `random.random()` gates — ref common.py:314-322, zipformer.py
    throughout).  `s` holds the schedule pytree from
    train/schedules.zipformer_schedules (traced scalars inside jit); keys are
    derived deterministically by a trace-time counter so layer i always gets
    the same key stream for a given base key.

    Passing ctx=None anywhere keeps exact eval semantics.
    """

    def __init__(self, key: jax.Array, s: Dict):
        self.key = key
        self.s = s
        self._n = 0
        self._stack = 0
        self._layer = 0

    def next_key(self) -> jax.Array:
        self._n += 1
        return jax.random.fold_in(self.key, self._n)

    def gate(self, prob) -> jax.Array:
        """Traced bool: apply-with-probability (ref `random.random() < p`)."""
        return jax.random.uniform(self.next_key(), ()) < prob

    def layerdrop_rate(self):
        return self.s["layerdrop"][self._stack][self._layer]


def _maybe_balancer(ctx: Optional[TrainCtx], x, prob, **kw):
    if ctx is None:
        return x
    from zipvoice_tpu.nn.regularizers import balancer

    return balancer(x, ctx.gate(prob), **kw)


def _maybe_whiten(ctx: Optional[TrainCtx], x, limit_key: str, grad_scale,
                  num_groups: int = 1, max_prob: float = 0.25):
    if ctx is None:
        return x
    from zipvoice_tpu.nn.regularizers import whiten

    return whiten(
        x, ctx.gate(max_prob), num_groups=num_groups,
        whitening_limit=ctx.s[limit_key], grad_scale=grad_scale,
    )


def _maybe_seq_dropout(ctx: Optional[TrainCtx], x, rate):
    if ctx is None:
        return x
    from zipvoice_tpu.nn.regularizers import sequence_dropout

    return sequence_dropout(x, ctx.next_key(), rate)


def _rel_shift(pos_scores: jax.Array, seq_len: int) -> jax.Array:
    """Convert (B, H, T, 2T-1) relative-axis scores to (B, H, T, T) absolute.

    out[..., i, j] = pos_scores[..., i, (T-1) + j - i]; equivalent to the
    reference's as_strided view (ref zipformer.py:1239-1248) but expressed as
    a flatten/slice/reshape that XLA lowers to a cheap copy.
    """
    t = seq_len
    if t == 1:
        return pos_scores
    b, h = pos_scores.shape[0], pos_scores.shape[1]
    flat = pos_scores.reshape(b, h, t * (2 * t - 1))
    flat = jax.lax.slice_in_dim(flat, t - 1, t - 1 + t * (2 * t - 2), axis=2)
    return flat.reshape(b, h, t, 2 * t - 2)[..., :t]


class _EvalAttn:
    """Eval attention bundle: the shared projections only, probabilities not
    yet materialized.  NonlinAttention consumes head 0 via tile-wise
    recompute (rel_attention_head0_consume); SelfAttention-1 materializes
    the shared probs as a kernel by-product of its own contraction
    (rel_attention_probs_consume) and hands them to SelfAttention-2."""

    __slots__ = ("q", "k", "pq", "pe", "mask")

    def __init__(self, q, k, pq, pe, mask):
        self.q, self.k, self.pq, self.pe, self.mask = q, k, pq, pe, mask


class _FusedAttn:
    """Training attention bundle: the shared projections of
    RelPositionMultiheadAttentionWeights (ref zipformer.py:1149-1306) plus
    the kernel-materialized probabilities under stop_gradient.  Consumers
    contract `probs` in the forward (shared across all three, like the
    reference) but their backward recomputes probability tiles in VMEM
    (rel_attention_consume) — no (B, H, T, T) cotangent or ds tensor in HBM.
    `pen` is the score-failsafe scalar (gate * penalty); exactly one
    consumer per layer attaches it."""

    __slots__ = ("q", "k", "pq", "pe", "mask", "pen", "probs")

    def __init__(self, q, k, pq, pe, mask, pen, probs):
        self.q, self.k, self.pq, self.pe = q, k, pq, pe
        self.mask, self.pen, self.probs = mask, pen, probs


def _attention_projections(
    p: Params,
    cfg: ZipformerConfig,
    x: jax.Array,
    pos_emb: jax.Array,
    ctx: Optional[TrainCtx] = None,
):
    """Shared q/k/pos-q/pos-emb projections + training regularizers
    (ref zipformer.py:1149-1211).  Returns (q, k, pq, pe, pen); the
    pos-score dropout is applied by gating pq (pos_scores are linear in pq,
    so forward and gradients match gating the scores), and pen is the
    failsafe scalar for the score penalty (None in eval)."""
    b, t, _ = x.shape
    h, qd, pd = cfg.num_heads, cfg.query_head_dim, cfg.pos_head_dim
    proj = linear(p["in_proj"], x)
    q = proj[..., : qd * h]
    k = proj[..., qd * h : 2 * qd * h]
    pq = proj[..., 2 * qd * h :].reshape(b, t, h, pd)

    # training: key balancer (prob 0.025) + key whitening (ref :1115-1138)
    k = _maybe_balancer(ctx, k, 0.025, min_positive=0.4, max_positive=0.6,
                        min_abs=0.0, max_abs=100.0)
    k = _maybe_whiten(ctx, k, "whiten_3", 0.025, num_groups=h)

    q = q.reshape(b, t, h, qd)
    k = k.reshape(b, t, h, qd)

    pe = linear(p["linear_pos"], pos_emb.astype(x.dtype)).reshape(2 * t - 1, h, pd)

    pen = None
    if ctx is not None:
        # pos-score dropout w.p. pos_emb_skip_rate (ref :1207-1211)
        use_pos = ~ctx.gate(ctx.s["pos_emb_skip_rate"])
        pq = pq * jnp.where(use_pos, 1.0, 0.0).astype(pq.dtype)
        # attention-score failsafe w.p. 0.1 (ref :1254-1269)
        pen = jnp.where(ctx.gate(0.1), 1.0e-04, 0.0).astype(jnp.float32)
    return q, k, pq, pe, pen


def _attention_weights(
    p: Params,
    cfg: ZipformerConfig,
    x: jax.Array,
    pos_emb: jax.Array,
    key_padding_mask: Optional[jax.Array],
    ctx: Optional[TrainCtx] = None,
) -> jax.Array:
    """RelPositionMultiheadAttentionWeights forward (ref zipformer.py:1149-1306).

    x: (B, T, D); pos_emb: (2T-1, pos_dim).  Returns attention probabilities
    (B, H, T, T) — the materialized-probs path, used when the fused apply
    kernel is off or T is too small.
    """
    t = x.shape[1]
    q, k, pq, pe, pen = _attention_projections(p, cfg, x, pos_emb, ctx)

    if _fused_attention_wanted(t, ctx):
        from zipvoice_tpu.ops.attention import rel_attention_probs_any

        # probs in compute dtype: every consumer casts to x.dtype anyway
        # (softmax itself stays f32 inside the kernel)
        return checkpoint_name(
            rel_attention_probs_any(
                q, k, pq, pe, key_padding_mask, out_dtype=x.dtype,
                score_penalty=pen, penalty_limit=25.0,
            ),
            "attn_probs",
        )

    attn_scores = jnp.einsum(
        "bthd,bshd->bhts", q, k, preferred_element_type=jnp.float32
    )
    # (B,T,H,pd) x (2T-1,H,pd) -> (B,H,T,2T-1), then rel-shift to (B,H,T,T)
    pos_scores = jnp.einsum(
        "bthd,nhd->bhtn", pq, pe, preferred_element_type=jnp.float32
    )
    attn_scores = attn_scores + _rel_shift(pos_scores, t)
    if pen is not None:
        from zipvoice_tpu.nn.regularizers import penalize_abs_values_gt

        attn_scores = penalize_abs_values_gt(
            attn_scores, pen > 0, limit=25.0, penalty=1.0e-04
        )

    return checkpoint_name(
        masked_softmax(attn_scores, key_padding_mask), "attn_probs"
    )


def _self_attention(p: Params, cfg: ZipformerConfig, x: jax.Array,
                    attn_weights, ctx: Optional[TrainCtx] = None,
                    use_pen: bool = False) -> jax.Array:
    """SelfAttention forward (ref zipformer.py:1359-1396).  x: (B, T, D).

    attn_weights: (B, H, T, T) probabilities, or a _FusedAttn whose
    probs @ v contraction runs inside the Pallas apply kernel.  use_pen
    attaches the layer's score-failsafe penalty to this consumer (must be
    true for exactly one all-head consumer per layer)."""
    b, t, _ = x.shape
    h = cfg.num_heads
    v = linear(p["in_proj"], x).reshape(b, t, h, cfg.value_head_dim)
    if isinstance(attn_weights, _EvalAttn):
        from zipvoice_tpu.ops.attention import rel_attention_probs_consume

        a = attn_weights
        probs, o = rel_attention_probs_consume(
            a.q, a.k, a.pq, a.pe, a.mask, v, out_dtype=x.dtype
        )
        out = linear(p["out_proj"], o.reshape(b, t, h * cfg.value_head_dim))
        return out, probs
    if isinstance(attn_weights, _FusedAttn):
        from zipvoice_tpu.ops.attention import rel_attention_consume

        a = attn_weights
        o = rel_attention_consume(
            a.q, a.k, a.pq, a.pe, a.mask, a.probs, v,
            score_penalty=a.pen if use_pen else None, penalty_limit=25.0,
        )
    elif (
        ctx is None
        and _PROBS_APPLY
        and t % _ATTN_TILE == 0
        and _fused_attention_wanted(t, ctx)
    ):
        # eval shared-probs consume: lane-padded Pallas matmul instead of
        # the 12-lane-minor XLA einsum (PROFILE_r4 measured the einsum at
        # 1.3-8.6% of peak; see ops.attention.rel_attention_probs_apply)
        from zipvoice_tpu.ops.attention import rel_attention_probs_apply

        o = rel_attention_probs_apply(attn_weights.astype(x.dtype), v)
    else:
        o = jnp.einsum(
            "bhts,bshd->bthd", attn_weights.astype(x.dtype), v,
            preferred_element_type=x.dtype,
        )
    out = linear(p["out_proj"], o.reshape(b, t, h * cfg.value_head_dim))
    return _maybe_whiten(ctx, out, "whiten_7_5x3", 0.01)


def _nonlin_attention(p: Params, x: jax.Array, attn_head0,
                      ctx: Optional[TrainCtx] = None,
                      const_gate: Optional[jax.Array] = None) -> jax.Array:
    """NonlinAttention forward (ref zipformer.py:1499-1544).

    attn_head0: (B, T, T) — the first attention head's probabilities — or a
    _FusedAttn (head-0 slices are contracted in-kernel).  const_gate: the
    const-attention gate (fused path only; the probs path applies the const
    branch before calling, see _encoder_layer).
    """
    proj = checkpoint_name(linear(p["in_proj"], x), "nonlin_mid")
    s, v, y = jnp.split(proj, 3, axis=-1)
    if ctx is not None:
        s = _maybe_balancer(
            ctx, s, ctx.s["balancer_prob"],
            min_positive=ctx.s["nonlin_balancer_min_pos"],
            max_positive=ctx.s["nonlin_balancer_max_pos"],
            min_abs=0.5, max_abs=5.0,
        )
    v = _maybe_whiten(ctx, v, "whiten_5", 0.01)
    v = checkpoint_name(v * jnp.tanh(s), "nonlin_mid")
    if isinstance(attn_head0, _EvalAttn):
        from zipvoice_tpu.ops.attention import rel_attention_head0_consume

        a = attn_head0
        v = rel_attention_head0_consume(a.q, a.k, a.pq, a.pe, a.mask, v)
    elif isinstance(attn_head0, _FusedAttn):
        from zipvoice_tpu.ops.attention import rel_attention_consume

        a = attn_head0
        head0 = a.probs[:, 0]
        gate = None
        if const_gate is not None:
            # const-attention forward on the materialized (stop-gradient)
            # head-0 probabilities (ref zipformer.py:545-556); the backward
            # kernel re-derives the same const branch from the gate scalar.
            binary = (head0 > 0.0).astype(head0.dtype)
            const_head = binary / jnp.maximum(
                jnp.sum(binary, axis=-1, keepdims=True), 1e-20
            )
            head0 = jnp.where(const_gate, const_head, head0)
            gate = jnp.where(const_gate, 1.0, 0.0).astype(jnp.float32)
        v = rel_attention_consume(
            a.q[:, :, :1], a.k[:, :, :1], a.pq[:, :, :1], a.pe[:, :1],
            a.mask, head0[:, None], v[:, :, None, :], const_gate=gate,
        )[:, :, 0]
    else:
        # XLA einsum kept on purpose: the head-0 slice-consume is already
        # cheap (12.3 us in PROFILE_r4_unfused — the 288-wide output is
        # lane-friendly), and routing it through the Pallas matmul forces
        # the strided (B, T, T) head-0 slice to materialize first —
        # measured 4x SLOWER (47.6 us, PROFILE_r5_unfused).
        v = jnp.einsum(
            "bts,bsc->btc", attn_head0.astype(x.dtype), v,
            preferred_element_type=x.dtype,
        )
    out = linear(p["out_proj"], checkpoint_name(v * y, "nonlin_mid"))
    return _maybe_whiten(ctx, out, "whiten_5x3", 0.01)


def _conv_module(p: Params, x: jax.Array,
                 key_padding_mask: Optional[jax.Array],
                 ctx: Optional[TrainCtx] = None) -> jax.Array:
    """ConvolutionModule forward (ref zipformer.py:1638-1680).

    GLU gate -> depthwise conv over time (SAME) -> SwooshR -> out linear.
    The depthwise conv lowers through lax.conv_general_dilated with
    feature_group_count=C — XLA's grouped-conv emitter beats the K-tap
    shift-and-fma formulation on TPU (measured r3 at B=2,T=1024,K=31:
    24.5 vs 35.3 us).
    """
    proj = checkpoint_name(linear(p["in_proj"], x), "conv_mid")
    if (
        ctx is None
        and _FUSED_CONV
        and "weight" in p["out_proj"]  # int8-exported weights -> XLA path
        and _fused_attention_wanted(x.shape[1], ctx)  # same backend/T gate
    ):
        from zipvoice_tpu.ops.convglu import conv_glu_swoosh_out

        return conv_glu_swoosh_out(
            proj,
            p["depthwise_conv"]["weight"],
            p["depthwise_conv"]["bias"],
            key_padding_mask,
            p["out_proj"]["weight"],
            p["out_proj"].get("bias"),
        )
    v, s = jnp.split(proj, 2, axis=-1)
    if ctx is not None:
        s = _maybe_balancer(
            ctx, s, ctx.s["balancer_prob"],
            min_positive=ctx.s["conv_balancer1_min_pos"], max_positive=1.0,
            min_abs=1.5, max_abs=ctx.s["conv_balancer1_max_abs"],
        )
    v = checkpoint_name(v * jax.nn.sigmoid(s), "conv_mid")
    if key_padding_mask is not None:
        v = checkpoint_name(
            jnp.where(key_padding_mask[:, :, None], 0.0, v), "conv_mid"
        )

    w = p["depthwise_conv"]["weight"].astype(x.dtype)  # (K, C)
    kernel = w.shape[0]
    pad = kernel // 2
    out = jax.lax.conv_general_dilated(
        v, w[:, None, :], window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=v.shape[-1],
    )
    out = checkpoint_name(
        out + p["depthwise_conv"]["bias"].astype(x.dtype), "conv_mid"
    )
    if ctx is not None:
        out = _maybe_balancer(
            ctx, out, ctx.s["balancer_prob"],
            min_positive=ctx.s["conv_balancer2_min_pos"], max_positive=1.0,
            min_abs=ctx.s["conv_balancer2_min_abs"], max_abs=10.0,
        )
    out = _maybe_whiten(ctx, out, "whiten_7_5", 0.01)
    return linear(p["out_proj"], checkpoint_name(swoosh_r(out), "conv_mid"))


def _feedforward(p: Params, x: jax.Array,
                 ctx: Optional[TrainCtx] = None) -> jax.Array:
    """FeedforwardModule forward: Linear -> [balancer] -> SwooshL ->
    [dropout shared over time] -> Linear -> [whiten]
    (ref zipformer.py:1399-1439)."""
    h = checkpoint_name(linear(p["in_proj"], x), "ff_hidden")
    if ctx is not None:
        h = _maybe_balancer(ctx, h, ctx.s["balancer_prob"],
                            min_positive=0.3, max_positive=1.0,
                            min_abs=0.75, max_abs=5.0)
        h = checkpoint_name(h, "ff_hidden")
    h = checkpoint_name(swoosh_l(h), "ff_hidden")
    if ctx is not None:
        from zipvoice_tpu.nn.regularizers import dropout_shared

        h = checkpoint_name(
            dropout_shared(h, ctx.next_key(), ctx.s["dropout"], shared_dim=1),
            "ff_hidden",
        )
    out = linear(p["out_proj"], h)
    return _maybe_whiten(ctx, out, "whiten_7_5", 0.01)


def _bypass(p: Params, src_orig: jax.Array, src: jax.Array,
            ctx: Optional[TrainCtx] = None, skip_rate=None) -> jax.Array:
    """BypassModule forward (ref zipformer.py:747-804).  In training the
    scale is range-limited (gradient clamp, w.p. 0.6) and whole sequences may
    be layer-dropped (scale zeroed) w.p. skip_rate."""
    scale = p["bypass_scale"].astype(src.dtype)
    if ctx is not None:
        from zipvoice_tpu.nn.regularizers import limit_param_value

        scale = limit_param_value(
            scale, ctx.gate(0.6), ctx.s["bypass_scale_min"], 1.0
        ).astype(src.dtype)
        if skip_rate is not None:
            keep = (
                jax.random.uniform(ctx.next_key(), (src.shape[0], 1, 1))
                > skip_rate
            )
            scale = scale * keep.astype(src.dtype)  # (B, 1, D) via broadcast
    return src_orig + (src - src_orig) * scale


def _encoder_layer(
    p: Params,
    cfg: ZipformerConfig,
    src: jax.Array,
    pos_emb: jax.Array,
    time_emb: Optional[jax.Array],
    key_padding_mask: Optional[jax.Array],
    ctx: Optional[TrainCtx] = None,
) -> jax.Array:
    """Zipformer2EncoderLayer forward (ref zipformer.py:489-642).

    src: (B, T, D); time_emb: (B, D) or None.  With ctx, the training-time
    stochastics are live: module skip-rates, const-attention, balancers,
    whitening, layerdrop.
    """
    src_orig = src
    t = src.shape[1]
    if ctx is None and _FUSED_EVAL and _fused_attention_wanted(t, ctx):
        # eval: defer probs materialization to SelfAttention-1 (see
        # _EvalAttn / set_fused_eval) — same scores, one fewer (B,H,T,T)
        # HBM read per layer plus the head-0 slice read
        q, k, pq, pe, _ = _attention_projections(
            p["self_attn_weights"], cfg, src, pos_emb, None
        )
        attn_weights = _EvalAttn(q, k, pq, pe, key_padding_mask)
    elif _FUSED_APPLY and ctx is not None and _fused_attention_wanted(t, ctx):
        from zipvoice_tpu.ops.attention import rel_attention_probs_any

        q, k, pq, pe, pen = _attention_projections(
            p["self_attn_weights"], cfg, src, pos_emb, ctx
        )
        # probs once per layer (kernel), shared by all three consumers in
        # the forward; stop_gradient — every score gradient flows through
        # the consumers' flash backward instead
        probs = checkpoint_name(
            jax.lax.stop_gradient(
                rel_attention_probs_any(
                    q, k, pq, pe, key_padding_mask, out_dtype=src.dtype
                )
            ),
            "attn_probs",
        )
        attn_weights = _FusedAttn(q, k, pq, pe, key_padding_mask, pen, probs)
        # diagnostic taps (inf_check / find_nonfinite) must keep attention-
        # probability coverage in the default fused training path (ADVICE r3)
        _tap("self_attn_weights", probs)
    else:
        attn_weights = _attention_weights(
            p["self_attn_weights"], cfg, src, pos_emb, key_padding_mask, ctx
        )
        _tap("self_attn_weights", attn_weights)

    te = None if time_emb is None else time_emb[:, None, :].astype(src.dtype)
    if te is not None:
        src = src + te
    ff1 = _feedforward(p["feed_forward1"], src, ctx)
    _tap("feed_forward1", ff1)
    src = src + ff1

    # one shared per-sequence attention-skip mask for nonlin-attn and both
    # self-attn modules (ref zipformer.py:538-540)
    if ctx is not None:
        attn_keep = (
            jax.random.uniform(ctx.next_key(), (src.shape[0], 1, 1))
            > ctx.s["attention_skip_rate"]
        ).astype(src.dtype)
    else:
        attn_keep = None

    if isinstance(attn_weights, _EvalAttn):
        na = _nonlin_attention(p["nonlin_attention"], src, attn_weights, ctx)
    elif isinstance(attn_weights, _FusedAttn):
        # const-attention (ref zipformer.py:545-556) resolves in-kernel; the
        # gate draw keeps the probs path's RNG position.
        const_gate = (
            ctx.gate(ctx.s["const_attention_rate"]) if ctx is not None else None
        )
        na = _nonlin_attention(
            p["nonlin_attention"], src, attn_weights, ctx, const_gate
        )
    else:
        head0 = attn_weights[:, 0]
        if ctx is not None:
            # const-attention: replace head 0 with a normalized binary mask
            # w.p. const_attention_rate (ref zipformer.py:545-556)
            binary = jax.lax.stop_gradient((head0 > 0.0).astype(head0.dtype))
            const_head = binary / jnp.maximum(
                jnp.sum(binary, axis=-1, keepdims=True), 1e-20
            )
            head0 = jnp.where(ctx.gate(ctx.s["const_attention_rate"]),
                              const_head, head0)

        na = _nonlin_attention(p["nonlin_attention"], src, head0, ctx)
    na = _maybe_balancer(ctx, na, 0.05, min_positive=0.3, max_positive=0.7,
                         min_abs=ctx.s["balancer_na_min_abs"] if ctx else 0.0,
                         max_abs=100.0)
    _tap("nonlin_attention", na)
    src = src + (na if attn_keep is None else na * attn_keep)

    sa = _self_attention(p["self_attn1"], cfg, src, attn_weights, ctx,
                         use_pen=True)
    if isinstance(attn_weights, _EvalAttn):
        # the kernel materialized the shared probs as a by-product; hand
        # them to SelfAttention-2 (plain bf16-probs contraction)
        sa, attn_weights = sa
        _tap("self_attn_weights", attn_weights)
    _tap("self_attn1", sa)
    src = src + (sa if attn_keep is None else sa * attn_keep)

    if cfg.use_conv:
        if te is not None:
            src = src + te
        cv = _conv_module(p["conv_module1"], src, key_padding_mask, ctx)
        if ctx is not None:
            cv = _maybe_seq_dropout(ctx, cv, ctx.s["conv_skip_rate"])
        _tap("conv_module1", cv)
        src = src + cv

    ff2 = _feedforward(p["feed_forward2"], src, ctx)
    _tap("feed_forward2", ff2)
    if ctx is not None:
        ff2 = _maybe_balancer(
            ctx, ff2, 0.05, min_positive=0.3, max_positive=0.7,
            min_abs=ctx.s["balancer_ff2_min_abs"], max_abs=2.0,
        )
        ff2 = _maybe_seq_dropout(ctx, ff2, ctx.s["ff2_skip_rate"])
    src = src + ff2

    src = _bypass(p["bypass_mid"], src_orig, src, ctx)

    sa = _self_attention(p["self_attn2"], cfg, src, attn_weights, ctx)
    _tap("self_attn2", sa)
    src = src + (sa if attn_keep is None else sa * attn_keep)

    if cfg.use_conv:
        if te is not None:
            src = src + te
        cv = _conv_module(p["conv_module2"], src, key_padding_mask, ctx)
        if ctx is not None:
            cv = _maybe_seq_dropout(ctx, cv, ctx.s["conv_skip_rate"])
        _tap("conv_module2", cv)
        src = src + cv

    ff3 = _feedforward(p["feed_forward3"], src, ctx)
    _tap("feed_forward3", ff3)
    if ctx is not None:
        ff3 = _maybe_balancer(
            ctx, ff3, 0.05, min_positive=0.3, max_positive=0.7,
            min_abs=ctx.s["balancer_ff3_min_abs"], max_abs=4.0,
        )
        ff3 = _maybe_seq_dropout(ctx, ff3, ctx.s["ff3_skip_rate"])
    src = src + ff3

    src = _maybe_balancer(ctx, src, ctx.s["balancer_prob"],
                          min_positive=0.45, max_positive=0.55,
                          min_abs=0.2, max_abs=4.0) if ctx is not None else src
    src = bias_norm(src, p["norm"]["bias"], p["norm"]["log_scale"])
    src = _bypass(p["bypass"], src_orig, src, ctx,
                  skip_rate=ctx.layerdrop_rate() if ctx is not None else None)
    if ctx is not None:
        src = _maybe_balancer(ctx, src, ctx.s["balancer_prob"],
                              min_positive=0.45, max_positive=0.55,
                              min_abs=0.1, max_abs=4.0)
        src = _maybe_whiten(ctx, src, "whiten_4x3", 0.01)
    _tap("output", src)
    return src


def _encoder_stack(
    p: Params,
    cfg: ZipformerConfig,
    stack: int,
    src: jax.Array,
    time_emb: Optional[jax.Array],
    key_padding_mask: Optional[jax.Array],
    ctx: Optional[TrainCtx] = None,
) -> jax.Array:
    """Zipformer2Encoder forward (ref zipformer.py:702-744).  src: (B, T, D)."""
    t = src.shape[1]
    pos_emb = compact_rel_positional_encoding(t, cfg.pos_dim)
    if ctx is not None:
        # pos-emb dropout rate 0.15 (ref zipformer.py:673-674, 1056)
        from zipvoice_tpu.nn.regularizers import dropout_shared

        pos_emb = dropout_shared(pos_emb, ctx.next_key(), 0.15)
    if cfg.use_time_embed:
        assert time_emb is not None
        stack_time_emb = linear(p["time_emb"]["1"], swoosh_r(time_emb))
    else:
        stack_time_emb = None
    out = src
    num_layers = cfg.num_encoder_layers[stack]

    if _SCAN_LAYERS and num_layers > 1:
        # lax.scan over the (structurally identical) layers of this stack:
        # one layer trace instead of num_layers — the dominant compile-time
        # lever for both the 16-step sampler and the regularized train step.
        stacked = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[p["layers"][str(i)] for i in range(num_layers)],
        )
        if ctx is None:
            keys = jnp.zeros((num_layers, 2), jnp.uint32)
            drops = jnp.zeros((num_layers,), jnp.float32)
            s = None
        else:
            # per-layer RNG streams + layerdrop rates ride as scanned inputs
            keys = jax.random.split(ctx.next_key(), num_layers)
            drops = jnp.asarray(
                [ctx.s["layerdrop"][stack][i] for i in range(num_layers)],
                jnp.float32,
            )
            s = ctx.s

        @_layer_checkpoint
        def layer_fn(carry, per_layer):
            # rematerialized: scan-of-remat-blocks keeps backward memory at
            # one layer's activations instead of the whole stack's
            lp, key_l, drop_l = per_layer
            if s is None:
                layer_ctx = None
            else:
                layer_ctx = TrainCtx(key_l, dict(s, layerdrop=None))
                layer_ctx.layerdrop_rate = lambda: drop_l  # type: ignore
            return _encoder_layer(
                lp, cfg, carry, pos_emb, stack_time_emb,
                key_padding_mask, layer_ctx,
            )

        def body(carry, per_layer):
            return layer_fn(carry, per_layer), None

        out, _ = jax.lax.scan(body, out, (stacked, keys, drops))
        return out

    for i in range(num_layers):
        if ctx is not None:
            ctx._layer = i
        with _diag_scope(f"layer{i}"):
            out = _encoder_layer(
                p["layers"][str(i)], cfg, out, pos_emb, stack_time_emb,
                key_padding_mask, ctx,
            )
    return out


def _downsample(p: Params, src: jax.Array, ds: int) -> jax.Array:
    """SimpleDownsample: softmax-weighted within-group average over time,
    right-padding with the last frame (ref zipformer.py:887-913).  (B,T,C)."""
    b, t, c = src.shape
    d_t = (t + ds - 1) // ds
    pad = d_t * ds - t
    if pad > 0:
        src = jnp.concatenate(
            [src, jnp.broadcast_to(src[:, -1:, :], (b, pad, c))], axis=1
        )
    src = src.reshape(b, d_t, ds, c)
    weights = jax.nn.softmax(p["bias"].astype(jnp.float32)).astype(src.dtype)
    return jnp.einsum("btdc,d->btc", src, weights, preferred_element_type=src.dtype)


def _upsample(src: jax.Array, ds: int, out_len: int) -> jax.Array:
    """SimpleUpsample (repeat) + crop (ref zipformer.py:925-935, 866-868)."""
    b, t, c = src.shape
    up = jnp.broadcast_to(src[:, :, None, :], (b, t, ds, c)).reshape(b, t * ds, c)
    return up[:, :out_len]


def _downsampled_encoder_stack(
    p: Params,
    cfg: ZipformerConfig,
    stack: int,
    src: jax.Array,
    time_emb: Optional[jax.Array],
    key_padding_mask: Optional[jax.Array],
    ctx: Optional[TrainCtx] = None,
) -> jax.Array:
    """DownsampledZipformer2Encoder forward (ref zipformer.py:823-870)."""
    ds = cfg.downsampling_factor[stack]
    src_orig = src
    x = _downsample(p["downsample"], src, ds)
    mask = None if key_padding_mask is None else key_padding_mask[:, ::ds]
    x = _encoder_stack(p["encoder"], cfg, stack, x, time_emb, mask, ctx)
    x = _upsample(x, ds, src.shape[1])
    return _bypass(p["out_combiner"], src_orig, x, ctx)


def tts_zipformer_forward(
    p: Params,
    cfg: ZipformerConfig,
    x: jax.Array,
    t: Optional[jax.Array] = None,
    padding_mask: Optional[jax.Array] = None,
    guidance_scale: Optional[jax.Array] = None,
    stream: int = 0,
    ctx: Optional["TrainCtx"] = None,
) -> jax.Array:
    """TTSZipformer forward (ref zipformer.py:242-293).

    Args:
      x: (B, T, in_dim) input.
      t: (B,) diffusion timestep in [0, 1], or None if use_time_embed=False.
      padding_mask: (B, T) bool, True = padded.
      guidance_scale: (B,) guidance scale (distill variant only).
      stream: which in/out projection pair to use when the params hold
        two-stream ModuleList projections (TTSZipformerTwoStream, ref
        zipformer_two_stream.py:161-167, 238-262); ignored otherwise.

    Returns: (B, T, out_dim).
    """
    def _in_dim(lin):  # works for both plain and int8-quantized linears
        return (lin["weight"] if "weight" in lin else lin["weight_int8"]).shape[0]

    if "weight" in p["in_proj"] or "weight_int8" in p["in_proj"]:
        in_proj, out_proj = p["in_proj"], p["out_proj"]
    else:
        # auto-dispatch by input width like the reference (two_stream.py:238-242)
        if x.shape[-1] != _in_dim(p["in_proj"][str(stream)]):
            stream = 1 - stream
        in_proj, out_proj = p["in_proj"][str(stream)], p["out_proj"][str(stream)]
    h = linear(in_proj, x)

    if t is not None:
        # f32_closers: run the whole time-embed MLP in f32 (it seeds every
        # layer's additive conditioning — docs/parity.md headroom plan);
        # default path casts the sinusoid to compute dtype before the MLP.
        emb_dtype = jnp.float32 if cfg.f32_closers else x.dtype
        time_emb = timestep_embedding(t, cfg.time_embed_dim).astype(emb_dtype)
        if guidance_scale is not None:
            gs_emb = timestep_embedding(
                guidance_scale, cfg.guidance_scale_embed_dim
            ).astype(emb_dtype)
            time_emb = time_emb + linear(p["guidance_scale_embed"], gs_emb)
        # Sequential(Linear, SwooshR, Linear) (ref zipformer.py:224-228)
        time_emb = linear(
            p["time_embed"]["2"], swoosh_r(linear(p["time_embed"]["0"], time_emb))
        ).astype(x.dtype)
    else:
        time_emb = None

    for i in range(cfg.num_stacks):
        sp = p["encoders"][str(i)]
        if ctx is not None:
            ctx._stack = i
        if cfg.downsampling_factor[i] == 1:
            h = _encoder_stack(sp, cfg, i, h, time_emb, padding_mask, ctx)
        else:
            h = _downsampled_encoder_stack(
                sp, cfg, i, h, time_emb, padding_mask, ctx
            )

    if cfg.f32_closers:
        # f32 closer: the velocity head's output feeds the cancellation-
        # sensitive CFG combination and the Euler state accumulation
        return linear(out_proj, h.astype(jnp.float32))
    return linear(out_proj, h)
