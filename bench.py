"""End-to-end inference benchmark on real hardware.

Measures RTF of the flagship config: ZipVoice 123M, 16-step Euler with CFG,
~10 s of 24 kHz audio (938 mel frames), text encoder + ODE + Vocos vocoder,
bf16 — the BASELINE.md target is RTF <= 0.05 on one v5e chip.  Also times
one data-parallel training step (CFM loss + backward + ScaledAdam, with the
stochastic regularizers live) and reports seconds-of-audio/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = target / value  (>1 means faster than the 0.05-RTF target).
"""

from __future__ import annotations

import json
import time

import numpy as np

TARGET_RTF = 0.05
SECONDS_OF_AUDIO = 10.0
NUM_STEP = 16
GUIDANCE = 1.0

# The remote-attached dev chip compiles terminal-side (the persistent
# compilation cache doesn't apply), so every distinct program costs minutes.
# The headline RTF is measured first; auxiliary measurements (batched
# serving, bf16 fidelity, training throughput) run only while inside this
# wall-clock budget and are skipped (reported as null) otherwise.
DEADLINE_SECONDS = float(__import__("os").environ.get("BENCH_DEADLINE", 1200))

# process start: the deadline is measured from HERE, so backend-probe
# time (floored at one full 360 s attempt window; up to two at the default
# deadline) counts against the budget instead of on top of it — and a
# pre-probe heartbeat line lands on stdout before any waiting starts, so
# even a driver time-box shorter than the probe floor still reads a
# parseable last-known payload
_PROCESS_T0 = time.monotonic()


def _train_throughput(cfg):
    """One DP training step (regularizers live) on B=8 x 1024-frame batch.
    Returns (sec_audio_per_sec_per_chip, step_seconds, (batch, frames)).  Uses scan-of-remat layers:
    bounded backward memory and minutes-not-tens-of-minutes compiles, at
    ~25% step-time cost vs fully unrolled.

    Instrumentation (r5, VERDICT r4 next #4b): the batch is device_put
    ONCE and the timed loop dispatches against the device-resident arrays
    — the r4 version re-uploaded a 3.3 MB numpy batch over the tunnel
    every step, under-measuring throughput ~1.7x (bench 414 vs
    PROFILE_train_r4's 121.92 ms step = ~700 s-audio/s).  Python-side
    dispatches pipeline (no host sync inside the loop; the single loss
    read at the end is the only barrier), matching tools/profile_train.py
    within dispatch jitter."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from zipvoice_tpu.nn.zipformer import set_scan_layers

    set_scan_layers(True)

    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.train.scaled_adam import scaled_adam
    from zipvoice_tpu.train.schedules import zipvoice_schedules
    from zipvoice_tpu.train.step import TrainConfig, make_train_step

    rng = np.random.default_rng(0)
    b, t = 8, 1024
    batch = {
        "tokens": rng.integers(1, cfg.vocab_size, (b, 128)).astype(np.int32),
        "tokens_lens": np.full((b,), 100, np.int32),
        "features": rng.standard_normal((b, t, cfg.feat_dim)).astype(np.float32),
        "features_lens": np.full((b,), 1000, np.int32),
    }
    audio_seconds = float(np.sum(batch["features_lens"])) * 256 / 24000
    batch = {k: jnp.asarray(v) for k, v in batch.items()}  # upload once
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    opt = scaled_adam(clipping_scale=2.0)
    opt_state = opt.init(params)
    step = make_train_step(cfg, opt, TrainConfig(compute_dtype="bfloat16"))
    sched = zipvoice_schedules(10000.0, cfg)
    key = jax.random.PRNGKey(1)

    params, opt_state, m = step(params, opt_state, batch, key,
                                np.int32(1), np.float32(0), sched)
    # forced host read: on the remote-attached platform block_until_ready
    # can return before the step has executed, inflating throughput
    float(m["loss"])
    n = 10
    t0 = time.monotonic()
    for i in range(n):
        params, opt_state, m = step(params, opt_state, batch, key,
                                    np.int32(i + 2), np.float32(0), sched)
    float(m["loss"])
    step_time = (time.monotonic() - t0) / n
    return audio_seconds / step_time, step_time, (b, t)


def _batched_throughput(cfg, params, batch: int = 8) -> float:
    """Serving throughput: B concurrent 10s-utterance streams through the
    16-step CFG sampler in ONE program (the pipeline's synthesize_batch
    path).  Returns aggregate seconds-of-audio per wall second."""
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.models import zipvoice as zv

    rng = np.random.default_rng(0)
    t = 1024  # frame bucket; all stack lengths stay %128 -> fused attention
    tp = jnp.asarray(rng.integers(1, cfg.vocab_size, (batch, 160)), jnp.int32)
    tl = jnp.asarray([130] * batch, jnp.int32)
    pf = jnp.asarray(
        rng.standard_normal((batch, t, cfg.feat_dim)) * 0.1, jnp.bfloat16
    )
    pl = jnp.asarray([281] * batch, jnp.int32)
    fl = jnp.asarray([938] * batch, jnp.int32)
    noise = jnp.asarray(
        rng.standard_normal((batch, t, cfg.feat_dim)), jnp.bfloat16
    )

    fn = jax.jit(
        lambda p, a, b, c, d, e, f: zv.sample(
            p, cfg, a, b, c, d, e, f, num_step=NUM_STEP,
            guidance_scale=GUIDANCE, t_shift=0.5,
        )
    )

    # Slope-timed (2 dispatches vs 1, min-of-3 each): the single-run time
    # carries the ~33 ms tunnel dispatch+readback constant on ~50 ms of
    # b8 compute (~65% inflation) — the same instrument defect the r4
    # train row had.  t(2)-t(1) cancels the constant and reports the
    # ON-CHIP aggregate throughput a locally attached deployment gets
    # (r3's 183x vs r4's 157.5x "regression" was partly this
    # contamination moving with tunnel latency).
    def run(n):
        out = None
        t0 = time.monotonic()
        for _ in range(n):
            out = fn(params, tp, tl, pf, pl, fl, noise)
        float(np.asarray(out[0, 0, 0], np.float32))
        return time.monotonic() - t0

    run(1)  # warmup/compile
    t1 = min(run(1) for _ in range(3))
    t2 = min(run(2) for _ in range(3))
    # Validate the slope instead of clamping: within-session jitter can
    # make min(t2) <= min(t1) (the shared dispatch constant is 43-59 ms
    # on ~50 ms of b8 compute), and a clamped 1e-9 denominator would
    # publish a plausible-looking ~1e11x row.  A b8 16-step sampler
    # dispatch is >5 ms of compute even at int8 speeds, so a smaller
    # slope means the measurement failed — surface it as an aux error.
    if t2 - t1 < 5e-3:
        raise RuntimeError(
            f"slope-timing invalid (t1={t1 * 1e3:.1f} ms, "
            f"t2={t2 * 1e3:.1f} ms): jitter swamped the per-dispatch "
            f"compute; rerun on a quieter session")
    return batch * SECONDS_OF_AUDIO / (t2 - t1)


def _distill_rtf(feat_cfg, tokens, prompt_tokens, prompt_feats, dtype,
                 num_steps=(8,), budget_ok=lambda label: True) -> dict:
    """ZipVoice-Distill low-latency modes: 8 Euler steps by default (the CLI
    default, ref infer_zipvoice.py:484-487) plus the paper's 1-4 step claims
    (ref run_emilia.sh:90-104), NO CFG doubling (guidance rides in as a scale
    embedding — ref zipvoice_distill.py:67).  Fused one-program path, same
    10 s request as the headline.  Returns {num_step: rtf}; each step count
    is a fresh compile, so later entries are deadline-guarded."""
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.audio.vocos import init_vocos
    from zipvoice_tpu.config import FeatureConfig, ZipVoiceConfig
    from zipvoice_tpu.models.distill import distill_config, init_zipvoice_distill
    from zipvoice_tpu.models.pipeline import ZipVoicePipeline

    cfg = distill_config(ZipVoiceConfig(vocab_size=700, pad_id=0))
    params = init_zipvoice_distill(jax.random.PRNGKey(0), cfg)
    pipe = ZipVoicePipeline(
        params=params, model_cfg=cfg, feat_cfg=feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1)), dtype=dtype,
        distill=True,
    )
    prompt_dev = jnp.asarray(prompt_feats, dtype)
    batch_in = pipe._prepare_sample_inputs(tokens, prompt_tokens, prompt_dev,
                                           1.0, 666)
    out_samples = max(batch_in.gen_len - 1, 1) * pipe.vocos_cfg.hop_length

    results = {}
    for i, num_step in enumerate(num_steps):
        if i > 0 and not budget_ok(f"distill_rtf_{num_step}step"):
            continue
        fused = pipe._sample_pcm_fn(num_step, 3.0, 0.5)

        def run():
            t0 = time.monotonic()
            pcm, _ = fused(pipe.params, pipe.vocos_params, *batch_in.args)
            wav = np.asarray(pcm[0])[:out_samples]
            return wav, time.monotonic() - t0

        run()
        times = []
        for _ in range(5):
            wav, t = run()
            times.append(t)
        results[num_step] = float(np.min(times)) / (
            wav.shape[-1] / feat_cfg.sampling_rate
        )
    return results


def _dialog_rtf(cfg_base, dtype) -> float:
    """ZipVoice-Dialog 16-step RTF at the reference defaults (guidance 1.5,
    t_shift 0.5 — ref infer_zipvoice_dialog.py:139-144), same 10 s request
    shapes as the headline; speaker embeddings + dual-condition CFG live."""
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.dialog import init_zipvoice_dialog, sample_dialog

    cfg = ZipVoiceConfig(vocab_size=cfg_base.vocab_size + 28, pad_id=0)
    params = jax.tree.map(
        lambda a: a.astype(dtype),
        init_zipvoice_dialog(jax.random.PRNGKey(0), cfg),
    )
    rng = np.random.default_rng(0)
    t = 1024
    tp = jnp.asarray(rng.integers(1, cfg.vocab_size - 28, (1, 160)), jnp.int32)
    tl = jnp.asarray([150], jnp.int32)
    pf = jnp.asarray(rng.standard_normal((1, t, cfg.feat_dim)) * 0.1, dtype)
    pl = jnp.asarray([281], jnp.int32)
    fl = jnp.asarray([938], jnp.int32)
    noise = jnp.asarray(rng.standard_normal((1, t, cfg.feat_dim)), dtype)

    fn = jax.jit(lambda p, *a: sample_dialog(
        p, cfg, *a, num_step=16, guidance_scale=1.5, t_shift=0.5))
    out = fn(params, tp, tl, pf, pl, fl, noise)
    float(np.asarray(out[0, 0, 0], np.float32))
    times = []
    for _ in range(5):
        t0 = time.monotonic()
        out = fn(params, tp, tl, pf, pl, fl, noise)
        float(np.asarray(out[0, 0, 0], np.float32))
        times.append(time.monotonic() - t0)
    return float(np.min(times)) / SECONDS_OF_AUDIO


def _int8_dynamic_rtf(cfg, params) -> float:
    """16-step CFG sampler with int8 linear weights AND dynamic per-row
    activation quantization — the s8xs8->s32 MXU path (2x bf16 peak on
    v5e; the TPU analogue of the reference's onnxruntime dynamic MatMul
    quant, ref onnx_export.py:384-400).  Same 10 s request shapes as the
    headline.  Runs LAST among device measurements: toggling the dynamic
    trace mode clears the jit caches (see nn.functional.set_int8_dynamic).
    Fidelity rows live in tools/int8_rtf.py."""
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.models import zipvoice as zv
    from zipvoice_tpu.nn.functional import set_int8_dynamic
    from zipvoice_tpu.ops.quant import (
        cast_quantized_tree,
        quantize_linear_int8,
    )

    qparams = cast_quantized_tree(
        quantize_linear_int8(jax.tree.map(
            lambda a: np.asarray(a, np.float32), params)),
        jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    t = 1024
    tp = jnp.asarray(rng.integers(1, cfg.vocab_size, (1, 160)), jnp.int32)
    tl = jnp.asarray([130], jnp.int32)
    pf = jnp.asarray(
        rng.standard_normal((1, t, cfg.feat_dim)) * 0.1, jnp.bfloat16)
    plen = jnp.asarray([281], jnp.int32)
    fl = jnp.asarray([938], jnp.int32)
    noise = jnp.asarray(
        rng.standard_normal((1, t, cfg.feat_dim)), jnp.bfloat16)

    set_int8_dynamic(True)
    try:
        fn = jax.jit(lambda p, *a: zv.sample(
            p, cfg, *a, num_step=NUM_STEP, guidance_scale=GUIDANCE,
            t_shift=0.5))
        out = fn(qparams, tp, tl, pf, plen, fl, noise)
        float(np.asarray(out[0, 0, 0], np.float32))
        times = []
        for _ in range(5):
            t0 = time.monotonic()
            out = fn(qparams, tp, tl, pf, plen, fl, noise)
            float(np.asarray(out[0, 0, 0], np.float32))
            times.append(time.monotonic() - t0)
    finally:
        set_int8_dynamic(False)
    return float(np.min(times)) / SECONDS_OF_AUDIO


def _vocoder_on_chip(feat_cfg, vocos_params, dtype, n: int = 50) -> float:
    """True on-chip vocoder cost: N decodes chained in a lax.scan so the
    remote-tunnel dispatch+readback latency amortizes away.  Measured r3:
    0.90 ms per 10 s request (rtf 0.00009) — the split-pipeline
    `rtf_vocoder` 0.00575 of round 2 was ~97% tunnel round-trip, not
    compute, which exonerates the ISTFT head (VERDICT r2 #5): the matmul
    DFT + shifted-adds overlap-add is already fused by XLA to well under
    1 ms for the whole ConvNeXt+ISTFT stack."""
    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.audio.vocos import VocosConfig, vocos_decode

    vcfg = VocosConfig()
    t = int(SECONDS_OF_AUDIO * feat_cfg.sampling_rate / feat_cfg.hop_length)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, t, 100)), dtype)

    def body(carry, _):
        out = vocos_decode(vocos_params, mel + carry * 1e-6, vcfg)
        return jnp.mean(out).astype(dtype), jnp.sum(out)

    @jax.jit
    def chained():
        _, outs = jax.lax.scan(body, jnp.asarray(0.0, dtype), None, length=n)
        return outs

    o = chained()
    float(np.asarray(o[0], np.float32))
    t0 = time.monotonic()
    o = chained()
    float(np.asarray(o[0], np.float32))
    per = (time.monotonic() - t0) / n
    return per / ((t - 1) * feat_cfg.hop_length / feat_cfg.sampling_rate)


def _bf16_fidelity(cfg, feat_cfg):
    """Mel MSE of the bf16 jitted sampler vs the f32 sampler on the SAME
    weights and noise — the fidelity cost of the deployment dtype on this
    hardware — measured twice: plain bf16 and bf16 + f32_closers (f32
    time-embed MLP / out_proj / Euler state, the docs/parity.md headroom
    plan).  Returns (mse_bf16, mse_bf16_f32_closers).
    (Checkpoint-vs-torch parity incl. a bf16 budget lives in
    eval/parity.py; this on-device number needs no torch reference.)"""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from zipvoice_tpu.eval.metrics import mel_mse
    from zipvoice_tpu.models import zipvoice as zv

    rng = np.random.default_rng(0)
    frame_rate = feat_cfg.sampling_rate / feat_cfg.hop_length
    total = int(5.0 * frame_rate)
    prompt_len = int(2.0 * frame_rate)
    f = cfg.feat_dim
    cat = list(rng.integers(1, cfg.vocab_size, 34))
    tokens_padded = zv.pad_labels([cat], cfg.pad_id)
    pf = np.zeros((1, total, f), np.float32)
    pf[0, :prompt_len] = rng.standard_normal((prompt_len, f)) * 0.1
    noise = rng.standard_normal((1, total, f)).astype(np.float32)
    params = zv.init_zipvoice(jax.random.PRNGKey(0), cfg)

    def run(dtype, run_cfg):
        p = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        out = zv.sample(
            p, run_cfg, tokens_padded, np.array([len(cat)], np.int32),
            jnp.asarray(pf, dtype), np.array([prompt_len], np.int32),
            np.array([total], np.int32), jnp.asarray(noise, dtype),
            num_step=NUM_STEP, guidance_scale=GUIDANCE, t_shift=0.5,
        )
        return np.asarray(out.astype(jnp.float32))[0]

    ref32 = run(jnp.float32, cfg)
    cfg_closers = dataclasses.replace(cfg, f32_closers=True)
    return (
        mel_mse(run(jnp.bfloat16, cfg), ref32),
        mel_mse(run(jnp.bfloat16, cfg_closers), ref32),
    )


# Last driver-captured numbers + the builder-side round-3 measurements, used
# as the degraded-mode payload when the TPU backend is unreachable (the
# 2026-08-17 tunnel outage turned BENCH_r03 into a bare traceback; this bench
# must never fail open again — VERDICT r3 next #1).
LAST_KNOWN = {
    "inference_rtf_zipvoice123M_16step": 0.01823,
    "provenance": "BENCH_r02.json (driver-captured)",
    "builder_measured_r4": {
        "rtf_fused": 0.01547,
        "rtf_bf16_sampler_only": 0.00998,
        "serving_b8_audio_sec_per_sec": 1575.0,
        "train_full_step_ms_b8": 121.92,
        "mfu_train_b16": 0.1705,
        "provenance": "R4_CAPTURE.log + R4_SUMMARY.json (builder capture, "
                      "2026-08-19; fused-eval defaults since flipped off — "
                      "unfused measured faster)",
    },
    "builder_measured_r5": {
        "train_full_step_ms_b8": 125.56,
        "mfu_train_b16": 0.1716,
        "mfu_train_b24": 0.1736,
        "rtf_int8_dynamic_sampler": 0.00975,
        "int8_dynamic_mel_mse_vs_bf16": 9.40e-4,
        "provenance": "R5_CAPTURE.log + R5_SUMMARY.json (builder capture "
                      "2026-08-19, healthy session; its bench TAIL ran on "
                      "a ~25x-degraded chip and is invalid — rerun gated "
                      "on tools/chip_health.py)",
    },
}

PROBE_SCRIPT = (
    "import jax, jax.numpy as jnp, numpy as np\n"
    "x = jnp.ones((128, 128), jnp.bfloat16)\n"
    "y = np.asarray(jax.jit(lambda a: a @ a)(x))\n"
    "print('PROBE_OK', float(y[0, 0]))\n"
)


def _probe_backend(attempt_timeout: float = 360.0, budget: float = 780.0):
    """Timeout-wrapped subprocess probe of the TPU backend (tiny matmul +
    host readback).  The observed outage mode is an indefinite hang inside
    backend init (CLAUDE.md 2026-08-17), which no in-process guard can
    escape — hence the subprocess.

    A HEALTHY tunnel spends ~200 s in backend init per process and has been
    observed needing more (the r4 driver capture lost its number to one
    280 s attempt on a tunnel that served a full queue 40 min earlier), so
    each attempt gets a 360 s window and the default budget fits TWO full
    attempts plus the inter-attempt pause.  When the remaining budget is
    shorter than a full window the attempt still runs with the clamped
    window (and the failure detail records the clamp) rather than giving
    up — a short late attempt can still catch an already-warm tunnel.
    Returns (ok, detail_str)."""
    import subprocess
    import sys

    t0 = time.monotonic()
    attempt = 0
    detail = ""
    while True:
        attempt += 1
        # each attempt is clamped to the REMAINING budget, so a small
        # BENCH_DEADLINE cannot be overrun by one long hung probe
        this_timeout = min(
            attempt_timeout, max(60.0, budget - (time.monotonic() - t0))
        )
        try:
            r = subprocess.run(
                [sys.executable, "-c", PROBE_SCRIPT],
                capture_output=True, text=True, timeout=this_timeout,
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                return True, f"probe ok (attempt {attempt})"
            detail = (
                f"probe rc={r.returncode}: "
                + (r.stderr or r.stdout).strip()[-300:]
            )
        except subprocess.TimeoutExpired:
            detail = (
                f"probe timed out after {this_timeout:.0f}s window"
                + (
                    f" (clamped from {attempt_timeout:.0f}s by budget)"
                    if this_timeout < attempt_timeout else ""
                )
            )
        if time.monotonic() - t0 + 15 + 60.0 > budget:
            return False, f"{detail} (gave up after {attempt} attempts)"
        time.sleep(15)


def _emit(value, detail, error=None, metric="inference_rtf_zipvoice123M_16step"):
    """Print the one-line JSON contract.  Called multiple times as results
    firm up; the driver takes the LAST parseable line, so each call
    supersedes the previous (and a mid-run kill still leaves the most
    recent state on stdout).  The mid-run heartbeat uses a DIFFERENT
    metric name so a driver that greps for the headline metric can only
    ever match a real result line."""
    line = {
        "metric": metric,
        "value": None if value is None else round(value, 5),
        "unit": "rtf",
        "vs_baseline": (
            None if value is None else round(TARGET_RTF / value, 2)
        ),
        "detail": detail,
    }
    if error is not None:
        line["error"] = error
    print(json.dumps(line), flush=True)


def main():
    """Outage-proof entry: probe the backend in a subprocess first, emit a
    parseable JSON line no matter what happens, and always exit 0."""
    import sys

    state = {}  # mutated by _main_impl as measurements land
    # pre-probe heartbeat: the probe budget is floored at one full 360 s
    # attempt window even when BENCH_DEADLINE is smaller, so a time-boxed
    # driver can kill the process MID-PROBE — this line guarantees a
    # parseable last-known payload is on stdout before any waiting starts
    _emit(None, {"status": "probing backend", "last_known": LAST_KNOWN},
          error="incomplete", metric="bench_heartbeat")
    # floor the budget at one full 360 s attempt window even for small
    # BENCH_DEADLINE (a sub-init-time window reads slow-but-up as DOWN);
    # at the default 1200 s deadline this allows two full attempts
    ok, probe_detail = _probe_backend(
        budget=max(360.0, min(780.0, DEADLINE_SECONDS * 0.65))
    )
    if not ok:
        _emit(None, {"probe": probe_detail, "last_known": LAST_KNOWN},
              error="tpu_backend_unavailable")
        sys.exit(0)
    # heartbeat: a parseable line exists from here on even if the tunnel
    # dies mid-run and the process is killed while hung on a dispatch
    _emit(None, {"probe": probe_detail, "status": "backend up, measuring",
                 "last_known": LAST_KNOWN}, error="incomplete",
          metric="bench_heartbeat")
    try:
        _main_impl(state)
    except BaseException as e:  # noqa: BLE001 — must never fail open
        if isinstance(e, KeyboardInterrupt):
            raise
        detail = {
            "partial": {k: v for k, v in state.items() if k != "rtf"},
            "last_known": LAST_KNOWN,
        }
        _emit(state.get("rtf"), detail,
              error=f"{type(e).__name__}: {str(e)[:300]}")
        sys.exit(0)


def _main_impl(state):
    import jax

    _T0 = _PROCESS_T0  # probe time already spent counts against the budget

    # persistent compilation cache: the heavy programs (16-step sampler,
    # regularized train step) compile once per machine, not per run
    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/jax_compilation"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass

    import jax.numpy as jnp

    # Chip-HEALTH probe (r5): the chip can run ~25-50x slow while the
    # tunnel reads "up" (2026-08-19: chained-GEMM probe 1.9 TFLOP/s vs
    # >100 healthy; that session's bench recorded RTF 0.2703 — all rows
    # uniformly degraded).  Chain 50 big GEMMs under one dispatch so the
    # answer is compute-bound, and FLAG (never null) a degraded capture:
    # a slower number with its explanation still beats an error line.
    # ONE implementation + healthy floor, shared with the capture queues'
    # gate, so bench and the queues can never disagree about "healthy".
    import pathlib
    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).parent / "tools"))
    from chip_health import HEALTHY_FLOOR_TFLOPS, probe_tflops

    try:
        chip_tflops = round(probe_tflops(), 1)
    except Exception:  # noqa: BLE001 — the probe must never cost the run
        chip_tflops = None
    state["chip_tflops_probe"] = chip_tflops
    state["chip_degraded"] = (
        bool(chip_tflops < HEALTHY_FLOOR_TFLOPS)
        if chip_tflops is not None else None
    )

    from zipvoice_tpu.audio.vocos import init_vocos
    from zipvoice_tpu.config import FeatureConfig, ZipVoiceConfig
    from zipvoice_tpu.models.pipeline import ZipVoicePipeline
    from zipvoice_tpu.models.zipvoice import init_zipvoice

    from zipvoice_tpu.nn.zipformer import set_scan_layers

    # inference: fully unrolled layers (peak throughput; the persistent
    # cache amortizes the longer compile)
    set_scan_layers(False)

    dtype = jnp.bfloat16
    cfg = ZipVoiceConfig(vocab_size=700, pad_id=0)
    feat_cfg = FeatureConfig()
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    vocos_params = init_vocos(jax.random.PRNGKey(1))

    pipe = ZipVoicePipeline(
        params=params, model_cfg=cfg, feat_cfg=feat_cfg,
        vocos_params=vocos_params, dtype=dtype,
    )

    frame_rate = feat_cfg.sampling_rate / feat_cfg.hop_length  # 93.75
    total_frames = int(SECONDS_OF_AUDIO * frame_rate)  # ~938
    prompt_frames = int(3.0 * frame_rate)
    gen_frames = total_frames - prompt_frames

    rng = np.random.default_rng(0)
    tokens = list(rng.integers(1, cfg.vocab_size, 120))
    # prompt token count tuned so ratio-duration prediction lands on ~10 s
    n_prompt_tokens = max(
        1, round(len(tokens) * prompt_frames / max(gen_frames, 1))
    )
    prompt_tokens = list(rng.integers(1, cfg.vocab_size, n_prompt_tokens))
    prompt_feats = (rng.standard_normal((prompt_frames, cfg.feat_dim)) * 0.1).astype(
        np.float32
    )

    # prompt features live on device in the serving flow (prompt_features()
    # extracts them there); mirror that so the bench measures the model, not
    # a redundant host->device prompt upload per request
    prompt_feats_dev = jnp.asarray(prompt_feats, dtype)

    def run():
        t0 = time.monotonic()
        mel, gen_len = pipe.sample_features(
            tokens, prompt_tokens, prompt_feats_dev, num_step=NUM_STEP,
            guidance_scale=GUIDANCE, t_shift=0.5,
        )
        # sample_features is sync-free; force a 1-element read so the
        # model/vocoder split stays meaningful (costs one tunnel roundtrip)
        float(np.asarray(mel[0, 0], np.float32))
        t1 = time.monotonic()
        wav = pipe.vocode(mel, gen_len)
        t2 = time.monotonic()
        return wav, t1 - t0, t2 - t1

    # warmup/compile.  The default eval path runs the shared-probs Pallas
    # kernel (fused consumers are OFF by default since r5 — the r4 A/B
    # measured unfused faster); a Mosaic lowering failure on the real chip
    # must degrade to the XLA paths — a slower RTF number beats an error
    # line in the round's one driver capture.
    try:
        run()
    except Exception as e:  # noqa: BLE001 — kernel-compile fallback
        from zipvoice_tpu.nn import zipformer as _zf

        state["fused_kernel_fallback"] = f"{type(e).__name__}: {str(e)[:200]}"
        _zf.set_fused_attention(False)
        _zf.set_fused_eval(False)
        _zf.set_fused_conv(False)
        run()
    # timed runs (min-of-8: device compute is deterministic, spread is
    # remote-tunnel transfer latency)
    times_model, times_voc, wav_secs = [], [], None
    for _ in range(8):
        wav, tm, tv = run()
        times_model.append(tm)
        times_voc.append(tv)
        wav_secs = wav.shape[-1] / feat_cfg.sampling_rate

    # min over runs: device compute is deterministic, the spread comes from
    # the remote-tunnel transfer latency, so min is the steady-state number
    tm = float(np.min(times_model))
    tv = float(np.min(times_voc))
    rtf_split = (tm + tv) / wav_secs
    state["rtf"] = rtf_split
    state["rtf_split_pipeline"] = round(rtf_split, 5)

    # headline: the fused serving path — sampler + vocoder + PCM16 quantize
    # in ONE program, one dispatch and one int16 readback per request (what
    # bin/serve.py runs for single requests).  Budget-guarded: its compile
    # costs minutes terminal-side; past half the deadline, the split RTF
    # (already measured) is the headline instead.
    rtf = rtf_split
    fused_ran = False
    if time.monotonic() - _T0 < DEADLINE_SECONDS / 2:
        # guarded like the warmup above: a compile failure of the LARGER
        # fused program must degrade to the already-measured split RTF,
        # not abort before the provisional print (the round's one capture)
        try:
            batch_in = pipe._prepare_sample_inputs(
                tokens, prompt_tokens, prompt_feats_dev, 1.0, 666
            )
            fused = pipe._sample_pcm_fn(NUM_STEP, GUIDANCE, 0.5)
            out_samples = (
                max(batch_in.gen_len - 1, 1) * pipe.vocos_cfg.hop_length
            )

            def run_fused():
                t0 = time.monotonic()
                pcm, _ = fused(pipe.params, pipe.vocos_params, *batch_in.args)
                wav = np.asarray(pcm[0])[:out_samples]
                return wav, time.monotonic() - t0

            run_fused()
            times_fused = []
            for _ in range(8):
                wav_f, tf = run_fused()
                times_fused.append(tf)
            fused_secs = wav_f.shape[-1] / feat_cfg.sampling_rate
            rtf = float(np.min(times_fused)) / fused_secs
            fused_ran = True
            state["rtf"] = rtf
        except Exception as e:  # noqa: BLE001 — headline falls back to split
            rtf = rtf_split
            state["fused_program_fallback"] = (
                f"{type(e).__name__}: {str(e)[:200]}"
            )


    # provisional line first: if the harness kills this process during the
    # auxiliary measurements below, the headline RTF is already on stdout
    # (the final line, with extras, supersedes it when reached)
    print(json.dumps({
        "metric": "inference_rtf_zipvoice123M_16step",
        "value": round(rtf, 5), "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 2),
        "detail": {"provisional": True},
    }), flush=True)

    # tunnel round-trip: a trivial program with the same int16 readback
    # volume as a request.  On this remote-attached platform every dispatch
    # pays ~tens of ms of terminal round-trip that a locally attached chip
    # would not; rtf_fused_on_chip_est subtracts it (cross-checked against
    # the scan-chained module profile in PROFILE_r3.json).  Runs AFTER the
    # provisional print so a time-boxed kill never loses the headline.
    trivial = jax.jit(lambda x: (x + 1).astype(jnp.int16))
    zin = jnp.zeros((int(SECONDS_OF_AUDIO * feat_cfg.sampling_rate),),
                    jnp.int16)
    np.asarray(trivial(zin))
    tunnel_s = min(
        (lambda t0: (np.asarray(trivial(zin)), time.monotonic() - t0)[1])(
            time.monotonic()
        )
        for _ in range(10)
    )

    # auxiliary measurements under the remaining wall-clock budget, on
    # scan-of-layers programs (minutes-faster compiles, ~same MXU math)
    set_scan_layers(True)
    t_start = _T0
    skipped = []

    def budget_ok(label):
        if time.monotonic() - t_start < DEADLINE_SECONDS:
            return True
        skipped.append(label)
        return False

    batched_tp = batched_tp16 = bf16_mse = train_tp = voc_chip = None
    train_mfu = None
    distill_rtfs = {}
    bparams = jax.tree.map(lambda a: a.astype(dtype), params)

    def _try(label, fn):
        """Each auxiliary measurement fails independently: one bad compile
        must not cost the remaining rows of the round's one capture."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            state.setdefault("aux_errors", {})[label] = (
                f"{type(e).__name__}: {str(e)[:200]}"
            )
            return None

    if budget_ok("vocoder_on_chip"):
        voc_chip = _try("vocoder_on_chip", lambda: float(
            f"{_vocoder_on_chip(feat_cfg, pipe.vocos_params, dtype):.2e}"))
        state["rtf_vocoder_on_chip"] = voc_chip
    if budget_ok("serving_b8"):
        batched_tp = _try("serving_b8", lambda: round(
            _batched_throughput(cfg, bparams, batch=8), 1))
        state["serving_b8_audio_sec_per_sec"] = batched_tp
    if budget_ok("serving_b16"):
        batched_tp16 = _try("serving_b16", lambda: round(
            _batched_throughput(cfg, bparams, batch=16), 1))
        state["serving_b16_audio_sec_per_sec"] = batched_tp16
    bf16_mse_closers = None
    if budget_ok("bf16_fidelity"):
        mses = _try("bf16_fidelity", lambda: _bf16_fidelity(cfg, feat_cfg))
        if mses is not None:
            bf16_mse = float(f"{mses[0]:.3e}")
            bf16_mse_closers = float(f"{mses[1]:.3e}")
            state["bf16_mel_mse_vs_f32"] = bf16_mse
            state["bf16_mel_mse_f32_closers"] = bf16_mse_closers
    if budget_ok("train_throughput"):
        tr = _try("train_throughput", lambda: _train_throughput(cfg))
        if tr is not None:
            train_tp, train_step_time, (tb, tt) = tr
            train_tp = round(train_tp, 2)
            state["train_sec_audio_per_sec_per_chip"] = train_tp
    if budget_ok("distill_rtf"):
        distill_rtfs = _try("distill_rtf", lambda: _distill_rtf(
            feat_cfg, tokens, prompt_tokens, prompt_feats, dtype,
            num_steps=(8, 4, 2, 1), budget_ok=budget_ok,
        )) or {}
        state["distill_rtfs"] = {k: round(v, 5) for k, v in distill_rtfs.items()}
    dialog_rtf = None
    if budget_ok("dialog_rtf"):
        dialog_rtf = _try("dialog_rtf",
                          lambda: round(_dialog_rtf(cfg, dtype), 5))
        state["dialog_rtf_16step"] = dialog_rtf
    int8_dyn_rtf = None
    if budget_ok("int8_dynamic_rtf"):
        # last device measurement: its trace-mode toggle clears jit caches
        int8_dyn_rtf = _try("int8_dynamic_rtf",
                            lambda: round(_int8_dynamic_rtf(cfg, params), 5))
        state["rtf_int8_dynamic_16step"] = int8_dyn_rtf

    # --- analytic FLOPs / MFU (VERDICT r2 weak #4: roofline-stable progress
    # metric instead of tunnel-jittered wall clock).  Shapes are the PADDED
    # compute shapes the chip actually runs (frame bucket 1024, token bucket
    # padding) — algorithmic GEMM FLOPs from the config, utils/flops.py.
    from zipvoice_tpu.utils.flops import (
        mfu, peak_bf16_tflops, sampler_flops, train_step_flops,
        vocos_fwd_flops,
    )

    device_kind = jax.devices()[0].device_kind
    t_padded = 1024  # 938 frames -> 1024 bucket (pipeline frame_bucket 128)
    n_tok_padded = 160
    infer_flops = sampler_flops(cfg, t_padded, n_tok_padded, NUM_STEP,
                                cfg_doubling=True)
    fused_flops = infer_flops + vocos_fwd_flops(t_padded)
    model_seconds = rtf * wav_secs  # fused program wall time per request
    infer_mfu = mfu(fused_flops, model_seconds, device_kind)
    onchip_seconds = max(model_seconds - tunnel_s, 1e-9)
    infer_mfu_onchip = (
        mfu(fused_flops, onchip_seconds, device_kind) if fused_ran else None
    )
    if train_tp is not None:
        tr_flops = train_step_flops(cfg, tb, tt, 128)
        train_mfu = round(mfu(tr_flops, train_step_time, device_kind), 4)

    result = {
        "metric": "inference_rtf_zipvoice123M_16step",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 2),
        "detail": {
            "rtf_split_pipeline": round(rtf_split, 5),
            "tunnel_roundtrip_ms": round(tunnel_s * 1e3, 1),
            # only meaningful for the one-dispatch fused program (the split
            # fallback pays TWO round trips); null when deadline-skipped
            "rtf_fused_on_chip_est": round(
                max(rtf - tunnel_s / wav_secs, 0.0), 5
            ) if fused_ran else None,
            "rtf_model": round(tm / wav_secs, 5),
            "rtf_vocoder": round(tv / wav_secs, 5),
            "rtf_vocoder_on_chip": voc_chip,
            "wav_seconds": round(wav_secs, 2),
            "serving_b8_audio_sec_per_sec": batched_tp,
            "serving_b16_audio_sec_per_sec": batched_tp16,
            # batched sampler MFU: aggregate requests/s x sampler FLOPs per
            # request (no vocoder in the batched program) vs bf16 peak
            "mfu_serving_b8": (
                round(mfu(infer_flops * batched_tp / SECONDS_OF_AUDIO, 1.0,
                          device_kind), 4)
                if batched_tp else None
            ),
            "distill_rtf_8step": round(distill_rtfs[8], 5) if 8 in distill_rtfs else None,
            "distill_rtf_low_step": {
                str(k): round(v, 5) for k, v in distill_rtfs.items() if k != 8
            },
            "dialog_rtf_16step": dialog_rtf,
            "rtf_int8_dynamic_16step": int8_dyn_rtf,
            # non-null when the fused Pallas eval path failed to compile
            # and the run degraded to XLA (see warmup fallback)
            "fused_kernel_fallback": state.get("fused_kernel_fallback"),
            # non-null when the fused one-program headline failed and the
            # split RTF is the headline instead
            "fused_program_fallback": state.get("fused_program_fallback"),
            # per-measurement failures that did not stop the run
            "aux_errors": state.get("aux_errors"),
            "train_sec_audio_per_sec_per_chip": train_tp,
            "bf16_mel_mse_vs_f32": bf16_mse,
            "bf16_mel_mse_f32_closers": bf16_mse_closers,
            "model_tflops_per_request": round(fused_flops / 1e12, 3),
            "mfu_infer_fused": round(infer_mfu, 4),
            "mfu_infer_on_chip_est": (
                round(infer_mfu_onchip, 4)
                if infer_mfu_onchip is not None else None
            ),
            "mfu_train": train_mfu,
            "peak_bf16_tflops": peak_bf16_tflops(device_kind),
            "skipped_over_deadline": skipped,
            # chained-GEMM compute throughput at run start; chip_degraded
            # means every row above ran on a throttled chip (see r5 notes)
            # and last-known healthy numbers are attached for the reader
            "chip_tflops_probe": state.get("chip_tflops_probe"),
            "chip_degraded": state.get("chip_degraded"),
            "device": str(jax.devices()[0]),
            "dtype": "bfloat16",
        },
    }
    if state.get("chip_degraded"):
        result["detail"]["last_known"] = LAST_KNOWN
    print(json.dumps(result))


if __name__ == "__main__":
    main()
