"""Zero-shot TTS inference pipeline: tokenize -> fbank -> ODE -> vocoder.

The device path is two jitted XLA programs cached per shape bucket:

  1. sample_fn(S, T):   text embed + text encoder + duration expansion +
                        N-step CFG Euler ODE + prompt strip (roll+mask)
  2. vocode_fn(T):      Vocos ConvNeXt + ISTFT

Everything dynamic (token counts, frame counts, prompt lengths) is carried
as scalar arrays over padded, bucketed shapes, so the compile cache stays
small and the hot path is pure compiled code.  Equivalent of the reference's
generate_sentence (ref zipvoice/bin/infer_zipvoice.py:276-401) including the
RMS normalization and feat scale/bias handling and per-phase RTF metrics.
"""

from __future__ import annotations

import dataclasses
import time
import weakref
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from zipvoice_tpu.audio.mel import (
    compute_num_frames,
    extract_features,
    stft_pad_amount,
)


def enable_compilation_cache(path: str = "/root/.cache/jax_compilation"):
    """Persistent XLA compilation cache: the 16-step sampler and train-step
    programs compile once per machine instead of per process."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:  # noqa: BLE001 — flag names vary across jax versions
        pass
from zipvoice_tpu.audio.vocos import VocosConfig, vocos_decode
from zipvoice_tpu.audio.wav import resample
from zipvoice_tpu.config import FeatureConfig, ZipVoiceConfig
from zipvoice_tpu.models import zipvoice as zv


from zipvoice_tpu.utils.shapes import round_up  # noqa: F401 — shared helper


from zipvoice_tpu.utils.memo import instance_cache as _instance_cache


@dataclasses.dataclass
class SynthesisResult:
    wav: np.ndarray  # (L,) float32
    # (T_gen, F) generated mel (model scale removed); None on the fused
    # one-program path, which reads back only PCM16
    features: Optional[np.ndarray]
    metrics: Dict[str, float]


@dataclasses.dataclass
class _SampleInputs:
    args: tuple  # device arrays after `params` in the sampling programs
    gen_len: int  # generated frames (host arithmetic, sync-free)


class ZipVoicePipeline:
    """Host-side orchestration around the two jitted programs."""

    # live int8-quantized pipelines.  The dynamic-activation flag is a
    # process-global trace-time binding (nn.functional), so two LIVE
    # pipelines with different int8 modes cannot coexist: constructing the
    # second would silently flip the first one's numerics on its next
    # retrace (and its clear_caches throws away multi-minute compiles).
    # Weak references: discarded pipelines don't pin the mode forever.
    _live_quantized = weakref.WeakSet()

    def __init__(
        self,
        params: Dict,
        model_cfg: ZipVoiceConfig,
        feat_cfg: FeatureConfig,
        vocos_params: Optional[Dict] = None,
        vocos_cfg: VocosConfig = VocosConfig(),
        tokenizer=None,
        dtype=jnp.float32,
        distill: bool = False,
        variant: str = "zipvoice",  # zipvoice | dialog | dialog_stereo
        vocoder: str = "vocos",  # vocos | bigvgan
        token_bucket: int = 32,
        frame_bucket: int = 128,
        quantize: Optional[str] = None,  # None | int8 | int8-dynamic
    ):
        if quantize is not None:
            if quantize not in ("int8", "int8-dynamic"):
                raise ValueError(f"unknown quantize mode {quantize!r}")
            other = {
                p.quantize for p in ZipVoicePipeline._live_quantized
            } - {quantize}
            if other:
                # a discarded pipeline can linger in a self->jit-memo->self
                # reference cycle; only a cycle collection proves liveness
                import gc

                gc.collect()
                other = {
                    p.quantize for p in ZipVoicePipeline._live_quantized
                } - {quantize}
            if other:
                raise ValueError(
                    f"a live pipeline uses quantize={other.pop()!r}; "
                    f"constructing one with {quantize!r} would flip the "
                    "process-global int8 trace mode under it (one process, "
                    "one int8 mode — drop the other pipeline first)"
                )
            from zipvoice_tpu.nn.functional import set_int8_dynamic
            from zipvoice_tpu.ops.quant import (
                cast_quantized_tree,
                quantize_linear_int8,
            )

            params = cast_quantized_tree(
                quantize_linear_int8(
                    jax.tree.map(lambda a: np.asarray(a, np.float32), params)
                ),
                dtype,
            )
            # trace-time, process-global binding (one serving process, one
            # quant mode — see nn.functional.set_int8_dynamic).  Set
            # EXPLICITLY for both modes: a weight-only pipeline built after
            # a dynamic one must not inherit the dynamic trace mode
            set_int8_dynamic(quantize == "int8-dynamic")
        self.quantize = quantize
        if quantize is not None:
            ZipVoicePipeline._live_quantized.add(self)

        self.params = jax.device_put(
            jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
            if quantize is None else params
        )
        self.vocos_params = (
            None
            if vocos_params is None
            else jax.device_put(jax.tree.map(lambda a: jnp.asarray(a, dtype), vocos_params))
        )
        self.model_cfg = model_cfg
        self.feat_cfg = feat_cfg
        self.vocos_cfg = vocos_cfg
        self.tokenizer = tokenizer
        self.dtype = dtype
        self.distill = distill
        self.variant = variant
        # the stereo dialog model generates 2-channel features: the sample
        # space (noise / x / generated mel) lives in 2F while
        # model_cfg.feat_dim stays the per-channel mel dim — the prompt
        # extractor (num_channels=2) and eval/parity.py (f_x = 2*feat_dim)
        # already agree on this contract
        self.sample_feat_dim = model_cfg.feat_dim * (
            2 if variant == "dialog_stereo" else 1
        )
        self.vocoder = vocoder
        self.token_bucket = token_bucket
        self.frame_bucket = frame_bucket
        # jit memos live per-instance (utils/memo.instance_cache): bounded,
        # freed with the pipeline — a class-level lru_cache kept discarded
        # pipelines' device params (HBM) reachable forever (VERDICT r2 #7)

    # ------------------------------------------------------------------ jits

    @_instance_cache
    def _sample_fn(self, num_step: int, guidance_scale: float,
                   t_shift: float, timesteps: tuple = None):
        cfg = self.model_cfg
        distill = self.distill
        feat_scale, feat_bias = self.feat_cfg.feat_scale, self.feat_cfg.feat_bias

        variant = self.variant

        @jax.jit
        def run(params, tokens_padded, tokens_lens, prompt_features,
                prompt_features_lens, features_lens, noise):
            if variant == "zipvoice":
                x1 = zv.sample(
                    params, cfg, tokens_padded, tokens_lens, prompt_features,
                    prompt_features_lens, features_lens, noise,
                    num_step=num_step, guidance_scale=guidance_scale,
                    t_shift=t_shift, distill=distill, timesteps=timesteps,
                )
            else:
                from zipvoice_tpu.models.dialog import sample_dialog

                x1 = sample_dialog(
                    params, cfg, tokens_padded, tokens_lens, prompt_features,
                    prompt_features_lens, features_lens, noise,
                    num_step=num_step, guidance_scale=guidance_scale,
                    t_shift=t_shift, timesteps=timesteps,
                )
            # strip prompt: roll generated region to the front, zero the rest
            # (mask-based equivalent of ref zipvoice.py:469-484)
            t = x1.shape[1]
            gen_lens = features_lens - prompt_features_lens
            x_gen = jax.vmap(lambda row, s: jnp.roll(row, -s, axis=0))(
                x1, prompt_features_lens
            )
            frame_idx = jnp.arange(t, dtype=jnp.int32)[None, :]
            valid = frame_idx < gen_lens[:, None]
            x_gen = jnp.where(valid[:, :, None], x_gen, 0.0)
            # undo model feature scaling (ref infer_zipvoice.py:374)
            mel = x_gen / feat_scale - feat_bias
            return mel, gen_lens

        return run

    @_instance_cache
    def _extract_fn(self, num_samples: int):
        """Prompt-fbank program for one BUCKETED padded length.

        num_samples is the pre-padded bucket length (true wav + host
        reflect padding + right zeros — see prompt_features), so the
        program count is bounded by the bucket grid, not by every distinct
        client prompt length (each of which would compile a fresh XLA
        program on the serving chip)."""
        fcfg = self.feat_cfg
        num_channels = 2 if self.variant == "dialog_stereo" else 1

        @jax.jit
        def run(wav):
            feats = extract_features(
                wav, fcfg, num_channels=num_channels, pre_padded=True
            )
            return (feats + fcfg.feat_bias) * fcfg.feat_scale

        return run

    # ------------------------------------------------------------------ api

    def warmup(self, num_step: int = 16, guidance_scale: float = 1.0,
               t_shift: float = 0.5, seconds=(10.0,), token_counts=(64,),
               fused: bool = True, batch_sizes=()):
        """Precompile the serving programs for the given duration and token
        buckets (cold-start control).  By default this includes the fused
        sample+vocoder+PCM16 program (what single requests run); pass
        ``batch_sizes`` (e.g. ``(4, 8)``) to also compile the batched
        sampler programs a dynamic-batching server drains into."""
        rng = np.random.default_rng(0)
        for secs in seconds:
            frames = int(secs * self.feat_cfg.frame_rate)
            for n_tok in token_counts:
                tokens = list(rng.integers(1, self.model_cfg.vocab_size, n_tok))
                prompt_tokens = list(
                    rng.integers(1, self.model_cfg.vocab_size, max(n_tok // 4, 1))
                )
                pf = (rng.standard_normal(
                    (max(frames // 4, 8), self.sample_feat_dim)) * 0.01
                ).astype(np.float32)
                mel, gen_len = self.sample_features(
                    tokens, prompt_tokens, pf, num_step=num_step,
                    guidance_scale=guidance_scale, t_shift=t_shift,
                )
                if self.vocos_params is not None:
                    self.vocode(mel, gen_len)
                    if fused:
                        batch_in = self._prepare_sample_inputs(
                            tokens, prompt_tokens, pf, 1.0, 0
                        )
                        run = self._sample_pcm_fn(
                            int(num_step), float(guidance_scale), float(t_shift)
                        )
                        pcm, _ = run(self.params, self.vocos_params,
                                     *batch_in.args)
                        np.asarray(pcm[0, 0])
                for b in batch_sizes:
                    if b <= 1:
                        continue
                    run = self._sample_fn(
                        int(num_step), float(guidance_scale), float(t_shift)
                    )
                    args = self._prepare_sample_inputs(
                        tokens, prompt_tokens, pf, 1.0, 0
                    ).args
                    bargs = [jnp.repeat(a, b, axis=0) for a in args]
                    mel_b, _ = run(self.params, *bargs)
                    if self.vocos_params is not None:
                        np.asarray(
                            self._vocode_i16_fn()(
                                self.vocos_params, mel_b.astype(self.dtype)
                            )[0, 0]
                        )

    # prompt wavs are padded to a grid of this many FRAMES worth of
    # samples (128 frames = 1.37 s at 24 kHz/hop 256), so a serving
    # process compiles at most ~22 prompt-fbank programs for prompts up
    # to 30 s instead of one per distinct client wav length
    PROMPT_FRAME_BUCKET = 128

    def prompt_features(self, prompt_wav: np.ndarray, sr: int,
                        target_rms: float = 0.1):
        """Resample + RMS-normalize + fbank the prompt
        (ref infer_zipvoice.py:332-349).  Returns ((Tp, F) device array,
        prompt_rms) — features stay on device; the tunnel/PCIe hop is the
        expensive resource, not the fbank.

        The jitted fbank runs on a BUCKETED length: the true wav gets the
        extractor's reflect padding applied host-side (stft_pad_amount —
        a center=False STFT of the pre-padded signal is sample-identical
        to the extractor's own centered one), then right-zeros up to the
        bucket; the true frames are sliced out afterwards, so the values
        match the unbucketed computation exactly while arbitrary client
        prompt lengths can no longer drive unbounded recompiles."""
        wav = np.asarray(prompt_wav, np.float32)
        if wav.ndim == 1:
            wav = wav[None, :]
        if sr != self.feat_cfg.sampling_rate:
            wav = resample(wav, sr, self.feat_cfg.sampling_rate)
        prompt_rms = float(np.sqrt(np.mean(np.square(wav))))
        if prompt_rms <= 0.0:
            # an all-zeros prompt (over-trimmed silence) would otherwise
            # divide by zero and serve NaN audio with HTTP 200 — the server
            # maps ValueError from request preparation to a 400
            raise ValueError("prompt audio is silent (rms == 0)")
        if prompt_rms < target_rms:
            wav = wav * (target_rms / prompt_rms)

        fcfg = self.feat_cfg
        length = wav.shape[-1]
        pad = stft_pad_amount(fcfg)
        if length <= pad:
            raise ValueError(
                f"prompt too short: {length} samples <= reflect pad {pad}"
            )
        bucket = fcfg.hop_length * self.PROMPT_FRAME_BUCKET
        length_b = round_up(length, bucket)
        wav_p = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
        wav_p = np.pad(wav_p, ((0, 0), (0, length_b - length)))
        out = self._extract_fn(wav_p.shape[-1])(jnp.asarray(wav_p, self.dtype))
        # frame contract (lhotse round-half-up): crop to the true count; if
        # the unbucketed STFT would have come up SHORT (bigvgan's smaller
        # pad can), replicate its last frame exactly like fix_num_frames
        n_true = compute_num_frames(length, fcfg.hop_length)
        f_unpadded = 1 + (length + 2 * pad - fcfg.n_fft) // fcfg.hop_length
        if f_unpadded >= n_true:
            feats = out[:n_true]
        else:
            feats = jnp.concatenate([
                out[:f_unpadded],
                jnp.broadcast_to(out[f_unpadded - 1:f_unpadded],
                                 (n_true - f_unpadded, out.shape[-1])),
            ])
        return feats, prompt_rms

    def synthesize(
        self,
        text: str,
        prompt_text: str,
        prompt_wav: np.ndarray,
        prompt_sr: int,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
        seed: int = 666,
        timesteps=None,
    ) -> SynthesisResult:
        assert self.tokenizer is not None, "pipeline needs a tokenizer"
        t0 = time.monotonic()
        tokens = self.tokenizer.texts_to_token_ids([text])[0]
        prompt_tokens = self.tokenizer.texts_to_token_ids([prompt_text])[0]
        pf, prompt_rms = self.prompt_features(prompt_wav, prompt_sr, target_rms)

        mel, gen_len = self.sample_features(
            tokens, prompt_tokens, pf, num_step=num_step,
            guidance_scale=guidance_scale, speed=speed, t_shift=t_shift,
            seed=seed, timesteps=timesteps,
        )
        t1 = time.monotonic()

        wav = self.vocode(mel, gen_len)
        if prompt_rms < target_rms:
            wav = wav * (prompt_rms / target_rms)
        t2 = time.monotonic()

        wav_seconds = wav.shape[-1] / self.feat_cfg.sampling_rate
        metrics = {
            "t": t2 - t0,
            "t_no_vocoder": t1 - t0,
            "t_vocoder": t2 - t1,
            "wav_seconds": wav_seconds,
            "rtf": (t2 - t0) / wav_seconds,
            "rtf_no_vocoder": (t1 - t0) / wav_seconds,
            "rtf_vocoder": (t2 - t1) / wav_seconds,
        }
        return SynthesisResult(
            wav=wav, features=np.asarray(mel[:gen_len], np.float32),
            metrics=metrics,
        )

    def _prepare_sample_inputs(self, tokens, prompt_tokens, prompt_feats,
                               speed: float, seed: int,
                               noise: Optional[np.ndarray] = None):
        """Shared bucket-padding for the sampling programs: returns a
        _SampleInputs whose ``args`` feed _sample_fn/_sample_pcm_fn after
        ``params`` and whose ``gen_len`` is the host-side generated-frame
        count (sync-free)."""
        cat_tokens = list(prompt_tokens) + list(tokens)
        prompt_len_frames = prompt_feats.shape[0]
        total_frames = int(
            zv.predict_features_lens(
                np.array([prompt_len_frames]),
                np.array([max(len(prompt_tokens), 1)]),
                np.array([len(tokens)]),
                speed=speed,
            )[0]
        )

        s_pad = round_up(len(cat_tokens) + 1, self.token_bucket)
        t_pad = round_up(total_frames, self.frame_bucket)

        tokens_padded = np.full((1, s_pad), self.model_cfg.pad_id, np.int32)
        row = list(cat_tokens) + [self.model_cfg.pad_id]
        tokens_padded[0, : len(row)] = row
        tokens_lens = np.array([len(cat_tokens)], np.int32)

        # pad prompt features on whichever side they live; device arrays
        # never round-trip to host
        if isinstance(prompt_feats, jax.Array):
            pf = jnp.zeros((1, t_pad, prompt_feats.shape[-1]), self.dtype)
            pf = pf.at[0, :prompt_len_frames].set(
                prompt_feats.astype(self.dtype)
            )
        else:
            pf = np.zeros((1, t_pad, prompt_feats.shape[-1]), np.float32)
            pf[0, :prompt_len_frames] = prompt_feats
        if noise is None:
            # generated on device; never round-trips to host
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), (1, t_pad, self.sample_feat_dim),
                self.dtype,
            )
        elif noise.shape[1] < t_pad:
            noise = np.concatenate(
                [noise, np.zeros((1, t_pad - noise.shape[1], noise.shape[-1]),
                                 np.float32)], axis=1,
            )
        else:
            noise = noise[:, :t_pad]

        return _SampleInputs(
            args=(
                jnp.asarray(tokens_padded),
                jnp.asarray(tokens_lens),
                jnp.asarray(pf, self.dtype),
                jnp.asarray([prompt_len_frames], jnp.int32),
                jnp.asarray([total_frames], jnp.int32),
                jnp.asarray(noise, self.dtype),
            ),
            gen_len=total_frames - prompt_len_frames,
        )

    def sample_features(
        self,
        tokens,
        prompt_tokens,
        prompt_feats: np.ndarray,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        seed: int = 666,
        noise: Optional[np.ndarray] = None,
        timesteps=None,
    ) -> Tuple[np.ndarray, int]:
        """Run the jitted ODE program.  Returns ((T_bucket, F) mel, gen_len).

        timesteps: optional explicit Euler grid (EPSS-style pruned
        schedules, arXiv 2505.19931) overriding num_step/t_shift."""
        batch = self._prepare_sample_inputs(
            tokens, prompt_tokens, prompt_feats, speed, seed, noise
        )
        ts_key = None if timesteps is None else tuple(float(t) for t in timesteps)
        run = self._sample_fn(int(num_step), float(guidance_scale),
                              float(t_shift), ts_key)
        mel, _ = run(self.params, *batch.args)
        # mel stays on device (the vocoder consumes it there), and gen_len is
        # host arithmetic — the request runs sync-free until the wav readback
        return mel[0], batch.gen_len

    def _decode_i16(self, vparams, mel, dtype):
        """Traced helper shared by the fused and split serving programs:
        vocoder dispatch + clip + PCM16 quantize."""
        if self.vocoder == "bigvgan":
            from zipvoice_tpu.audio.bigvgan import (
                BigVGANConfig,
                bigvgan_decode,
            )

            wav = bigvgan_decode(vparams, mel.astype(dtype), BigVGANConfig())
        else:
            wav = vocos_decode(vparams, mel.astype(dtype), self.vocos_cfg)
        wav = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
        return jnp.round(wav * 32767.0).astype(jnp.int16)

    @_instance_cache
    def _sample_pcm_fn(self, num_step: int, guidance_scale: float,
                       t_shift: float):
        """Fused serving program: ODE sampler + vocoder + PCM16 quantize in
        ONE jitted computation — one dispatch and one (int16) readback per
        request, which beats the split sample/vocode pair by a device
        roundtrip on remote-attached chips.  The reference's closest
        analogue is the two-session ONNX pipeline with a host Euler loop
        (ref infer_zipvoice_onnx.py:357-377); here the whole request is a
        single XLA program."""
        sample = self._sample_fn(num_step, guidance_scale, t_shift)
        decode = self._decode_i16

        @jax.jit
        def run(params, vparams, tokens_padded, tokens_lens, prompt_features,
                prompt_features_lens, features_lens, noise):
            mel, gen_lens = sample(
                params, tokens_padded, tokens_lens, prompt_features,
                prompt_features_lens, features_lens, noise,
            )
            return decode(vparams, mel, noise.dtype), gen_lens

        return run

    def synthesize_fused(
        self,
        text: str,
        prompt_text: str,
        prompt_wav: np.ndarray,
        prompt_sr: int,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
        seed: int = 666,
        precomputed: Optional[Dict] = None,
    ) -> SynthesisResult:
        """synthesize() through the fused one-program path (no model/vocoder
        split in the metrics — the two stages are one XLA computation).

        ``precomputed`` may carry {"tokens", "prompt_tokens",
        "prompt_feats", "prompt_rms"} prepared off-thread (the serving
        handlers tokenize/fbank per request so the dispatcher thread only
        launches device programs)."""
        assert self.vocos_params is not None, "pipeline needs vocoder weights"
        t0 = time.monotonic()
        if precomputed is not None:
            tokens = precomputed["tokens"]
            prompt_tokens = precomputed["prompt_tokens"]
            pf = precomputed["prompt_feats"]
            prompt_rms = precomputed["prompt_rms"]
        else:
            assert self.tokenizer is not None, "pipeline needs a tokenizer"
            tokens = self.tokenizer.texts_to_token_ids([text])[0]
            prompt_tokens = self.tokenizer.texts_to_token_ids([prompt_text])[0]
            pf, prompt_rms = self.prompt_features(prompt_wav, prompt_sr,
                                                  target_rms)
        batch = self._prepare_sample_inputs(tokens, prompt_tokens, pf, speed, seed)
        run = self._sample_pcm_fn(int(num_step), float(guidance_scale),
                                  float(t_shift))
        pcm, _ = run(self.params, self.vocos_params, *batch.args)
        wav = np.asarray(pcm[0]).astype(np.float32) / 32767.0
        out_len = max(batch.gen_len - 1, 1) * self.vocos_cfg.hop_length
        wav = wav[:out_len]
        if prompt_rms < target_rms:
            wav = wav * (prompt_rms / target_rms)
        t1 = time.monotonic()
        wav_seconds = wav.shape[-1] / self.feat_cfg.sampling_rate
        return SynthesisResult(
            wav=wav, features=None,
            metrics={"t": t1 - t0, "wav_seconds": wav_seconds,
                     "rtf": (t1 - t0) / max(wav_seconds, 1e-9)},
        )

    @_instance_cache
    def _vocode_i16_fn(self):
        """Vocoder emitting PCM16: halves the device->host wav transfer,
        which dominates vocoding wall time on remote-attached chips."""
        decode = self._decode_i16

        @jax.jit
        def run(vparams, mel):
            return decode(vparams, mel, mel.dtype)

        return run

    def synthesize_batch(
        self,
        texts,
        prompt_texts,
        prompt_wavs,
        prompt_srs,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
        seed: int = 666,
        seeds=None,
        precomputed=None,
    ):
        """Serve several requests in ONE compiled program call (the reference
        infers strictly one sentence at a time, ref infer_zipvoice.py:420-470;
        batching the CFG Euler loop is nearly free on the MXU).

        ``seeds`` (one per request) keys each row's noise independently so a
        request's seed is honored regardless of what it was co-batched with;
        the draw additionally depends on the padded frame bucket, so byte
        reproducibility holds per bucket, not across bucket changes.

        Returns a list of SynthesisResult (metrics carry the batch totals).
        """
        n = len(texts)
        t0 = time.monotonic()
        if precomputed is not None:
            # per-request dicts like synthesize_fused's ``precomputed``
            token_lists = [p["tokens"] for p in precomputed]
            prompt_token_lists = [p["prompt_tokens"] for p in precomputed]
            feats = [p["prompt_feats"] for p in precomputed]
            rmss = [p["prompt_rms"] for p in precomputed]
        else:
            assert self.tokenizer is not None
            token_lists = self.tokenizer.texts_to_token_ids(list(texts))
            prompt_token_lists = self.tokenizer.texts_to_token_ids(
                list(prompt_texts)
            )
            feats = []
            rmss = []
            for wav, sr in zip(prompt_wavs, prompt_srs):
                f, r = self.prompt_features(wav, sr, target_rms)
                feats.append(f)
                rmss.append(r)

        cats = [list(p) + list(t) for p, t in zip(prompt_token_lists, token_lists)]
        prompt_lens = [f.shape[0] for f in feats]
        totals = [
            int(zv.predict_features_lens(
                np.array([pl]), np.array([max(len(pt), 1)]),
                np.array([len(t)]), speed=speed,
            )[0])
            for pl, pt, t in zip(prompt_lens, prompt_token_lists, token_lists)
        ]
        s_pad = round_up(max(len(c) for c in cats) + 1, self.token_bucket)
        t_pad = round_up(max(totals), self.frame_bucket)

        tokens_padded = np.full((n, s_pad), self.model_cfg.pad_id, np.int32)
        for i, c in enumerate(cats):
            tokens_padded[i, : len(c)] = c
        # pad each prompt row then stack once: n sequential .at[].set calls
        # each dispatched a full-(n, t_pad, F) copy over the tunnel
        pf = jnp.stack([
            jnp.pad(jnp.asarray(f, self.dtype),
                    ((0, t_pad - f.shape[0]), (0, 0)))
            for f in feats
        ])
        if seeds is None:
            noise = jax.random.normal(
                jax.random.PRNGKey(seed), (n, t_pad, self.sample_feat_dim),
                self.dtype,
            )
        else:
            assert len(seeds) == n
            noise = jax.vmap(
                lambda s: jax.random.normal(
                    jax.random.PRNGKey(s), (t_pad, self.sample_feat_dim),
                    self.dtype,
                )
            )(jnp.asarray([s & 0xFFFFFFFF for s in seeds], jnp.uint32))

        run = self._sample_fn(int(num_step), float(guidance_scale), float(t_shift))
        mel, gen_lens = run(
            self.params, jnp.asarray(tokens_padded),
            jnp.asarray([len(c) for c in cats], jnp.int32), pf,
            jnp.asarray(prompt_lens, jnp.int32),
            jnp.asarray(totals, jnp.int32), noise,
        )
        t1 = time.monotonic()

        pcm = self._vocode_i16_fn()(self.vocos_params, mel.astype(self.dtype))
        wavs = np.asarray(pcm).astype(np.float32) / 32767.0
        gen_lens_np = np.asarray(gen_lens)
        t2 = time.monotonic()

        results = []
        total_secs = 0.0
        for i in range(n):
            out_len = max(int(gen_lens_np[i]) - 1, 1) * self.vocos_cfg.hop_length
            w = wavs[i, :out_len]
            if rmss[i] < target_rms:
                w = w * (rmss[i] / target_rms)
            total_secs += len(w) / self.feat_cfg.sampling_rate
            results.append(SynthesisResult(
                wav=w,
                features=np.asarray(mel[i, : int(gen_lens_np[i])], np.float32),
                metrics={},
            ))
        metrics = {
            "t": t2 - t0, "t_no_vocoder": t1 - t0, "t_vocoder": t2 - t1,
            "wav_seconds": total_secs,
            "rtf": (t2 - t0) / max(total_secs, 1e-9),
        }
        for r in results:
            r.metrics.update(metrics)
        return results

    def synthesize_long(
        self,
        text: str,
        prompt_text: str,
        prompt_wav: np.ndarray,
        prompt_sr: int,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
        seed: int = 666,
        max_chunk_seconds: float = 20.0,
        carry_seconds: float = 4.0,
    ) -> SynthesisResult:
        """Long-form synthesis beyond the model's trained utterance cap
        (the reference trains on <=30 s and synthesizes one shot): the text
        splits into sentence chunks; each chunk is conditioned on the tail of
        the previously *generated mel* (no vocode/fbank round trip), keeping
        speaker identity and prosody continuous across chunks.
        """
        assert self.tokenizer is not None
        t0 = time.monotonic()
        chunks = self._long_form_plan(text, max_chunk_seconds)
        pf0, prompt_rms = self.prompt_features(prompt_wav, prompt_sr, target_rms)
        prompt_tokens = self.tokenizer.texts_to_token_ids([prompt_text])[0]
        carry_frames = int(carry_seconds * self.feat_cfg.frame_rate)

        mels = list(
            self._long_form_mels(
                chunks, prompt_tokens, pf0, num_step, guidance_scale, speed,
                t_shift, seed, carry_frames,
            )
        )
        full_mel = np.concatenate(mels, axis=0)
        t1 = time.monotonic()
        t_pad = round_up(full_mel.shape[0], self.frame_bucket)
        mel_padded = np.zeros((t_pad, full_mel.shape[1]), np.float32)
        mel_padded[: full_mel.shape[0]] = full_mel
        wav = self.vocode(mel_padded, full_mel.shape[0])
        if prompt_rms < target_rms:
            wav = wav * (prompt_rms / target_rms)
        t2 = time.monotonic()
        secs = wav.shape[-1] / self.feat_cfg.sampling_rate
        return SynthesisResult(
            wav=wav, features=full_mel,
            metrics={
                "t": t2 - t0, "t_no_vocoder": t1 - t0, "t_vocoder": t2 - t1,
                "wav_seconds": secs, "rtf": (t2 - t0) / max(secs, 1e-9),
                "chunks": len(chunks),
            },
        )

    # ------------------------------------------------------- long-form plumbing

    def _long_form_plan(self, text: str, max_chunk_seconds: float):
        """Sentence-split + greedy packing into chunks below the length cap
        (language-aware duration proxy: a CJK char is a full syllable
        ~0.30 s vs ~0.06 s per Latin char — a flat rate under-counted ZH
        4-6x and let chunks blow past the ~30 s training cap)."""
        import re as _re

        # Latin punctuation splits only when followed by whitespace (keeps
        # "3.14" together); CJK full-width punctuation splits regardless —
        # ZH text has no space after 。！？；, and requiring one meant a
        # 3-minute ZH input stayed ONE chunk, blowing past the length cap
        sentences = [
            s.strip()
            for s in _re.split(r"(?<=[.!?;])\s+|(?<=[。！？；])\s*", text)
            if s.strip()
        ] or [text]

        def _est_seconds(t: str) -> float:
            cjk = sum(1 for ch in t if "一" <= ch <= "鿿")
            return cjk * 0.30 + (len(t) - cjk) * 0.06

        chunks: list = []
        cur = ""
        for s in sentences:
            cand = (cur + " " + s).strip()
            if cur and _est_seconds(cand) > max_chunk_seconds:
                chunks.append(cur)
                cur = s
            else:
                cur = cand
        if cur:
            chunks.append(cur)
        return chunks

    def _long_form_mels(self, chunks, prompt_tokens, pf0, num_step,
                        guidance_scale, speed, t_shift, seed,
                        carry_frames: int):
        """Generator: per-chunk generated mel (model scale removed), each
        chunk conditioned on the previous chunk's trailing generated mel (no
        vocode/fbank round trip) + a proportional token tail, keeping
        speaker identity and prosody continuous across chunks."""
        cur_prompt_feats = pf0
        cur_prompt_tokens = prompt_tokens
        for ci, chunk in enumerate(chunks):
            tokens = self.tokenizer.texts_to_token_ids([chunk])[0]
            mel, gen_len = self.sample_features(
                tokens, cur_prompt_tokens, cur_prompt_feats,
                num_step=num_step, guidance_scale=guidance_scale,
                speed=speed, t_shift=t_shift, seed=seed + ci,
            )
            mel_np = np.asarray(mel[:gen_len], np.float32)
            # carry_frames=0 disables the cross-chunk carry: every chunk is
            # conditioned on the ORIGINAL prompt (duration prediction needs
            # a nonzero prompt to extrapolate a speaking rate, so "no
            # prompt at all" is not an option).  The old mel_np[-0:] slice
            # silently carried the ENTIRE previous chunk instead.
            if carry_frames > 0:
                tail = mel_np[-carry_frames:]
                cur_prompt_feats = jnp.asarray(
                    (tail + self.feat_cfg.feat_bias) * self.feat_cfg.feat_scale,
                    self.dtype,
                )
                frac = min(1.0, len(tail) / max(gen_len, 1))
                n_tok = max(1, int(len(tokens) * frac))
                cur_prompt_tokens = tokens[-n_tok:]
            yield mel_np

    def synthesize_stream(
        self,
        text: str,
        prompt_text: str,
        prompt_wav: np.ndarray,
        prompt_sr: int,
        num_step: int = 16,
        guidance_scale: float = 1.0,
        speed: float = 1.0,
        t_shift: float = 0.5,
        target_rms: float = 0.1,
        seed: int = 666,
        max_chunk_seconds: float = 20.0,
        carry_seconds: float = 4.0,
        context_frames: int = 32,
    ):
        """Streaming long-form synthesis: a generator yielding float32 wav
        segments as each text chunk finishes — first audio after ONE chunk
        instead of the whole text (beyond the reference, which is strictly
        batch).  Same chunking/prompt-carry as synthesize_long; each chunk
        is vocoded with `context_frames` of the previous chunk's mel as
        left context (covering the vocoder's ConvNeXt receptive field) and
        the corresponding samples trimmed, so chunk joins are seam-free.
        The concatenation of the yielded segments covers the same mel stream
        as synthesize_long sample-for-sample (total length identical); audio
        values differ from batch mode only within the vocoder receptive
        field of each join.
        """
        assert self.tokenizer is not None
        chunks = self._long_form_plan(text, max_chunk_seconds)
        pf0, prompt_rms = self.prompt_features(prompt_wav, prompt_sr, target_rms)
        prompt_tokens = self.tokenizer.texts_to_token_ids([prompt_text])[0]
        carry_frames = int(carry_seconds * self.feat_cfg.frame_rate)
        gain = prompt_rms / target_rms if prompt_rms < target_rms else 1.0
        hop = self.vocos_cfg.hop_length
        # >= 1 context frame is required for gapless joins: vocode() maps T
        # frames to (T-1)*hop samples, so a chunk's LAST frame is emitted by
        # the NEXT segment (whose trim starts one frame into the context)
        context_frames = max(1, int(context_frames))

        prev_tail = None  # (C, F) left context from the previous chunk
        for mel_np in self._long_form_mels(
            chunks, prompt_tokens, pf0, num_step, guidance_scale, speed,
            t_shift, seed, carry_frames,
        ):
            if prev_tail is None:
                ctx = 0
                mel_in = mel_np
            else:
                ctx = prev_tail.shape[0]
                mel_in = np.concatenate([prev_tail, mel_np], axis=0)
            t_pad = round_up(mel_in.shape[0], self.frame_bucket)
            mel_padded = np.zeros((t_pad, mel_in.shape[1]), np.float32)
            mel_padded[: mel_in.shape[0]] = mel_in
            wav = self.vocode(mel_padded, mel_in.shape[0])
            # drop the context samples except the last context frame's hop:
            # that hop carries the PREVIOUS chunk's final frame, which the
            # previous segment's (T-1)*hop trim did not emit — each segment
            # then starts exactly where the last one ended (no gap, no dup)
            yield wav[max(ctx - 1, 0) * hop:] * gain
            prev_tail = mel_np[-context_frames:]

    def vocode(self, mel, gen_len: int) -> np.ndarray:
        """Vocode a (T_bucket, F) mel whose frames >= gen_len are zero."""
        assert self.vocos_params is not None, "pipeline needs vocoder weights"
        pcm = self._vocode_i16_fn()(
            self.vocos_params, jnp.asarray(mel, self.dtype)[None]
        )
        wav = np.asarray(pcm[0]).astype(np.float32) / 32767.0
        out_len = max(gen_len - 1, 1) * self.vocos_cfg.hop_length
        return wav[:out_len]

    def vocode_stereo(self, mel, gen_len: int) -> np.ndarray:
        """Per-channel vocoding for the stereo model: (T, 2F) mel -> (2, L)
        wav (ref infer_zipvoice_dialog.py:482-490 vocode-left/right)."""
        assert self.vocos_params is not None, "pipeline needs vocoder weights"
        f = mel.shape[-1] // 2
        pair = jnp.stack(
            [jnp.asarray(mel[..., :f], self.dtype),
             jnp.asarray(mel[..., f:], self.dtype)], axis=0
        )
        pcm = self._vocode_i16_fn()(self.vocos_params, pair)
        wav = np.asarray(pcm).astype(np.float32) / 32767.0
        out_len = max(gen_len - 1, 1) * self.vocos_cfg.hop_length
        return wav[:, :out_len]
