"""TPU-native data pipeline: TSV manifests -> duration-bucketed batches with
on-device fbank extraction.

Replaces the reference's lhotse stack (CutSet manifests, LilcomChunkyWriter
feature shards, DynamicBucketingSampler — ref zipvoice/dataset/datamodule.py,
bin/compute_fbank.py): there is no offline feature precompute; audio is
loaded host-side, padded to a bucket, and the log-mel fbank runs inside the
jitted input program on device (the k2/lhotse CPU pipeline has no TPU role).

Manifest format (the reference's TSV contract, ref egs run_finetune.sh):
``id\\ttext\\twav_path`` or ``id\\ttext\\twav_path\\tstart\\tend``
(start/end in seconds within the wav); a trailing tokens column may follow
(bin/prepare_tokens).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Sequence

from zipvoice_tpu.utils.memo import instance_cache

import numpy as np


@dataclasses.dataclass
class Utterance:
    uid: str
    text: str
    wav_path: str
    start: float = 0.0
    duration: Optional[float] = None  # seconds; probed lazily if None
    tokens: Optional[List[int]] = None
    token_strs: Optional[List[str]] = None  # offline tokenization (strings)
    sample_rate: Optional[int] = None  # cached by probe_duration
    num_samples: Optional[int] = None


def read_tsv_manifest(path) -> List[Utterance]:
    utts = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            items = line.rstrip("\r\n").split("\t")
            if len(items) == 3:
                uid, text, wav = items
                utts.append(Utterance(uid, text, wav))
            elif len(items) == 5:
                # 5-col = id, text, wav, start, END (the reference's TSV
                # contract, ref egs/zipvoice/run_finetune.sh)
                uid, text, wav, start, end = items
                utts.append(Utterance(uid, text, wav, float(start),
                                      float(end) - float(start)))
            elif len(items) == 4:
                # bin/prepare_tokens output: trailing column = offline tokens
                uid, text, wav, toks = items
                utts.append(Utterance(uid, text, wav,
                                      token_strs=toks.split(" ")))
            elif len(items) == 6:
                uid, text, wav, start, end, toks = items
                utts.append(Utterance(uid, text, wav, float(start),
                                      float(end) - float(start),
                                      token_strs=toks.split(" ")))
            elif items and items[0]:
                raise ValueError(
                    f"manifest line needs 3-6 columns: {items}"
                )
    return utts


def probe_duration(utt: Utterance) -> float:
    if utt.duration is None:
        from zipvoice_tpu.audio.wav import probe_wav

        utt.sample_rate, utt.num_samples, _ = probe_wav(utt.wav_path)
        utt.duration = utt.num_samples / utt.sample_rate
    return utt.duration


class DurationBucketSampler:
    """Duration-bucketed batching (DynamicBucketingSampler equivalent,
    ref datamodule.py:179-187): sorts a shuffled window by duration, emits
    batches capped at `max_duration` seconds, reshuffles per epoch, shards
    across hosts, and exposes resume state (epoch, batch cursor) like the
    reference's sampler state in checkpoints (ref checkpoint.py:92)."""

    def __init__(
        self,
        utterances: Sequence[Utterance],
        max_duration: float = 200.0,
        max_len: float = 30.0,
        min_len: float = 1.0,
        seed: int = 42,
        shuffle: bool = True,
        num_buckets: int = 30,
        process_index: int = 0,
        process_count: int = 1,
        drop_last: bool = False,
    ):
        utterances = list(utterances)
        unprobed = [u for u in utterances if u.duration is None]
        if len(unprobed) > 32:
            # header-only probes are tiny reads; a serial loop over a large
            # duration-less manifest costs minutes of startup per process
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=16) as pool:
                list(pool.map(probe_duration, unprobed))
        self.utts = [
            u for u in utterances if min_len <= probe_duration(u) <= max_len
        ]
        self.max_duration = max_duration
        self.seed = seed
        self.shuffle = shuffle
        self.num_buckets = num_buckets
        self.process_index = process_index
        self.process_count = process_count
        self.drop_last = drop_last
        self.epoch = 0
        self.batch_cursor = 0  # batches already consumed this epoch
        self._batches_cache = None  # (epoch, batches) memo

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        self.batch_cursor = 0

    def state_dict(self) -> Dict:
        return {"epoch": self.epoch, "batch_cursor": self.batch_cursor}

    def load_state_dict(self, state: Dict):
        self.epoch = state["epoch"]
        self.batch_cursor = state["batch_cursor"]

    def _epoch_batches(self) -> List[List[Utterance]]:
        # memoized per epoch: __len__, pessimistic_batches and __iter__ all
        # need the same plan; recomputing the shuffle+sort per call is O(n
        # log n) wasted work on large manifests
        if self._batches_cache is not None and self._batches_cache[0] == self.epoch:
            return self._batches_cache[1]
        order = np.arange(len(self.utts))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(order)
        # bucket by duration within shuffled windows: sort each window of
        # num_buckets*capacity items so batches are duration-homogeneous but
        # epoch order stays random
        window = max(1, len(order) // self.num_buckets)
        batches: List[List[Utterance]] = []
        for w0 in range(0, len(order), window):
            idx = sorted(
                order[w0 : w0 + window], key=lambda i: self.utts[i].duration
            )
            cur: List[Utterance] = []
            cur_dur = 0.0
            for i in idx:
                u = self.utts[i]
                if cur and cur_dur + u.duration > self.max_duration:
                    batches.append(cur)
                    cur, cur_dur = [], 0.0
                cur.append(u)
                cur_dur += u.duration
            if cur and not self.drop_last:
                batches.append(cur)
        if self.shuffle:
            rng = np.random.default_rng(self.seed * 7919 + self.epoch)
            rng.shuffle(batches)
        # per-host shard; truncate to an equal count per host — a host
        # with one extra batch would issue collectives the others never
        # join (end-of-epoch deadlock in multi-host SPMD)
        usable = len(batches) - len(batches) % self.process_count
        shard = batches[self.process_index:usable:self.process_count]
        self._batches_cache = (self.epoch, shard)
        return shard

    def pessimistic_batches(self, n: int = 1) -> List[List[Utterance]]:
        """The n largest batches (by total audio seconds) of the current
        epoch — the OOM-scan candidates (ref lhotse find_pessimistic_batches,
        used by train_zipvoice.py:808-858).  Does not advance the cursor."""
        return sorted(
            self._epoch_batches(),
            key=lambda b: sum(u.duration for u in b), reverse=True,
        )[:n]

    def __iter__(self) -> Iterator[List[Utterance]]:
        batches = self._epoch_batches()
        for i in range(self.batch_cursor, len(batches)):
            self.batch_cursor = i + 1
            yield batches[i]

    def __len__(self) -> int:
        return len(self._epoch_batches())


from zipvoice_tpu.utils.shapes import round_up  # noqa: F401 — shared helper



def _ensure_tokens(tokenizer, utts: List[Utterance]) -> None:
    """Fill u.tokens: offline token strings are a dict lookup (the G2P ran
    at prepare_tokens time); anything left runs the tokenizer."""
    for u in utts:
        if u.tokens is None and u.token_strs is not None:
            u.tokens = tokenizer.tokens_to_token_ids([u.token_strs])[0]
    if any(u.tokens is None for u in utts):
        token_lists = tokenizer.texts_to_token_ids([u.text for u in utts])
        for u, toks in zip(utts, token_lists):
            u.tokens = toks


def _pad_token_batch(utts: List[Utterance], pad_id: int, token_bucket: int,
                     b_pad: int, num_frames: List[int]):
    """Shared token/length padding for both collators."""
    from zipvoice_tpu.models.zipvoice import pad_labels

    tokens = pad_labels([u.tokens for u in utts], pad_id)
    s_pad = round_up(tokens.shape[1], token_bucket)
    tokens_padded = np.full((b_pad, s_pad), pad_id, np.int32)
    tokens_padded[: len(utts), : tokens.shape[1]] = tokens
    features_lens = np.zeros((b_pad,), np.int32)
    features_lens[: len(utts)] = num_frames
    tokens_lens = np.zeros((b_pad,), np.int32)
    tokens_lens[: len(utts)] = [len(u.tokens) for u in utts]
    return tokens_padded, tokens_lens, features_lens


class OnDeviceFbankCollator:
    """Collate utterances into a device batch: tokens padded host-side, audio
    padded to a sample bucket, fbank computed on device in one jitted call,
    features scaled to model space ((x + bias) * scale, ref common.py:238)."""

    def __init__(
        self,
        tokenizer,
        feat_cfg,
        pad_id: int = 0,
        frame_bucket: int = 64,
        token_bucket: int = 16,
        batch_bucket: int = 8,
        three_channel: bool = False,
    ):
        self.tokenizer = tokenizer
        self.feat_cfg = feat_cfg
        self.pad_id = pad_id
        self.frame_bucket = frame_bucket
        self.token_bucket = token_bucket
        self.batch_bucket = batch_bucket
        # stereo recipe: features = [ch0 mel, ch1 mel, mixed mel] (3F), the
        # trainer slices [:2F] or [2F:] per batch
        # (ref train_zipvoice_dialog_stereo.py:355-358)
        self.three_channel = three_channel

    @instance_cache(maxsize=64)
    def _fbank_fn(self, num_samples: int):
        import jax
        import jax.numpy as jnp

        from zipvoice_tpu.audio.mel import bigvgan_log_mel, vocos_log_mel

        fcfg = self.feat_cfg

        three_channel = self.three_channel

        # fused Pallas mel kernel when eligible (vocos semantics, TPU,
        # tile-aligned frame count); XLA composition otherwise
        use_fused = (
            not three_channel
            and fcfg.type == "vocos"
            and jax.default_backend() in ("tpu", "axon")
        )

        @jax.jit
        def run(wav):  # (B, L) or (B, 2, L) when three_channel
            fn = vocos_log_mel if fcfg.type == "vocos" else bigvgan_log_mel
            if three_channel:
                mel2 = fn(wav, fcfg)  # (B, 2, T, M)
                mixed = fn(jnp.mean(wav, axis=1), fcfg)  # (B, T, M)
                b, _, t, m = mel2.shape
                mel = jnp.concatenate(
                    [mel2[:, 0], mel2[:, 1], mixed], axis=-1
                )  # (B, T, 3M)
            elif use_fused:
                from zipvoice_tpu.ops.melspec import TILE, fused_log_mel

                n_fft, hop = fcfg.n_fft, fcfg.hop_length
                frames = wav.shape[-1] // hop
                f_pad = ((frames + TILE - 1) // TILE) * TILE
                need = (f_pad - 1) * hop + n_fft
                wc = jnp.pad(
                    wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect"
                )
                if wc.shape[-1] < need:
                    wc = jnp.pad(wc, ((0, 0), (0, need - wc.shape[-1])))
                mel = fused_log_mel(
                    wc[:, :need], fcfg.sampling_rate, n_fft, hop, fcfg.n_mels
                )[:, :frames]
            else:
                mel = fn(wav, fcfg)
            return (mel + fcfg.feat_bias) * fcfg.feat_scale

        return run

    def load_audio(self, utt: Utterance) -> np.ndarray:
        from zipvoice_tpu.audio.wav import read_wav, resample

        wav, sr = read_wav(utt.wav_path)
        if self.three_channel:
            assert wav.shape[0] == 2, f"{utt.wav_path}: stereo wav required"
        elif wav.shape[0] > 1:
            wav = wav.mean(axis=0, keepdims=True)
        if utt.start or (utt.duration is not None and utt.num_samples is None):
            # manifest segment rows (duration set WITHOUT a probe-derived
            # num_samples): crop with rounding — int() truncation shaved
            # the final sample for most durations (e.g. 4.145 s @ 24 kHz ->
            # 99479 of 99480).  Probe-derived full-file durations skip the
            # crop entirely.
            a = int(round(utt.start * sr))
            b = a + int(round(utt.duration * sr))
            wav = wav[:, a:b]
        if sr != self.feat_cfg.sampling_rate:
            wav = resample(wav, sr, self.feat_cfg.sampling_rate)
        return wav if self.three_channel else wav[0]

    def _load_batch_audio(self, utts: List[Utterance]) -> List[np.ndarray]:
        """Load a batch's audio: native thread-pooled decode+resample when
        the C++ IO runtime is available (ops/native.py), else per-file numpy."""
        sr_t = self.feat_cfg.sampling_rate

        def full_file(u: Utterance) -> bool:
            # the native loader always reads the WHOLE file: manifest
            # segment rows (duration set without probe-derived num_samples)
            # must take the cropping python path
            return u.start == 0.0 and (
                u.duration is None or u.num_samples is not None
            )

        can_native = (
            not self.three_channel and all(full_file(u) for u in utts)
        )
        if can_native:
            try:
                from zipvoice_tpu.ops import native

                if native.available():
                    for u in utts:
                        if u.sample_rate is None:
                            probe_duration(u)
                    exp = [
                        -(-u.num_samples * sr_t // u.sample_rate)
                        for u in utts
                    ]
                    audio, lens = native.batch_load_wav(
                        [u.wav_path for u in utts], sr_t, int(max(exp))
                    )
                    return [audio[i, : lens[i]] for i in range(len(utts))]
            except Exception as ex:  # noqa: BLE001 — numpy fallback, LOUDLY
                import logging

                logging.warning(
                    "native IO batch load failed (%s: %s); numpy fallback",
                    type(ex).__name__, ex,
                )
        return [self.load_audio(u) for u in utts]

    def __call__(self, utts: List[Utterance]) -> Dict[str, np.ndarray]:
        import jax.numpy as jnp

        from zipvoice_tpu.audio.mel import compute_num_frames

        hop = self.feat_cfg.hop_length
        _ensure_tokens(self.tokenizer, utts)

        wavs = self._load_batch_audio(utts)
        num_frames = [compute_num_frames(w.shape[-1], hop) for w in wavs]
        t_pad = round_up(max(num_frames), self.frame_bucket)
        l_pad = t_pad * hop
        b_pad = round_up(len(utts), self.batch_bucket)

        if self.three_channel:
            audio = np.zeros((b_pad, 2, l_pad), np.float32)
            for i, w in enumerate(wavs):
                audio[i, :, : w.shape[-1]] = w[:, :l_pad]
        else:
            audio = np.zeros((b_pad, l_pad), np.float32)
            for i, w in enumerate(wavs):
                audio[i, : len(w)] = w[:l_pad]

        feats = np.asarray(self._fbank_fn(l_pad)(jnp.asarray(audio)))
        feats = feats[:, :t_pad]

        tokens_padded, tokens_lens, features_lens = _pad_token_batch(
            utts, self.pad_id, self.token_bucket, b_pad, num_frames
        )

        return {
            "tokens": tokens_padded,
            "tokens_lens": tokens_lens,
            "features": feats,
            "features_lens": features_lens,
        }


class PrecomputedFeatureCollator:
    """Collate from offline fbank shards written by bin/compute_fbank.py
    (npz shards + index TSV), the LilcomChunkyWriter-reader equivalent
    (ref dataset/dataset.py:62-97 precomputed-input path)."""

    def __init__(self, tokenizer, index_tsv: str, feats_dir: str,
                 feat_scale: float = 0.1, feat_bias: float = 0.0,
                 pad_id: int = 0, frame_bucket: int = 64,
                 token_bucket: int = 16, batch_bucket: int = 8):
        self.tokenizer = tokenizer
        self.feat_scale = feat_scale
        self.feat_bias = feat_bias
        self.pad_id = pad_id
        self.frame_bucket = frame_bucket
        self.token_bucket = token_bucket
        self.batch_bucket = batch_bucket
        self.feats_dir = Path(feats_dir)
        self.index: Dict[str, str] = {}
        with open(index_tsv, encoding="utf-8") as f:
            for line in f:
                items = line.rstrip("\r\n").split("\t")
                if len(items) >= 4:
                    self.index[items[0]] = items[3]
        from collections import OrderedDict

        self._shard_cache: "OrderedDict[str, object]" = OrderedDict()

    def _features(self, uid: str) -> np.ndarray:
        shard_name = self.index[uid]
        cache = self._shard_cache
        if shard_name in cache:
            cache.move_to_end(shard_name)
        else:
            if len(cache) > 4:
                # evict ONE cold shard and close its file handle (clear()
                # thrashed every hot shard and leaked NpzFile descriptors)
                _, old = cache.popitem(last=False)
                try:
                    old.close()
                except Exception:  # noqa: BLE001
                    pass
            cache[shard_name] = np.load(self.feats_dir / shard_name)
        return cache[shard_name][uid].astype(np.float32)

    def __call__(self, utts: List[Utterance]) -> Dict[str, np.ndarray]:
        _ensure_tokens(self.tokenizer, utts)
        feats = [self._features(u.uid) for u in utts]
        num_frames = [f.shape[0] for f in feats]
        t_pad = round_up(max(num_frames), self.frame_bucket)
        b_pad = round_up(len(utts), self.batch_bucket)
        fdim = feats[0].shape[1]
        out = np.zeros((b_pad, t_pad, fdim), np.float32)
        for i, f in enumerate(feats):
            out[i, : f.shape[0]] = (f + self.feat_bias) * self.feat_scale

        tokens_padded, tokens_lens, features_lens = _pad_token_batch(
            utts, self.pad_id, self.token_bucket, b_pad, num_frames
        )
        return {
            "tokens": tokens_padded,
            "tokens_lens": tokens_lens,
            "features": out,
            "features_lens": features_lens,
        }
