"""Dynamic-batching HTTP serving layer (serve/server.py + bin/serve.py)."""

import base64
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from zipvoice_tpu.audio.vocos import VocosConfig, init_vocos
from zipvoice_tpu.audio.wav import read_wav_bytes, wav_bytes
from zipvoice_tpu.io.model_dir import load_model_dir
from zipvoice_tpu.models.pipeline import ZipVoicePipeline
from zipvoice_tpu.serve.server import TTSServer

from test_pipeline import TINY, TOKENS_TXT  # reuse the tiny model fixture


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    d = tmp_path_factory.mktemp("serve_model")
    # tiny model dir (same construction as test_pipeline.model_dir)
    import torch

    from zipvoice_tpu.io.checkpoint import params_to_state_dict
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.text.tokenizer import write_token_file

    tokens = {t: i for i, t in enumerate(TOKENS_TXT)}
    write_token_file(tokens, str(d / "tokens.txt"))
    (d / "model.json").write_text(json.dumps({
        "model": {k: list(v) if isinstance(v, tuple) else v
                  for k, v in TINY.items()},
        "feature": {"sampling_rate": 24000, "type": "vocos", "n_mels": 20},
    }))
    cfg = ZipVoiceConfig(**TINY, vocab_size=len(tokens), pad_id=0)
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(params).items()}
    torch.save({"model": sd}, d / "model.pt")

    assets = load_model_dir(model_dir=str(d), model_name="zipvoice",
                            tokenizer_name="simple")
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    pipe = ZipVoicePipeline(
        params=assets.params, model_cfg=assets.model_cfg,
        feat_cfg=assets.feat_cfg,
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=assets.tokenizer, token_bucket=8, frame_bucket=32,
    )
    srv = TTSServer(pipe, port=0, max_batch=4, max_wait_ms=200.0,
                    num_step=2, guidance_scale=1.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield srv
    srv.shutdown()


def _request(port: int, text: str, accept_json: bool = False, seed: int = 7):
    rng = np.random.default_rng(0)
    prompt = (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32)
    payload = {
        "text": text, "prompt_text": "hi there",
        "prompt_wav_b64": base64.b64encode(wav_bytes(prompt, 24000)).decode(),
        "num_step": 2, "seed": seed,
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/synthesize",
        data=json.dumps(payload).encode(),
        headers={"Accept": "application/json"} if accept_json else {},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, resp.headers.get("Content-Type"), resp.read()


def test_healthz_and_single_request(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/healthz", timeout=30
    ) as resp:
        health = json.loads(resp.read())
    assert health["status"] == "ok"

    status, ctype, body = _request(server.port, "hello world")
    assert status == 200 and ctype == "audio/wav"
    wav, sr = read_wav_bytes(body)
    assert sr == 24000 and wav.shape[-1] > 0
    assert np.isfinite(wav).all()


def test_concurrent_requests_batch(server):
    """Concurrent requests drain into one batched program call."""
    before = dict(server.batcher.stats)
    results = [None] * 3
    threads = []

    def hit(i):
        results[i] = _request(server.port, f"hello world number {i}",
                              accept_json=True)

    for i in range(3):
        t = threading.Thread(target=hit, args=(i,))
        t.start()
        threads.append(t)
    for t in threads:
        t.join(timeout=300)
    for status, _, body in results:
        assert status == 200
        payload = json.loads(body)
        wav, sr = read_wav_bytes(base64.b64decode(payload["wav_b64"]))
        assert sr == 24000 and np.isfinite(wav).all()
    after = server.batcher.stats
    new_reqs = after["requests"] - before["requests"]
    new_batches = after["batches"] - before["batches"]
    assert new_reqs == 3
    # at least two of the three must have shared a batch
    assert new_batches < new_reqs

    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/stats", timeout=30
    ) as resp:
        stats = json.loads(resp.read())
    assert stats["requests"] >= 3 and stats["errors"] == 0
    assert stats["audio_seconds"] > 0


def test_bad_request(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/synthesize",
        data=b"{\"text\": \"no prompt\"}", method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_long_form_request(server):
    """long_form=true routes through chunked synthesis."""
    rng = np.random.default_rng(0)
    prompt = (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32)
    payload = {
        "text": "the quick brown fox jumps over the lazy dog " * 3,
        "prompt_text": "hi there",
        "prompt_wav_b64": base64.b64encode(wav_bytes(prompt, 24000)).decode(),
        "num_step": 2, "long_form": True,
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/synthesize",
        data=json.dumps(payload).encode(), method="POST",
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        body = resp.read()
    wav, sr = read_wav_bytes(body)
    assert sr == 24000 and wav.shape[-1] > 0 and np.isfinite(wav).all()


def test_custom_sampling_rejected_when_pinned(server):
    """strict sampling: non-default num_step gets a 400, not a compile."""
    rng = np.random.default_rng(0)
    prompt = (rng.standard_normal((1, 8000)) * 0.05).astype(np.float32)
    payload = {
        "text": "hello", "prompt_text": "hi",
        "prompt_wav_b64": base64.b64encode(wav_bytes(prompt, 24000)).decode(),
        "num_step": 13,
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/synthesize",
        data=json.dumps(payload).encode(), method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=60)
    assert e.value.code == 400


def test_variant_serving_defaults_match_reference():
    """Per-variant sampling defaults the serving/infer CLIs resolve when
    --num-step/--guidance-scale are omitted (ref infer_zipvoice.py:479-488:
    zipvoice 16/1.0, distill 8/3.0; infer_zipvoice_dialog.py:139-144:
    dialog 16/1.5)."""
    from zipvoice_tpu.io.model_dir import MODEL_REGISTRY

    expect = {
        "zipvoice": (16, 1.0, 0.5, False),
        "zipvoice_distill": (8, 3.0, 0.5, True),
        "zipvoice_dialog": (16, 1.5, 0.5, False),
        "zipvoice_dialog_stereo": (16, 1.5, 0.5, False),
    }
    for name, (steps, gs, t_shift, distill) in expect.items():
        reg = MODEL_REGISTRY[name]
        assert reg["num_step"] == steps, name
        assert reg["guidance_scale"] == gs, name
        assert reg["t_shift"] == t_shift, name
        assert reg["distill"] == distill, name


def test_streaming_endpoint(server):
    """POST /synthesize_stream returns chunked-transfer streaming WAV whose
    PCM body decodes to finite audio; the header is the unknown-length
    streaming variant (sizes 0xFFFFFFFF)."""
    import struct

    rng = np.random.default_rng(3)
    prompt = (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32)
    payload = {
        "text": "hello world. good morning. see you later.",
        "prompt_text": "hi there",
        "prompt_wav_b64": base64.b64encode(wav_bytes(prompt, 24000)).decode(),
        "num_step": 2, "seed": 5,
    }
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/synthesize_stream",
        data=json.dumps(payload).encode(), method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        assert resp.status == 200
        assert resp.headers.get("Content-Type") == "audio/wav"
        body = resp.read()  # urllib de-chunks transfer encoding
    assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
    assert struct.unpack("<I", body[4:8])[0] == 0xFFFFFFFF
    pcm = np.frombuffer(body[44:], dtype="<i2").astype(np.float32) / 32768.0
    assert pcm.size > 0 and np.isfinite(pcm).all()


def test_synthesize_stream_matches_long():
    """Pipeline-level: the concatenated streamed segments track
    synthesize_long's output (same mel stream; vocoder chunk boundaries
    differ only within the receptive-field context)."""
    import jax

    import torch  # noqa: F401 — fixture parity with the other tests

    from zipvoice_tpu.audio.vocos import init_vocos
    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.models.pipeline import ZipVoicePipeline
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.text.tokenizer import SimpleTokenizer, write_token_file

    cfg = ZipVoiceConfig(**TINY, vocab_size=len(TOKENS_TXT), pad_id=0)
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        tokens = {t: i for i, t in enumerate(TOKENS_TXT)}
        tok_file = f"{td}/tokens.txt"
        write_token_file(tokens, tok_file)
        tokenizer = SimpleTokenizer(tok_file)
    vcfg = VocosConfig(input_channels=20, dim=32, intermediate_dim=64,
                       num_layers=2, n_fft=64, hop_length=16)
    from zipvoice_tpu.config import FeatureConfig

    pipe = ZipVoicePipeline(
        params=params, model_cfg=cfg, feat_cfg=FeatureConfig(n_mels=20),
        vocos_params=init_vocos(jax.random.PRNGKey(1), vcfg), vocos_cfg=vcfg,
        tokenizer=tokenizer, token_bucket=8, frame_bucket=32,
    )
    rng = np.random.default_rng(0)
    prompt = (rng.standard_normal((1, 24000)) * 0.05).astype(np.float32)
    kwargs = dict(
        text="hello there. how are you. fine thanks. good bye now.",
        prompt_text="hi", prompt_wav=prompt, prompt_sr=24000,
        num_step=2, max_chunk_seconds=1.0, seed=4,
    )
    segs = list(pipe.synthesize_stream(**kwargs))
    assert len(segs) >= 2, "expected multiple streamed chunks"
    streamed = np.concatenate(segs)
    res = pipe.synthesize_long(**kwargs)
    # EXACT total length: the streamed segments tile the same mel stream
    # with no per-seam sample loss or duplication
    assert len(streamed) == len(res.wav), (len(streamed), len(res.wav))
    # values match batch mode except within the vocoder receptive field of
    # each join (batch vocodes the full mel in one pass); verify the bulk
    # INCLUDING audio well past the first join
    margin = 16 * vcfg.hop_length
    close = np.isclose(streamed, res.wav, atol=1e-3)
    n_joins = len(segs) - 1
    assert (~close).sum() <= (2 * margin + 1) * (n_joins + 1), (
        f"{(~close).sum()} samples differ — more than receptive-field "
        f"neighborhoods of {n_joins} joins"
    )
    # audio AFTER the last join matches exactly (same left context depth)
    tail_start = len(streamed) - len(segs[-1]) + margin
    np.testing.assert_allclose(streamed[tail_start:], res.wav[tail_start:],
                               atol=1e-3)
    assert np.isfinite(streamed).all()
