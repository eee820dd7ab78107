"""Evaluation suite tests: metric math + the mel-parity harness end-to-end."""

import json

import numpy as np
import pytest

from tests.conftest import requires_reference

from zipvoice_tpu.eval.metrics import (
    corpus_wer,
    cosine_similarity,
    cp_wer,
    edit_distance,
    mel_mse,
    normalize_transcript,
    split_dialog_turns,
    wer,
)


def test_edit_distance_and_wer():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance([], [1, 2]) == 2
    w, errs, n = wer("hello world", "hello there world")
    assert (errs, n) == (1, 2) and abs(w - 0.5) < 1e-9
    assert wer("Hello, World!", "hello world")[0] == 0.0
    assert corpus_wer([("a b", "a b"), ("a b c d", "a x c d")]) == 1 / 6


def test_dialog_split_and_cpwer():
    turns = split_dialog_turns("[S1] hi there [S2] hello [S1] bye")
    assert turns["[S1]"] == "hi there bye"
    assert turns["[S2]"] == "hello"
    # perfect hypothesis with swapped speaker labels -> cpWER 0
    ref = "[S1] good morning [S2] how are you"
    hyp = "[S1] how are you [S2] good morning"
    assert cp_wer(ref, ref) == 0.0
    assert cp_wer(ref, hyp) == 0.0
    assert cp_wer(ref, "[S1] good evening [S2] how are you") > 0.0


def test_cosine_and_mel_mse():
    a = np.array([1.0, 0.0])
    assert abs(cosine_similarity(a, a) - 1.0) < 1e-9
    assert abs(cosine_similarity(a, np.array([0.0, 1.0]))) < 1e-9
    x = np.random.default_rng(0).standard_normal((10, 4))
    assert mel_mse(x, x) == 0.0
    assert mel_mse(x, x + 0.1) == pytest.approx(0.01, rel=1e-6)


@requires_reference
def test_parity_harness_end_to_end(reference_path, tmp_path):
    """The mel-MSE acceptance harness must PASS on a fresh tiny model."""
    import jax
    import torch

    from zipvoice_tpu.config import ZipVoiceConfig
    from zipvoice_tpu.eval.parity import run_parity
    from zipvoice_tpu.io.checkpoint import params_to_state_dict
    from zipvoice_tpu.models.zipvoice import init_zipvoice
    from zipvoice_tpu.text.tokenizer import write_token_file

    tiny = dict(
        fm_decoder_downsampling_factor=[1, 2, 1],
        fm_decoder_num_layers=[1, 1, 1],
        fm_decoder_cnn_module_kernel=[9, 7, 9],
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
        feat_dim=20,
    )
    token2id = {"_": 0}
    for i in range(1, 40):
        token2id[f"tk{i}"] = i
    write_token_file(token2id, str(tmp_path / "tokens.txt"))
    (tmp_path / "model.json").write_text(
        json.dumps({"model": tiny,
                    "feature": {"sampling_rate": 24000, "type": "vocos",
                                "n_mels": 20}})
    )
    cfg = ZipVoiceConfig(
        **{k: tuple(v) if isinstance(v, list) else v for k, v in tiny.items()},
        vocab_size=40, pad_id=0,
    )
    params = init_zipvoice(jax.random.PRNGKey(0), cfg)
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in params_to_state_dict(params).items()}
    torch.save({"model": sd}, tmp_path / "model.pt")

    mse = run_parity(str(tmp_path), str(reference_path), num_step=4,
                     seconds=1.5, prompt_seconds=0.5)
    assert mse < 1e-3, mse
