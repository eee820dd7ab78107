"""Structure/parity tests for the vendored eval scorer architectures
(UTMOS22-strong, ECAPA-TDNN-on-WavLM) — fully offline: random weights,
key-set and forward parity against the reference definitions."""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _import_reference_utmos(reference_path):
    # the reference module imports torchaudio but never uses it at module
    # scope beyond the import — stub it (with a real __spec__ so
    # transformers' availability probes don't choke on the stub)
    if "torchaudio" not in sys.modules:
        import importlib.machinery

        stub = types.ModuleType("torchaudio")
        stub.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
        sys.modules["torchaudio"] = stub
    sys.path.insert(0, str(reference_path))
    from zipvoice.eval.models.utmos import UTMOS22Strong

    return UTMOS22Strong


def test_utmos_state_dict_and_forward_parity(reference_path):
    """Our UTMOS22Strong has the exact checkpoint tree of the reference's
    vendored definition and computes the same scores."""
    RefUTMOS = _import_reference_utmos(reference_path)
    from zipvoice_tpu.eval.models.utmos import UTMOS22Strong

    ref = RefUTMOS()
    mine = UTMOS22Strong()
    rk = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    mk = {k: tuple(v.shape) for k, v in mine.state_dict().items()}
    assert rk == mk  # identical key set AND shapes

    torch.manual_seed(0)
    sd = ref.state_dict()
    for k in sd:
        if sd[k].dtype.is_floating_point:
            sd[k] = torch.randn_like(sd[k]) * 0.05
    ref.load_state_dict(sd)
    mine.load_state_dict(sd)
    ref.eval(), mine.eval()
    wave = torch.randn(2, 16000)
    with torch.no_grad():
        a = ref(wave, 16000)
        b = mine(wave, 16000)
    np.testing.assert_allclose(a.numpy(), b.numpy(), atol=2e-5)
    # scores land on the MOS scale mapping (mean*2+3)
    assert a.shape == (2,)


def _ref_ecapa_head(reference_path):
    """Assemble the reference's head submodules (importable without s3prl)
    under the same attribute names ECAPA_TDNN_WAVLM uses."""
    sys.path.insert(0, str(reference_path))
    from zipvoice.eval.models.ecapa_tdnn_wavlm import (
        AttentiveStatsPool,
        Conv1dReluBn,
        SE_Res2Block,
    )

    class Head(torch.nn.Module):
        def __init__(self, feat_dim=32, channels=16, emb_dim=8):
            super().__init__()
            self.feature_weight = torch.nn.Parameter(torch.zeros(25))
            self.instance_norm = torch.nn.InstanceNorm1d(feat_dim)
            self.layer1 = Conv1dReluBn(feat_dim, channels, kernel_size=5,
                                       padding=2)
            self.layer2 = SE_Res2Block(channels, channels, 3, 1, 2, 2, 8, 4)
            self.layer3 = SE_Res2Block(channels, channels, 3, 1, 3, 3, 8, 4)
            self.layer4 = SE_Res2Block(channels, channels, 3, 1, 4, 4, 8, 4)
            self.conv = torch.nn.Conv1d(channels * 3, 48, 1)
            self.pooling = AttentiveStatsPool(48, attention_channels=4)
            self.bn = torch.nn.BatchNorm1d(96)
            self.linear = torch.nn.Linear(96, emb_dim)

        def forward(self, x):
            import torch.nn.functional as F

            x = self.instance_norm(x)
            o1 = self.layer1(x)
            o2 = self.layer2(o1)
            o3 = self.layer3(o2)
            o4 = self.layer4(o3)
            out = torch.cat([o2, o3, o4], dim=1)
            return self.linear(self.bn(self.pooling(F.relu(self.conv(out)))))

    return Head()


class _TinyHeadMine(torch.nn.Module):
    """Our head blocks assembled at the same tiny dims (bypassing the SSL)."""

    def __init__(self, feat_dim=32, channels=16, emb_dim=8):
        super().__init__()
        from zipvoice_tpu.eval.models.ecapa_tdnn_wavlm import (
            _AttentiveStatsPool,
            _ConvReluBn,
            _SERes2Block,
        )

        self.feature_weight = torch.nn.Parameter(torch.zeros(25))
        self.instance_norm = torch.nn.InstanceNorm1d(feat_dim)
        self.layer1 = _ConvReluBn(feat_dim, channels, k=5, padding=2)
        self.layer2 = _SERes2Block(channels, 3, padding=2, dilation=2,
                                   se_bottleneck=4)
        self.layer3 = _SERes2Block(channels, 3, padding=3, dilation=3,
                                   se_bottleneck=4)
        self.layer4 = _SERes2Block(channels, 3, padding=4, dilation=4,
                                   se_bottleneck=4)
        self.conv = torch.nn.Conv1d(channels * 3, 48, 1)
        from zipvoice_tpu.eval.models.ecapa_tdnn_wavlm import (
            _AttentiveStatsPool as _ASP,
        )

        self.pooling = _ASP(48, attention_channels=4)
        self.bn = torch.nn.BatchNorm1d(96)
        self.linear = torch.nn.Linear(96, emb_dim)

    def forward(self, x):
        import torch.nn.functional as F

        x = self.instance_norm(x)
        o1 = self.layer1(x)
        o2 = self.layer2(o1)
        o3 = self.layer3(o2)
        o4 = self.layer4(o3)
        out = torch.cat([o2, o3, o4], dim=1)
        return self.linear(self.bn(self.pooling(F.relu(self.conv(out)))))


def test_ecapa_head_state_dict_and_forward_parity(reference_path):
    """Head parameter tree and forward math match the reference blocks —
    i.e. `wavlm_large_finetune.pth` head tensors will load name-for-name."""
    ref = _ref_ecapa_head(reference_path)
    mine = _TinyHeadMine()
    rk = {k: tuple(v.shape) for k, v in ref.state_dict().items()}
    mk = {k: tuple(v.shape) for k, v in mine.state_dict().items()}
    assert rk == mk

    torch.manual_seed(1)
    sd = ref.state_dict()
    for k in sd:
        if not sd[k].dtype.is_floating_point:
            continue
        if "running_var" in k:
            # eval-mode BatchNorm sqrt's these — random negatives would
            # turn both outputs into NaN and make the comparison vacuous
            sd[k] = torch.rand_like(sd[k]) * 0.5 + 0.5
        else:
            sd[k] = torch.randn_like(sd[k]) * 0.1
    ref.load_state_dict(sd)
    mine.load_state_dict(sd)
    ref.eval(), mine.eval()
    x = torch.randn(2, 32, 50)
    with torch.no_grad():
        out_ref = ref(x).numpy()
        out_mine = mine(x).numpy()
    assert np.isfinite(out_ref).all(), "reference output must be finite"
    np.testing.assert_allclose(out_ref, out_mine, atol=1e-5)


def test_full_ecapa_instantiates_with_tiny_ssl():
    """ECAPA_TDNN_WavLM runs end-to-end (wave -> embedding) with a tiny HF
    WavLM trunk; the full head tree is present."""
    from transformers import WavLMConfig, WavLMModel

    from zipvoice_tpu.eval.models.ecapa_tdnn_wavlm import ECAPA_TDNN_WavLM

    ssl = WavLMModel(WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[8] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        feat_extract_norm="layer", do_stable_layer_norm=True, conv_bias=True,
        num_buckets=16, max_bucket_distance=40,
    ))
    model = ECAPA_TDNN_WavLM(feat_dim=32, channels=16, emb_dim=8, ssl=ssl)
    model.eval()
    wave = torch.randn(2, 8000)
    with torch.no_grad():
        emb = model(wave)
    assert emb.shape == (2, 8)
    assert torch.isfinite(emb).all()
    # the head keys the finetune checkpoint must hit
    keys = set(model.state_dict().keys())
    for k in ["feature_weight", "layer1.conv.weight",
              "layer2.Res2Conv1dReluBn.convs.0.weight",
              "layer3.SE_Connect.linear1.weight", "layer4.Conv1dReluBn2.bn.weight",
              "conv.weight", "pooling.linear1.weight", "bn.running_mean",
              "linear.weight"]:
        assert k in keys, k


def test_wavlm_fairseq_converter_covers_hf_tree():
    """Every representative fairseq-style WavLM key converts to a real key of
    the HF module (layer-norm extractor, stable-LN encoder = the Large
    geometry)."""
    from transformers import WavLMConfig, WavLMModel

    from zipvoice_tpu.eval.models.ecapa_tdnn_wavlm import (
        convert_wavlm_fairseq_to_hf,
    )

    hf = WavLMModel(WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, conv_dim=[8] * 7,
        conv_kernel=[10, 3, 3, 3, 3, 2, 2], conv_stride=[5, 2, 2, 2, 2, 2, 2],
        feat_extract_norm="layer", do_stable_layer_norm=True, conv_bias=True,
        num_buckets=16, max_bucket_distance=40,
    ))
    hf_keys = set(hf.state_dict().keys())

    fairseq_keys = [
        "mask_emb",
        "post_extract_proj.weight", "post_extract_proj.bias",
        "layer_norm.weight", "layer_norm.bias",
        "feature_extractor.conv_layers.0.0.weight",
        "feature_extractor.conv_layers.0.0.bias",
        "feature_extractor.conv_layers.0.2.1.weight",
        "feature_extractor.conv_layers.0.2.1.bias",
        "feature_extractor.conv_layers.3.0.weight",
        "feature_extractor.conv_layers.3.2.1.weight",
        "encoder.pos_conv.0.bias",
        "encoder.pos_conv.0.weight_g",
        "encoder.pos_conv.0.weight_v",
        "encoder.layer_norm.weight",
        "encoder.layers.0.self_attn.k_proj.weight",
        "encoder.layers.0.self_attn.q_proj.bias",
        "encoder.layers.0.self_attn.v_proj.weight",
        "encoder.layers.0.self_attn.out_proj.weight",
        "encoder.layers.0.self_attn.grep_linear.weight",
        "encoder.layers.0.self_attn.grep_a",
        "encoder.layers.0.self_attn.relative_attention_bias.weight",
        "encoder.layers.1.self_attn_layer_norm.weight",
        "encoder.layers.1.fc1.weight",
        "encoder.layers.1.fc2.bias",
        "encoder.layers.1.final_layer_norm.weight",
    ]
    fake = {k: torch.zeros(1) for k in fairseq_keys}
    converted = convert_wavlm_fairseq_to_hf(fake)
    assert len(converted) == len(fairseq_keys)  # nothing dropped
    for src, dst in zip(fairseq_keys, converted):
        assert dst in hf_keys, f"{src} -> {dst} not an HF key"
    # pre-training-only tensors are dropped silently
    dropped = convert_wavlm_fairseq_to_hf({"quantizer.vars": torch.zeros(1)})
    assert dropped == {}


def test_hf_hidden_states_match_s3prl_hooks():
    """Extraction-convention parity (VERDICT r2 weak #3 / next-round #4):
    HF ``output_hidden_states`` for a stable-layer-norm WavLM must equal
    (a) states captured by forward hooks placed exactly where s3prl places
    them, and (b) a hand-coded fairseq-style extract_features loop driving
    the same submodules (pos-conv add, no initial LN, per-layer input
    capture, final LN applied after the loop only)."""
    import torch
    from transformers import WavLMConfig, WavLMModel

    from zipvoice_tpu.eval.models.ecapa_tdnn_wavlm import (
        extract_hidden_states_s3prl_convention,
    )

    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=64, conv_dim=[16, 16], conv_kernel=[3, 3],
        conv_stride=[2, 2], conv_bias=True, feat_extract_norm="layer",
        do_stable_layer_norm=True, num_buckets=8, max_bucket_distance=16,
        num_conv_pos_embeddings=15, num_conv_pos_embedding_groups=4,
    )
    ssl = WavLMModel(cfg).eval()
    wave = torch.randn(2, 400)

    with torch.no_grad():
        hf_states = ssl(wave, output_hidden_states=True).hidden_states
    assert len(hf_states) == cfg.num_hidden_layers + 1

    # (a) s3prl hook placement
    hooked = extract_hidden_states_s3prl_convention(ssl, wave)
    assert len(hooked) == len(hf_states)
    for i, (a, b) in enumerate(zip(hf_states, hooked)):
        torch.testing.assert_close(a, b, rtol=0, atol=0,
                                   msg=f"state {i} differs (hooks)")

    # (b) hand-coded fairseq extract_features loop over the HF submodules:
    # x += pos_conv(x); dropout; [capture x; x = layer(x)] * L; final LN
    # (fairseq wav2vec2.py layer_norm_first convention, which WavLM uses)
    with torch.no_grad():
        feats = ssl.feature_extractor(wave).transpose(1, 2)
        h, _ = ssl.feature_projection(feats)
        h = h + ssl.encoder.pos_conv_embed(h)
        h = ssl.encoder.dropout(h)
        manual = []
        position_bias = None
        for layer in ssl.encoder.layers:
            manual.append(h)
            h, position_bias = layer(h, position_bias=position_bias)[:2]
        manual.append(ssl.encoder.layer_norm(h))
    for i, (a, b) in enumerate(zip(hf_states, manual)):
        torch.testing.assert_close(a, b, rtol=0, atol=0,
                                   msg=f"state {i} differs (fairseq loop)")
