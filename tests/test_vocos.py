"""Vocos vocoder tests: a torch mini-oracle re-implements the published
vocos-mel-24khz graph (ConvNeXt backbone + ISTFT head) with identically-named
parameters; our loader maps its state_dict and must reproduce its output.
"""

import numpy as np
import pytest

from zipvoice_tpu.audio.vocos import (
    VocosConfig,
    init_vocos,
    load_vocos_params,
    vocos_decode,
)

torch = pytest.importorskip("torch")


CFG = VocosConfig(input_channels=20, dim=32, intermediate_dim=64, num_layers=2,
                  n_fft=64, hop_length=16)


def _torch_oracle(cfg: VocosConfig):
    """Minimal torch replica of vocos.models.VocosBackbone + heads.ISTFTHead
    with matching state_dict key names."""
    import torch.nn as nn

    class ConvNeXtBlock(nn.Module):
        def __init__(self):
            super().__init__()
            self.dwconv = nn.Conv1d(cfg.dim, cfg.dim, 7, padding=3, groups=cfg.dim)
            self.norm = nn.LayerNorm(cfg.dim, eps=1e-6)
            self.pwconv1 = nn.Linear(cfg.dim, cfg.intermediate_dim)
            self.act = nn.GELU()
            self.pwconv2 = nn.Linear(cfg.intermediate_dim, cfg.dim)
            self.gamma = nn.Parameter(
                torch.full((cfg.dim,), 1.0 / cfg.num_layers)
            )

        def forward(self, x):  # (B, C, T)
            res = x
            x = self.dwconv(x)
            x = x.transpose(1, 2)
            x = self.norm(x)
            x = self.pwconv2(self.act(self.pwconv1(x)))
            x = self.gamma * x
            return res + x.transpose(1, 2)

    class Backbone(nn.Module):
        def __init__(self):
            super().__init__()
            self.embed = nn.Conv1d(cfg.input_channels, cfg.dim, 7, padding=3)
            self.norm = nn.LayerNorm(cfg.dim, eps=1e-6)
            self.convnext = nn.ModuleList(
                [ConvNeXtBlock() for _ in range(cfg.num_layers)]
            )
            self.final_layer_norm = nn.LayerNorm(cfg.dim, eps=1e-6)

        def forward(self, x):  # (B, n_mels, T)
            x = self.embed(x)
            x = self.norm(x.transpose(1, 2)).transpose(1, 2)
            for blk in self.convnext:
                x = blk(x)
            return self.final_layer_norm(x.transpose(1, 2))  # (B, T, C)

    class Head(nn.Module):
        def __init__(self):
            super().__init__()
            self.out = nn.Linear(cfg.dim, cfg.n_fft + 2)

        def forward(self, x):  # (B, T, C)
            x = self.out(x).transpose(1, 2)  # (B, n_fft+2, T)
            mag, p = x.chunk(2, dim=1)
            mag = torch.exp(mag).clip(max=1e2)
            s = mag * (torch.cos(p) + 1j * torch.sin(p))
            return torch.istft(
                s, cfg.n_fft, hop_length=cfg.hop_length,
                window=torch.hann_window(cfg.n_fft), center=True,
            )

    class Vocos(nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = Backbone()
            self.head = Head()

        def decode(self, mel):  # (B, n_mels, T)
            return self.head(self.backbone(mel))

    torch.manual_seed(0)
    m = Vocos()
    m.eval()
    return m


def test_vocos_decode_parity():
    oracle = _torch_oracle(CFG)
    params = load_vocos_params(
        {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    )
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 25, CFG.input_channels)).astype(np.float32)
    with torch.no_grad():
        ref = oracle.decode(torch.from_numpy(mel).permute(0, 2, 1)).numpy()
    out = np.asarray(vocos_decode(params, mel, CFG))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    err = np.abs(out - ref).max()
    assert err < 1e-4, f"vocos decode err {err}"


def test_vocos_random_init_shapes():
    import jax

    params = init_vocos(jax.random.PRNGKey(0), CFG)
    mel = np.zeros((1, 10, CFG.input_channels), np.float32)
    wav = np.asarray(vocos_decode(params, mel, CFG))
    assert wav.shape == (1, 9 * CFG.hop_length)
    assert np.isfinite(wav).all()


def test_vocos_loader_drops_feature_extractor():
    oracle = _torch_oracle(CFG)
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    sd["feature_extractor.mel_spec.spectrogram.window"] = np.ones(4, np.float32)
    sd["head.istft.window"] = np.ones(CFG.n_fft, np.float32)
    params = load_vocos_params(sd)
    assert "feature_extractor" not in params
    assert "istft" not in params["head"]
