"""BigVGAN vocoder tests: a torch mini-oracle replicating the official
generator (weight-normed convs, SnakeBeta, alias-free Activation1d, AMPBlock1)
with matching state_dict names; our loader + forward must reproduce it."""

import numpy as np
import pytest

from zipvoice_tpu.audio.bigvgan import (
    BigVGANConfig,
    bigvgan_decode,
    kaiser_sinc_filter,
    load_bigvgan_params,
)

torch = pytest.importorskip("torch")

CFG = BigVGANConfig(
    num_mels=8,
    upsample_initial_channel=16,
    upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4),
    resblock_kernel_sizes=(3,),
    resblock_dilations=((1, 3),),
    aa_kernel_size=12,
)


def _torch_oracle(cfg: BigVGANConfig):
    import torch.nn as nn
    import torch.nn.functional as F
    from torch.nn.utils import weight_norm

    kfilt = torch.tensor(kaiser_sinc_filter(0.25, 0.3, cfg.aa_kernel_size))

    class UpSample1d(nn.Module):
        def forward(self, x):  # (B, C, T)
            c = x.shape[1]
            k = cfg.aa_kernel_size
            pad = k // 2 - 1
            pad_left = pad * 2 + (k - 2) // 2
            pad_right = pad * 2 + (k - 2 + 1) // 2
            x = F.pad(x, (pad, pad), mode="replicate")
            x = 2.0 * F.conv_transpose1d(
                x, kfilt.view(1, 1, k).expand(c, 1, k), stride=2, groups=c
            )
            return x[..., pad_left:-pad_right]

    class DownSample1d(nn.Module):
        def forward(self, x):
            c = x.shape[1]
            k = cfg.aa_kernel_size
            x = F.pad(x, (k // 2 - 1, k // 2), mode="replicate")
            return F.conv1d(
                x, kfilt.view(1, 1, k).expand(c, 1, k), stride=2, groups=c
            )

    class SnakeBeta(nn.Module):
        def __init__(self, c):
            super().__init__()
            self.alpha = nn.Parameter(torch.randn(c) * 0.2)
            self.beta = nn.Parameter(torch.randn(c) * 0.2)

        def forward(self, x):  # (B, C, T)
            a = torch.exp(self.alpha)[None, :, None]
            b = torch.exp(self.beta)[None, :, None]
            return x + (1.0 / (b + 1e-9)) * torch.sin(a * x) ** 2

    class Activation1d(nn.Module):
        def __init__(self, act):
            super().__init__()
            self.up = UpSample1d()
            self.act = act
            self.down = DownSample1d()

        def forward(self, x):
            return self.down(self.act(self.up(x)))

    class AMPBlock1(nn.Module):
        def __init__(self, c, k, dilations):
            super().__init__()
            self.convs1 = nn.ModuleList([
                weight_norm(nn.Conv1d(c, c, k, dilation=d,
                                      padding=(k - 1) * d // 2))
                for d in dilations
            ])
            self.convs2 = nn.ModuleList([
                weight_norm(nn.Conv1d(c, c, k, padding=(k - 1) // 2))
                for _ in dilations
            ])
            self.activations = nn.ModuleList(
                [Activation1d(SnakeBeta(c)) for _ in range(2 * len(dilations))]
            )

        def forward(self, x):
            for j in range(len(self.convs1)):
                xt = self.activations[2 * j](x)
                xt = self.convs1[j](xt)
                xt = self.activations[2 * j + 1](xt)
                xt = self.convs2[j](xt)
                x = x + xt
            return x

    class Generator(nn.Module):
        def __init__(self):
            super().__init__()
            c0 = cfg.upsample_initial_channel
            self.conv_pre = weight_norm(nn.Conv1d(cfg.num_mels, c0, 7, padding=3))
            self.ups = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            for i, (r, k) in enumerate(
                zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)
            ):
                cin, cout = c0 // (2**i), c0 // (2 ** (i + 1))
                self.ups.append(nn.ModuleList([
                    weight_norm(nn.ConvTranspose1d(
                        cin, cout, k, r, padding=(k - r) // 2))
                ]))
                for kr, dil in zip(cfg.resblock_kernel_sizes,
                                   cfg.resblock_dilations):
                    self.resblocks.append(AMPBlock1(cout, kr, dil))
            c_last = c0 // (2 ** len(cfg.upsample_rates))
            self.activation_post = Activation1d(SnakeBeta(c_last))
            self.conv_post = weight_norm(
                nn.Conv1d(c_last, 1, 7, padding=3, bias=cfg.use_bias_at_final)
            )

        def forward(self, mel):  # (B, n_mels, T)
            nk = len(cfg.resblock_kernel_sizes)
            x = self.conv_pre(mel)
            for i in range(len(self.ups)):
                x = self.ups[i][0](x)
                acc = None
                for j in range(nk):
                    y = self.resblocks[i * nk + j](x)
                    acc = y if acc is None else acc + y
                x = acc / nk
            x = self.activation_post(x)
            x = self.conv_post(x)
            return torch.clamp(x, -1.0, 1.0)

    torch.manual_seed(0)
    g = Generator()
    g.eval()
    return g


def _oracle_state_dict(g):
    """Rename the oracle's Activation1d snake params to the published
    layout (…activations.N.act.alpha)."""
    sd = {}
    for k, v in g.state_dict().items():
        k = k.replace(".act.alpha", ".act.alpha").replace(
            "activations.", "activations."
        )
        k = k.replace(".up.", ".__drop__.").replace(".down.", ".__drop__.")
        if "__drop__" in k:
            continue
        sd[k] = v.detach().numpy()
    # oracle stores snake params at activations.N.act.{alpha,beta} already
    return sd


def test_bigvgan_decode_parity():
    g = _torch_oracle(CFG)
    sd = _oracle_state_dict(g)
    params = load_bigvgan_params(sd)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 23, CFG.num_mels)).astype(np.float32)
    with torch.no_grad():
        ref = g(torch.from_numpy(mel).permute(0, 2, 1)).numpy()[:, 0, :]
    out = np.asarray(bigvgan_decode(params, mel, CFG))
    assert out.shape == ref.shape, (out.shape, ref.shape)
    err = np.abs(out - ref).max()
    assert err < 1e-4, f"bigvgan decode err {err}"


def test_kaiser_filter_properties():
    f = kaiser_sinc_filter(0.25, 0.3, 12)
    assert f.shape == (12,)
    assert abs(f.sum() - 1.0) < 1e-6  # DC gain 1
    np.testing.assert_allclose(f, f[::-1], atol=1e-7)  # symmetric
