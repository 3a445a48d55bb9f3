"""LTX-2 vocoder golden: flax LTX2Vocoder vs a torch HiFi-GAN mirror in the
diffusers key layout (conv_in/upsamplers/resnets.convs1|2/conv_out)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.ltx_vocoder import (  # noqa: E402
    LTX2Vocoder,
    VocoderConfig,
    stack_stereo_mel,
    vocoder_rules,
)


class TRes(nn.Module):
    def __init__(self, ch, k, dils, slope):
        super().__init__()
        self.slope = slope
        self.convs1 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, dilation=d, padding=(k - 1) * d // 2) for d in dils])
        self.convs2 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, padding=(k - 1) // 2) for _ in dils])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            h = c2(F.leaky_relu(c1(F.leaky_relu(x, self.slope)), self.slope))
            x = x + h
        return x


class TVocoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.conv_in = nn.Conv1d(cfg.in_channels, cfg.hidden_channels, 7, padding=3)
        self.upsamplers = nn.ModuleList()
        self.resnets = nn.ModuleList()
        ch = cfg.hidden_channels
        for k, u in zip(cfg.upsample_kernel_sizes, cfg.upsample_factors):
            self.upsamplers.append(
                nn.ConvTranspose1d(ch, ch // 2, k, stride=u, padding=(k - u) // 2))
            ch //= 2
            for rk in cfg.resnet_kernel_sizes:
                self.resnets.append(TRes(ch, rk, cfg.resnet_dilations, cfg.leaky_slope))
        self.conv_out = nn.Conv1d(ch, cfg.out_channels, 7, padding=3)

    def forward(self, mel):
        cfg = self.cfg
        nk = len(cfg.resnet_kernel_sizes)
        x = self.conv_in(mel)
        for i, up in enumerate(self.upsamplers):
            x = up(F.leaky_relu(x, cfg.leaky_slope))
            x = sum(self.resnets[nk * i + j](x) for j in range(nk)) / nk
        return torch.tanh(self.conv_out(F.leaky_relu(x, cfg.leaky_slope)))


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), v


@pytest.mark.parametrize("cfg,T", [
    (VocoderConfig.tiny(), 12),
    # k-u even per level, as in every released config (exact u*T lengths)
    (VocoderConfig(in_channels=8, hidden_channels=32, out_channels=2,
                   upsample_kernel_sizes=(7, 5, 4), upsample_factors=(3, 5, 2),
                   resnet_kernel_sizes=(3, 7), resnet_dilations=(1, 3, 5)), 9),
])
def test_vocoder_golden(cfg, T):
    torch.manual_seed(0)
    tm = TVocoder(cfg).eval()
    for p_ in tm.parameters():
        p_.data = torch.randn_like(p_) * 0.1
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, vocoder_rules())
    assert not unmatched, unmatched[:6]

    voc = LTX2Vocoder(cfg)
    mel = np.random.default_rng(0).normal(size=(2, cfg.in_channels, T)).astype(np.float32)
    ref = voc.init(jax.random.key(0), jnp.asarray(mel.transpose(0, 2, 1)))["params"]
    assert {p for p, _ in _walk(ref)} == {p for p, _ in _walk(tree)}

    j = np.asarray(voc.apply({"params": tree}, jnp.asarray(mel.transpose(0, 2, 1))))
    with torch.no_grad():
        t_out = tm(torch.from_numpy(mel)).numpy()
    assert j.transpose(0, 2, 1).shape == t_out.shape
    assert j.shape[1] == T * cfg.total_upsample
    np.testing.assert_allclose(j.transpose(0, 2, 1), t_out, rtol=2e-3, atol=2e-3)


def test_stereo_mel_stacking():
    mel = np.arange(2 * 3 * 4 * 2, dtype=np.float32).reshape(2, 3, 4, 2)
    out = np.asarray(stack_stereo_mel(jnp.asarray(mel)))
    assert out.shape == (2, 3, 8)
    np.testing.assert_allclose(out[0, 0, :4], mel[0, 0, :, 0])  # left block first
    np.testing.assert_allclose(out[0, 0, 4:], mel[0, 0, :, 1])
