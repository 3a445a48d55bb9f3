"""LTX-2 audio VAE golden: flax LTXAudioVAE vs a torch mirror of the
taming-style layout the checkpoint uses (converter keeps original keys),
with pixel norms and height-causal convolutions."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.io.video_vae_import import ltx_audio_vae_rules  # noqa: E402
from ai_toolkit_tpu.models.ltx_audio_vae import (  # noqa: E402
    LTXAudioVAE,
    LTXAudioVAEConfig,
    log_mel_spectrogram,
    pack_audio_latents,
    unpack_audio_latents,
)


def _pn(x, eps=1e-6):
    return x * torch.rsqrt(x.pow(2).mean(dim=1, keepdim=True) + eps)


class TConv(nn.Conv2d):
    def __init__(self, cin, cout, k=3, stride=1, causal=True):
        super().__init__(cin, cout, k, stride=stride)
        self.causal = causal
        self.k = k

    def forward(self, x):
        p = self.k - 1
        ph = (p, 0) if self.causal else (p // 2, p - p // 2)
        pw = ((self.k - 1) // 2,) * 2
        x = F.pad(x, (pw[0], pw[1], ph[0], ph[1]))
        return self._conv_forward(x, self.weight, self.bias)


class TRes(nn.Module):
    def __init__(self, cin, cout, causal):
        super().__init__()
        self.conv1 = TConv(cin, cout, causal=causal)
        self.conv2 = TConv(cout, cout, causal=causal)
        self.nin_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(F.silu(_pn(x)))
        h = self.conv2(F.silu(_pn(h)))
        if self.nin_shortcut is not None:
            x = self.nin_shortcut(x)
        return x + h


class TEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = [cfg.base_channels * m for m in cfg.ch_mult]
        self.conv_in = TConv(cfg.in_channels, ch[0], causal=cfg.causal)
        self.down = nn.ModuleList()
        for i in range(len(ch)):
            lvl = nn.Module()
            lvl.block = nn.ModuleList(
                [TRes(ch[i], ch[i], cfg.causal) for _ in range(cfg.num_res_blocks)])
            if i < len(ch) - 1:
                ds = nn.Module()
                ds.conv = nn.Conv2d(ch[i], ch[i + 1], 3, stride=2)
                lvl.downsample = ds
            self.down.append(lvl)
        self.mid = nn.Module()
        self.mid.block_1 = TRes(ch[-1], ch[-1], cfg.causal)
        self.mid.block_2 = TRes(ch[-1], ch[-1], cfg.causal)
        self.conv_out = TConv(ch[-1], 2 * cfg.latent_channels, causal=cfg.causal)
        self.causal = cfg.causal

    def forward(self, x):
        x = self.conv_in(x)
        for i, lvl in enumerate(self.down):
            for blk in lvl.block:
                x = blk(x)
            if hasattr(lvl, "downsample"):
                ph = (1, 0) if self.causal else (0, 1)
                x = F.pad(x, (0, 1, ph[0], ph[1]))
                x = lvl.downsample.conv(x)
        x = self.mid.block_2(self.mid.block_1(x))
        return self.conv_out(F.silu(_pn(x)))


class TDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        ch = [cfg.base_channels * m for m in cfg.ch_mult]
        self.conv_in = TConv(cfg.latent_channels, ch[-1], causal=cfg.causal)
        self.mid = nn.Module()
        self.mid.block_1 = TRes(ch[-1], ch[-1], cfg.causal)
        self.mid.block_2 = TRes(ch[-1], ch[-1], cfg.causal)
        self.up = nn.ModuleList()
        for i in range(len(ch)):
            lvl = nn.Module()
            lvl.block = nn.ModuleList(
                [TRes(ch[i], ch[i], cfg.causal) for _ in range(cfg.num_res_blocks + 1)])
            if i > 0:
                us = nn.Module()
                us.conv = TConv(ch[i], ch[i - 1], causal=cfg.causal)
                lvl.upsample = us
            self.up.append(lvl)
        self.conv_out = TConv(ch[0], cfg.in_channels, causal=cfg.causal)
        self.causal = cfg.causal

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid.block_2(self.mid.block_1(x))
        for i in reversed(range(len(self.up))):
            for blk in self.up[i].block:
                x = blk(x)
            if i > 0:
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
                if self.causal:
                    x = x[:, :, 1:]
                x = self.up[i].upsample.conv(x)
        return self.conv_out(F.silu(_pn(x)))


class TAudioVAE(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)
        self.decoder = TDecoder(cfg)


def _walk(tree, prefix=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield from _walk(v, prefix + (k,))
        else:
            yield "/".join(prefix + (k,)), v


@pytest.mark.parametrize("cfg,T", [
    (LTXAudioVAEConfig.tiny(), 8),
    (LTXAudioVAEConfig(base_channels=8, ch_mult=(1, 1, 2), num_res_blocks=2,
                       latent_channels=4, mel_bins=16), 12),
])
def test_ltx_audio_vae_golden(cfg, T):
    torch.manual_seed(0)
    tm = TAudioVAE(cfg).eval()
    for p_ in tm.parameters():
        p_.data = torch.randn_like(p_) * 0.15
    flat = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    tree, unmatched = torch_to_tree(flat, ltx_audio_vae_rules())
    assert not unmatched, unmatched[:6]

    vae = LTXAudioVAE(cfg)
    x = np.random.default_rng(0).normal(
        size=(1, cfg.in_channels, T, cfg.mel_bins)).astype(np.float32)  # NCHW
    ref = vae.init(jax.random.key(0),
                   jnp.asarray(x.transpose(0, 2, 3, 1)))["params"]
    ref_paths = {p for p, _ in _walk(ref)}
    got_paths = {p for p, _ in _walk(tree)}
    assert ref_paths == got_paths, (sorted(ref_paths - got_paths)[:5],
                                    sorted(got_paths - ref_paths)[:5])

    with torch.no_grad():
        t_m = tm.quant_conv(tm.encoder(torch.from_numpy(x))).numpy()
    j_m = np.asarray(vae.apply({"params": tree},
                               jnp.asarray(x.transpose(0, 2, 3, 1)),
                               method=LTXAudioVAE.raw_moments)).transpose(0, 3, 1, 2)
    assert t_m.shape == j_m.shape
    np.testing.assert_allclose(j_m, t_m, rtol=2e-3, atol=2e-3)

    z = t_m[:, : cfg.latent_channels]
    with torch.no_grad():
        t_d = tm.decoder(tm.post_quant_conv(torch.from_numpy(z))).numpy()
    j_d = np.asarray(vae.apply({"params": tree},
                               jnp.asarray(z.transpose(0, 2, 3, 1)),
                               method=LTXAudioVAE.decode)).transpose(0, 3, 1, 2)
    assert t_d.shape == j_d.shape
    np.testing.assert_allclose(j_d, t_d, rtol=2e-3, atol=2e-3)


def test_mel_frontend_and_packing():
    wav = np.random.default_rng(0).standard_normal((16000, 2)).astype(np.float32)
    mel = log_mel_spectrogram(wav, 16000, n_fft=1024, hop=160, n_mels=64)
    assert mel.shape[1:] == (64, 2)
    assert mel.shape[0] == 1 + (16000 - 1024) // 160
    assert np.isfinite(mel).all()

    z = np.random.default_rng(1).normal(size=(2, 5, 16, 8)).astype(np.float32)
    toks = pack_audio_latents(jnp.asarray(z))
    assert toks.shape == (2, 5, 128)  # matches audio_in_channels 128
    back = unpack_audio_latents(toks, 16)
    np.testing.assert_allclose(np.asarray(back), z)


def test_ltx2_mel_audio_backend_end_to_end():
    """model_kwargs audio_vae='mel' swaps the joint-AV audio chain onto the
    reference-exact pipeline: log-mel -> 2D causal VAE -> packed tokens for
    the DiT; decode runs the vocoder back to a waveform."""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("ltx2")(ModelConfig(
        arch="ltx2", model_kwargs={"size": "tiny", "joint_audio": True,
                                   "audio_vae": "mel"}))
    variables = model.init_variables(jax.random.key(0))
    assert "vocoder" in variables
    wav = jax.random.normal(jax.random.key(1), (2, 16000, 2)) * 0.1
    tokens = model.encode_audio(variables, wav)
    assert tokens.ndim == 3
    assert tokens.shape[-1] == model.av_config.audio_in_channels
    out = model.decode_audio(variables, tokens)
    assert out.ndim == 3 and out.shape[-1] == 2
    assert np.isfinite(np.asarray(out)).all()

    # joint forward with mel-backed audio tokens
    t_lat, h, w, c = model.latent_shape(16, 16, num_frames=3)
    cond = model.encode_prompt(variables, ["a", "b"])
    cond["pe"] = model.rope_table(t_lat, h, w)
    cond["pe_audio"] = model.audio_rope_table(int(tokens.shape[1]))
    cond["noisy_audio"] = tokens
    noisy = jax.random.normal(jax.random.key(2), (2, t_lat, h, w, c))
    out_v, out_a = model.predict(variables, noisy, jnp.array([0.5, 0.5]), cond)
    assert out_v.shape == noisy.shape
    assert out_a.shape == tokens.shape


def test_mel_is_default_for_checkpoint_dirs(tmp_path, capsys):
    """Real checkpoints always carry an audio VAE
    (convert_ltx2_to_diffusers.py:84-86), so joint-AV training against a
    checkpoint path must default to the reference mel chain; overriding it
    back to the waveform stand-in warns loudly."""
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    (tmp_path / "audio_vae").mkdir()
    kw = {"size": "tiny", "joint_audio": True}
    m = get_model_class("ltx2")(ModelConfig(
        arch="ltx2", name_or_path=str(tmp_path), model_kwargs=dict(kw)))
    assert m.audio_backend == "mel"
    capsys.readouterr()

    # explicit waveform override over a mel checkpoint: honored, but loud
    m2 = get_model_class("ltx2")(ModelConfig(
        arch="ltx2", name_or_path=str(tmp_path),
        model_kwargs={**kw, "audio_vae": "waveform"}))
    assert m2.audio_backend == "waveform"
    assert "random-init waveform" in capsys.readouterr().out

    # no checkpoint path at all -> from-scratch waveform experiments keep
    # working without a mel frontend
    m3 = get_model_class("ltx2")(ModelConfig(
        arch="ltx2", name_or_path="", model_kwargs=dict(kw)))
    assert m3.audio_backend == "waveform"


def test_mel_av_train_step_and_sample(tmp_path):
    """e2e through the default checkpoint path: LoRA train step on
    mel-backed audio tokens, then joint sampling mel -> vocoder -> wav."""
    import optax
    from scipy.io import wavfile

    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.config.modules import GenerateImageConfig, ModelConfig
    from ai_toolkit_tpu.generation import generate_video, save_wav_atomic
    from ai_toolkit_tpu.models.registry import get_model_class
    from ai_toolkit_tpu.samplers import get_schedule
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model = get_model_class("ltx2")(ModelConfig(
        arch="ltx2", model_kwargs={"size": "tiny", "joint_audio": True,
                                   "audio_vae": "mel"}))
    variables = model.init_variables(jax.random.key(0))

    # audio tokens from a real waveform through the mel chain
    wav_in = jax.random.normal(jax.random.key(1), (1, 8000, 2)) * 0.1
    a_lat = model.encode_audio(variables, wav_in)

    spec = LoRASpec(rank=2, alpha=2, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(7))
    state = TrainState.create(variables, {"lora": lora}, optax.adam(1e-3))
    step = make_train_step(
        model.predict, get_schedule("flowmatch", "ltx2"),
        TrainStepConfig(timestep_type="linear"))
    b, t_, h, w = 1, 2, 4, 4
    lat = jax.random.normal(jax.random.key(4),
                            (b, t_, h, w, model.dit_config.in_channels))
    cond = model.encode_prompt(variables, ["x"])
    cond["pe"] = model.rope_table(t_, h, w)
    cond["pe_audio"] = model.audio_rope_table(int(a_lat.shape[1]))
    batch = {"latents": lat, "audio_latents": a_lat, "cond": cond}
    _, metrics = jax.jit(step)(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["audio_loss"]) > 0

    # joint sampling: audio latents -> mel VAE decode -> vocoder -> wav file
    sd = model.vae_config.spatial_downscale
    gen = GenerateImageConfig(
        prompt="a tiny clip", width=2 * sd, height=2 * sd, sample_steps=2,
        num_frames=2 * model.vae_config.temporal_downscale, fps=8, seed=3)
    sr = model.audio_vae_config.sample_rate
    frames, wav = generate_video(model, variables, gen, audio_sample_rate=sr)
    assert frames.ndim == 4 and frames.dtype == np.uint8
    assert wav is not None and wav.ndim == 2 and np.isfinite(wav).all()
    save_wav_atomic(wav, str(tmp_path / "clip.wav"), sample_rate=sr)
    got_sr, data = wavfile.read(tmp_path / "clip.wav")
    assert got_sr == sr and data.shape == wav.shape
