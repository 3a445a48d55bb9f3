"""LTX-2 joint audio-video stream (a2v/v2a cross-attention).

Reference behavior: extensions_built_in/diffusion_models/ltx2/ltx2.py:945-1079
(audio latents noised at the shared sigma, dual predictions, dual loss).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


@pytest.fixture(scope="module")
def ltx2_av():
    model = get_model_class("ltx2")(
        ModelConfig(arch="ltx2", model_kwargs={"size": "tiny", "joint_audio": True})
    )
    variables = model.init_variables(jax.random.key(0))
    return model, variables


def test_av_forward_shapes(ltx2_av):
    model, variables = ltx2_av
    b, t_, h, w = 1, 2, 4, 4
    c = model.dit_config.in_channels
    lat = jax.random.normal(jax.random.key(1), (b, t_, h, w, c))
    na = 6
    ca = model.av_config.audio_in_channels
    a_lat = jax.random.normal(jax.random.key(2), (b, na, ca))
    cond = model.encode_prompt(variables, ["a noisy video"])
    cond["pe"] = model.rope_table(t_, h, w)
    cond["pe_audio"] = model.audio_rope_table(na)
    cond["noisy_audio"] = a_lat
    t = jnp.full((b,), 0.5)
    pred_v, pred_a = model.predict(variables, lat, t, cond)
    assert pred_v.shape == lat.shape
    assert pred_a.shape == a_lat.shape
    assert np.isfinite(np.asarray(pred_v)).all()
    assert np.isfinite(np.asarray(pred_a)).all()
    # video-only path still works on the same params (audio stream gated off)
    cond2 = {k: v for k, v in cond.items() if k != "noisy_audio"}
    assert model.joint_audio
    pred_only = model.predict(variables, lat, t, cond2)
    assert pred_only.shape == lat.shape


def test_audio_vae_roundtrip(ltx2_av):
    model, variables = ltx2_av
    sr_samples = 4 * model.audio_vae_config.downscale
    wav = jax.random.normal(jax.random.key(3), (1, sr_samples, 2)) * 0.1
    lat = model.encode_audio(variables, wav)
    assert lat.shape == (1, 4, model.audio_vae_config.latent_channels)


def test_joint_train_step_audio_loss(ltx2_av):
    """Dual-stream flow loss: audio_loss reported, grads reach both streams."""
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.samplers import get_schedule
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step
    import optax

    model, variables = ltx2_av
    spec = LoRASpec(rank=2, alpha=2, target_patterns=model.lora_targets())
    lora = build_lora(variables["dit"], spec, jax.random.key(7))
    has_audio_lora = any(
        "audio" in "/".join(p) for p in _paths(lora)
    )
    assert has_audio_lora, "LoRA must target the audio-stream projections too"

    schedule = get_schedule("flowmatch", "ltx2")
    cfg = TrainStepConfig(timestep_type="linear")
    state = TrainState.create(variables, {"lora": lora}, optax.adam(1e-3))
    step = make_train_step(model.predict, schedule, cfg)

    b, t_, h, w = 1, 2, 4, 4
    lat = jax.random.normal(jax.random.key(4), (b, t_, h, w, model.dit_config.in_channels))
    a_lat = jax.random.normal(jax.random.key(5), (b, 6, model.av_config.audio_in_channels))
    cond = model.encode_prompt(variables, ["x"])
    cond["pe"] = model.rope_table(t_, h, w)
    cond["pe_audio"] = model.audio_rope_table(6)
    batch = {"latents": lat, "audio_latents": a_lat, "cond": cond}
    state2, metrics = jax.jit(step)(state, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["audio_loss"]))
    assert float(metrics["audio_loss"]) > 0
    # lora moved on both streams
    moved = jax.tree.map(
        lambda a, b_: float(jnp.abs(a - b_).max()), state.trainable, state2.trainable
    )
    audio_moved = [
        v for p, v in _flat(moved) if "audio" in p or "v2a" in p or "a2v" in p
    ]
    video_moved = [v for p, v in _flat(moved) if "self_" in p or "ffn" in p]
    assert any(v > 0 for v in audio_moved)
    assert any(v > 0 for v in video_moved)


def _paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        if {"a", "b", "scale"} <= set(tree.keys()):
            return [prefix]
        for k, v in tree.items():
            out.extend(_paths(v, prefix + (k,)))
    return out


def _flat(tree, prefix=""):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flat(v, prefix + "/" + k))
    else:
        out.append((prefix, tree))
    return out


@pytest.mark.slow
def test_ltx2_av_e2e_trainer(tmp_path):
    """Full CLI-config path: video files + sidecar wavs -> joint AV training."""
    import cv2
    import yaml
    from scipy.io import wavfile

    folder = tmp_path / "vids"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        p = str(folder / f"v_{i}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 16, (64, 64))
        for _ in range(8):
            wr.write(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        wr.release()
        wav = (rng.standard_normal((8000, 2)) * 3000).astype(np.int16)
        wavfile.write(str(folder / f"v_{i}.wav"), 16000, wav)
        (folder / f"v_{i}.txt").write_text(f"a video {i}")

    cfg = {
        "job": "extension",
        "config": {"name": "av", "process": [{
            "type": "sd_trainer",
            "training_folder": str(tmp_path / "out"),
            "network": {"type": "lora", "linear": 2, "linear_alpha": 2},
            "save": {"save_every": 100},
            "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                          "resolution": 64, "num_frames": 4, "fps": 16,
                          "do_audio": True, "audio_sample_rate": 16000,
                          "cache_latents": False, "cache_latents_to_disk": False}],
            "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                      "optimizer": "adamw", "lr": 1e-4, "dtype": "float32",
                      "timestep_type": "linear",
                      "ema_config": {"use_ema": False}},
            "model": {"name_or_path": "", "arch": "ltx2",
                      "model_kwargs": {"size": "tiny", "joint_audio": True}},
            "sample": {"sample_every": 0, "prompts": []},
            "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
        }]},
    }
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])


def test_av_generation_joint_sampler(ltx2_av, tmp_path):
    """Joint AV euler sampler: frames + waveform out, saved atomically
    (reference ltx2 pipeline __call__ with audio head on)."""
    from ai_toolkit_tpu.config.modules import GenerateImageConfig
    from ai_toolkit_tpu.generation import (
        generate,
        generate_video,
        save_video_atomic,
        save_wav_atomic,
    )

    model, variables = ltx2_av
    sd = model.vae_config.spatial_downscale
    gen = GenerateImageConfig(
        prompt="a tiny clip", width=2 * sd, height=2 * sd, sample_steps=2,
        num_frames=2 * model.vae_config.temporal_downscale, fps=8, seed=3,
    )
    frames, wav = generate_video(model, variables, gen, audio_sample_rate=512)
    assert frames.ndim == 4 and frames.shape[-1] == 3 and frames.dtype == np.uint8
    assert frames.shape[0] >= 2
    assert wav is not None and wav.ndim == 2 and np.isfinite(wav).all()

    save_video_atomic(frames, str(tmp_path / "clip.webp"), fps=8)
    save_wav_atomic(wav, str(tmp_path / "clip.wav"), sample_rate=512)
    from PIL import Image

    im = Image.open(tmp_path / "clip.webp")
    # webp anim encoder may merge identical consecutive frames
    assert 2 <= getattr(im, "n_frames", 1) <= frames.shape[0]
    from scipy.io import wavfile

    sr, data = wavfile.read(tmp_path / "clip.wav")
    assert sr == 512 and data.shape == wav.shape

    # generate() dispatches video models to the video sampler
    out = generate(model, variables, gen)
    assert isinstance(out, tuple) and out[0].ndim == 4
