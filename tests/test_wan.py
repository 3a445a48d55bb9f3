import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ai_toolkit_tpu.config.modules import ModelConfig
from ai_toolkit_tpu.models.registry import get_model_class


@pytest.fixture(scope="module")
def wan_tiny():
    model = get_model_class("wan21")(ModelConfig(arch="wan21", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    return model, variables


def test_wan_video_vae_roundtrip(wan_tiny):
    # causal VAE contract: T = td*k+1 frames <-> k+1 latent frames
    model, variables = wan_tiny
    vid = jax.random.uniform(jax.random.key(0), (1, 5, 16, 16, 3)) * 2 - 1
    lat = model.encode_images(variables, vid)
    t, h, w, c = model.latent_shape(16, 16, num_frames=5)
    assert lat.shape == (1, t, h, w, c)
    dec = model.decode_latents(variables, lat)
    assert dec.shape == vid.shape


def test_wan_forward_and_train_step(wan_tiny):
    from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
    from ai_toolkit_tpu.samplers import FlowMatchSchedule
    from ai_toolkit_tpu.train.optimizers import get_optimizer
    from ai_toolkit_tpu.train.state import TrainState
    from ai_toolkit_tpu.train.step import TrainStepConfig, make_train_step

    model, variables = wan_tiny
    t_, h, w, c = model.latent_shape(16, 16, num_frames=4)
    cond = model.encode_prompt(variables, ["a video of a cat"])
    pe = model.rope_table(t_, h, w)
    cond = {**cond, "pe": pe}
    noisy = jax.random.normal(jax.random.key(1), (1, t_, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), cond)
    assert out.shape == noisy.shape

    lora = build_lora(variables["dit"], LoRASpec(rank=4, target_patterns=model.lora_targets()),
                      jax.random.key(2))
    assert lora  # targeted the blocks
    state = TrainState.create(variables, {"lora": lora}, get_optimizer("adamw", 1e-3))
    step = jax.jit(make_train_step(model.predict, FlowMatchSchedule(), TrainStepConfig()))
    batch = {"latents": noisy, "cond": cond}
    state, m = step(state, batch, jax.random.key(3))
    assert np.isfinite(float(m["loss"]))


def test_wan_i2v_forward():
    model = get_model_class("wan21_i2v")(
        ModelConfig(arch="wan21_i2v", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    t_, h, w, c = model.latent_shape(16, 16, num_frames=4)
    cond = model.encode_prompt(variables, ["x"])
    cond = {**cond, "pe": model.rope_table(t_, h, w),
            "img_cond": jnp.zeros((1, 4, model.dit_config.img_cond_dim))}
    noisy = jax.random.normal(jax.random.key(1), (1, t_, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), cond)
    assert out.shape == noisy.shape


def test_frame_snapper(wan_tiny):
    # wan snaps to td*k+1 (reference get_frame_count_snapper: 4k+1)
    model, _ = wan_tiny
    td = model.vae_config.temporal_downscale
    assert model.frame_count_snapper(17) % td == 1
    assert model.frame_count_snapper(17) <= 17
    assert model.frame_count_snapper(1) == 1
    assert model.frame_count_snapper(td + 1) == td + 1


def test_wan22_multistage_routing():
    model = get_model_class("wan22_14b")(
        ModelConfig(arch="wan22_14b", model_kwargs={"size": "tiny", "stage_boundary": 0.5})
    )
    variables = model.init_variables(jax.random.key(0))
    assert "dit_low" in variables
    t_, h, w, c = model.latent_shape(16, 16, num_frames=4)
    cond = model.encode_prompt(variables, ["x"])
    cond = {**cond, "pe": model.rope_table(t_, h, w)}
    noisy = jax.random.normal(jax.random.key(1), (1, t_, h, w, c))
    out_hi = model.predict(variables, noisy, jnp.array([0.9]), cond)
    out_lo = model.predict(variables, noisy, jnp.array([0.1]), cond)
    assert out_hi.shape == noisy.shape
    # different experts -> different outputs
    assert not np.allclose(np.asarray(out_hi), np.asarray(out_lo))


def test_wan_i2v_clip_vision_cond():
    model = get_model_class("wan21_i2v")(
        ModelConfig(arch="wan21_i2v", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    assert "clip_vision" in variables
    frame = jax.random.uniform(jax.random.key(1), (1, 48, 48, 3)) * 2 - 1
    img_cond = model.encode_image_cond(variables, frame)
    assert img_cond.shape[-1] == model.dit_config.img_cond_dim
    t_, h, w, c = model.latent_shape(16, 16, num_frames=4)
    cond = {**model.encode_prompt(variables, ["x"]), "pe": model.rope_table(t_, h, w),
            "img_cond": img_cond}
    noisy = jax.random.normal(jax.random.key(2), (1, t_, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), cond)
    assert out.shape == noisy.shape


def test_wan_video_generation(wan_tiny, tmp_path):
    """generate() routes video models to the euler video sampler and the
    result saves as an animated webp (reference WanGenerationPipeline)."""
    from ai_toolkit_tpu.config.modules import GenerateImageConfig
    from ai_toolkit_tpu.generation import generate, save_video_atomic

    model, variables = wan_tiny
    sd = model.vae_config.spatial_downscale
    gen = GenerateImageConfig(
        prompt="a clip", width=2 * sd, height=2 * sd, sample_steps=2,
        num_frames=2 * model.vae_config.temporal_downscale, fps=8, seed=1,
    )
    frames, wav = generate(model, variables, gen)
    assert wav is None  # wan has no audio stream
    assert frames.ndim == 4 and frames.dtype == np.uint8 and frames.shape[0] >= 2
    save_video_atomic(frames, str(tmp_path / "w.webp"), fps=8)
    assert (tmp_path / "w.webp").exists()


def test_wan_sequence_parallel_matches_dense():
    """enable_sequence_parallel: tokens shard over 'sp', self-attn becomes
    ring attention — predict must equal the dense single-device forward."""
    from ai_toolkit_tpu.config.modules import MeshConfig
    from ai_toolkit_tpu.parallel.mesh import make_mesh

    model = get_model_class("wan21")(ModelConfig(arch="wan21", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    t_lat, h, w, c = model.latent_shape(16, 16, num_frames=4)
    lat = jax.random.normal(jax.random.key(1), (2, t_lat, h, w, c))
    cond = model.encode_prompt(variables, ["a", "b"])
    cond["pe"] = model.rope_table(t_lat, h, w)
    t = jnp.full((2,), 0.3)
    ref = np.asarray(jax.jit(model.predict)(variables, lat, t, cond))

    mesh = make_mesh(MeshConfig(axes={"dp": 1, "fsdp": 2, "tp": 2, "sp": 2}))
    model.enable_sequence_parallel(mesh)
    assert model.dit_config.sp_axis == "sp"
    out = np.asarray(jax.jit(model.predict)(variables, lat, t, cond))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)

    # gradients flow through the ring (train-step viability)
    def loss(v):
        return jnp.sum(model.predict(v, lat, t, cond) ** 2)

    g = jax.grad(lambda dit: loss({**variables, "dit": dit}))(variables["dit"])
    assert all(np.isfinite(x).all() for x in jax.tree.leaves(g))


def test_wan_i2v_generation_with_ctrl_img(tmp_path):
    """i2v sampling: ctrl_img conditions generation through clip-vision
    first-frame tokens (reference wan i2v pipeline image input)."""
    from PIL import Image

    from ai_toolkit_tpu.config.modules import GenerateImageConfig
    from ai_toolkit_tpu.generation import generate_video

    model = get_model_class("wan21_i2v")(
        ModelConfig(arch="wan21_i2v", model_kwargs={"size": "tiny"})
    )
    variables = model.init_variables(jax.random.key(0))
    sd = model.vae_config.spatial_downscale
    img = tmp_path / "first.png"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (2 * sd, 2 * sd, 3), dtype=np.uint8)
    ).save(img)
    gen = GenerateImageConfig(
        prompt="clip", width=2 * sd, height=2 * sd, sample_steps=2,
        num_frames=2 * model.vae_config.temporal_downscale, seed=2, ctrl_img=str(img),
    )
    frames, wav = generate_video(model, variables, gen)
    assert frames.ndim == 4 and np.isfinite(frames).all()
    # conditioning image changes the output
    gen2 = GenerateImageConfig(
        prompt="clip", width=2 * sd, height=2 * sd, sample_steps=2,
        num_frames=2 * model.vae_config.temporal_downscale, seed=2,
    )
    frames2, _ = generate_video(model, variables, gen2)
    assert frames.shape == frames2.shape
    assert np.abs(frames.astype(np.int32) - frames2.astype(np.int32)).max() > 0


def test_wan22_5b_single_stage_residual_vae():
    """wan22_5b is a single transformer (no multistage) riding the 2.2
    residual/patchified VAE (wan22_5b_model.py:83, 16x + 2x2 patch)."""
    model = get_model_class("wan22_5b")(
        ModelConfig(arch="wan22_5b", model_kwargs={"size": "tiny"})
    )
    assert not model.multistage
    assert model.vae_config.is_residual and model.vae_config.patch_size == 2
    variables = model.init_variables(jax.random.key(0))
    assert "dit_low" not in variables
    td = model.vae_config.temporal_downscale
    sd = model.vae_config.spatial_downscale
    vid = jax.random.uniform(jax.random.key(0), (1, td + 1, 2 * sd, 2 * sd, 3)) * 2 - 1
    lat = model.encode_images(variables, vid)
    t_, h, w, c = model.latent_shape(2 * sd, 2 * sd, num_frames=td + 1)
    assert lat.shape == (1, t_, h, w, c)
    dec = model.decode_latents(variables, lat)
    assert dec.shape == vid.shape
    cond = model.encode_prompt(variables, ["x"])
    cond = {**cond, "pe": model.rope_table(t_, h, w)}
    noisy = jax.random.normal(jax.random.key(1), (1, t_, h, w, c))
    out = model.predict(variables, noisy, jnp.array([0.5]), cond)
    assert out.shape == noisy.shape


def test_wan22_5b_real_size_configs():
    """5b config dims: 48-ch latents, 16x spatial VAE, divisibility 32."""
    model_cls = get_model_class("wan22_5b")
    m = model_cls.__new__(model_cls)
    from ai_toolkit_tpu.models.wan_dit import WanConfig
    from ai_toolkit_tpu.models.wan_vae import WanVAEConfig

    dit = WanConfig.wan22_5b()
    vae = WanVAEConfig.wan22_5b()
    assert dit.in_channels == vae.z_dim == 48
    assert vae.spatial_downscale == 16 and vae.temporal_downscale == 4
    assert dit.dim == 3072 and dit.num_layers == 30


def test_i2v_adapter_on_t2v_base_e2e(tmp_path):
    """CustomAdapter type 'i2v' (reference toolkit/models/i2v_adapter.py):
    grafts image cross-attn KV (+ optional first-frame embedder) onto a
    FROZEN t2v wan base and trains them with a LoRA over the rest."""
    import cv2
    import yaml

    folder = tmp_path / "vids"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        p = str(folder / f"v_{i}.mp4")
        wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 16, (64, 64))
        for _ in range(8):
            wr.write(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        wr.release()
        (folder / f"v_{i}.txt").write_text(f"a video {i}")

    cfg = {"job": "extension", "config": {"name": "i2va", "process": [{
        "type": "sd_trainer",
        "training_folder": str(tmp_path / "out"),
        "adapter": {"type": "i2v", "i2v_do_start_frame": True},
        "network": {"type": "lora", "linear": 2, "linear_alpha": 2},
        "save": {"save_every": 100},
        "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                      "resolution": 64, "num_frames": 5, "fps": 16,
                      "do_i2v": True,
                      "cache_latents": False, "cache_latents_to_disk": False}],
        "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                  "optimizer": "adamw", "lr": 1e-4, "dtype": "float32",
                  "ema_config": {"use_ema": False}},
        "model": {"name_or_path": "", "arch": "wan21",
                  "model_kwargs": {"size": "tiny"}},
        "sample": {"sample_every": 0, "prompts": []},
        "mesh": {"axes": {"dp": 1, "fsdp": -1, "tp": 1}},
    }]}}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    out = tmp_path / "out" / "i2va" / "i2va.safetensors"
    assert out.exists()
