import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ai_toolkit_tpu.adapters.lora import LoRASpec
from ai_toolkit_tpu.adapters.lycoris import build_dora, build_lokr, factorize, lokr_delta, merge_lokr
from ai_toolkit_tpu.ops.layers import Linear


class Net(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = Linear(48, dtype=jnp.float32, param_dtype=jnp.float32, name="fc1")(x)
        return Linear(24, dtype=jnp.float32, param_dtype=jnp.float32, name="fc2")(nn.silu(x))


@pytest.fixture()
def net_and_params():
    net = Net()
    x = jax.random.normal(jax.random.key(0), (2, 36))
    params = net.init(jax.random.key(1), x)["params"]
    return net, params, x


def test_factorize():
    assert factorize(36) == (6, 6)
    assert factorize(48) == (6, 8)
    a, c = factorize(3072)
    assert a * c == 3072 and a <= c
    assert factorize(48, factor=4) == (4, 12)


def test_lokr_overlay_and_merge(net_and_params):
    net, params, x = net_and_params
    lokr = build_lokr(params, LoRASpec(), jax.random.key(2))
    assert set(lokr.keys()) == {"fc1", "fc2"}
    # w2 zero at init -> identity
    base = net.apply({"params": params}, x)
    out0 = net.apply({"params": params, "lokr": lokr}, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)

    lokr = jax.tree.map(lambda v: jax.random.normal(jax.random.key(3), v.shape) * 0.05, lokr)
    out = net.apply({"params": params, "lokr": lokr}, x)
    assert not np.allclose(np.asarray(out), np.asarray(base))
    merged = merge_lokr(params, lokr)
    out_m = net.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_m), rtol=1e-4, atol=1e-5)
    # kron shape sanity
    d = lokr_delta(lokr["fc1"])
    assert d.shape == params["fc1"]["kernel"].shape


def test_dora_identity_at_init_and_trains(net_and_params):
    net, params, x = net_and_params
    dora = build_dora(params, LoRASpec(rank=4, alpha=4), jax.random.key(2))
    # b=0 and magnitude=||W|| -> output identical to base
    base = net.apply({"params": params}, x)
    out0 = net.apply({"params": params, "dora": dora}, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), rtol=1e-4, atol=1e-5)

    # grads flow to magnitude and factors
    def loss(dora):
        y = net.apply({"params": params, "dora": dora}, x)
        return jnp.mean(jnp.square(y - 1.0))

    g = jax.grad(loss)(dora)
    assert float(jnp.abs(g["fc1"]["magnitude"]).sum()) > 0
    # with zero-init b, first-step grads flow to b (a's grad is b^T-scaled = 0)
    assert float(jnp.abs(g["fc1"]["b"]).sum()) > 0


def test_adapter_file_save(tmp_path, net_and_params):
    from safetensors import safe_open

    from ai_toolkit_tpu.io.lora_file import save_adapter_file

    net, params, x = net_and_params
    lokr = build_lokr(params, LoRASpec(), jax.random.key(2))
    p = str(tmp_path / "lokr.safetensors")
    save_adapter_file(lokr, "lokr", p, prefix="lora_unet", metadata={"step": 5})
    with safe_open(p, framework="numpy") as f:
        keys = list(f.keys())
        assert f.metadata()["step"] == "5"
    assert "lora_unet_fc1.lokr_w1" in keys

    dora = build_dora(params, LoRASpec(rank=4), jax.random.key(2))
    p2 = str(tmp_path / "dora.safetensors")
    save_adapter_file(dora, "dora", p2, prefix="lora_unet")
    with safe_open(p2, framework="numpy") as f:
        keys = list(f.keys())
    assert "lora_unet_fc1.dora_scale" in keys
    assert "lora_unet_fc1.lora_down.weight" in keys


def test_loha_identity_at_init_and_merge(net_and_params):
    from ai_toolkit_tpu.adapters.lycoris import build_loha, merge_loha

    net, params, x = net_and_params
    loha = build_loha(params, LoRASpec(rank=4, alpha=4), jax.random.key(2))
    assert set(loha.keys()) == {"fc1", "fc2"}
    assert set(loha["fc1"].keys()) == {"w1a", "w1b", "w2a", "w2b", "scale"}
    # w2b zero at init -> hadamard delta is zero -> identity
    base = net.apply({"params": params}, x)
    out0 = net.apply({"params": params, "loha": loha}, x)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(base), atol=1e-6)

    # randomize factors -> output changes; merge matches the overlay
    loha = jax.tree.map(
        lambda v: jax.random.normal(jax.random.key(3), v.shape) * 0.05, loha
    )
    out = net.apply({"params": params, "loha": loha}, x)
    assert not np.allclose(np.asarray(out), np.asarray(base))
    merged = merge_loha(params, loha)
    out_m = net.apply({"params": merged}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_m), rtol=1e-4, atol=1e-5)

    # gradient flows into the zero-init factor first
    def loss(t):
        y = net.apply({"params": params, "loha": t}, x)
        return jnp.mean(jnp.square(y - 1.0))

    loha0 = build_loha(params, LoRASpec(rank=4, alpha=4), jax.random.key(2))
    g = jax.grad(loss)(loha0)
    assert float(jnp.abs(g["fc1"]["w2b"]).sum()) > 0


def test_loha_e2e_train(tmp_path):
    """network.type: loha trains + saves through the full trainer path."""
    import yaml
    from PIL import Image

    folder = tmp_path / "imgs"
    folder.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
            folder / f"im_{i}.png")
        (folder / f"im_{i}.txt").write_text("x")
    cfg = {"job": "extension", "config": {"name": "loha", "process": [{
        "type": "sd_trainer", "training_folder": str(tmp_path / "out"),
        "network": {"type": "loha", "linear": 4, "linear_alpha": 4},
        "save": {"save_every": 100},
        "datasets": [{"folder_path": str(folder), "caption_ext": "txt",
                      "resolution": 64}],
        "train": {"batch_size": 1, "steps": 2, "noise_scheduler": "flowmatch",
                  "optimizer": "adamw", "lr": 1e-3, "dtype": "float32",
                  "timestep_type": "linear", "ema_config": {"use_ema": False}},
        "model": {"name_or_path": "", "arch": "sd3",
                  "model_kwargs": {"size": "tiny"}},
        "sample": {"sample_every": 0, "prompts": []},
    }]}}
    p = tmp_path / "job.yaml"
    p.write_text(yaml.safe_dump(cfg))
    from ai_toolkit_tpu.config import get_config
    from ai_toolkit_tpu.jobs import get_job

    job = get_job(get_config(p))
    results = job.run()
    assert np.isfinite(results[0]["final_loss"])
    assert (tmp_path / "out" / "loha" / "loha.safetensors").exists()
