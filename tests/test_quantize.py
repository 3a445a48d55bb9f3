import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from ai_toolkit_tpu.adapters.lora import LoRASpec, build_lora
from ai_toolkit_tpu.adapters.quantize import (
    dequantize_kernel_int8,
    quantize_kernel_int8,
    quantize_params,
    quantized_bytes,
)
from ai_toolkit_tpu.ops.layers import Linear


def test_int8_kernel_roundtrip():
    w = jax.random.normal(jax.random.key(0), (256, 128)) * 0.02
    q, s = quantize_kernel_int8(w)
    assert q.dtype == jnp.int8
    back = dequantize_kernel_int8(q, s, jnp.float32)
    err = np.max(np.abs(np.asarray(back) - np.asarray(w)))
    assert err < np.max(np.abs(np.asarray(w))) / 100


def test_quantize_params_split_and_forward():
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Linear(512, dtype=jnp.float32, param_dtype=jnp.float32, name="big")(x)
            x = nn.silu(x)
            return Linear(4, dtype=jnp.float32, param_dtype=jnp.float32, name="small")(x)

    net = Net()
    x = jax.random.normal(jax.random.key(0), (2, 256))
    params = net.init(jax.random.key(1), x)["params"]
    rest, quant = quantize_params(params, exclude_patterns=[], min_size=2**12)
    # big layer quantized, small layer (512*4 = 2048 < 2^12) stays
    assert "qvalue" in quant["big"]
    assert "kernel" not in rest["big"]
    assert "bias" in rest["big"]
    assert "kernel" in rest["small"]

    out_q = net.apply({"params": rest, "quant": quant}, x)
    out_f = net.apply({"params": params}, x)
    rel = np.max(np.abs(np.asarray(out_q - out_f))) / (np.max(np.abs(np.asarray(out_f))) + 1e-9)
    assert rel < 0.05

    # int8 collection is ~1/4 the bf16 base
    assert quantized_bytes(quant) < 256 * 512 * 2


def test_quant_plus_lora_compose():
    """The reference's accuracy-recovery-adapter path: LoRA over quantized base."""

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Linear(64, dtype=jnp.float32, param_dtype=jnp.float32, name="fc")(x)

    net = Net()
    x = jax.random.normal(jax.random.key(0), (2, 128))
    params = net.init(jax.random.key(1), x)["params"]
    rest, quant = quantize_params(params, exclude_patterns=[], min_size=1)
    lora = build_lora(params, LoRASpec(rank=4), jax.random.key(2))
    lora = jax.tree.map(lambda v: jnp.ones(v.shape) * 0.01, lora)
    out = net.apply({"params": rest, "quant": quant, "lora": lora}, x)
    base = net.apply({"params": rest, "quant": quant}, x)
    assert not np.allclose(np.asarray(out), np.asarray(base))


def test_flux_exclude_defaults():
    from ai_toolkit_tpu.config.modules import ModelConfig
    from ai_toolkit_tpu.models.registry import get_model_class

    model = get_model_class("flux")(ModelConfig(arch="flux", model_kwargs={"size": "tiny"}))
    variables = model.init_variables(jax.random.key(0))
    rest, quant = quantize_params(variables["dit"], min_size=1)
    # modulation / embedding layers excluded, attention/mlp kernels quantized
    assert "img_mod" in rest["double_0"] and "kernel" in rest["double_0"]["img_mod"]["mod"]
    assert "qvalue" in quant["double_0"]["img_qkv"]
