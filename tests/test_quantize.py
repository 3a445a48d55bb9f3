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


def test_qtype_backends_roundtrip():
    """qfloat8 / int4 storage backends (reference quanto/torchao qtypes):
    channelwise scales bound the roundtrip error; unknown qtypes raise."""
    import pytest

    from ai_toolkit_tpu.adapters.quantize import (
        dequantize_kernel_int8,
        get_quantize_kernel,
        quantize_kernel_fp8,
        quantize_kernel_int4,
    )

    w = jax.random.normal(jax.random.key(0), (128, 64), jnp.float32)
    qv, qs = quantize_kernel_fp8(w)
    assert str(qv.dtype) == "float8_e4m3fn"
    err = jnp.max(jnp.abs(dequantize_kernel_int8(qv, qs, jnp.float32) - w))
    # e4m3 mantissa = 3 bits -> ULP/2 = value/16 worst case near absmax
    assert float(err) < float(jnp.max(jnp.abs(w))) / 16.0 + 1e-3

    qv4, qs4 = quantize_kernel_int4(w)
    assert str(qv4.dtype) == "int4"
    err4 = jnp.max(jnp.abs(dequantize_kernel_int8(qv4, qs4, jnp.float32) - w))
    assert float(err4) < 0.5  # 4-bit: |err| <= scale/2 ~ absmax/14

    assert get_quantize_kernel("qfloat8") is quantize_kernel_fp8
    with pytest.raises(ValueError, match="unknown qtype"):
        get_quantize_kernel("q3_k_m")


def test_quantize_params_qtype_and_dequantize_tree():
    from ai_toolkit_tpu.adapters.quantize import dequantize_tree, quantize_params

    params = {
        "blk": {"attn": {"kernel": jax.random.normal(jax.random.key(1), (512, 256))},
                "norm": {"scale": jnp.ones((256,))}},
    }
    rest, quant = quantize_params(params, min_size=1, qtype="qfloat8")
    assert str(quant["blk"]["attn"]["qvalue"].dtype) == "float8_e4m3fn"
    assert "kernel" not in rest["blk"]["attn"]
    full = dequantize_tree(rest, quant, jnp.float32)
    assert full["blk"]["norm"]["scale"].shape == (256,)
    w0 = params["blk"]["attn"]["kernel"]
    err = jnp.max(jnp.abs(full["blk"]["attn"]["kernel"] - w0))
    assert float(err) < float(jnp.max(jnp.abs(w0))) / 16.0 + 1e-3


def test_merge_variables_stacks_frozen_ara_lora():
    """A frozen 'lora' collection in the base tree (accuracy recovery adapter)
    must STACK with the trainable lora (exact rank-concat), not be shadowed."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from ai_toolkit_tpu.ops.layers import Linear
    from ai_toolkit_tpu.train.state import merge_variables

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Linear(16, dtype=jnp.float32, param_dtype=jnp.float32, name="fc")(x)

    net = Net()
    x = jnp.ones((2, 16))
    params = net.init(jax.random.key(0), x)["params"]
    k1, k2 = jax.random.split(jax.random.key(1))

    def mk_lora(k, r):
        ka, kb = jax.random.split(k)
        return {"fc": {
            "a": jax.random.normal(ka, (16, r)) * 0.1,
            "b": jax.random.normal(kb, (r, 16)) * 0.1,
            "scale": jnp.float32(1.0),
        }}

    ara, trained = mk_lora(k1, 4), mk_lora(k2, 2)
    merged = merge_variables({"params": params, "lora": ara}, {"lora": trained})
    out = net.apply(merged, x)
    base = net.apply({"params": params}, x)
    out_ara = net.apply({"params": params, "lora": ara}, x)
    out_tr = net.apply({"params": params, "lora": trained}, x)
    # delta(concat) == delta(ara) + delta(trained), exactly
    np.testing.assert_allclose(
        np.asarray(out - base),
        np.asarray((out_ara - base) + (out_tr - base)), atol=1e-5)


def test_load_lokr_file_roundtrip(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from ai_toolkit_tpu.io.lora_file import load_lokr_file, save_adapter_file

    tree = {"blk": {"attn": {
        "w1": np.arange(6, dtype=np.float32).reshape(2, 3),
        "w2": np.arange(12, dtype=np.float32).reshape(3, 4) * 0.1,
        "scale": np.float32(1.0),
    }}}
    p = str(tmp_path / "ara_lokr.safetensors")
    save_adapter_file(tree, "lokr", p, prefix="lycoris")
    got, _ = load_lokr_file(p, {"blk_attn": "blk/attn"})
    leaf = got["blk"]["attn"]
    np.testing.assert_allclose(leaf["w1"], tree["blk"]["attn"]["w1"], atol=1e-3)
    np.testing.assert_allclose(leaf["w2"], tree["blk"]["attn"]["w2"], atol=1e-3)
    assert float(np.asarray(leaf["scale"])) == 1.0
