"""Core layers with functional LoRA overlay and quantized-base hooks.

TPU-first redesign of the reference's adapter injection: instead of
monkey-patching ``nn.Linear.forward`` per module
(``/root/reference/toolkit/network_mixins.py:197-350``), every matmul-bearing
layer here *reads optional extra variable collections* at apply time:

- ``lora``: ``{a: [in, r], b: [r, out], scale: [] or [B]}`` — the factored
  update ``y += scale * (x @ a) @ b`` runs inside the same jitted forward, so
  XLA fuses it with the base matmul; merge_in/merge_out and per-sample
  multipliers are pure pytree operations (see ``adapters/lora.py``).
- ``quant``: ``{qvalue: int8[in, out], qscale: f32[1, out] or [G, out]}`` —
  weight-only quantized base; dequant happens in-register next to the MXU
  matmul (channelwise or groupwise scales).
- ``ctrl``: ``{w: [extra_in, out], b?: [out]}`` — trainable input-channel
  expansion. When present, the layer accepts inputs wider than the frozen
  kernel and routes the trailing ``extra_in`` features through ``w``:
  ``y = x_base @ kernel + x_extra @ w``. This is numerically identical to
  the reference's concat-weight hijack (``control_lora_adapter.py:86-113``
  ImgEmbedder: ``linear(x, cat([orig_w, new_w], dim=1))``) but stays a pure
  variable read — the base params are untouched and XLA fuses both matmuls.

If neither collection is present the layer is a plain Dense/Conv.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
default_kernel_init = nn.initializers.lecun_normal()


def _lora_delta(self: nn.Module, x: jax.Array, y: jax.Array, dtype: Dtype) -> jax.Array:
    """Apply the low-rank overlay from the 'lora' collection, if present."""
    if not self.has_variable("lora", "a"):
        return y
    a = self.get_variable("lora", "a").astype(dtype)
    b = self.get_variable("lora", "b").astype(dtype)
    scale = self.get_variable("lora", "scale")
    if a.ndim == 3:
        # per-sample generated factors (InstantLoRA, adapters/ilora.py):
        # a [B, in, r], b [B, r, out] — batched einsum keeps it one fused op
        h = jnp.einsum("b...i,bir->b...r", x, a)
        delta = jnp.einsum("b...r,bro->b...o", h, b)
    else:
        h = x @ a
        delta = h @ b
    scale = jnp.asarray(scale, dtype)
    if scale.ndim > 0:  # per-batch-item multiplier [B] -> broadcast over trailing dims
        scale = scale.reshape(scale.shape + (1,) * (delta.ndim - scale.ndim))
    return y + delta * scale


def _base_kernel(self: nn.Module, shape: tuple[int, ...], param_dtype: Dtype, dtype: Dtype):
    """Fetch the base kernel, dequantizing from the 'quant' collection if present."""
    if self.has_variable("quant", "qvalue"):
        qv = self.get_variable("quant", "qvalue")
        qs = self.get_variable("quant", "qscale")
        return (qv.astype(dtype) * qs.astype(dtype)).reshape(shape)
    kernel = self.param("kernel", default_kernel_init, shape, param_dtype)
    return kernel.astype(dtype)


class Linear(nn.Module):
    """Dense layer with LoRA / LoKr / DoRA / quant collection hooks.

    Weight layout is ``[in_features, out_features]`` (JAX convention; note the
    transpose vs torch ``nn.Linear`` — checkpoint importers handle this).
    """

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(self.dtype)
        if self.has_variable("lorm", "a"):
            # LoRM: the factor pair REPLACES the base kernel entirely (the
            # kernel leaf is deleted from params by adapters/lorm.build_lorm)
            a = self.get_variable("lorm", "a").astype(self.dtype)
            b = self.get_variable("lorm", "b").astype(self.dtype)
            y = (x @ a) @ b
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros_init(),
                                  (self.features,), self.param_dtype)
                y = y + bias.astype(self.dtype)
            return y
        x_ctrl = ctrl_w = None
        if self.has_variable("ctrl", "w"):
            # trainable input-channel expansion (see module docstring): the
            # trailing extra_in features bypass the frozen kernel
            ctrl_w = self.get_variable("ctrl", "w").astype(self.dtype)
            extra_in = ctrl_w.shape[0]
            x, x_ctrl = x[..., :-extra_in], x[..., -extra_in:]
        in_features = x.shape[-1]
        if self.has_variable("quant", "qvalue"):
            # int8 weight-only: keep the matmul in int8-input-friendly form:
            # (x * 1) @ (qv * qs) — XLA fuses the dequant into the matmul.
            qv = self.get_variable("quant", "qvalue")
            qs = self.get_variable("quant", "qscale")
            kernel = qv.astype(self.dtype) * qs.astype(self.dtype)
        else:
            kernel = self.param(
                "kernel", default_kernel_init, (in_features, self.features), self.param_dtype
            ).astype(self.dtype)

        if self.has_variable("lokr", "w1"):
            # LoKr: delta = kron(w1, w2) * scale (LyCORIS lokr)
            w1 = self.get_variable("lokr", "w1").astype(self.dtype)
            w2 = self.get_variable("lokr", "w2").astype(self.dtype)
            scale = jnp.asarray(self.get_variable("lokr", "scale"), self.dtype)
            delta = jnp.einsum("ab,cd->acbd", w1, w2).reshape(kernel.shape)
            kernel = kernel + delta * scale

        if self.has_variable("loha", "w1a"):
            # LoHa: delta = (w1a@w1b) * (w2a@w2b) * scale (LyCORIS hadamard)
            w1a = self.get_variable("loha", "w1a").astype(self.dtype)
            w1b = self.get_variable("loha", "w1b").astype(self.dtype)
            w2a = self.get_variable("loha", "w2a").astype(self.dtype)
            w2b = self.get_variable("loha", "w2b").astype(self.dtype)
            scale = jnp.asarray(self.get_variable("loha", "scale"), self.dtype)
            kernel = kernel + (w1a @ w1b) * (w2a @ w2b) * scale

        if self.has_variable("dora", "magnitude"):
            # DoRA: direction = (W + lora delta) column-normalized, scaled by a
            # learned per-output magnitude; lora factors live in 'dora' too.
            a = self.get_variable("dora", "a").astype(self.dtype)
            b = self.get_variable("dora", "b").astype(self.dtype)
            scale = jnp.asarray(self.get_variable("dora", "scale"), self.dtype)
            mag = self.get_variable("dora", "magnitude").astype(jnp.float32)  # [out]
            w = kernel.astype(jnp.float32) + (a.astype(jnp.float32) @ b.astype(jnp.float32)) * scale
            norm = jnp.linalg.norm(w, axis=0, keepdims=True)
            kernel = (w * (mag[None, :] / jnp.maximum(norm, 1e-6))).astype(self.dtype)
            y = x @ kernel
        else:
            y = x @ kernel
            y = _lora_delta(self, x, y, self.dtype)
        if ctrl_w is not None:
            y = y + x_ctrl @ ctrl_w
            if self.has_variable("ctrl", "b"):
                y = y + self.get_variable("ctrl", "b").astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class Conv(nn.Module):
    """NHWC convolution with LoCon-style LoRA overlay.

    LoRA factorization for conv (reference conv LoRA,
    ``/root/reference/toolkit/lora_special.py``): ``a`` is a [kh, kw, in, r]
    conv and ``b`` a 1x1 [1, 1, r, out] conv.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    groups: int = 1  # feature_group_count (groups == in_features -> depthwise)
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        x = x.astype(self.dtype)
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", default_kernel_init,
            (kh, kw, in_features // self.groups, self.features), self.param_dtype,
        ).astype(self.dtype)
        dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=tuple(self.strides), padding=self.padding,
            dimension_numbers=dn, feature_group_count=self.groups,
        )
        if self.has_variable("lora", "a"):
            a = self.get_variable("lora", "a").astype(self.dtype)  # [kh, kw, in, r]
            b = self.get_variable("lora", "b").astype(self.dtype)  # [1, 1, r, out]
            scale = jnp.asarray(self.get_variable("lora", "scale"), self.dtype)
            h = jax.lax.conv_general_dilated(
                x, a, window_strides=tuple(self.strides), padding=self.padding,
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    x.shape, a.shape, ("NHWC", "HWIO", "NHWC")
                ),
            )
            delta = jax.lax.conv_general_dilated(
                h, b, window_strides=(1, 1), padding="SAME",
                dimension_numbers=jax.lax.conv_dimension_numbers(
                    h.shape, b.shape, ("NHWC", "HWIO", "NHWC")
                ),
            )
            if scale.ndim > 0:
                scale = scale.reshape(scale.shape + (1,) * (delta.ndim - scale.ndim))
            y = y + delta * scale
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), self.param_dtype)
            y = y + bias.astype(self.dtype)
        return y


class RMSNorm(nn.Module):
    dim: int | None = None
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32
    use_scale: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = self.dim or x.shape[-1]
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones_init(), (dim,), self.param_dtype)
            y = y * scale.astype(jnp.float32)
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    eps: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        if self.use_scale:
            scale = self.param("scale", nn.initializers.ones_init(), (dim,), self.param_dtype)
            y = y * scale.astype(jnp.float32)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros_init(), (dim,), self.param_dtype)
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # x: [..., C]
        c = x.shape[-1]
        g = min(self.num_groups, c)
        xf = x.astype(jnp.float32)
        shape = x.shape[:-1] + (g, c // g)
        xg = xf.reshape(shape)
        red_axes = tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,)
        # NOTE (r5, measured on TPU): a one-pass E[x^2]-E[x]^2 variant cuts the
        # SDXL step's bytes 343->333 GB but SLOWS the step 511->641/698 ms
        # (achieved BW collapses 82%->~60%; XLA schedules the combined reduce
        # worse than two fused passes). Keep the two-pass form.
        mean = jnp.mean(xg, axis=red_axes, keepdims=True)
        var = jnp.var(xg, axis=red_axes, keepdims=True)
        xg = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        y = xg.reshape(x.shape)
        scale = self.param("scale", nn.initializers.ones_init(), (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), self.param_dtype)
        return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(self.dtype)


class AdaLayerNormZero(nn.Module):
    """DiT adaLN-Zero: conditioning -> (shift, scale, gate) modulation sets."""

    dim: int
    n_mods: int = 6  # 6 for double blocks (attn+mlp), 3 for single
    dtype: Dtype = jnp.bfloat16
    param_dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, cond: jax.Array) -> tuple[jax.Array, ...]:
        h = nn.silu(cond.astype(self.dtype))
        mods = Linear(
            self.dim * self.n_mods, dtype=self.dtype, param_dtype=self.param_dtype, name="mod"
        )(h)
        return tuple(jnp.split(mods, self.n_mods, axis=-1))


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """x * (1 + scale) + shift with broadcast over the sequence axis."""
    while shift.ndim < x.ndim:
        shift = shift[:, None]
        scale = scale[:, None]
    return x * (1.0 + scale) + shift
