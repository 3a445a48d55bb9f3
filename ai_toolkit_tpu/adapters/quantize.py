"""Weight-only quantization of frozen base params (int8 channelwise).

TPU-native replacement for the reference's quantization stack
(``/root/reference/toolkit/util/quantize.py`` + the optimum-quanto / torchao /
custom-Triton backends, SURVEY §2.7): the frozen base kernels move into a
``quant`` collection ``{qvalue: int8, qscale: f32}`` that ``ops.layers.Linear``
dequantizes next to the MXU matmul. Halves HBM for the base (the usual reason
a 12B model doesn't fit), composes with the LoRA overlay (the reference's
"accuracy recovery adapter" path is just lora-on-quant here).
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np


def quantize_kernel_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[in, out] (or stacked [L, in, out]) -> (int8, per-output-channel scale)."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 127.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kernel_int8(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    return q.astype(dtype) * scale.astype(dtype)


DEFAULT_EXCLUDE = [
    r"norm", r"embedding", r"bias", r"mod/", r"_mod/", r"time_in", r"guidance_in",
    r"vector_in", r"final_",
]


def quantize_params(
    params: dict,
    exclude_patterns: list[str] | None = None,
    min_size: int = 2**16,
) -> tuple[dict, dict]:
    """Split a params tree into (remaining_params, quant_collection).

    2D kernels matching no exclude pattern and above min_size move to the
    quant collection; everything else stays in params. Per-model exclude
    lists mirror the reference's ``get_quantization_exclude_modules``
    (``base_model.py:1613``).
    """
    exclude = exclude_patterns if exclude_patterns is not None else DEFAULT_EXCLUDE

    def walk(node, path):
        rest, quant = {}, {}
        for k, v in node.items():
            p = f"{path}/{k}" if path else k
            if isinstance(v, dict):
                r, q = walk(v, p)
                rest[k] = r
                if q:
                    quant[k] = q
            else:
                is_kernel = k == "kernel" and getattr(v, "ndim", 0) in (2, 3)
                big = int(np.prod(v.shape)) >= min_size if hasattr(v, "shape") else False
                excluded = any(re.search(pat, p) for pat in exclude)
                if is_kernel and big and not excluded:
                    qv, qs = quantize_kernel_int8(v)
                    quant["qvalue"] = qv
                    quant["qscale"] = qs
                else:
                    rest[k] = v
        return rest, quant

    rest, quant = walk(params, "")
    return rest, quant


def quantized_bytes(quant: dict) -> int:
    return sum(
        x.size * x.dtype.itemsize for x in jax.tree.leaves(quant)
    )
