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


def quantize_kernel_fp8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """float8_e4m3 storage with per-output-channel scale to the e4m3 max
    (448). The reference's quanto qfloat8 backend analog; on TPU the upcast
    is a free XLA fusion like int8."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 448.0
    scale = jnp.maximum(scale, 1e-12)
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return q, scale


def quantize_kernel_int4(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """4-bit signed storage (jnp.int4, packed 2/byte in HBM) with
    per-output-channel scale — the uint4/torchao-uintx analog."""
    wf = jnp.asarray(w, jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=-2, keepdims=True) / 7.0
    scale = jnp.maximum(scale, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int4)
    return q, scale


# reference qtype strings (toolkit/util/quantize.get_qtype: quanto / torchao
# names) -> our backend. nvfp4 has no TPU dtype; int4 is the closest
# same-width storage and we say so at quantize time.
_QTYPE_BACKENDS = {
    "qint8": quantize_kernel_int8,
    "int8": quantize_kernel_int8,
    "uint8": quantize_kernel_int8,
    "qfloat8": quantize_kernel_fp8,
    "float8": quantize_kernel_fp8,
    "fp8": quantize_kernel_fp8,
    "float8_e4m3fn": quantize_kernel_fp8,
    "qint4": quantize_kernel_int4,
    "int4": quantize_kernel_int4,
    "uint4": quantize_kernel_int4,
    "uint4wo": quantize_kernel_int4,
    "nvfp4": quantize_kernel_int4,
    "uint3": quantize_kernel_int4,
    "uint2": quantize_kernel_int4,
}


def get_quantize_kernel(qtype: str):
    fn = _QTYPE_BACKENDS.get(str(qtype).lower())
    if fn is None:
        raise ValueError(
            f"unknown qtype {qtype!r} (supported: {sorted(_QTYPE_BACKENDS)})"
        )
    if str(qtype).lower() in ("nvfp4", "uint3", "uint2"):
        print(f"qtype {qtype}: no TPU dtype — storing int4 (closest width)")
    return fn


def dequantize_kernel_int8(q: jax.Array, scale: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """Generic dequant: works for int8/fp8/int4 qvalues alike."""
    return q.astype(dtype) * scale.astype(dtype)


DEFAULT_EXCLUDE = [
    r"norm", r"embedding", r"bias", r"mod/", r"_mod/", r"time_in", r"guidance_in",
    r"vector_in", r"final_",
]


def quantize_params(
    params: dict,
    exclude_patterns: list[str] | None = None,
    min_size: int = 2**16,
    qtype: str = "qint8",
) -> tuple[dict, dict]:
    """Split a params tree into (remaining_params, quant_collection).

    2D kernels matching no exclude pattern and above min_size move to the
    quant collection; everything else stays in params. Per-model exclude
    lists mirror the reference's ``get_quantization_exclude_modules``
    (``base_model.py:1613``).
    """
    exclude = exclude_patterns if exclude_patterns is not None else DEFAULT_EXCLUDE
    qfn = get_quantize_kernel(qtype)

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
                    qv, qs = qfn(v)
                    quant["qvalue"] = qv
                    quant["qscale"] = qs
                else:
                    rest[k] = v
        return rest, quant

    rest, quant = walk(params, "")
    return rest, quant


def dequantize_tree(rest: dict, quant: dict, dtype=jnp.bfloat16) -> dict:
    """Re-insert dequantized kernels into a params tree split by
    ``quantize_params``. Used for components whose apply path takes bare
    params (text encoders): weights sit in HBM quantized; the full tree is
    materialized transiently inside the (jitted) encode call."""
    out = dict(rest)
    if "qvalue" in quant:
        out["kernel"] = dequantize_kernel_int8(quant["qvalue"], quant["qscale"], dtype)
    for k, q in quant.items():
        if k in ("qvalue", "qscale"):
            continue
        out[k] = dequantize_tree(out.get(k, {}), q, dtype)
    return out


def quantized_bytes(quant: dict) -> int:
    def nbytes(x):
        if "int4" in str(x.dtype):
            return (x.size + 1) // 2  # packed two per byte in HBM
        return x.size * x.dtype.itemsize

    return sum(nbytes(x) for x in jax.tree.leaves(quant))
