"""LoRA as a functional parameter overlay.

The reference implements LoRA by monkey-patching module forwards and holding
mutable multiplier state (``/root/reference/toolkit/network_mixins.py:197-350``,
``lora_special.py``). Here a LoRA network is *just a pytree* shaped like the
extra ``lora`` variable collection that ``ops.layers.Linear``/``Conv`` read:

    {"blocks_0": {"attn": {"qkv": {"a": [in,r], "b": [r,out], "scale": []}}}}

which makes every reference capability a pure function:
- apply_to        -> pass the tree as the 'lora' collection in apply()
- multiplier      -> ``scale_lora`` (supports per-batch-item multipliers)
- merge_in/out    -> ``merge_lora`` / ``unmerge_lora`` (exact inverses)
- save/load       -> io/lora_file.py (kohya-format safetensors)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp

from ai_toolkit_tpu.config.modules import NetworkConfig


@dataclass
class LoRASpec:
    """Which modules get adapters, and at what rank."""

    rank: int = 16
    alpha: float = 16.0
    conv_rank: int | None = None
    conv_alpha: float | None = None
    # path filters, matched as substrings against '/'-joined module paths
    only_if_contains: list[str] | None = None
    ignore_if_contains: list[str] | None = None
    # model-provided default target patterns (regex); None = all linear/conv
    target_patterns: list[str] | None = None
    init_std: float = 0.01

    @classmethod
    def from_network_config(
        cls, cfg: NetworkConfig, target_patterns: list[str] | None = None
    ) -> "LoRASpec":
        return cls(
            rank=cfg.rank,
            alpha=cfg.alpha,
            conv_rank=cfg.conv,
            conv_alpha=cfg.conv_alpha if cfg.conv_alpha is not None else cfg.alpha,
            only_if_contains=cfg.only_if_contains,
            ignore_if_contains=cfg.ignore_if_contains,
            target_patterns=target_patterns,
        )


def _iter_modules(params: dict, prefix: tuple[str, ...] = ()):
    """Yield (path_tuple, node) for every module node holding a 'kernel'."""
    if isinstance(params, dict):
        if "kernel" in params and hasattr(params["kernel"], "shape"):
            yield prefix, params
        for k, v in params.items():
            if isinstance(v, dict):
                yield from _iter_modules(v, prefix + (str(k),))


def _matches(path: str, spec: LoRASpec) -> bool:
    if spec.ignore_if_contains and any(s in path for s in spec.ignore_if_contains):
        return False
    if spec.only_if_contains:
        return any(s in path for s in spec.only_if_contains)
    if spec.target_patterns:
        return any(re.search(p, path) for p in spec.target_patterns)
    return True


def build_lora(params: dict, spec: LoRASpec, rng: jax.Array) -> dict:
    """Create the lora collection tree for a base params tree.

    Linear kernels [in, out] get a:[in,r] (normal init), b:[r,out] (zeros).
    Conv kernels [kh, kw, in, out] get a:[kh,kw,in,cr], b:[1,1,cr,out].
    """
    lora: dict[str, Any] = {}
    targets = []
    for path, node in _iter_modules(params):
        pstr = "/".join(path)
        kshape = node["kernel"].shape
        if len(kshape) == 2 and _matches(pstr, spec):
            targets.append((path, kshape, "linear"))
        elif len(kshape) == 3 and _matches(pstr, spec):
            # scanned (nn.scan) linear stack: [L, in, out]
            targets.append((path, kshape, "scanned_linear"))
        elif len(kshape) == 4 and spec.conv_rank and _matches(pstr, spec):
            targets.append((path, kshape, "conv"))
    if not targets:
        return {}
    rngs = jax.random.split(rng, len(targets))
    for (path, kshape, kind), key in zip(targets, rngs):
        if kind == "linear":
            r = spec.rank
            a = jax.random.normal(key, (kshape[0], r), jnp.float32) * spec.init_std
            b = jnp.zeros((r, kshape[1]), jnp.float32)
            scale = jnp.asarray(spec.alpha / r, jnp.float32)
        elif kind == "scanned_linear":
            r = spec.rank
            layers, cin, cout = kshape
            a = jax.random.normal(key, (layers, cin, r), jnp.float32) * spec.init_std
            b = jnp.zeros((layers, r, cout), jnp.float32)
            # [L] so nn.scan's variable_axes={'lora': 0} can slice it per layer
            scale = jnp.full((layers,), spec.alpha / r, jnp.float32)
        else:
            r = int(spec.conv_rank)
            kh, kw, cin, cout = kshape
            a = jax.random.normal(key, (kh, kw, cin, r), jnp.float32) * spec.init_std
            b = jnp.zeros((1, 1, r, cout), jnp.float32)
            alpha = spec.conv_alpha if spec.conv_alpha is not None else spec.alpha
            scale = jnp.asarray(alpha / r, jnp.float32)
        node = lora
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {"a": a, "b": b, "scale": scale}
    return lora


def _is_lora_leaf(x: Any) -> bool:
    return isinstance(x, dict) and set(x.keys()) == {"a", "b", "scale"}


def lora_paths(lora: dict) -> list[tuple[str, ...]]:
    out = []

    def walk(node, prefix):
        if _is_lora_leaf(node):
            out.append(prefix)
            return
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, prefix + (k,))

    walk(lora, ())
    return out


def scale_lora(lora: dict, multiplier: jax.Array | float) -> dict:
    """Return a lora tree with all scales multiplied (scalar or per-sample [B])."""
    mult = jnp.asarray(multiplier)

    def upd(node):
        if _is_lora_leaf(node):
            return {**node, "scale": node["scale"] * mult}
        return {k: upd(v) for k, v in node.items()}

    return upd(lora)


def _delta(leaf: dict) -> jax.Array:
    a, b, scale = leaf["a"], leaf["b"], leaf["scale"]
    if a.ndim == 2:
        return (a @ b) * scale
    if a.ndim == 3:  # scanned stack: [L,in,r] x [L,r,out]; scale is [L]
        s = jnp.asarray(scale).reshape(-1, 1, 1)
        return jnp.einsum("lir,lro->lio", a, b) * s
    # conv: [kh,kw,in,r] x [1,1,r,out] -> [kh,kw,in,out]
    return jnp.einsum("hwir,xyro->hwio", a, b) * scale


def _apply_delta(params: dict, lora: dict, sign: float) -> dict:
    def walk(p_node, l_node):
        if _is_lora_leaf(l_node):
            d = _delta(l_node).astype(p_node["kernel"].dtype)
            return {**p_node, "kernel": p_node["kernel"] + sign * d}
        out = dict(p_node)
        for k, v in l_node.items():
            out[k] = walk(p_node[k], v)
        return out

    return walk(params, lora)


def merge_lora(params: dict, lora: dict, multiplier: float = 1.0) -> dict:
    """W' = W + multiplier * scale * (a @ b) — for export or fast sampling."""
    return _apply_delta(params, scale_lora(lora, multiplier), 1.0)


def unmerge_lora(params: dict, lora: dict, multiplier: float = 1.0) -> dict:
    return _apply_delta(params, scale_lora(lora, multiplier), -1.0)


def concat_loras(first: dict | None, second: dict | None) -> dict | None:
    """Exact sum of two plain-LoRA overlays as ONE lora collection.

    Per shared module the rank axes concatenate (each lora's scale folded into
    its 'b' first, so the combined delta is a1@b1*s1 + a2@b2*s2 exactly);
    modules present in only one tree pass through. Used by the
    unconditional-pass LoRA (reference ideogram4 src/pipeline.py:381-395:
    trained network AND uncond lora both active on the uncond CFG branch).
    """
    if first is None or not first:
        return second
    if second is None or not second:
        return first

    def fold(leaf):
        s = jnp.asarray(leaf["scale"])
        b = leaf["b"] * jnp.reshape(s, s.shape + (1,) * (leaf["b"].ndim - s.ndim))
        return leaf["a"], b

    def walk(x, y):
        if x is None:
            return y
        if y is None:
            return x
        if _is_lora_leaf(x) and _is_lora_leaf(y):
            ax, bx = fold(x)
            ay, by = fold(y)
            return {
                "a": jnp.concatenate([ax, ay], axis=-1),
                "b": jnp.concatenate([bx, by], axis=-2),
                "scale": jnp.ones_like(jnp.asarray(x["scale"])),
            }
        if isinstance(x, dict) and isinstance(y, dict):
            return {k: walk(x.get(k), y.get(k)) for k in set(x) | set(y)}
        raise ValueError("concat_loras: incompatible lora trees")

    return walk(first, second)


def count_lora_params(lora: dict) -> int:
    return sum(
        x.size for x in jax.tree.leaves(lora)
    )
