"""InstantLoRA: per-sample LoRA weights generated from vision embeddings.

Parity target: the reference's ``toolkit/models/ilora.py`` (InstantLoRAModule
+ LoRAGenerator + InstantLoRAMidModule). The torch version hijacks every
``lora_down/lora_up`` forward with per-sample weight chunks sliced out of a
generated flat vector. TPU-first redesign: the generator is a pure Flax
module whose output vector is *reshaped into the 'lora' variable collection
itself*, with a leading batch axis on every ``a``/``b`` leaf —
``ops.layers._lora_delta`` detects the extra axis and runs the low-rank
branch as a batched einsum, so the whole thing stays inside one jitted
train step (no dynamic forwards, no weight chunk loops).

Scanned DiT stacks (params ``[L, in, out]``) are handled by generating
``[L, B, in, r]`` / ``[L, B, r, out]`` leaves: ``nn.scan`` slices the layer
axis as usual and each layer sees its per-sample factors.

Conv LoRA targets are excluded (the reference supports them via per-sample
``conv2d`` loops — a shape-dynamic pattern that XLA can't tile; linear /
scanned-linear targets cover every DiT and the UNet attention projections).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.adapters.ip_adapter import Resampler
from ai_toolkit_tpu.ops.layers import LayerNorm, Linear


@dataclass(frozen=True)
class ILoRAEntry:
    path: tuple[str, ...]
    kind: str  # 'linear' | 'scanned'
    a_shape: tuple[int, ...]  # [in, r] or [L, in, r]
    b_shape: tuple[int, ...]  # [r, out] or [L, r, out]
    offset: int  # start of this entry's slice in the flat vector

    @property
    def size(self) -> int:
        return int(np.prod(self.a_shape) + np.prod(self.b_shape))


@dataclass(frozen=True)
class ILoRASpec:
    entries: tuple[ILoRAEntry, ...]
    total: int


def _iter_lora_leaves(tree: dict, prefix: tuple[str, ...] = ()):
    if isinstance(tree, dict):
        if {"a", "b", "scale"} <= set(tree.keys()):
            yield prefix, tree
            return
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from _iter_lora_leaves(v, prefix + (str(k),))


def build_ilora_spec(lora_tree: dict) -> ILoRASpec:
    """Flatten a built 'lora' collection into a generation spec.

    Conv factors (a.ndim == 4) are skipped; those modules keep their static
    trainable LoRA (if any) untouched by the generator.
    """
    entries = []
    offset = 0
    for path, node in _iter_lora_leaves(lora_tree):
        a, b = np.shape(node["a"]), np.shape(node["b"])
        if len(a) == 2:
            kind = "linear"
        elif len(a) == 3:
            kind = "scanned"
        else:
            continue  # conv
        e = ILoRAEntry(path, kind, tuple(a), tuple(b), offset)
        offset += e.size
        entries.append(e)
    if not entries:
        raise ValueError("ilora: no linear LoRA targets found in the network")
    return ILoRASpec(tuple(entries), offset)


class _ResidualMLP(nn.Module):
    """LN -> fc1 -> GELU -> fc2 (+residual) — reference ilora.MLP."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = LayerNorm(dtype=self.dtype, name="layernorm")(x)
        h = Linear(self.dim, dtype=self.dtype, param_dtype=self.dtype, name="fc1")(h)
        h = Linear(self.dim, dtype=self.dtype, param_dtype=self.dtype, name="fc2")(
            jax.nn.gelu(h, approximate=False)
        )
        return x + h


class ILoRAGenerator(nn.Module):
    """vision tokens [B, N, E] -> flat per-sample LoRA weights [B, total].

    Mirrors the reference stack: Resampler (num_heads query tokens of
    head_dim) -> lin_in -> MLP -> head -> LayerNorm -> per-head output
    projections (weights scaled 0.01 at init so generated deltas start tiny),
    chunks concatenated then averaged over heads.
    """

    total: int
    head_dim: int = 512
    num_heads: int = 1
    resampler_depth: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vision_tokens: jax.Array) -> jax.Array:
        dt = self.dtype
        if self.total % self.num_heads:
            raise ValueError("ilora: total size must divide num_heads")
        x = Resampler(
            self.head_dim, n_tokens=self.num_heads,
            dim=min(768, max(64, self.head_dim)), depth=self.resampler_depth,
            heads=max(1, min(12, self.head_dim // 64)), dtype=dt, name="resampler",
        )(vision_tokens)  # [B, num_heads, head_dim]
        x = Linear(self.head_dim, dtype=dt, param_dtype=dt, name="lin_in")(x)
        x = _ResidualMLP(self.head_dim, dtype=dt, name="mlp_0")(x)
        x = Linear(self.head_dim, use_bias=False, dtype=dt, param_dtype=dt,
                   name="head")(x)
        x = LayerNorm(dtype=dt, name="norm")(x)
        per_head = self.total // self.num_heads
        outs = []
        small = nn.initializers.variance_scaling(0.01 ** 2, "fan_in", "truncated_normal")
        for i in range(self.num_heads):
            w = self.param(f"output_{i}_kernel", small, (self.head_dim, per_head), dt)
            bias = self.param(f"output_{i}_bias", nn.initializers.zeros_init(),
                              (per_head,), dt)
            outs.append(x[:, i] @ w + bias)
        return jnp.concatenate(outs, axis=-1)  # [B, total]


def vector_to_lora_tree(vec: jax.Array, spec: ILoRASpec, base_tree: dict) -> dict:
    """[B, total] -> a 'lora' collection with per-sample a/b leaves.

    Scale leaves are taken from ``base_tree`` (alpha/rank, [L] for scanned
    stacks); non-generated leaves (conv) pass through unchanged.
    """
    b = vec.shape[0]
    out = jax.tree.map(lambda x: x, base_tree)  # shallow-copy containers

    def node_at(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    for e in spec.entries:
        seg = vec[:, e.offset:e.offset + e.size]
        na = int(np.prod(e.a_shape))
        if e.kind == "linear":
            a = seg[:, :na].reshape((b,) + e.a_shape)  # [B, in, r]
            bb = seg[:, na:].reshape((b,) + e.b_shape)  # [B, r, out]
        else:  # scanned: [L, B, in, r] so nn.scan slices the layer axis
            a = seg[:, :na].reshape((b,) + e.a_shape).transpose(1, 0, 2, 3)
            bb = seg[:, na:].reshape((b,) + e.b_shape).transpose(1, 0, 2, 3)
        node = node_at(out, e.path)
        node = dict(node)
        node["a"], node["b"] = a, bb
        parent = node_at(out, e.path[:-1]) if e.path[:-1] else out
        parent[e.path[-1]] = node
    return out


def make_ilora_apply(spec: ILoRASpec, base_tree: dict, module: ILoRAGenerator):
    """Return apply(params, variables, cond) -> (variables, cond): generates
    the per-sample lora collection from cond['vision_tokens'] and installs it.

    If the context batch is 2x the vision batch (CFG stacking at sample
    time), the generated weights are tiled — reference
    ``InstantLoRAMidModule.down_forward`` unconditional handling.
    """

    def apply(params: dict, variables: dict, cond: dict):
        vt = cond.get("vision_tokens")
        if vt is None:
            return variables, cond
        vec = module.apply({"params": params}, vt)
        ctx = cond.get("txt", cond.get("context"))
        if ctx is not None and ctx.shape[0] == 2 * vec.shape[0]:
            vec = jnp.concatenate([vec, vec], axis=0)
        tree = vector_to_lora_tree(vec, spec, base_tree)
        new_vars = dict(variables)
        new_vars["lora"] = tree
        cond = {k: v for k, v in cond.items() if k != "vision_tokens"}
        return new_vars, cond

    return apply
