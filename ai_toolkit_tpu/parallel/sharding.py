"""Partition-rule engine: param-path regex -> PartitionSpec.

This is the deliverable SURVEY §2.11 calls for — the mesh/sharding layer that
replaces NCCL-era comm code. Rules are matched against '/'-joined param paths
(t5x-style); a FSDP heuristic shards the largest divisible axis of anything the
rules don't claim.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class PartitionRule:
    pattern: str  # regex, searched against the '/'-joined path
    spec: P

    def matches(self, path: str) -> bool:
        return re.search(self.pattern, path) is not None


def _path_str(key_path) -> str:
    parts = []
    for k in key_path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "idx"):
            parts.append(str(k.idx))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def _axis_sizes(mesh: Mesh) -> dict[str, int]:
    return dict(zip(mesh.axis_names, mesh.devices.shape))


def fsdp_partition(
    shape: tuple[int, ...],
    mesh: Mesh,
    axis: str = "fsdp",
    min_size: int = 2**16,
) -> P:
    """Shard the largest divisible dimension of a param over the fsdp axis.

    Small params (norm scales, biases) are replicated — sharding them only
    adds collective latency.
    """
    sizes = _axis_sizes(mesh)
    n = sizes.get(axis, 1)
    if n <= 1 or not shape:
        return P()
    total = 1
    for s in shape:
        total *= s
    if total < min_size:
        return P()
    # prefer the largest dim divisible by the axis size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n == 0 and shape[i] >= n:
            spec: list[Any] = [None] * len(shape)
            spec[i] = axis
            return P(*spec)
    return P()


def _validate_spec(spec: P, shape: tuple[int, ...], mesh: Mesh) -> P:
    """Drop sharded axes that don't divide the param dim (fallback: replicate dim)."""
    sizes = _axis_sizes(mesh)
    out: list[Any] = []
    for i, entry in enumerate(spec):
        if entry is None:
            out.append(None)
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        # axes absent from the mesh (e.g. 'ep' on a single-chip dp/fsdp/tp
        # mesh) are dropped, not passed through — NamedSharding rejects them
        names = tuple(nm for nm in names if nm in sizes)
        if not names:
            out.append(None)
            continue
        entry = names if len(names) > 1 else names[0]
        n = 1
        for nm in names:
            n *= sizes[nm]
        if i < len(shape) and shape[i] % n == 0:
            out.append(entry)
        else:
            out.append(None)
    # pad/trim to rank
    out = out[: len(shape)] + [None] * max(0, len(shape) - len(out))
    return P(*out)


def apply_rules(
    tree: Any,
    mesh: Mesh,
    rules: list[PartitionRule] | None = None,
    default: str = "fsdp",
    min_size: int = 2**16,
) -> Any:
    """Map a pytree of arrays/ShapeDtypeStructs to a pytree of PartitionSpec."""

    def spec_for(key_path, leaf):
        path = _path_str(key_path)
        shape = tuple(getattr(leaf, "shape", ()))
        for rule in rules or []:
            if rule.matches(path):
                return _validate_spec(rule.spec, shape, mesh)
        if default == "fsdp":
            return fsdp_partition(shape, mesh, min_size=min_size)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, tree)


def named_sharding_tree(spec_tree: Any, mesh: Mesh) -> Any:
    """PartitionSpec pytree -> NamedSharding pytree."""
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch_spec(mesh: Mesh, batch_axes: tuple[str, ...] = ("dp", "fsdp")) -> P:
    """Batch dim sharded over all data axes present in the mesh."""
    present = tuple(a for a in batch_axes if a in mesh.axis_names and _axis_sizes(mesh)[a] > 1)
    if not present:
        return P()
    return P(present if len(present) > 1 else present[0])


def shard_pytree(tree: Any, mesh: Mesh, rules: list[PartitionRule] | None = None) -> Any:
    """Device-put a pytree according to rules (host -> sharded device arrays)."""
    specs = apply_rules(tree, mesh, rules)
    shardings = named_sharding_tree(specs, mesh)
    return jax.device_put(tree, shardings)
