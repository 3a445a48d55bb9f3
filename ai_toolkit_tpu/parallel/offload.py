"""Host-offload for frozen parameters via XLA memory spaces.

Parity target: the reference's MemoryManager weight streaming
(``toolkit/memory_management/manager_modules.py:79-860`` — pinned-CPU
parameter residency with per-layer CUDA-stream staging, enabled by
``model.layer_offloading`` with ``layer_offloading_*_percent`` partial
offload, ``config_modules.py:712-714``).

TPU-native design: no hand-written staging. Frozen params are
``jax.device_put`` into the ``pinned_host`` memory space and passed to the
jitted train step as *inputs* (this repo's split-jit keeps frozen params
input-only already) — XLA inserts the host->HBM streaming copies in the
compiled program and overlaps them with compute. The offload fraction picks
the largest leaves first, matching the reference's offload_percent semantics
(``MemoryManager.attach`` skips norms/embeddings; here small leaves stay in
HBM automatically because selection is size-descending).
"""

from __future__ import annotations

import jax
import numpy as np


def _leaf_bytes(x) -> int:
    return int(np.prod(x.shape)) * x.dtype.itemsize if hasattr(x, "shape") else 0


def offload_to_host(tree, fraction: float = 1.0, min_bytes: int = 1 << 20, mesh=None):
    """Move ~``fraction`` of the tree's bytes (largest leaves first, leaves
    smaller than ``min_bytes`` never offloaded) into pinned_host memory.

    Returns (new_tree, stats). With a mesh, each leaf keeps its sharding
    spec and only the memory kind changes (sharded host offload).
    """
    leaves, treedef = jax.tree.flatten(tree)
    sizes = [_leaf_bytes(x) for x in leaves]
    total = sum(sizes)
    budget = total * float(fraction)
    order = sorted(range(len(leaves)), key=lambda i: -sizes[i])
    to_offload: set[int] = set()
    acc = 0
    for i in order:
        if acc >= budget:
            break
        if sizes[i] < min_bytes:
            continue
        to_offload.add(i)
        acc += sizes[i]

    def host_sharding(x):
        if mesh is not None and hasattr(x, "sharding") and hasattr(x.sharding, "spec"):
            return jax.sharding.NamedSharding(mesh, x.sharding.spec, memory_kind="pinned_host")
        if hasattr(x, "sharding") and isinstance(x.sharding, jax.sharding.NamedSharding):
            return jax.sharding.NamedSharding(
                x.sharding.mesh, x.sharding.spec, memory_kind="pinned_host"
            )
        dev = (
            x.devices().pop() if hasattr(x, "devices") and callable(getattr(x, "devices"))
            else jax.devices()[0]
        )
        return jax.sharding.SingleDeviceSharding(dev, memory_kind="pinned_host")

    new_leaves = []
    for i, x in enumerate(leaves):
        if i in to_offload:
            new_leaves.append(jax.device_put(x, host_sharding(x)))
        else:
            new_leaves.append(x)
    stats = {
        "total_bytes": total,
        "offloaded_bytes": acc,
        "offloaded_leaves": len(to_offload),
        "total_leaves": len(leaves),
    }
    return jax.tree.unflatten(treedef, new_leaves), stats


def offload_model_variables(variables: dict, cfg, mesh=None) -> dict:
    """Apply config-driven offload to frozen model components.

    cfg fields (reference names): ``layer_offloading`` (bool),
    ``layer_offloading_transformer_percent`` / ``..._text_encoder_percent``
    (floats 0..1, via model.extras or model_kwargs).
    """
    extras = {**getattr(cfg, "extras", {}), **getattr(cfg, "model_kwargs", {})}
    if not extras.get("layer_offloading") and not getattr(cfg, "low_vram", False):
        return variables
    tr_pct = float(extras.get("layer_offloading_transformer_percent", 1.0))
    te_pct = float(extras.get("layer_offloading_text_encoder_percent", 1.0))
    out = dict(variables)
    for key in ("dit", "unet", "transformer"):
        if key in out and tr_pct > 0:
            out[key], stats = offload_to_host(out[key], tr_pct, mesh=mesh)
            print(
                f"host-offload {key}: {stats['offloaded_bytes'] / 1e9:.2f} GB "
                f"({stats['offloaded_leaves']}/{stats['total_leaves']} leaves) -> pinned_host"
            )
    for key in ("t5", "te", "clip", "clip2", "llm"):
        if key in out and te_pct > 0:
            out[key], stats = offload_to_host(out[key], te_pct, mesh=mesh)
            if stats["offloaded_leaves"]:
                print(f"host-offload {key}: {stats['offloaded_bytes'] / 1e9:.2f} GB -> pinned_host")
    return out


def fetch_to_device(tree):
    """In-graph transfer of any pinned_host leaves back to device memory.

    Safe to call on every step input (trace-time no-op for device leaves);
    under jit XLA schedules the host->HBM copies and overlaps with compute.
    """

    def fix(x):
        ms = getattr(getattr(x, "aval", None), "memory_space", None)
        if ms is None and hasattr(x, "sharding"):
            mk = getattr(x.sharding, "memory_kind", None)
            if mk and "host" in str(mk):
                ms = mk
        if ms is not None and "host" in str(ms).lower():
            try:
                from jax._src.memory import Space

                return jax.device_put(x, Space.Device)
            except Exception:
                return jax.device_put(
                    x, jax.sharding.SingleDeviceSharding(jax.devices()[0], memory_kind="device")
                )
        return x

    return jax.tree.map(fix, tree)
