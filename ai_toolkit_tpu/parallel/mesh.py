"""Named-mesh construction over ICI/DCN.

TPU-native replacement for the reference's HF-Accelerate data parallelism
(``/root/reference/toolkit/accelerator.py``) and its naive multi-GPU layer
splitter (``/root/reference/toolkit/models/flux.py:121-178``): all parallelism
here is expressed as shardings over one ``jax.sharding.Mesh``.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ai_toolkit_tpu.config.modules import MeshConfig

# Canonical axis meaning (scaling-book conventions):
#   dp   — pure data parallel (replicated params, sharded batch)
#   fsdp — data parallel with parameter sharding (batch AND params sharded)
#   tp   — tensor parallel inside a layer (activations sharded on features)
#   sp   — sequence/context parallel (tokens/frames axis)
#   ep   — expert parallel (MoE)
BATCH_AXES = ("dp", "fsdp")


def mesh_shape_for_devices(cfg: MeshConfig, n_devices: int) -> dict[str, int]:
    """Resolve -1 axis sizes against the device count."""
    axes = dict(cfg.axes)
    order = [a for a in cfg.axis_order if a in axes]
    fixed = math.prod(v for v in axes.values() if v and v > 0)
    wild = [k for k, v in axes.items() if v in (-1, 0, None)]
    if n_devices % max(fixed, 1) != 0:
        raise ValueError(
            f"mesh axes {axes} do not divide device count {n_devices}"
        )
    remaining = n_devices // max(fixed, 1)
    if not wild:
        if fixed != n_devices:
            raise ValueError(f"mesh {axes} covers {fixed} devices but {n_devices} available")
    else:
        # first wildcard absorbs the remainder, the rest get 1
        axes[wild[0]] = remaining
        for k in wild[1:]:
            axes[k] = 1
    return {a: int(axes[a]) for a in order}


def make_mesh(cfg: MeshConfig | None = None, devices: Sequence[jax.Device] | None = None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    shape = mesh_shape_for_devices(cfg, len(devices))
    names = tuple(shape.keys())
    dev_array = np.asarray(devices).reshape(tuple(shape.values()))
    return Mesh(dev_array, axis_names=names)


def single_device_mesh(axis_names: Sequence[str] = ("dp", "fsdp", "tp")) -> Mesh:
    """A trivial mesh so the same pjit code path runs on one chip."""
    dev = np.asarray(jax.devices()[:1]).reshape((1,) * len(axis_names))
    return Mesh(dev, axis_names=tuple(axis_names))


def init_distributed() -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    On a single host this is a no-op. Equivalent role to torch.distributed
    init inside HF Accelerate in the reference.
    """
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
