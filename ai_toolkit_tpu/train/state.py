"""TrainState: the single pytree the jitted train step maps over.

Replaces the mutable object soup of the reference's train lifecycle
(network/optimizer/EMA spread across ``BaseSDTrainProcess`` attributes) with
one immutable struct: ``(state, batch, rng) -> (state, metrics)``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    # frozen base variables: {'params': ..., optionally 'quant': ...}
    model_variables: Any
    # the thing being trained: {'lora': tree} and/or {'params': tree}, {'emb': tree}
    trainable: Any
    opt_state: Any
    ema: Any = None  # EMA copy of `trainable` (None if disabled)
    tx: optax.GradientTransformation = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, model_variables, trainable, tx, use_ema: bool = False):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            model_variables=model_variables,
            trainable=trainable,
            opt_state=tx.init(trainable),
            ema=jax.tree.map(lambda x: x, trainable) if use_ema else None,
            tx=tx,
        )

    def apply_gradients(self, grads, ema_decay: float | None = None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.trainable)
        new_trainable = optax.apply_updates(self.trainable, updates)
        new_ema = self.ema
        if self.ema is not None and ema_decay is not None:
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1.0 - ema_decay),
                self.ema,
                new_trainable,
            )
        return self.replace(
            step=self.step + 1,
            trainable=new_trainable,
            opt_state=new_opt_state,
            ema=new_ema,
        )


def merge_variables(model_variables: dict, trainable: dict) -> dict:
    """Compose frozen base collections with trainable overlays for apply().

    New collections (e.g. 'lora') are attached as-is; keys that already exist
    in the base tree (e.g. 'params' or a component like 'dit' under full
    fine-tune) are deep-merged so the trainable subtree shadows the frozen one.
    """
    out = dict(model_variables)
    for key, tree in trainable.items():
        if key == "lora" and key in out:
            # a frozen lora rides in the base tree (accuracy recovery adapter
            # on a quantized base, reference util/quantize.py:281-400): the
            # trainable lora STACKS with it via an exact rank-concat instead
            # of shadowing its leaves
            from ai_toolkit_tpu.adapters.lora import concat_loras

            out[key] = concat_loras(out[key], tree)
        elif key in out and isinstance(out[key], dict) and isinstance(tree, dict):
            out[key] = _deep_merge(out[key], tree)
        else:
            out[key] = tree
    # host-offloaded frozen leaves (parallel/offload.py) must be fetched to
    # device memory before entering compute; no-op when nothing is offloaded
    if any(
        "host" in str(getattr(getattr(x, "aval", None), "memory_space", "")).lower()
        for x in jax.tree.leaves(out)
    ):
        from ai_toolkit_tpu.parallel.offload import fetch_to_device

        out = fetch_to_device(out)
    return out


def _deep_merge(base: dict, overlay: dict) -> dict:
    out = dict(base)
    for k, v in overlay.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out
