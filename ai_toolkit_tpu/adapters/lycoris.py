"""LyCORIS-family adapters: LoKr and DoRA as functional overlays.

Reference: ``/root/reference/toolkit/models/lokr.py`` (LyCORIS lokr with
``factor`` decomposition) and ``toolkit/models/DoRA.py`` — here they are just
alternative variable collections read by ``ops.layers.Linear``:

- lokr: ``{w1: [a, b], w2: [c, d], scale}`` with delta = kron(w1, w2)
  (a*c = in_features, b*d = out_features; factor picks a,b small)
- dora: ``{a, b, scale, magnitude}`` — lora factors + learned per-column
  magnitude, direction normalized (Liu et al. 2024).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ai_toolkit_tpu.adapters.lora import LoRASpec, _iter_modules, _matches


def factorize(n: int, factor: int = -1) -> tuple[int, int]:
    """LyCORIS factorization: n = a*c with a <= c, a close to sqrt(n) (or
    a <= factor when factor > 0)."""
    if factor > 0 and n % factor == 0:
        return factor, n // factor
    a = int(math.isqrt(n))
    while a > 1 and n % a != 0:
        a -= 1
    return a, n // a


def build_lokr(params: dict, spec: LoRASpec, rng: jax.Array, factor: int = -1) -> dict:
    """LoKr collection: full-rank small kronecker factors per targeted linear."""
    out: dict = {}
    targets = [
        (path, node["kernel"].shape)
        for path, node in _iter_modules(params)
        if len(node["kernel"].shape) == 2 and _matches("/".join(path), spec)
    ]
    rngs = jax.random.split(rng, max(1, len(targets)))
    for (path, (cin, cout)), key in zip(targets, rngs):
        a, c = factorize(cin, factor)
        b, d = factorize(cout, factor)
        w1 = jax.random.normal(key, (a, b), jnp.float32) * spec.init_std
        w2 = jnp.zeros((c, d), jnp.float32)  # zero -> identity at init
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {"w1": w1, "w2": w2, "scale": jnp.asarray(1.0, jnp.float32)}
    return out


def build_loha(params: dict, spec: LoRASpec, rng: jax.Array) -> dict:
    """LoHa collection (LyCORIS hadamard product): delta =
    (w1a @ w1b) * (w2a @ w2b) * scale; w2b zero -> zero delta at init."""
    out: dict = {}
    targets = [
        (path, node["kernel"].shape)
        for path, node in _iter_modules(params)
        if len(node["kernel"].shape) == 2 and _matches("/".join(path), spec)
    ]
    rngs = jax.random.split(rng, max(1, len(targets)))
    r = spec.rank
    for (path, (cin, cout)), key in zip(targets, rngs):
        k1, k2, k3 = jax.random.split(key, 3)
        leaf = {
            "w1a": jax.random.normal(k1, (cin, r), jnp.float32) * spec.init_std,
            "w1b": jax.random.normal(k2, (r, cout), jnp.float32) * spec.init_std,
            "w2a": jax.random.normal(k3, (cin, r), jnp.float32) * spec.init_std,
            "w2b": jnp.zeros((r, cout), jnp.float32),
            "scale": jnp.asarray(spec.alpha / r, jnp.float32),
        }
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = leaf
    return out


def loha_delta(leaf: dict) -> jax.Array:
    return (leaf["w1a"] @ leaf["w1b"]) * (leaf["w2a"] @ leaf["w2b"]) * leaf["scale"]


def merge_loha(params: dict, loha: dict) -> dict:
    def walk(p_node, l_node):
        if isinstance(l_node, dict) and "w1a" in l_node:
            return {**p_node,
                    "kernel": p_node["kernel"] + loha_delta(l_node).astype(p_node["kernel"].dtype)}
        out = dict(p_node)
        for k, v in l_node.items():
            out[k] = walk(p_node[k], v)
        return out

    return walk(params, loha)


def build_dora(params: dict, spec: LoRASpec, rng: jax.Array) -> dict:
    """DoRA collection: lora factors + magnitude initialized to ||W||_col."""
    out: dict = {}
    targets = [
        (path, node)
        for path, node in _iter_modules(params)
        if len(node["kernel"].shape) == 2 and _matches("/".join(path), spec)
    ]
    rngs = jax.random.split(rng, max(1, len(targets)))
    for (path, node_p), key in zip(targets, rngs):
        w = np.asarray(node_p["kernel"], np.float32)
        cin, cout = w.shape
        r = spec.rank
        a = jax.random.normal(key, (cin, r), jnp.float32) * spec.init_std
        b = jnp.zeros((r, cout), jnp.float32)
        mag = jnp.asarray(np.linalg.norm(w, axis=0), jnp.float32)
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {
            "a": a, "b": b, "scale": jnp.asarray(spec.alpha / r, jnp.float32), "magnitude": mag,
        }
    return out


def lokr_delta(leaf: dict) -> jax.Array:
    return jnp.einsum("ab,cd->acbd", leaf["w1"], leaf["w2"]).reshape(
        leaf["w1"].shape[0] * leaf["w2"].shape[0], leaf["w1"].shape[1] * leaf["w2"].shape[1]
    ) * leaf["scale"]


def merge_lokr(params: dict, lokr: dict) -> dict:
    def walk(p_node, l_node):
        if isinstance(l_node, dict) and set(l_node.keys()) == {"w1", "w2", "scale"}:
            return {**p_node, "kernel": p_node["kernel"] + lokr_delta(l_node).astype(p_node["kernel"].dtype)}
        out = dict(p_node)
        for k, v in l_node.items():
            out[k] = walk(p_node[k], v)
        return out

    return walk(params, lokr)
