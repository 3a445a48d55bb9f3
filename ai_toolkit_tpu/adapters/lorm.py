"""LoRM — low-rank module REPLACEMENT (reference ``toolkit/lorm.py``).

The reference rewrites UNet Linears (inside Transformer2DModel containers,
skipping proj_in/proj_out) into ``down @ up`` SVD factor pairs
(``convert_diffusers_unet_to_lorm``, lorm.py:318-461) and trains the factors
— compressing the base model itself rather than adding an adapter. Rank per
module comes from an extract mode over the singular values
(fixed / threshold / ratio / quantile / percentage, lorm.py:157-262) and is
capped at out_features/2.

TPU-first redesign: no module rewriting. Targeted kernels are SVD-factored
into a ``lorm`` variable collection ``{a: [in, r], b: [r, out], scale: 1.0}``
that ``ops/layers.Linear``/``Conv`` consume INSTEAD of the base kernel, and
the base kernel leaves are DELETED from params (flax only resolves params a
module actually asks for, so the slimmed tree is a real HBM saving — the
reference's memory win, kept). The factors train like any other collection;
``merge_lorm`` reconstructs full kernels (a @ b) for full-model export.
Scanned ``[L, in, out]`` stacks factor per-layer at the max selected rank.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np


@dataclass
class LoRMSpec:
    extract_mode: str = "ratio"  # fixed|threshold|ratio|quantile|percentage
    extract_mode_param: float = 0.25
    parameter_threshold: int = 0
    do_conv: bool = False  # reference ships with conv replacement disabled
    target_patterns: list[str] = field(default_factory=list)
    ignore_if_contains: tuple = ("proj_in", "proj_out")


def _rank_for(S: np.ndarray, spec: LoRMSpec, out_ch: int, in_ch: int,
              col_dim: int) -> int:
    """Reference extract_* rank selection + the out/2 cap."""
    mode, p = spec.extract_mode, spec.extract_mode_param
    if mode == "fixed":
        r = int(p)
    elif mode == "threshold":
        r = int(np.sum(S > p))
    elif mode == "ratio":
        r = int(np.sum(S > float(S.max()) * p))
    elif mode in ("quantile", "percentile"):
        r = int(np.sum(np.cumsum(S) < p * float(S.sum())))
    elif mode == "percentage":
        r = int(p * out_ch * col_dim / (col_dim + out_ch))
    else:
        raise ValueError(f"unknown lorm extract_mode {mode!r}")
    r = max(1, min(out_ch, in_ch, r))
    if r >= out_ch / 2:
        r = max(1, int(out_ch / 2))
    return r


def _factor_2d(kernel: np.ndarray, spec: LoRMSpec):
    """[in, out] -> (a [in, r], b [r, out]). a @ b approximates the kernel."""
    in_ch, out_ch = kernel.shape
    U, S, Vh = np.linalg.svd(kernel.astype(np.float64), full_matrices=False)
    r = _rank_for(S, spec, out_ch, in_ch, in_ch)
    a = (U[:, :r] * S[:r]).astype(np.float32)
    b = Vh[:r, :].astype(np.float32)
    return a, b, r


def _matches(path: str, spec: LoRMSpec) -> bool:
    if any(w in path for w in spec.ignore_if_contains):
        return False
    if not spec.target_patterns:
        return True
    return any(re.search(p, path) for p in spec.target_patterns)


def build_lorm(params: dict, spec: LoRMSpec):
    """Returns (lorm_tree, slim_params, stats).

    slim_params is ``params`` with each factored kernel leaf REMOVED;
    lorm_tree mirrors the module structure with {a, b, scale} leaves."""
    import jax

    params = jax.tree.map(np.asarray, params)
    lorm: dict = {}
    stats = {"modules": 0, "params_before": 0, "params_after": 0, "ranks": []}

    def walk(node: dict, out: dict, prefix: str):
        removed = []
        for k, v in node.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                if "kernel" in v and isinstance(v["kernel"], np.ndarray):
                    kern = v["kernel"]
                    if (kern.ndim in (2, 3) and _matches(path, spec)
                            and kern.size > spec.parameter_threshold):
                        if kern.ndim == 2:
                            a, b, r = _factor_2d(kern, spec)
                            scale = np.float32(1.0)
                        else:  # scanned [L, in, out]: per-layer, max rank
                            pairs = [_factor_2d(kern[i], spec)
                                     for i in range(kern.shape[0])]
                            r = max(p[2] for p in pairs)
                            pairs = [_factor_2d(kern[i],
                                                LoRMSpec(extract_mode="fixed",
                                                         extract_mode_param=r))
                                     for i in range(kern.shape[0])]
                            a = np.stack([p[0] for p in pairs])
                            b = np.stack([p[1] for p in pairs])
                            # [L] scale: nn.scan slices every lorm leaf
                            scale = np.ones((kern.shape[0],), np.float32)
                        out[k] = {"a": a, "b": b, "scale": scale}
                        stats["modules"] += 1
                        stats["params_before"] += int(kern.size)
                        stats["params_after"] += int(a.size + b.size)
                        stats["ranks"].append(r)
                        removed.append(k)
                        continue
                    sub: dict = {}
                    walk(v, sub, path)
                    if sub:
                        out[k] = sub
                else:
                    sub = {}
                    walk(v, sub, path)
                    if sub:
                        out[k] = sub
        for k in removed:
            node[k] = {kk: vv for kk, vv in node[k].items() if kk != "kernel"}

    walk(params, lorm, "")
    return lorm, params, stats


def merge_lorm(params: dict, lorm: dict) -> dict:
    """Reconstruct full kernels (a @ b) back into params (export path)."""
    import jax

    out = jax.tree.map(lambda x: x, params)  # shallow-ish copy

    def walk(p: dict, l: dict):
        for k, v in l.items():
            if isinstance(v, dict) and "a" in v and "b" in v:
                a, b = np.asarray(v["a"], np.float32), np.asarray(v["b"], np.float32)
                if a.ndim == 3:
                    kern = np.einsum("lir,lro->lio", a, b)
                else:
                    kern = a @ b
                node = p.setdefault(k, {})
                node["kernel"] = kern
            elif isinstance(v, dict):
                walk(p.setdefault(k, {}), v)

    walk(out, lorm)
    return out


def count_lorm_params(lorm: dict) -> int:
    import jax

    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(lorm))


def lorm_stats_str(stats: dict) -> str:
    before, after = stats["params_before"], stats["params_after"]
    ranks = stats["ranks"]
    return (f"LoRM: {stats['modules']} modules replaced, "
            f"{before:,} -> {after:,} params "
            f"({(1 - after / max(before, 1)) * 100:.1f}% reduction, "
            f"ranks {min(ranks)}-{max(ranks)})" if ranks else "LoRM: 0 modules")
