"""LoRA extraction: SVD of weight diffs (reference ExtractLoraProcess,
``/root/reference/jobs/process/ExtractLoraProcess.py:33-73`` /
``lycoris_utils.extract_diff``)."""

from __future__ import annotations

import numpy as np

from ai_toolkit_tpu.adapters.lora import _iter_modules


def svd_extract(diff: np.ndarray, rank: int) -> tuple[np.ndarray, np.ndarray]:
    """[in, out] weight diff -> (a [in, r], b [r, out]) with a @ b ~= diff."""
    u, s, vt = np.linalg.svd(diff.astype(np.float64), full_matrices=False)
    r = min(rank, s.shape[0])
    sqrt_s = np.sqrt(s[:r])
    a = (u[:, :r] * sqrt_s[None, :]).astype(np.float32)
    b = (sqrt_s[:, None] * vt[:r]).astype(np.float32)
    return a, b


def extract_lora_from_diff(
    params_base: dict, params_tuned: dict, rank: int = 16, alpha: float | None = None,
    min_diff: float = 1e-6,
) -> dict:
    """Walk both param trees, SVD every changed 2D kernel into a lora leaf."""
    alpha = float(alpha if alpha is not None else rank)
    lora: dict = {}
    tuned_index = {p: n for p, n in _iter_modules(params_tuned)}
    for path, node in _iter_modules(params_base):
        if path not in tuned_index:
            continue
        w0 = np.asarray(node["kernel"], np.float32)
        w1 = np.asarray(tuned_index[path]["kernel"], np.float32)
        if w0.shape != w1.shape or w0.ndim not in (2, 3):
            continue
        diff = w1 - w0
        if np.max(np.abs(diff)) < min_diff:
            continue
        if w0.ndim == 3:
            # scanned (nn.scan) module: kernels stacked [L, in, out] — one SVD
            # per layer, stacked lora leaves with a [L] scale vector
            pairs = [svd_extract(diff[i], rank) for i in range(diff.shape[0])]
            a = np.stack([p[0] for p in pairs])
            b = np.stack([p[1] for p in pairs])
            scale = alpha / min(rank, a.shape[-1])
            a = a / np.sqrt(scale)
            b = b / np.sqrt(scale)
            leaf = {"a": a, "b": b,
                    "scale": np.full(a.shape[0], scale, np.float32)}
        else:
            a, b = svd_extract(diff, rank)
            # bake the alpha/rank scale out so a @ b * (alpha/r) == diff_r
            scale = alpha / min(rank, a.shape[1])
            a = a / np.sqrt(scale)
            b = b / np.sqrt(scale)
            leaf = {"a": a, "b": b, "scale": np.float32(scale)}
        n = lora
        for k in path[:-1]:
            n = n.setdefault(k, {})
        n[path[-1]] = leaf
    return lora
