"""Torch-layout safetensors -> JAX param tree conversion machinery.

Checkpoint importers are the parity bridge: users arrive with HF/BFL
safetensors (torch tensor layouts); our modules use JAX layouts. Rules:

- torch ``Linear.weight [out, in]``  -> ``kernel [in, out]``        (transpose)
- torch ``Conv2d.weight [o, i, kh, kw]`` -> ``[kh, kw, i, o]``
- torch ``Conv3d.weight [o, i, kt, kh, kw]`` -> ``[kt, kh, kw, i, o]``
- norm ``weight`` -> ``scale``; embeddings stay [num, dim]

A family map is a list of ``(torch_regex, our_path_template, kind)`` where the
template may use regex groups ``{0}``, ``{1}``... Scanned (nn.scan) modules
use layer-group stacking: mark with kind ``linear_stack`` etc. and include the
layer index as group 0 — matching keys are collected and stacked on axis 0.
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np

Rule = tuple[str, str, str]  # (torch key regex, our '/'-joined path template, kind)


def convert_tensor(v: np.ndarray, kind: str) -> np.ndarray:
    if kind == "linear_or_conv1x1":
        # diffusers proj_in/out: Linear (sd2/sdxl) or 1x1 Conv2d (sd1.5)
        if v.ndim == 4:
            v = v[:, :, 0, 0]
        return np.ascontiguousarray(v.T)
    if kind in ("linear", "linear_stack"):
        return np.ascontiguousarray(v.T)
    if kind in ("conv2d", "conv2d_stack"):
        return np.ascontiguousarray(v.transpose(2, 3, 1, 0))
    if kind in ("conv3d",):
        return np.ascontiguousarray(v.transpose(2, 3, 4, 1, 0))
    if kind in ("conv1d",):  # torch [o, i, k] -> [k, i, o]
        return np.ascontiguousarray(v.transpose(2, 1, 0))
    if kind == "convtranspose1d":  # torch [i, o, k] -> [k, i, o]
        return np.ascontiguousarray(v.transpose(2, 0, 1))
    if kind.startswith("conv_flatten"):
        # strided patchify conv == Linear over c-major flattened patches:
        # torch [O, I, kh, kw] -> kernel [I*kh*kw, O] (chroma radiance
        # img_in_patch; kind carries ':I:kh:kw' for the inverse direction)
        return np.ascontiguousarray(v.reshape(v.shape[0], -1).T)
    if kind == "plus_one":  # gemma RMSNorm stores w, applies (1 + w)
        return np.ascontiguousarray(v + 1.0)
    if kind == "flatten_c":  # broadcast-shaped norm gains (C,1,1[,1]) -> (C,)
        return np.ascontiguousarray(v.reshape(v.shape[0]))
    if kind == "flatten_all":  # e.g. lpips lin heads (1, C, 1, 1) -> (C,)
        return np.ascontiguousarray(v.reshape(-1))
    return np.ascontiguousarray(v)  # direct / scale / bias / embedding


def torch_to_tree(
    flat: dict[str, np.ndarray],
    rules: list[Rule],
    strict: bool = False,
) -> tuple[dict, list[str]]:
    """Apply rules; returns (tree, unmatched_keys).

    '*_stack' kinds: group 0 of the regex is the layer index; all layers are
    stacked (sorted by index) into one leaf at the template path.
    """
    tree: dict = {}
    stacks: dict[str, dict[int, np.ndarray]] = {}
    stack_kind: dict[str, str] = {}
    unmatched: list[str] = []

    compiled = [(re.compile(pat), tmpl, kind) for pat, tmpl, kind in rules]
    for key, v in flat.items():
        hit = False
        for pat, tmpl, kind in compiled:
            m = pat.match(key)
            if not m:
                continue
            hit = True
            groups = m.groups()
            if kind.endswith("_stack"):
                layer = int(groups[0])
                path = tmpl.format(*groups)
                stacks.setdefault(path, {})[layer] = convert_tensor(v, kind)
                stack_kind[path] = kind
            else:
                path = tmpl.format(*groups)
                _set(tree, path, convert_tensor(v, kind))
            break
        if not hit:
            unmatched.append(key)
    for path, layers in stacks.items():
        idxs = sorted(layers)
        _set(tree, path, np.stack([layers[i] for i in idxs]))
    if strict and unmatched:
        raise KeyError(f"{len(unmatched)} unmatched checkpoint keys, e.g. {unmatched[:5]}")
    return tree, unmatched


def tree_to_torch(tree: dict, rules: list[Rule], depth_hints: dict[str, int] | None = None):
    """Inverse direction (for tests / export): our tree -> torch-layout flat.

    Only supports templates whose regexes are simple enough to invert by
    substituting group placeholders; sufficient for our family maps.
    """
    flat: dict[str, np.ndarray] = {}

    def un_convert(v: np.ndarray, kind: str) -> np.ndarray:
        if kind in ("linear", "linear_stack", "linear_or_conv1x1"):
            return np.ascontiguousarray(v.T)
        if kind in ("conv2d", "conv2d_stack"):
            return np.ascontiguousarray(v.transpose(3, 2, 0, 1))
        if kind == "conv3d":
            return np.ascontiguousarray(v.transpose(4, 3, 0, 1, 2))
        if kind == "conv1d":
            return np.ascontiguousarray(v.transpose(2, 1, 0))
        if kind == "plus_one":
            return np.ascontiguousarray(v - 1.0)
        if kind.startswith("conv_flatten"):
            _, i, kh, kw = kind.split(":")
            return np.ascontiguousarray(v.T.reshape(-1, int(i), int(kh), int(kw)))
        return np.ascontiguousarray(v)

    for pat, tmpl, kind in rules:
        # turn the regex into a key template by replacing each group with {i}
        key_tmpl = _regex_to_template(pat)
        n_groups = re.compile(pat).groups
        if kind.endswith("_stack"):
            leaf = _get(tree, tmpl.format(*(["{0}"] + ["?"] * 8)[: max(1, n_groups)]))
            if leaf is None:
                continue
            for l in range(leaf.shape[0]):
                flat[key_tmpl.format(l)] = un_convert(leaf[l], kind)
        else:
            if n_groups == 0:
                leaf = _get(tree, tmpl)
                if leaf is not None:
                    flat[key_tmpl] = un_convert(leaf, kind)
            else:
                # enumerate integer group values by probing the tree
                for combo in _enumerate_paths(tree, tmpl, n_groups):
                    leaf = _get(tree, tmpl.format(*combo))
                    if leaf is not None:
                        flat[key_tmpl.format(*combo)] = un_convert(leaf, kind)
    return flat


def _set(tree: dict, path: str, v):
    parts = path.split("/")
    node = tree
    for k in parts[:-1]:
        node = node.setdefault(k, {})
    node[parts[-1]] = v


def _get(tree: dict, path: str):
    node = tree
    for k in path.split("/"):
        if not isinstance(node, dict) or k not in node:
            return None
        node = node[k]
    return node


def _regex_to_template(pat: str) -> str:
    out, i, g = [], 0, 0
    while i < len(pat):
        c = pat[i]
        if c == "(":
            # find matching close paren (no nesting in our rules)
            j = pat.index(")", i)
            out.append("{" + str(g) + "}")
            g += 1
            i = j + 1
        elif c == "\\":
            out.append(pat[i + 1])
            i += 2
        elif c in "^$":
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _enumerate_paths(tree: dict, tmpl: str, n_groups: int) -> Iterable[tuple]:
    """Probe integer group values 0..N until the templated path stops existing."""
    if n_groups == 1:
        i = 0
        while _get(tree, tmpl.format(i)) is not None:
            yield (i,)
            i += 1
    elif n_groups == 2:
        i = 0
        while True:
            j, found_any = 0, False
            while _get(tree, tmpl.format(i, j)) is not None:
                yield (i, j)
                found_any = True
                j += 1
            if not found_any:
                break
            i += 1


def load_safetensors_dir(path: str, subdir: str | None = None) -> dict[str, np.ndarray]:
    """Load (possibly sharded) safetensors from an HF-layout directory or file."""
    import glob
    import os

    from safetensors import safe_open

    if subdir:
        path = os.path.join(path, subdir)
    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    flat: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                flat[k] = sf.get_tensor(k)
    return flat
