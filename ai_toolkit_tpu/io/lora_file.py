"""LoRA safetensors export/import with kohya / PEFT / ComfyUI key layouts.

Spec source: the reference's save path
(``/root/reference/toolkit/network_mixins.py:581-720``,
``lora_special.py:455-502``): kohya keys are
``lora_unet_<module_path_underscored>.lora_down.weight`` / ``.lora_up.weight``
/ ``.alpha`` (prefix ``lora_te``/``lora_te1``/``lora_te2`` for text encoders,
``lora_transformer`` for DiTs); PEFT format is
``transformer.<dotted_path>.lora_A.weight`` / ``lora_B.weight``; ComfyUI flux
wants ``transformer.`` -> ``diffusion_model.``
(``flux2_model.py:508-521``). Weights are stored torch-oriented
([out, in] etc.), so our JAX [in, r]/[r, out] factors are transposed on the
way out and back in.
"""

from __future__ import annotations

import json
from typing import Callable

import numpy as np

from ai_toolkit_tpu.adapters.lora import _is_lora_leaf, lora_paths


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _c(x: np.ndarray, dtype) -> np.ndarray:
    # safetensors writes the raw buffer; transposed views keep F-order through
    # astype(order='K'), so force C-contiguity explicitly.
    return np.ascontiguousarray(x.astype(dtype))


def _get(tree: dict, path: tuple[str, ...]) -> dict:
    node = tree
    for k in path:
        node = node[k]
    return node


def flatten_lora(
    lora: dict,
    key_map: Callable[[str], str] | dict[str, str] | None = None,
    fmt: str = "kohya",
    prefix: str = "lora_transformer",
    dtype=np.float16,
) -> dict[str, np.ndarray]:
    """lora pytree -> flat {external_key: tensor} dict.

    key_map translates an internal '/'-joined module path to the external
    dotted module name (e.g. 'double_0/img_qkv' -> 'double_blocks.0.img_attn.qkv').
    """
    out: dict[str, np.ndarray] = {}
    for path in lora_paths(lora):
        leaf = _get(lora, path)
        pstr = "/".join(path)
        if callable(key_map):
            ext = key_map(pstr)
        elif isinstance(key_map, dict):
            ext = key_map.get(pstr, pstr.replace("/", "."))
        else:
            ext = pstr.replace("/", ".")
        if ext is None:
            continue
        a, b = _np(leaf["a"]), _np(leaf["b"])
        scale_arr = _np(leaf["scale"]).reshape(-1)  # scalar or per-layer [L]

        def emit(ext_one: str, down: np.ndarray, up: np.ndarray, rank: int, scale: float):
            alpha = scale * rank  # scale = alpha/rank
            if fmt == "kohya":
                key = f"{prefix}_{ext_one.replace('.', '_')}"
                out[f"{key}.lora_down.weight"] = _c(down, dtype)
                out[f"{key}.lora_up.weight"] = _c(up, dtype)
                out[f"{key}.alpha"] = np.asarray(alpha, dtype)
            elif fmt in ("peft", "comfy"):
                root = "diffusion_model" if fmt == "comfy" else "transformer"
                out[f"{root}.{ext_one}.lora_A.weight"] = _c(down, dtype)
                out[f"{root}.{ext_one}.lora_B.weight"] = _c(up, dtype)
            else:
                raise ValueError(f"unknown lora format {fmt}")

        if a.ndim == 2:
            emit(ext.replace("{L}", "0"), a.T, b.T, a.shape[-1], float(scale_arr[0]))
        elif a.ndim == 3:
            # scanned stack [L, in, r]: one external entry per layer
            for l in range(a.shape[0]):
                ext_l = ext.replace("{L}", str(l)) if "{L}" in ext else f"{ext}.{l}"
                s = float(scale_arr[l]) if scale_arr.size > 1 else float(scale_arr[0])
                emit(ext_l, a[l].T, b[l].T, a.shape[-1], s)
        else:  # conv [kh,kw,in,r] -> torch [r, in, kh, kw]
            emit(ext, a.transpose(3, 2, 0, 1), b.transpose(3, 2, 0, 1), a.shape[-1],
                 float(scale_arr[0]))
    return out


def unflatten_lora(
    flat: dict[str, np.ndarray],
    inverse_key_map: Callable[[str], str] | dict[str, str] | None = None,
) -> dict:
    """flat external dict -> lora pytree (inverse of flatten_lora)."""
    groups: dict[str, dict[str, np.ndarray]] = {}
    for key, v in flat.items():
        if key.endswith(".lora_down.weight") or key.endswith(".lora_A.weight"):
            part = "down"
            mod = key.rsplit(".lora_", 1)[0]
        elif key.endswith(".lora_up.weight") or key.endswith(".lora_B.weight"):
            part = "up"
            mod = key.rsplit(".lora_", 1)[0]
        elif key.endswith(".alpha"):
            part = "alpha"
            mod = key[: -len(".alpha")]
        else:
            continue
        groups.setdefault(mod, {})[part] = v

    lora: dict = {}
    stacked: dict[str, dict[int, tuple]] = {}
    for mod, parts in groups.items():
        if "down" not in parts or "up" not in parts:
            continue
        # strip known prefixes; kohya keys stay underscored (the key map resolves
        # them exactly — blind '_'->'.' would corrupt names like 'to_q')
        ext = mod
        for pre in ("lora_transformer_", "lora_unet_", "lora_te1_", "lora_te2_", "lora_te_"):
            if ext.startswith(pre):
                ext = ext[len(pre) :]
                break
        for pre in ("transformer.", "diffusion_model."):
            if ext.startswith(pre):
                ext = ext[len(pre) :]
                break
        if callable(inverse_key_map):
            internal = inverse_key_map(ext)
        elif isinstance(inverse_key_map, dict):
            internal = inverse_key_map.get(ext, ext.replace(".", "/"))
        else:
            internal = ext.replace(".", "/")
        if internal is None:
            continue
        down = parts["down"].astype(np.float32)
        up = parts["up"].astype(np.float32)
        if down.ndim == 2:
            a = down.T  # [in, r]
            b = up.T  # [r, out]
        else:
            a = down.transpose(2, 3, 1, 0)
            b = up.transpose(2, 3, 1, 0)
        rank = a.shape[-1]
        alpha = float(parts.get("alpha", rank))
        if "#" in internal:  # stacked (scanned) entry: 'path#layer'
            base, _, layer = internal.rpartition("#")
            stacked.setdefault(base, {})[int(layer)] = (a, b, alpha)
            continue
        node = lora
        pieces = internal.split("/")
        for k in pieces[:-1]:
            node = node.setdefault(k, {})
        node[pieces[-1]] = {"a": a, "b": b, "scale": np.float32(alpha / rank)}

    for base, layers in stacked.items():
        idxs = sorted(layers)
        a = np.stack([layers[i][0] for i in idxs])
        b = np.stack([layers[i][1] for i in idxs])
        alphas = np.asarray([layers[i][2] for i in idxs], np.float32)
        rank = a.shape[-1]
        node = lora
        pieces = base.split("/")
        for k in pieces[:-1]:
            node = node.setdefault(k, {})
        node[pieces[-1]] = {"a": a, "b": b, "scale": alphas / rank}
    return lora


def _walk_module_leaves(tree: dict, keysets: list[set], prefix: tuple[str, ...] = ()):
    if isinstance(tree, dict):
        if any(set(tree.keys()) >= ks for ks in keysets):
            yield prefix, tree
            return
        for k, v in tree.items():
            if isinstance(v, dict):
                yield from _walk_module_leaves(v, keysets, prefix + (k,))


def save_adapter_file(
    tree: dict,
    kind: str,
    path: str,
    key_map: dict | None = None,
    prefix: str = "lora_transformer",
    metadata: dict | None = None,
    dtype=np.float16,
) -> None:
    """LyCORIS-family export: 'lokr' -> .lokr_w1/.lokr_w2/.alpha keys;
    'dora' -> .lora_down/.lora_up/.alpha/.dora_scale keys."""
    from safetensors.numpy import save_file

    flat: dict[str, np.ndarray] = {}
    keysets = [{"w1", "w2", "scale"}, {"a", "b", "scale", "magnitude"}]
    for mpath, leaf in _walk_module_leaves(tree, keysets):
        pstr = "/".join(mpath)
        ext = (key_map or {}).get(pstr, pstr.replace("/", "."))
        key = f"{prefix}_{ext.replace('.', '_')}"
        if kind == "lokr":
            flat[f"{key}.lokr_w1"] = _c(_np(leaf["w1"]).T, dtype)
            flat[f"{key}.lokr_w2"] = _c(_np(leaf["w2"]).T, dtype)
            flat[f"{key}.alpha"] = np.asarray(float(_np(leaf["scale"]).reshape(-1)[0]), dtype)
        elif kind == "dora":
            a, b = _np(leaf["a"]), _np(leaf["b"])
            rank = a.shape[-1]
            scale = float(_np(leaf["scale"]).reshape(-1)[0])
            flat[f"{key}.lora_down.weight"] = _c(a.T, dtype)
            flat[f"{key}.lora_up.weight"] = _c(b.T, dtype)
            flat[f"{key}.alpha"] = np.asarray(scale * rank, dtype)
            flat[f"{key}.dora_scale"] = _c(_np(leaf["magnitude"])[None, :], dtype)
        else:
            raise ValueError(kind)
    meta = {str(k): str(v) for k, v in (metadata or {}).items()}
    save_file(flat, path, metadata=meta)


def save_lora_file(
    lora: dict,
    path: str,
    key_map=None,
    fmt: str = "kohya",
    prefix: str = "lora_transformer",
    metadata: dict | None = None,
    dtype=np.float16,
    extra_flat: dict | None = None,
) -> None:
    from safetensors.numpy import save_file

    flat = flatten_lora(lora, key_map, fmt, prefix, dtype)
    if extra_flat:
        flat.update(extra_flat)  # e.g. kohya lora_te* entries beside the unet lora
    meta = {str(k): str(v) for k, v in (metadata or {}).items()}
    save_file(flat, path, metadata=meta)


def load_lora_file(path: str, inverse_key_map=None) -> tuple[dict, dict]:
    """Returns (lora_tree, metadata)."""
    from safetensors import safe_open

    flat = {}
    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
        for k in f.keys():
            flat[k] = f.get_tensor(k)
    return unflatten_lora(flat, inverse_key_map), meta


_TE_PREFIXES = ("lora_te1_", "lora_te2_", "lora_te_")


def split_flat_by_te_prefix(flat: dict[str, np.ndarray]) -> tuple[dict, dict[str, dict]]:
    """Partition a flat checkpoint dict into (main, {collection: flat}) where
    collection is 'lora_te'/'lora_te1'/'lora_te2' (kohya TE entries saved beside
    the unet/transformer lora, reference lora_special.py:455-502)."""
    main: dict[str, np.ndarray] = {}
    te: dict[str, dict[str, np.ndarray]] = {}
    for k, v in flat.items():
        for pre in _TE_PREFIXES:
            if k.startswith(pre):
                te.setdefault(pre[:-1], {})[k] = v
                break
        else:
            main[k] = v
    return main, te


def load_lora_file_split(
    path: str,
    inverse_key_map=None,
    te_inverse_maps: dict[str, dict] | None = None,
) -> tuple[dict, dict[str, dict], dict]:
    """Returns (main_lora_tree, {te_collection: lora_tree}, metadata).

    Unlike load_lora_file, lora_te* entries are unflattened into their own
    trees with their own inverse key maps instead of polluting the main tree
    (needed to resume train_text_encoder runs)."""
    from safetensors import safe_open

    flat = {}
    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
        for k in f.keys():
            flat[k] = f.get_tensor(k)
    main_flat, te_flat = split_flat_by_te_prefix(flat)
    te_trees = {
        coll: unflatten_lora(fl, (te_inverse_maps or {}).get(coll))
        for coll, fl in te_flat.items()
    }
    return unflatten_lora(main_flat, inverse_key_map), te_trees, meta


def load_lokr_file(path: str, inverse_key_map=None) -> tuple[dict, dict]:
    """LyCORIS LoKr file -> 'lokr' collection tree (frozen ARA load path,
    reference util/quantize.py:319-365 detects lokr ARAs by the lycoris
    prefix). Leaves are {w1, w2, scale}; full-rank LoKr semantics give
    multiplier 1.0 regardless of the stored alpha (LyCORIS convention for
    undecomposed factors), which also matches our exporter's default.
    """
    from safetensors import safe_open

    flat: dict[str, np.ndarray] = {}
    with safe_open(path, framework="numpy") as f:
        meta = dict(f.metadata() or {})
        for k in f.keys():
            flat[k] = f.get_tensor(k)

    groups: dict[str, dict[str, np.ndarray]] = {}
    for key, v in flat.items():
        for part in ("lokr_w1", "lokr_w2", "alpha"):
            if key.endswith("." + part):
                mod = key[: -(len(part) + 1)]
                groups.setdefault(mod, {})[part] = v
                break

    tree: dict = {}
    stacked: dict[str, dict[int, tuple]] = {}
    for mod, parts in groups.items():
        if "lokr_w1" not in parts or "lokr_w2" not in parts:
            continue
        ext = mod
        for pre in ("lycoris_", "lora_transformer_", "lora_unet_"):
            if ext.startswith(pre):
                ext = ext[len(pre):]
                break
        if callable(inverse_key_map):
            internal = inverse_key_map(ext)
        elif isinstance(inverse_key_map, dict):
            internal = inverse_key_map.get(ext, ext.replace(".", "/"))
        else:
            internal = ext.replace(".", "/")
        if internal is None:
            continue
        w1 = parts["lokr_w1"].astype(np.float32).T  # torch [b,a] -> [a,b]
        w2 = parts["lokr_w2"].astype(np.float32).T
        alpha = float(np.asarray(parts.get("alpha", 1.0)).reshape(-1)[0])
        if alpha not in (0.0, 1.0) and alpha != w2.shape[-1]:
            print(f"lokr load: non-unit alpha {alpha} on {mod} ignored "
                  "(full-rank LoKr multiplier is 1.0)")
        if "#" in internal:  # stacked (scanned) entry: 'path#layer'
            base, _, layer = internal.rpartition("#")
            stacked.setdefault(base, {})[int(layer)] = (w1, w2)
            continue
        node = tree
        pieces = internal.split("/")
        for k in pieces[:-1]:
            node = node.setdefault(k, {})
        node[pieces[-1]] = {"w1": w1, "w2": w2, "scale": np.float32(1.0)}

    for base, layers in stacked.items():
        idxs = sorted(layers)
        node = tree
        pieces = base.split("/")
        for k in pieces[:-1]:
            node = node.setdefault(k, {})
        node[pieces[-1]] = {
            "w1": np.stack([layers[i][0] for i in idxs]),
            "w2": np.stack([layers[i][1] for i in idxs]),
            "scale": np.ones(len(idxs), np.float32),
        }
    return tree, meta
