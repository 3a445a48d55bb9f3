"""I2V adapter: adapt a t2v Wan base into an image-to-video model.

Reference: ``/root/reference/toolkit/models/i2v_adapter.py`` — three fresh
trainable pieces are grafted onto the frozen t2v transformer:

- AttentionHog (:132-210): decoupled image K/V projections on every block's
  cross-attention (``add_k_proj``/``add_v_proj`` init ``*0.001``, plus the
  wan ``rms_norm_across_heads`` added-k norm), fed by vision-encoder tokens.
- WanImageEmbedding (:438-452): the MLPProj that maps vision hidden states
  into the transformer width.
- FrameEmbedder (:21-109, gated on ``i2v_do_start_frame``): a second patch
  embedding over 4 mask + latent channels of first-frame conditioning
  (``wan_utils.add_first_frame_conditioning``), summed with the original
  patch embedding's output.

A standard LoRA covers the rest (``patch_embedding``/``add_*`` excluded,
:346-354).

TPU-native design: no forward hijacks. The wan DiT already *is* an i2v model
when ``WanConfig.i2v=True`` (``models/wan_dit.py`` cross_k_img/cross_v_img +
img_emb_*) — the adapter flips the config, initializes exactly the leaves the
t2v checkpoint doesn't have, and trains them as a ``{"dit": overlay}``
collection that ``merge_variables`` deep-merges over the frozen base inside
the one jitted step. The FrameEmbedder is a ``ctrl`` input-expansion on
``patch_embedding`` (ops/layers.py): conditioning channels are patchified
separately and feature-concatenated, which equals the reference's
two-convs-summed formulation.

Save layout mirrors the reference ``get_state_dict`` (:527-548):
``attn_hog.{i}.*`` / ``image_embedder.*`` / ``frame_embedder.*`` keys beside
the LoRA entries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

I2V_ADD_KV_SCALE = 1e-3  # reference i2v_adapter.py:158,164


def new_leaves(new: dict, old: dict) -> dict:
    """Subtree of ``new`` whose paths don't exist in ``old`` (the i2v-only
    params of a freshly initialized i2v DiT vs the t2v checkpoint)."""
    out = {}
    for k, v in new.items():
        if k not in old:
            out[k] = v
        elif isinstance(v, dict) and isinstance(old.get(k), dict):
            sub = new_leaves(v, old[k])
            if sub:
                out[k] = sub
    return out


def scale_added_kv(overlay: dict) -> dict:
    """Down-scale the fresh image-KV kernels like the reference (*0.001)."""

    def walk(node, path=()):
        if not isinstance(node, dict):
            if len(path) >= 2 and path[-1] == "kernel" and path[-2] in (
                "cross_k_img", "cross_v_img",
            ):
                return node * I2V_ADD_KV_SCALE
            return node
        return {k: walk(v, path + (k,)) for k, v in node.items()}

    return walk(overlay)


def init_frame_embedder_ctrl(
    dim: int,
    latent_channels: int,
    patch_size: tuple[int, int, int],
    rng: jax.Array,
    mask_channels: int = 4,
) -> dict:
    """The FrameEmbedder as a ``ctrl`` expansion on ``patch_embedding``:
    (mask + latent) extra channels, patchified position-major. mask_channels
    is the VAE's temporal downscale (4 for real wan -> the reference's
    16 + 4 + 16 = 36-channel i2v input)."""
    pt, ph, pw = patch_size
    extra_in = (mask_channels + latent_channels) * pt * ph * pw
    w = jax.random.normal(rng, (extra_in, dim), jnp.float32) / np.sqrt(extra_in)
    return {"patch_embedding": {"w": w, "b": jnp.zeros((dim,), jnp.float32)}}


def assemble_first_frame_control(
    first_frame: np.ndarray,  # [B, H, W, 3] in [-1, 1]
    num_latent_frames: int,
    encode_fn,  # pixels [B, F, H, W, 3] -> latents [B, T, h, w, C]
    temporal_downscale: int = 4,
) -> np.ndarray:
    """Reference ``add_first_frame_conditioning`` (wan_utils.py:5-113):
    encode [first_frame, zeros x (F-1)] and prepend the td-channel temporal
    mask (latent frame 0 = 1 — the first td pixel-frame slots are the
    repeated conditioning frame). Returns [B, T, h, w, td + C]."""
    b = first_frame.shape[0]
    td = temporal_downscale
    num_frames = (num_latent_frames - 1) * td + 1
    video = np.zeros((b, num_frames) + first_frame.shape[1:], np.float32)
    video[:, 0] = first_frame
    lat = np.asarray(encode_fn(video), np.float32)  # [B, T, h, w, C]
    mask = np.zeros(lat.shape[:-1] + (td,), np.float32)
    mask[:, 0] = 1.0
    return np.concatenate([mask, lat], axis=-1)


# ---- reference save layout ----


def _block_subtrees(overlay: dict):
    """Yield (layer_index, block_subtree) for scan ([L, ...] stacked) and
    non-scan (block_{i}) layouts alike."""
    if "blocks" in overlay and "block" in overlay["blocks"]:
        stacked = overlay["blocks"]["block"]
        n = next(x.shape[0] for x in jax.tree.leaves(stacked))
        for i in range(n):
            yield i, jax.tree.map(lambda x: x[i], stacked)
        return
    for k in sorted(
        (k for k in overlay if k.startswith("block_")),
        key=lambda s: int(s.split("_")[1]),
    ):
        yield int(k.split("_")[1]), overlay[k]


def i2v_extra_flat(
    overlay: dict,
    ctrl: dict | None,
    patch_size: tuple[int, int, int] = (1, 2, 2),
) -> dict:
    """Flatten the trainable i2v pieces to the reference key layout
    (i2v_adapter.py get_state_dict :527-548, torch orientation)."""
    flat: dict[str, np.ndarray] = {}
    f32 = lambda x: np.asarray(x, np.float32)  # noqa: E731
    for i, blk in _block_subtrees(overlay):
        for ours, theirs in (("cross_k_img", "add_k_proj"),
                             ("cross_v_img", "add_v_proj")):
            flat[f"attn_hog.{i}.{theirs}.weight"] = np.ascontiguousarray(
                f32(blk[ours]["kernel"]).T
            )
            if "bias" in blk[ours]:
                flat[f"attn_hog.{i}.{theirs}.bias"] = f32(blk[ours]["bias"])
        flat[f"attn_hog.{i}.norm_added_k.weight"] = f32(
            blk["cross_k_img_norm"]["scale"]
        )
        # the reference hog also inits an (unused-by-wan) added-q norm; emit
        # identity for layout parity
        d = flat[f"attn_hog.{i}.norm_added_k.weight"].shape[0]
        flat[f"attn_hog.{i}.norm_added_q.weight"] = np.ones((d,), np.float32)
    for ours, theirs in (
        ("img_emb_norm1", "image_embedder.norm1"),
        ("img_emb_norm2", "image_embedder.norm2"),
    ):
        flat[f"{theirs}.weight"] = f32(overlay[ours]["scale"])
        flat[f"{theirs}.bias"] = f32(overlay[ours]["bias"])
    for ours, theirs in (
        ("img_emb_in", "image_embedder.ff.net.0.proj"),
        ("img_emb_out", "image_embedder.ff.net.2"),
    ):
        flat[f"{theirs}.weight"] = np.ascontiguousarray(
            f32(overlay[ours]["kernel"]).T
        )
        flat[f"{theirs}.bias"] = f32(overlay[ours]["bias"])
    if ctrl is not None:
        pt, ph, pw = patch_size
        w = f32(ctrl["patch_embedding"]["w"])  # [(pt*ph*pw)*(4+C), d] pos-major
        d = w.shape[1]
        cin = w.shape[0] // (pt * ph * pw)
        conv = w.reshape(pt, ph, pw, cin, d).transpose(4, 3, 0, 1, 2)
        flat["frame_embedder.patch_embedding.weight"] = np.ascontiguousarray(conv)
        flat["frame_embedder.patch_embedding.bias"] = f32(
            ctrl["patch_embedding"]["b"]
        )
    return flat


def load_i2v_from_flat(
    flat: dict,
    overlay_template: dict,
    ctrl_template: dict | None,
    patch_size: tuple[int, int, int] = (1, 2, 2),
) -> tuple[dict, dict | None]:
    """Inverse of :func:`i2v_extra_flat` against shape templates (resume)."""
    scan = "blocks" in overlay_template and "block" in overlay_template["blocks"]

    def blk_entry(i, ours, name):
        key = {"cross_k_img": "add_k_proj", "cross_v_img": "add_v_proj"}.get(ours)
        if name == "kernel":
            return np.ascontiguousarray(flat[f"attn_hog.{i}.{key}.weight"].T)
        if name == "bias":
            return flat[f"attn_hog.{i}.{key}.bias"]
        return flat[f"attn_hog.{i}.norm_added_k.weight"]  # norm scale

    overlay = jax.tree.map(lambda x: x, overlay_template)  # copy structure
    if scan:
        stacked = overlay_template["blocks"]["block"]
        n = next(x.shape[0] for x in jax.tree.leaves(stacked))
        new_blk = {}
        for ours, sub in stacked.items():
            new_blk[ours] = {}
            for name in sub:
                if ours == "cross_k_img_norm":
                    per = [flat[f"attn_hog.{i}.norm_added_k.weight"] for i in range(n)]
                else:
                    per = [blk_entry(i, ours, name) for i in range(n)]
                new_blk[ours][name] = jnp.asarray(np.stack(per))
        overlay = {**overlay, "blocks": {"block": new_blk}}
    else:
        for k in list(overlay_template):
            if not k.startswith("block_"):
                continue
            i = int(k.split("_")[1])
            sub = {}
            for ours, leaves in overlay_template[k].items():
                if ours == "cross_k_img_norm":
                    sub[ours] = {"scale": jnp.asarray(
                        flat[f"attn_hog.{i}.norm_added_k.weight"]
                    )}
                else:
                    sub[ours] = {nm: jnp.asarray(blk_entry(i, ours, nm))
                                 for nm in leaves}
            overlay = {**overlay, k: sub}
    for ours, theirs in (
        ("img_emb_norm1", "image_embedder.norm1"),
        ("img_emb_norm2", "image_embedder.norm2"),
    ):
        overlay[ours] = {"scale": jnp.asarray(flat[f"{theirs}.weight"]),
                         "bias": jnp.asarray(flat[f"{theirs}.bias"])}
    for ours, theirs in (
        ("img_emb_in", "image_embedder.ff.net.0.proj"),
        ("img_emb_out", "image_embedder.ff.net.2"),
    ):
        overlay[ours] = {
            "kernel": jnp.asarray(np.ascontiguousarray(flat[f"{theirs}.weight"].T)),
            "bias": jnp.asarray(flat[f"{theirs}.bias"]),
        }
    ctrl = None
    if ctrl_template is not None and "frame_embedder.patch_embedding.weight" in flat:
        pt, ph, pw = patch_size
        conv = np.asarray(flat["frame_embedder.patch_embedding.weight"])
        d, cin = conv.shape[0], conv.shape[1]
        w = conv.transpose(2, 3, 4, 1, 0).reshape(pt * ph * pw * cin, d)
        ctrl = {"patch_embedding": {
            "w": jnp.asarray(np.ascontiguousarray(w)),
            "b": jnp.asarray(flat["frame_embedder.patch_embedding.bias"]),
        }}
    return overlay, ctrl
