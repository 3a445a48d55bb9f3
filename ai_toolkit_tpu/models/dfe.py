"""Diffusion Feature Extractor (DFE) perceptual latent loss.

Parity target: ``/root/reference/toolkit/models/diffusion_feature_extraction.py``
(v1 ``DiffusionFeatureExtractor``: 1x1 conv-in -> 6 residual GELU blocks ->
conv-out at latent resolution; v2 ``DiffusionFeatureExtractor2``: five
multi-scale conv paths over ``concat[flow_target, noise]``) and its use in
``extensions_built_in/sd_trainer/SDTrainer.py:623-683``:

- v1: features of the *stepped-to-x0* prediction vs features of the clean
  latents, MSE scaled by ``1 - t`` (weaker at high noise).
- v2: feature-list MSE between ``dfe([pred, noise])`` and
  ``dfe([noise - latents, noise])``.

Weights load from a torch-layout safetensors file
(``train.diffusion_feature_extractor_path``); with no file the net is
random-init (offline envs — still a valid fixed random projection loss).
All convs run NHWC on the latent grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Conv, GroupNorm


class _ResBlock(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        identity = x
        if x.shape[-1] != self.out_channels:
            identity = Conv(self.out_channels, (1, 1), dtype=jnp.float32,
                            param_dtype=jnp.float32, name="skip")(x)
        x = Conv(self.out_channels, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                 name="conv1")(x)
        x = GroupNorm(8, dtype=jnp.float32, name="norm1")(x)
        x = jax.nn.silu(x)
        x = Conv(self.out_channels, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                 name="conv2")(x)
        x = GroupNorm(8, dtype=jnp.float32, name="norm2")(x)
        return jax.nn.silu(x + identity)


class _DFEBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        x_in = x
        x = Conv(self.channels, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                 name="conv1")(x)
        x = Conv(self.channels, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                 name="conv2")(x)
        x = jax.nn.gelu(x, approximate=False)  # torch nn.GELU() default (erf)
        x = Conv(self.channels, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                 name="proj")(x)
        return x + x_in


class DFEv1(nn.Module):
    """conv_in 1x1 -> 6 DFE blocks -> conv_out 1x1 (latent-resolution features)."""

    out_channels: int = 512
    width: int = 512
    num_blocks: int = 6

    @nn.compact
    def __call__(self, x):
        x = Conv(self.width, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                 name="conv_in")(x)
        for i in range(self.num_blocks):
            x = _DFEBlock(self.width, name=f"block_{i}")(x)
        return Conv(self.out_channels, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                    name="conv_out")(x)


def _upsample2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), "bilinear")


class DFEv2(nn.Module):
    """Five multi-scale paths; returns the feature list (reference order)."""

    width: int = 64  # path-1 width; paths scale 64/128/256/512/512

    @nn.compact
    def __call__(self, x) -> list[jax.Array]:
        w0 = self.width
        outs = []
        # path 1: 3 upsamples
        h = Conv(w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="p1_in")(x)
        for i in range(3):
            h = _upsample2(h)
            h = _ResBlock(w0, name=f"p1_res{i}")(h)
        outs.append(Conv(w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                         name="p1_out")(h))
        # path 2: 2 upsamples
        h = Conv(2 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="p2_in")(x)
        for i in range(2):
            h = _upsample2(h)
            h = _ResBlock(2 * w0, name=f"p2_res{i}")(h)
        outs.append(Conv(2 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                         name="p2_out")(h))
        # path 3: 1 upsample
        h = Conv(4 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="p3_in")(x)
        h = _ResBlock(4 * w0, name="p3_res0")(_upsample2(h))
        outs.append(Conv(4 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                         name="p3_out")(h))
        # path 4: native res
        h = Conv(8 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="p4_in")(x)
        h = _ResBlock(8 * w0, name="p4_res0")(h)
        h = _ResBlock(8 * w0, name="p4_res1")(h)
        outs.append(Conv(8 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                         name="p4_out")(h))
        # path 5: avg-pool down
        h = Conv(8 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32, name="p5_in")(x)
        h = _ResBlock(8 * w0, name="p5_res0")(h)
        h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = _ResBlock(8 * w0, name="p5_res1")(h)
        outs.append(Conv(8 * w0, (3, 3), dtype=jnp.float32, param_dtype=jnp.float32,
                         name="p5_out")(h))
        return outs


# torch key -> our path (v1)
_V1_MAP = {
    "conv_in": "conv_in",
    "conv_out": "conv_out",
}
# reference v2 module-list indices -> our named modules
_V2_PATHS = {
    "up_path": ("p1_in", None, "p1_res0", None, "p1_res1", None, "p1_res2", "p1_out"),
    "path2": ("p2_in", None, "p2_res0", None, "p2_res1", "p2_out"),
    "path3": ("p3_in", None, "p3_res0", "p3_out"),
    "path4": ("p4_in", "p4_res0", "p4_res1", "p4_out"),
    "path5": ("p5_in", "p5_res0", None, "p5_res1", "p5_out"),
}


def _conv_w(v):
    return np.ascontiguousarray(np.asarray(v).transpose(2, 3, 1, 0))


def load_dfe(path: str | None, in_channels: int, version: int | None = None):
    """Returns (module, params, version). path=None -> random init."""
    flat = {}
    if path:
        from safetensors import safe_open

        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                flat[k] = f.get_tensor(k)
        if version is None:
            version = 2 if any(k.startswith("up_path") for k in flat) else 1

    version = version or 1
    module = DFEv1() if version == 1 else DFEv2()
    x = jnp.zeros((1, 8, 8, in_channels * (2 if version == 2 else 1)), jnp.float32)
    params = module.init(jax.random.key(0), x)["params"]
    if not flat:
        return module, params, version

    tree = _convert_dfe_flat(flat, version)
    from ai_toolkit_tpu.io.flux_import import _merge_imported

    return module, _merge_imported(params, tree, f"dfe v{version}"), version


def _convert_dfe_flat(flat: dict, version: int) -> dict:
    tree: dict = {}

    def put(path, v):
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def conv(src, dst):
        if src + ".weight" in flat:
            put(dst + "/kernel", _conv_w(flat[src + ".weight"]))
        if src + ".bias" in flat:
            put(dst + "/bias", np.asarray(flat[src + ".bias"]))

    def resblock(src, dst):
        conv(src + ".conv1", dst + "/conv1")
        conv(src + ".conv2", dst + "/conv2")
        conv(src + ".skip", dst + "/skip")
        for n in ("norm1", "norm2"):
            if f"{src}.{n}.weight" in flat:
                put(f"{dst}/{n}/scale", np.asarray(flat[f"{src}.{n}.weight"]))
                put(f"{dst}/{n}/bias", np.asarray(flat[f"{src}.{n}.bias"]))

    if version == 1:
        conv("conv_in", "conv_in")
        conv("conv_out", "conv_out")
        i = 0
        while f"blocks.{i}.conv1.weight" in flat:
            for n in ("conv1", "conv2", "proj"):
                conv(f"blocks.{i}.{n}", f"block_{i}/{n}")
            i += 1
    else:
        for src_list, names in _V2_PATHS.items():
            for idx, name in enumerate(names):
                if name is None:  # nn.Upsample — no params
                    continue
                src = f"{src_list}.{idx}"
                if f"{src}.conv1.weight" in flat:
                    resblock(src, name)
                else:
                    conv(src, name)
    return tree


def make_dfe_loss(module, params, version: int, schedule, weight: float):
    """Returns aux_loss_fn(pred, noisy, latents, noise, t) -> scalar,
    jit-safe (params closed over as constants)."""

    def v1_loss(pred, noisy, latents, noise, t):
        x0_pred = schedule.pred_to_x0(pred.astype(jnp.float32), noisy.astype(jnp.float32), t)
        pred_f = module.apply({"params": params}, x0_pred)
        tgt_f = jax.lax.stop_gradient(
            module.apply({"params": params}, latents.astype(jnp.float32))
        )
        scaler = (1.0 - t.astype(jnp.float32)).reshape(-1, *([1] * (pred_f.ndim - 1)))
        return weight * jnp.mean(jnp.square(pred_f - tgt_f) * scaler)

    def v2_loss(pred, noisy, latents, noise, t):
        nf = noise.astype(jnp.float32)
        tgt_in = jnp.concatenate([nf - latents.astype(jnp.float32), nf], axis=-1)
        pred_in = jnp.concatenate([pred.astype(jnp.float32), nf], axis=-1)
        tgt_f = jax.lax.stop_gradient(module.apply({"params": params}, tgt_in))
        pred_f = module.apply({"params": params}, pred_in)
        loss = 0.0
        for pf, tf in zip(pred_f, tgt_f):
            loss = loss + jnp.mean(jnp.square(pf - tf))
        return weight * loss

    return v1_loss if version == 1 else v2_loss


def load_dfe7(path: str):
    """DFE v7/v8 backbone (reference diffusion_feature_extraction.py:848-1075:
    ``load_dfe("v7")`` -> TIPSv2 b14-dpt). ``path`` is "v7"/"v8" (random-init
    offline) or "v7:<dir>" pointing at local tipsv2 weights. Returns
    (module, params, partial_step)."""
    import jax

    from ai_toolkit_tpu.models.tipsv2 import (
        TIPSConfig,
        TIPSv2DPT,
        load_tipsv2_dpt,
    )

    ver, _, wdir = path.partition(":")
    partial = ver.startswith("v8")  # v8 == v7 + partial_step (ref :1061-1065)
    if wdir:
        module, params = load_tipsv2_dpt(wdir)
        return module, params, partial
    cfg = (TIPSConfig.tiny() if ver.endswith("-tiny")  # test hook
           else TIPSConfig.b14_dpt())
    module = TIPSv2DPT(cfg)
    print("DFE v7: no local tipsv2 weights — random-init backbone "
          "(offline; pass 'v7:<dir>' with model.safetensors for the real one)")
    params = module.init(jax.random.key(7),
                         jnp.zeros((1, 14 * 4, 14 * 4, 3)))["params"]
    return module, params, partial


def make_dfe7_loss(module, params, schedule, weight: float, decode_fn,
                   partial_step: bool = False):
    """aux_loss_fn for DFE v7/v8 (reference DiffusionFeatureExtractor7.forward
    :915-1058): step the prediction to x0, decode to pixels, and match the
    TIPSv2 head features (mse) + depth/normals/segmentation maps (l1) of the
    decoded TARGET latents, weighted per-sample by 1/clamp(sigma, 0.1)^2.

    TPU-native deviations (documented): the target pass decodes the clean
    latents instead of re-reading dataset pixels (identical up to the VAE
    round-trip the prediction side also pays), and v8's random partial step
    size U(0.02, 0.05) is the fixed midpoint 0.035 (aux hook is rng-free).
    """

    def loss(pred, noisy, latents, noise, t):
        tv = t.astype(jnp.float32).reshape(-1, 1, 1, 1)
        if not partial_step:
            x0 = schedule.pred_to_x0(
                pred.astype(jnp.float32), noisy.astype(jnp.float32), t)
            tgt_lat = latents.astype(jnp.float32)
            tv_eff = jnp.maximum(tv, 0.001)
        else:
            step = 0.035
            nxt = jnp.clip(tv - step, 0.0)
            x0 = noisy.astype(jnp.float32) + (nxt - tv) * pred.astype(jnp.float32)
            tgt_lat = ((1.0 - nxt) * latents.astype(jnp.float32)
                       + nxt * noise.astype(jnp.float32))
            tv_eff = tv
        pred_img = (decode_fn(x0).astype(jnp.float32) + 1.0) / 2.0
        tgt_img = jax.lax.stop_gradient(
            (decode_fn(tgt_lat).astype(jnp.float32) + 1.0) / 2.0)
        p = module.apply({"params": params}, pred_img)
        tg = jax.lax.stop_gradient(module.apply({"params": params}, tgt_img))
        w = 1.0 / jnp.maximum(tv_eff, 0.1) ** 2  # velocity-equivalent weight

        def red(a, b, sq):
            d = a.astype(jnp.float32) - b.astype(jnp.float32)
            d = jnp.square(d) if sq else jnp.abs(d)
            return jnp.mean(d * w)

        total = (red(p["head"], tg["head"], True)
                 + red(p["depth"], tg["depth"], False)
                 + red(p["normals"], tg["normals"], False)
                 + red(p["segmentation"], tg["segmentation"], False)) / 4.0
        if partial_step:
            total = total * 10.0
        return weight * total

    return loss
