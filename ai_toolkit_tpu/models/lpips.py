"""LPIPS perceptual distance (VGG16 backbone + learned linear heads).

Parity target: the ``lpips`` package's ``LPIPS(net='vgg')`` used by the
reference VAE trainer (``jobs/process/TrainVAEProcess.py:719-721,942-946``):
inputs in [-1, 1] are normalized by the fixed ImageNet scaling layer, run
through the five VGG16 feature slices (relu1_2/2_2/3_3/4_3/5_3), each slice's
activations are channel-unit-normalized, squared-differenced, reduced by a
1x1 non-negative linear head, spatially averaged, and summed.

Offline constraint: the pretrained VGG16 + LPIPS-head weights cannot be
downloaded here — training configs must point ``lpips_weights`` at a local
safetensors/pt file holding the torchvision ``features.N.weight`` keys plus
the lpips ``linK.model.1.weight`` heads (``lpips_weights: random`` random-
inits for tests/smoke runs). The architecture itself is golden-tested against
a hand-written torch mirror in tests/test_lpips.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ai_toolkit_tpu.ops.layers import Conv

# torchvision vgg16.features conv indices per slice (maxpool between slices)
_SLICES = (
    ((0, 3, 64), (2, 64, 64)),
    ((5, 64, 128), (7, 128, 128)),
    ((10, 128, 256), (12, 256, 256), (14, 256, 256)),
    ((17, 256, 512), (19, 512, 512), (21, 512, 512)),
    ((24, 512, 512), (26, 512, 512), (28, 512, 512)),
)
# lpips ScalingLayer constants (lpips/lpips.py ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _VGGFeats(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = (x.astype(jnp.float32) - _SHIFT) / _SCALE
        feats = []
        h = x.astype(dt)
        for si, convs in enumerate(_SLICES):
            if si > 0:
                h = nn.max_pool(h, (2, 2), strides=(2, 2))
            for ci, (_, _, out) in enumerate(convs):
                h = Conv(out, (3, 3), dtype=dt, param_dtype=jnp.float32,
                         name=f"conv_{si}_{ci}")(h)
                h = nn.relu(h)
            feats.append(h)
        return feats


class LPIPS(nn.Module):
    """Returns the scalar LPIPS distance per pair, [B]."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        """a, b: [B, H, W, 3] in [-1, 1]."""
        vgg = _VGGFeats(self.dtype, name="vgg")
        fa = vgg(a)
        fb = vgg(b)
        total = jnp.zeros((a.shape[0],), jnp.float32)
        for si, (xa, xb) in enumerate(zip(fa, fb)):
            def unit(t):
                t32 = t.astype(jnp.float32)
                n = jnp.sqrt(jnp.sum(t32 * t32, axis=-1, keepdims=True)) + 1e-10
                return t32 / n

            d2 = (unit(xa) - unit(xb)) ** 2
            lin = self.param(
                f"lin_{si}", nn.initializers.uniform(1.0), (d2.shape[-1],), jnp.float32
            )
            # lpips heads are trained non-negative; abs keeps random init valid
            val = jnp.sum(d2 * jnp.abs(lin)[None, None, None], axis=-1)
            total = total + jnp.mean(val, axis=(1, 2))
        return total


def lpips_rules():
    """torchvision ``features.N`` + lpips ``linK.model.1`` keys -> LPIPS tree.

    Accepts both raw names and the lpips package's ``net.sliceS.N`` prefix.
    """
    from ai_toolkit_tpu.io.torch_import import Rule  # noqa: F401

    rules = []
    for si, convs in enumerate(_SLICES):
        for ci, (fidx, _, _) in enumerate(convs):
            rules.append((rf"(?:net\.)?(?:slice\d+\.)?features\.{fidx}\.weight",
                          f"vgg/conv_{si}_{ci}/kernel", "conv2d"))
            rules.append((rf"(?:net\.)?(?:slice\d+\.)?features\.{fidx}\.bias",
                          f"vgg/conv_{si}_{ci}/bias", "direct"))
            rules.append((rf"net\.slice{si + 1}\.{fidx}\.weight",
                          f"vgg/conv_{si}_{ci}/kernel", "conv2d"))
            rules.append((rf"net\.slice{si + 1}\.{fidx}\.bias",
                          f"vgg/conv_{si}_{ci}/bias", "direct"))
        rules.append((rf"lin{si}\.model\.1\.weight", f"lin_{si}", "flatten_all"))
    return rules


def load_lpips(path: str | None, rng: jax.Array) -> tuple[LPIPS, dict]:
    """Build the LPIPS module; ``path`` is a safetensors/pt weights file,
    or the literal string 'random' for an explicitly random-init metric."""
    module = LPIPS()
    dummy = jnp.zeros((1, 64, 64, 3))
    params = module.init(rng, dummy, dummy)["params"]
    if not path or path == "random":
        if path != "random":
            raise FileNotFoundError(
                "lpips_weight > 0 requires train.lpips_weights to point at a "
                "local VGG16+LPIPS weights file (no network egress here); set "
                "lpips_weights: random to opt into a random-feature metric."
            )
        return module, params
    from ai_toolkit_tpu.io.flux_import import _merge_imported
    from ai_toolkit_tpu.io.torch_import import torch_to_tree

    if path.endswith((".pt", ".pth")):
        import torch

        flat = {k: v.numpy() for k, v in torch.load(path, map_location="cpu").items()}
    else:
        from ai_toolkit_tpu.io.torch_import import load_safetensors_dir

        flat = load_safetensors_dir(path)
    tree, unmatched = torch_to_tree(flat, lpips_rules())
    if unmatched:
        print(f"lpips import: {len(unmatched)} unmatched (e.g. {unmatched[:3]})")
    return module, _merge_imported(params, tree, "lpips")
