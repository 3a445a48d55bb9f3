"""LPIPS golden: flax LPIPS (models/lpips.py) vs a hand-written torch mirror
of the lpips package's VGG16 variant (ScalingLayer -> 5 feature slices ->
channel-unit-normalized squared diffs -> non-negative 1x1 heads -> spatial
mean -> sum), with torchvision/lpips checkpoint key names loaded through
lpips_rules. Random weights (the pretrained files are not downloadable in
this environment); the architecture path is what's under test."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch import nn  # noqa: E402

from ai_toolkit_tpu.io.flux_import import _merge_imported  # noqa: E402
from ai_toolkit_tpu.io.torch_import import torch_to_tree  # noqa: E402
from ai_toolkit_tpu.models.lpips import _SLICES, LPIPS, lpips_rules  # noqa: E402


class TorchLPIPS(nn.Module):
    def __init__(self):
        super().__init__()
        self.shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
        self.scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
        feats = {}
        for convs in _SLICES:
            for fidx, cin, cout in convs:
                feats[str(fidx)] = nn.Conv2d(cin, cout, 3, padding=1)
        self.features = nn.ModuleDict(feats)
        for si, convs in enumerate(_SLICES):
            lin = nn.Module()
            lin.model = nn.ModuleDict(
                {"1": nn.Conv2d(convs[-1][2], 1, 1, bias=False)})
            setattr(self, f"lin{si}", lin)

    def slices(self, x):
        x = (x - self.shift) / self.scale
        outs = []
        h = x
        for si, convs in enumerate(_SLICES):
            if si > 0:
                h = F.max_pool2d(h, 2, 2)
            for fidx, _, _ in convs:
                h = F.relu(self.features[str(fidx)](h))
            outs.append(h)
        return outs

    def forward(self, a, b):
        fa, fb = self.slices(a), self.slices(b)
        total = 0.0
        for si, (xa, xb) in enumerate(zip(fa, fb)):
            def unit(t):
                return t / (t.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

            d2 = (unit(xa) - unit(xb)) ** 2
            w = getattr(self, f"lin{si}").model["1"].weight.abs()
            val = F.conv2d(d2, w)
            total = total + val.mean(dim=(1, 2, 3))
        return total

    def flat_lpips_layout(self):
        """Export with the lpips-package key names (features.N + linK.model.1)."""
        out = {}
        for fidx, m in self.features.items():
            out[f"features.{fidx}.weight"] = m.weight.detach().numpy()
            out[f"features.{fidx}.bias"] = m.bias.detach().numpy()
        for si in range(5):
            out[f"lin{si}.model.1.weight"] = (
                getattr(self, f"lin{si}").model["1"].weight.detach().numpy()
            )
        return out


def test_lpips_golden():
    torch.manual_seed(0)
    ref = TorchLPIPS().eval()
    flat = ref.flat_lpips_layout()
    tree, unmatched = torch_to_tree(flat, lpips_rules())
    assert not unmatched, unmatched[:8]

    module = LPIPS()
    dummy = jnp.zeros((1, 32, 32, 3))
    params = module.init(jax.random.key(0), dummy, dummy)["params"]
    params = _merge_imported(params, tree, "lpips test")

    rng = np.random.default_rng(0)
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(a.transpose(0, 3, 1, 2)),
                   torch.from_numpy(b.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(module.apply({"params": params}, jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
    # identity pairs score ~0
    same = np.asarray(module.apply({"params": params}, jnp.asarray(a), jnp.asarray(a)))
    assert float(np.abs(same).max()) < 1e-6


def test_load_lpips_random_and_grad():
    from ai_toolkit_tpu.models.lpips import load_lpips

    with pytest.raises(FileNotFoundError):
        load_lpips(None, jax.random.key(0))
    mod, params = load_lpips("random", jax.random.key(0))

    def loss(img):
        return jnp.mean(mod.apply({"params": params}, img,
                                  jnp.zeros_like(img)))

    g = jax.grad(loss)(jnp.ones((1, 32, 32, 3)) * 0.5)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
