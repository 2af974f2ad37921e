"""ConvMixer checkpoint import: the REFERENCE'S OWN ConvMixer class
(src/models_multimodal.py:38-95, loaded via tests/ref_modules.py) produces
the same outputs as the flax ConvMixer running the imported weights —
including BatchNorm running statistics, in eval mode. No trained reference
checkpoint ships image weights (verified across all 28 importable families),
so the oracle weights are random-init with burned-in BN statistics.

A structural twin of the reference's Sequential layout is kept as a
fallback oracle for when the reference snapshot is not mounted."""

import os

import numpy as np
import pytest

import jax

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

from multimodal_supernovae_tpu.models import ConvMixer  # noqa: E402
from multimodal_supernovae_tpu.models.factory import _import_convmixer  # noqa: E402


class TorchResidual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


def torch_convmixer(dim, depth, channels, kernel_size, patch_size, n_out):
    """Oracle with the reference's Sequential layout (so state-dict keys are
    net.0/net.2/net.{3+i}.0.fn.{0,2}/net.{3+i}.{1,3}/projection.{2,5})."""
    net = nn.Sequential(
        nn.Conv2d(channels, dim, patch_size, stride=patch_size, bias=False),
        nn.GELU(),
        nn.BatchNorm2d(dim),
    )
    for _ in range(depth):
        net.append(
            nn.Sequential(
                TorchResidual(
                    nn.Sequential(
                        nn.Conv2d(dim, dim, kernel_size, groups=dim, padding="same"),
                        nn.GELU(),
                        nn.BatchNorm2d(dim),
                        nn.Dropout(0.0),
                    )
                ),
                nn.Conv2d(dim, dim, 1),
                nn.GELU(),
                nn.BatchNorm2d(dim),
                nn.Dropout(0.0),
            )
        )
    projection = nn.Sequential(
        nn.AdaptiveAvgPool2d((1, 1)),
        nn.Flatten(),
        nn.Linear(dim, 1024),
        nn.GELU(),
        nn.Dropout(0.0),
        nn.Linear(1024, n_out),
    )

    class Wrapper(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = net
            self.projection = projection

        def forward(self, x):
            return self.projection(self.net(x))

    return Wrapper()


def _reference_convmixer(dim, depth, ch, ks, ps, n_out):
    """The reference's real ConvMixer when the snapshot is mounted, else the
    structural twin above."""
    if os.path.isdir("/root/reference/src"):
        from ref_modules import load_reference_models

        ref = load_reference_models()
        return ref.ConvMixer(dim=dim, depth=depth, channels=ch,
                             kernel_size=ks, patch_size=ps, n_out=n_out,
                             dropout_prob=0.0)
    return torch_convmixer(dim, depth, ch, ks, ps, n_out)


def test_convmixer_import_matches_torch(rng):
    dim, depth, ch, ks, ps, n_out = 8, 2, 3, 3, 5, 6
    torch.manual_seed(0)
    oracle = _reference_convmixer(dim, depth, ch, ks, ps, n_out)

    # give the BN layers non-trivial running stats
    oracle.train()
    with torch.no_grad():
        for _ in range(3):
            oracle(torch.randn(16, ch, 20, 20))
    oracle.eval()

    sd = {f"image_encoder.{k}" if not k.startswith("projection") else
          f"image_encoder.{k}": v.numpy() for k, v in oracle.state_dict().items()}
    params, stats = _import_convmixer(sd, "image_encoder.")

    model = ConvMixer(dim=dim, depth=depth, kernel_size=ks, patch_size=ps,
                      n_out=n_out, dropout_prob=0.0)
    x_nchw = rng.normal(size=(4, ch, 20, 20)).astype(np.float32)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc)
    # imported trees must be drop-in replacements (same structure)
    assert set(params) == set(variables["params"])
    out = model.apply({"params": params, "batch_stats": stats}, x_nhwc)

    with torch.no_grad():
        want = oracle(torch.tensor(x_nchw)).numpy()
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-4, atol=2e-4)
