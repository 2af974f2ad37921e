import os

import numpy as np
import pytest

import jax

from multimodal_supernovae_tpu.data.synthetic import make_synthetic_dataset
from multimodal_supernovae_tpu.data.viz import (
    assert_sorted_lightcurves,
    plot_banner,
    plot_lightcurves_and_images,
    plot_masked_reconstruction,
)
from multimodal_supernovae_tpu.models import MaskedLightCurveEncoder
from multimodal_supernovae_tpu.models.pretraining import MaskedEncoderConfig


@pytest.fixture(scope="module")
def tri_ds():
    return make_synthetic_dataset(
        n=12, n_max_lc=10, nband=2, n_max_sp=12, image_size=12,
        modalities=("lightcurve", "spectral", "host_galaxy"), seed=0,
    )


def test_plot_grids(tri_ds, tmp_path):
    out1 = plot_lightcurves_and_images(tri_ds, nband=2, path_base=str(tmp_path))
    out2 = plot_banner(tri_ds, nband=2, path_base=str(tmp_path))
    assert out1 and os.path.getsize(out1) > 0
    assert out2 and os.path.getsize(out2) > 0


def test_masked_reconstruction_plot(tri_ds, tmp_path):
    model = MaskedLightCurveEncoder(
        MaskedEncoderConfig.create(
            f_mask=0.3, nband=2,
            transformer_kwargs={"n_out": 1, "emb": 8, "heads": 2, "depth": 1,
                                "use_pallas": False},
        )
    )
    batch = tri_ds.host_batch(np.arange(4))
    variables = model.init(jax.random.PRNGKey(0), batch)
    out = plot_masked_reconstruction(
        model, variables, tri_ds, jax.random.PRNGKey(1),
        path=str(tmp_path / "masked.png"), n_panels=4,
    )
    assert out and os.path.getsize(out) > 0


def test_assert_sorted(tri_ds):
    # synthetic generator emits ascending times per band
    assert_sorted_lightcurves(tri_ds, nband=2)
    bad = make_synthetic_dataset(n=4, n_max_lc=6, nband=2, seed=1)
    arr = dict(bad.arrays)
    t = arr["t_lc"].copy()
    t[:, [0, 1]] = t[:, [1, 0]] + np.array([5.0, 0.0])  # break ordering
    arr["t_lc"] = t
    from multimodal_supernovae_tpu.data.batching import ArrayDataset

    with pytest.raises(AssertionError):
        assert_sorted_lightcurves(ArrayDataset(arr, bad.filenames), nband=2)


def test_class_dependent_metrics(rng):
    from multimodal_supernovae_tpu.evaluation.metrics import (
        class_dependent_regression_metrics,
    )

    results = [{
        "Model": "m", "Combination": "lc", "id": 0,
        "y_pred": rng.random(30), "y_true": rng.random(30),
        "y_true_label": rng.integers(0, 3, 30),
    }]
    rows = class_dependent_regression_metrics(
        results, {0: ("A", "r"), 1: ("B", "g"), 2: ("C", "b")}
    )
    assert {r["class"] for r in rows} == {"A", "B", "C"}
    assert all("R2" in r for r in rows)
