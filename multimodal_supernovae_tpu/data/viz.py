"""Dataset visualisation: host-image + light-curve grids and banners
(reference: plot_lightcurve_and_images, src/dataloader.py:682-758), and the
masked-pretraining reconstruction plot
(plot_masked_pretraining_model, src/models_pretraining.py:262-347)."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .batching import ArrayDataset


from ..utils.plotting import get_pyplot as _plt


def plot_lightcurves_and_images(
    ds: ArrayDataset, nband: int = 2, path_base: str = "./", n_rows: int = 5
) -> Optional[str]:
    """Grid of host images next to their per-band light curves."""
    plt = _plt()
    if plt is None or "x_img" not in ds.arrays or "x_lc" not in ds.arrays:
        return None
    imgs = ds.arrays["x_img"]
    t, x, e, m = (ds.arrays[k] for k in ("t_lc", "x_lc", "err_lc", "mask_lc"))
    n_rows = min(n_rows, len(ds))
    block = t.shape[1] // nband
    fig, axs = plt.subplots(n_rows, 2, figsize=(10, 4 * n_rows))
    for i in range(n_rows):
        axs[i, 0].imshow(np.clip(imgs[i], 0, 1))
        axs[i, 0].set_title("Host Image")
        axs[i, 0].axis("off")
        for b in range(nband):
            sl = slice(b * block, (b + 1) * block)
            mb = m[i, sl]
            axs[i, 1].errorbar(t[i, sl][mb], x[i, sl][mb], yerr=e[i, sl][mb], fmt="o")
        axs[i, 1].set_title("Light Curve")
        axs[i, 1].invert_yaxis()
    out = os.path.join(path_base, "lightcurves_and_host_images.png")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_banner(
    ds: ArrayDataset, nband: int = 2, path_base: str = "./",
    n_rows: int = 5, n_pairs_per_row: int = 3,
) -> Optional[str]:
    """Publication-style banner: image/light-curve pairs, no axes."""
    plt = _plt()
    if plt is None or "x_img" not in ds.arrays or "x_lc" not in ds.arrays:
        return None
    imgs = ds.arrays["x_img"]
    t, x, e, m = (ds.arrays[k] for k in ("t_lc", "x_lc", "err_lc", "mask_lc"))
    block = t.shape[1] // nband
    colors = ["firebrick", "dodgerblue"]
    n = min(len(ds), n_rows * n_pairs_per_row)
    fig, axs = plt.subplots(n_rows, 2 * n_pairs_per_row,
                            figsize=(8 * n_pairs_per_row, 4 * n_rows))
    for idx in range(n):
        r, c = divmod(idx, n_pairs_per_row)
        axs[r, 2 * c].imshow(np.clip(imgs[idx], 0, 1))
        axs[r, 2 * c].axis("off")
        for b in range(nband):
            sl = slice(b * block, (b + 1) * block)
            mb = m[idx, sl]
            axs[r, 2 * c + 1].errorbar(
                t[idx, sl][mb], x[idx, sl][mb], yerr=e[idx, sl][mb],
                fmt="o", ms=8, color=colors[b % 2],
            )
        axs[r, 2 * c + 1].set_xticklabels([])
        axs[r, 2 * c + 1].set_yticklabels([])
    out = os.path.join(path_base, "banner.png")
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return out


def plot_masked_reconstruction(
    model, variables, ds: ArrayDataset, key, path: Optional[str] = None,
    n_panels: int = 8, f_mask: float = 0.3,
) -> Optional[str]:
    """Predicted vs. true values over randomly-hidden spans for a trained
    masked light-curve encoder."""
    plt = _plt()
    if plt is None:
        return None
    import jax

    batch = ds.host_batch(np.arange(min(n_panels, len(ds))))
    truth, pred, mask_pred = model.apply(
        variables, batch.x_lc, batch.t_lc, batch.mask_lc, key,
        method=model.masked_pred,
    )
    truth, pred, mask_pred = map(np.asarray, (truth, pred, mask_pred))
    t = np.asarray(batch.t_lc)
    pm = np.asarray(batch.mask_lc)
    n = truth.shape[0]
    rows = (n + 1) // 2
    fig, axs = plt.subplots(rows, 2, figsize=(12, 3 * rows), squeeze=False)
    for i in range(n):
        ax = axs[i // 2][i % 2]
        ax.scatter(t[i][pm[i]], truth[i][pm[i]], label="truth", s=12)
        if mask_pred[i].any():
            ax.scatter(t[i][mask_pred[i]], pred[i][mask_pred[i]],
                       label="pred (hidden)", s=12)
            ax.axvspan(t[i][mask_pred[i]].min(), t[i][mask_pred[i]].max(),
                       alpha=0.1, color="red")
        ax.set_xlabel("time")
        ax.set_ylabel("mag")
        ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path)
    plt.close(fig)
    return path


def assert_sorted_lightcurves(ds: ArrayDataset, nband: int = 2) -> None:
    """Validate that valid times within each band block are ascending
    (the reference's assert_sorted_lc, src/utils.py:1353-1383). The ingest
    packers sort by time, so this should always hold post-ingest."""
    t = ds.arrays["t_lc"]
    m = ds.arrays["mask_lc"]
    block = t.shape[1] // nband
    for b in range(nband):
        sl = slice(b * block, (b + 1) * block)
        tb = np.where(m[:, sl], t[:, sl], np.inf)
        # ignore the padded tail (inf) — prefix must be non-decreasing
        with np.errstate(invalid="ignore"):
            diffs = np.diff(tb, axis=1)
        valid_pairs = np.isfinite(tb[:, :-1]) & np.isfinite(tb[:, 1:])
        if not (diffs[valid_pairs] >= 0).all():
            raise AssertionError(f"band {b}: light-curve times not sorted")
