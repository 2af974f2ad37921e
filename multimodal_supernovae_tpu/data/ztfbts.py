"""ZTF BTS real-data ingest: files on disk -> fixed-shape ArrayDataset.

The on-disk layout matches the reference's expectations (SURVEY.md L0):

  <data_dir>/ZTFBTS_TransientTable.csv      per-SN metadata (ZTFID, redshift,
                                            type, A_V, ...)
  <data_dir>/light-curves/<ZTFID>.csv       columns time,mag,magerr,band
  <data_dir>/hostImgs/<ZTFID>.host.png      3-channel host cutout
  <spectra_dir>/<ZTFID>.csv                 headerless (wavelength, flux
                                            [, fluxerr]) rows

Ingest semantics follow src/dataloader.py (load_images :290, load_redshifts
:336, load_classes :368, load_lightcurves :444, load_spectras :578,
load_data :761): CCM89 extinction correction of magnitudes per band (A_V
from the transient table, R_V=3.1, the reference's effective wavelengths),
per-band pad/subsample + time zeroing + band-blocked concat, spectra
rescaling and zero-filled missing errors, and filename intersection across
modalities with redshift/class always appended.

The TPU-relevant design difference: this runs ONCE, producing dense arrays
(cacheable via data/cache.py) that live in HBM for the whole run — not per
batch in DataLoader workers. CSV parsing can use the native C++ reader
(data/native) when built; pandas otherwise.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .batching import ArrayDataset
from .extinction import ZTF_WAVE_EFF, ccm89
from .folds import stratified_kfolds
from .transforms import factorize_classes, process_ragged_series

BANDS = ("R", "g")  # ingest order defines the band-block layout


def _read_csv(path: str, header: bool):
    """CSV -> dict of numpy arrays. Uses the native reader when available."""
    from . import native

    if native.available():
        return native.read_csv(path, header=header)
    import pandas as pd

    df = pd.read_csv(path, header=0 if header else None)
    return {str(c): df[c].to_numpy() for c in df.columns}


import functools


@functools.lru_cache(maxsize=8)
def _cached_table(path: str, mtime: float):
    import pandas as pd

    df = pd.read_csv(path)
    df["redshift"] = pd.to_numeric(df["redshift"], errors="coerce")
    return df


def load_transient_table(data_dir: str):
    """The per-SN metadata table, parsed once per (path, mtime) — the
    image/lightcurve/redshift/class loaders all consult it."""
    path = os.path.join(data_dir, "ZTFBTS_TransientTable.csv")
    return _cached_table(path, os.path.getmtime(path))


def load_images(
    data_dir: str, filenames: Optional[Sequence[str]] = None
) -> Tuple[np.ndarray, List[str]]:
    """hostImgs/*.host.png -> (N, H, W, 3) float32 in [0, 1] (NHWC)."""
    from PIL import Image

    img_dir = os.path.join(data_dir, "hostImgs")
    avail = sorted(f for f in os.listdir(img_dir) if f.endswith(".host.png"))
    if filenames is not None:
        wanted = {f + ".host.png" for f in filenames}
        avail = [f for f in avail if f in wanted]
    imgs, names = [], []
    for fname in avail:
        img = Image.open(os.path.join(img_dir, fname)).convert("RGB")
        imgs.append(np.asarray(img, dtype=np.float32) / 255.0)
        names.append(fname[: -len(".host.png")])
    return np.stack(imgs) if imgs else np.zeros((0, 0, 0, 3), np.float32), names


def load_lightcurves(
    data_dir: str,
    n_max_obs: int = 100,
    filenames: Optional[Sequence[str]] = None,
    rng: Optional[np.random.Generator] = None,
    abs_mag: bool = False,
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Per-SN CSVs -> band-blocked (N, nband*n_max) arrays.

    Per band: CCM89-correct magnitudes (A_V from the table, R_V=3.1,
    reference wavelengths), pad/subsample to n_max_obs, shift valid times to
    start at 0, then concatenate bands along the sequence axis
    (dataloader.py:496-552).
    """
    rng = rng or np.random.default_rng(0)
    lc_dir = os.path.join(data_dir, "light-curves")
    table = load_transient_table(data_dir)
    known = set(table["ZTFID"].astype(str))
    av_by_id = dict(zip(table["ZTFID"].astype(str), table["A_V"]))

    avail = sorted(f for f in os.listdir(lc_dir) if f.endswith(".csv"))
    if filenames is not None:
        wanted = {f + ".csv" for f in filenames}
        avail = [f for f in avail if f in wanted]

    # Per-unit-A_V extinction for each band (polynomials evaluated once).
    ext_unit = {
        band: float(ccm89(np.array([ZTF_WAVE_EFF[band]]), 1.0, 3.1)[0])
        for band in BANDS
    }

    rows_t, rows_x, rows_e, rows_m, names = [], [], [], [], []
    for fname in avail:
        sn = Path(fname).stem
        if sn not in known:
            continue
        cols = _read_csv(os.path.join(lc_dir, fname), header=True)
        if not all(c in cols for c in ("time", "mag", "magerr", "band")):
            continue
        band_col = np.asarray(cols["band"]).astype(str)
        av = float(av_by_id[sn])
        t_cat, x_cat, e_cat, m_cat = [], [], [], []
        for band in BANDS:
            sel = band_col == band
            mag = np.asarray(cols["mag"], dtype=np.float64)[sel]
            mag = mag - av * ext_unit[band]
            tt, xx, ee, mm = process_ragged_series(
                np.asarray(cols["time"], dtype=np.float64)[sel],
                mag,
                np.asarray(cols["magerr"], dtype=np.float64)[sel],
                n_max_obs,
                rng,
            )
            t_cat.append(tt)
            x_cat.append(xx)
            e_cat.append(ee)
            m_cat.append(mm)
        rows_t.append(np.concatenate(t_cat))
        rows_x.append(np.concatenate(x_cat))
        rows_e.append(np.concatenate(e_cat))
        rows_m.append(np.concatenate(m_cat))
        names.append(sn)

    arrays = {
        "t_lc": np.asarray(rows_t, dtype=np.float32),
        "x_lc": np.asarray(rows_x, dtype=np.float32),
        "err_lc": np.asarray(rows_e, dtype=np.float32),
        "mask_lc": np.asarray(rows_m, dtype=bool),
    }
    if abs_mag:
        # Apparent -> absolute magnitudes via the flat-LCDM distance modulus
        # (the reference's astropy Planck15 path, dataloader.py:559-575).
        # Redshifts come back in table order; re-align to our row order and
        # drop rows without a finite redshift.
        from .extinction import flat_lcdm_distmod

        z_vals, z_names = load_redshifts(data_dir, names)
        z_by_name = dict(zip(z_names, z_vals))
        z = np.array([z_by_name.get(n, np.nan) for n in names])
        ok = np.isfinite(z)
        mu = flat_lcdm_distmod(np.where(ok, z, 0.1))
        arrays["x_lc"] = arrays["x_lc"] - mu.astype(np.float32)[:, None]
        arrays = {k: v[ok] for k, v in arrays.items()}
        names = [n for n, good in zip(names, ok) if good]
    return arrays, names


def load_spectra(
    spectra_dir: str,
    n_max_obs: int = 1000,
    rescalefactor: float = 1e14,
    filenames: Optional[Sequence[str]] = None,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[Dict[str, np.ndarray], List[str]]:
    """Headerless (wavelength, flux[, err]) CSVs -> (N, n_max) arrays.

    Flux (and err) scaled by ``rescalefactor``; missing error columns become
    zeros; missing err values are zero-filled (dataloader.py:624-672).
    """
    rng = rng or np.random.default_rng(0)
    avail = sorted(
        f
        for f in os.listdir(spectra_dir)
        if f.endswith(".csv") and not f.startswith(".")
    )
    if filenames is not None:
        wanted = {f + ".csv" for f in filenames}
        avail = [f for f in avail if f in wanted]

    rows_t, rows_x, rows_e, rows_m, names = [], [], [], [], []
    for fname in avail:
        cols = _read_csv(os.path.join(spectra_dir, fname), header=False)
        vals = list(cols.values())
        freq = np.asarray(vals[0], dtype=np.float64)
        spec = np.asarray(vals[1], dtype=np.float64) * rescalefactor
        if len(vals) >= 3:
            err = np.nan_to_num(np.asarray(vals[2], dtype=np.float64)) * rescalefactor
        else:
            err = np.zeros_like(spec)
        tt, xx, ee, mm = process_ragged_series(
            freq, spec, err, n_max_obs, rng, zero_time=False
        )
        rows_t.append(tt)
        rows_x.append(xx)
        rows_e.append(ee)
        rows_m.append(mm)
        names.append(Path(fname).stem)

    arrays = {
        "t_sp": np.asarray(rows_t, dtype=np.float32),
        "x_sp": np.asarray(rows_x, dtype=np.float32),
        "err_sp": np.asarray(rows_e, dtype=np.float32),
        "mask_sp": np.asarray(rows_m, dtype=bool),
    }
    return arrays, names


def load_redshifts(data_dir: str, filenames: Sequence[str]) -> Tuple[np.ndarray, List[str]]:
    """Redshifts for the given IDs, in table order, NaNs dropped
    (dataloader.py:336-365)."""
    table = load_transient_table(data_dir).dropna(subset=["redshift"])
    sub = table[table["ZTFID"].astype(str).isin(set(filenames))]
    return sub["redshift"].to_numpy(np.float32), sub["ZTFID"].astype(str).tolist()


def load_classes(
    data_dir: str, n_classes: int, filenames: Sequence[str]
) -> Tuple[np.ndarray, List[str]]:
    """Factorized SN-type labels for the given IDs (dataloader.py:368-416)."""
    table = load_transient_table(data_dir).dropna(subset=["type"])
    sub = table[table["ZTFID"].astype(str).isin(set(filenames))]
    labels, keep, _ = factorize_classes(sub["type"].astype(str).tolist(), n_classes)
    names = sub["ZTFID"].astype(str).to_numpy()[keep].tolist()
    return labels, names


def load_ztfbts(
    data_dir: str,
    spectra_dir: Optional[str] = None,
    combinations: Sequence[str] = ("host_galaxy", "lightcurve"),
    max_data_len_lc: int = 100,
    max_data_len_spec: int = 1000,
    n_classes: int = 5,
    spectral_rescalefactor: float = 1e14,
    filenames: Optional[Sequence[str]] = None,
    kfolds: Optional[int] = 5,
    seed: int = 0,
    abs_mag: bool = False,
):
    """The unified loader (reference ``load_data``, dataloader.py:761-905).

    Returns (ArrayDataset, nband, folds). Filenames are intersected across
    all requested modalities plus redshift and class availability; rows are
    ordered by sorted ZTFID (every per-modality loader walks sorted listings,
    so intersection preserves a common order).
    """
    spectra_dir = spectra_dir or data_dir
    rng = np.random.default_rng(seed)
    combos = set(combinations)
    nband = len(BANDS) if "lightcurve" in combos else 1

    arrays: Dict[str, np.ndarray] = {}
    names: Optional[List[str]] = list(filenames) if filenames is not None else None

    def intersect(new_names: Sequence[str]):
        nonlocal names, arrays
        if names is None:
            names = list(new_names)
            return
        keep_set = set(new_names)
        keep = np.array([n in keep_set for n in names], dtype=bool)
        names = [n for n, k in zip(names, keep) if k]
        arrays = {k: v[keep] for k, v in arrays.items()}

    if "host_galaxy" in combos:
        imgs, img_names = load_images(data_dir, names)
        intersect(img_names)
        idx = {n: i for i, n in enumerate(img_names)}
        arrays["x_img"] = imgs[np.array([idx[n] for n in names])]

    if "lightcurve" in combos:
        lc_arrays, lc_names = load_lightcurves(
            data_dir, max_data_len_lc, names, rng, abs_mag=abs_mag
        )
        intersect(lc_names)
        # re-align the lc arrays to the (possibly smaller) intersection
        idx = {n: i for i, n in enumerate(lc_names)}
        sel = np.array([idx[n] for n in names])
        arrays.update({k: v[sel] for k, v in lc_arrays.items()})

    if "spectral" in combos:
        sp_arrays, sp_names = load_spectra(
            spectra_dir, max_data_len_spec, spectral_rescalefactor, names, rng
        )
        intersect(sp_names)
        idx = {n: i for i, n in enumerate(sp_names)}
        sel = np.array([idx[n] for n in names])
        arrays.update({k: v[sel] for k, v in sp_arrays.items()})

    # redshift + class always ride along (dataloader.py:871-891)
    z, z_names = load_redshifts(data_dir, names)
    intersect(z_names)
    idx = {n: i for i, n in enumerate(z_names)}
    arrays["redshift"] = z[np.array([idx[n] for n in names])]

    labels, c_names = load_classes(data_dir, n_classes, names)
    intersect(c_names)
    idx = {n: i for i, n in enumerate(c_names)}
    arrays["label"] = labels[np.array([idx[n] for n in names])]

    folds = stratified_kfolds(arrays["label"], kfolds) if kfolds else None
    return ArrayDataset(arrays, names), nband, folds
