"""On-disk mini ZTFBTS fixture: writes the reference's data layout
(TransientTable.csv, light-curves/*.csv, hostImgs/*.host.png, spectra
*.csv) with synthetic content, so ingest tests never need the real
download (the reference's CI unzips the real data; SURVEY.md §4)."""

from __future__ import annotations

import os

import numpy as np


SN_TYPES = ["SN Ia", "SN II", "SN Ib", "SN Ic", "SN IIP", "SLSN-I", "SN IIn",
            "SN Ib/c"]


def write_mini_sim_hdf5(path: str, n_per_type: int = 8, seed: int = 0,
                        lc_len: int = 40, sp_len: int = 30):
    """Mini HDF5 in the reference's Photometry/Spectroscopy schema
    (SimulationDataset, src/dataloader.py:1037-1229)."""
    import h5py

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for i, t_type in enumerate(["Ia", "II"]):
            gp = f.create_group(f"Photometry/{t_type}/model0")
            n = n_per_type
            gp["TID"] = np.arange(n) + 100 * i
            gp["z"] = rng.random(n).astype(np.float64) * 0.2
            gp["mjd"] = np.sort(rng.random((n, lc_len)) * 100, axis=1)
            gp["filter"] = rng.choice([1, 2], size=(n, lc_len))
            base = 22 + rng.normal(size=(n, lc_len))
            gp["mag_obs"] = base + 0.1 * rng.normal(size=(n, lc_len))
            gp["mag_perfect"] = base
            gs = f.create_group(f"Spectroscopy/{t_type}/model0")
            gs["TID"] = gp["TID"][...]
            gs["wavelength"] = np.tile(np.linspace(3000, 9000, sp_len), (n, 1))
            flux = 1 + 0.3 * rng.random((n, sp_len))
            gs["flux_obs"] = flux + 0.02 * rng.normal(size=(n, sp_len))
            gs["flux_perfect"] = flux
    return path


def write_mini_ztfbts(root: str, n: int = 12, seed: int = 0,
                      with_images: bool = True, with_spectra: bool = True,
                      image_size: int = 20):
    rng = np.random.default_rng(seed)
    data_dir = os.path.join(root, "ZTFBTS")
    spectra_dir = os.path.join(root, "ZTFBTS_spectra")
    os.makedirs(os.path.join(data_dir, "light-curves"), exist_ok=True)
    if with_images:
        os.makedirs(os.path.join(data_dir, "hostImgs"), exist_ok=True)
    if with_spectra:
        os.makedirs(spectra_dir, exist_ok=True)

    ids = [f"ZTF20test{i:04d}" for i in range(n)]
    # transient table
    rows = ["ZTFID,redshift,type,A_V"]
    for i, sid in enumerate(ids):
        z = rng.random() * 0.1 + 0.01
        typ = SN_TYPES[i % len(SN_TYPES)]
        av = rng.random() * 0.3
        # one NaN redshift to exercise the drop path
        z_str = "" if i == n - 1 else f"{z:.5f}"
        rows.append(f"{sid},{z_str},{typ},{av:.4f}")
    with open(os.path.join(data_dir, "ZTFBTS_TransientTable.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")

    for i, sid in enumerate(ids):
        # light curve CSV: interleaved bands, ragged lengths
        lines = ["time,mag,magerr,band"]
        for band in ("g", "R"):
            n_obs = int(rng.integers(5, 30))
            t0 = 2458000 + rng.random() * 100
            for k in range(n_obs):
                lines.append(
                    f"{t0 + k * rng.random() * 3:.4f},"
                    f"{18 + rng.normal():.4f},{0.05 + 0.1 * rng.random():.4f},{band}"
                )
        with open(os.path.join(data_dir, "light-curves", f"{sid}.csv"), "w") as f:
            f.write("\n".join(lines) + "\n")

        if with_images and i != 1:  # drop one image to exercise intersection
            from PIL import Image

            img = (rng.random((image_size, image_size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(data_dir, "hostImgs", f"{sid}.host.png")
            )

        if with_spectra and i != 2:  # drop one spectrum too
            n_wl = int(rng.integers(40, 80))
            wl = np.linspace(3500, 9000, n_wl)
            flux = (1e-14 * (1 + 0.3 * rng.random(n_wl)))
            lines = []
            for k in range(n_wl):
                if i % 2 == 0:  # half the files carry an error column
                    err = "" if k == 0 else f"{flux[k] * 0.05:.6e}"
                    lines.append(f"{wl[k]:.2f},{flux[k]:.6e},{err}")
                else:
                    lines.append(f"{wl[k]:.2f},{flux[k]:.6e}")
            with open(os.path.join(spectra_dir, f"{sid}.csv"), "w") as f:
                f.write("\n".join(lines) + "\n")

    return data_dir, spectra_dir, ids
