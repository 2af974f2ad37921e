import numpy as np
import pytest

from multimodal_supernovae_tpu.data.extinction import CCM89_UNIT_AV_RV31
from multimodal_supernovae_tpu.data.simulation import (
    ingest_simulation,
    ingest_simulation_lightcurves,
)
from multimodal_supernovae_tpu.data.transforms import (
    pack_ragged_rows,
    zero_time_origin_rows,
)


@pytest.fixture(scope="module")
def sim_h5(tmp_path_factory):
    """Mini HDF5 in the Photometry/Spectroscopy schema."""
    import h5py

    path = tmp_path_factory.mktemp("sim") / "sim.hdf5"
    rng = np.random.default_rng(0)
    with h5py.File(path, "w") as f:
        for t_type, n in [("Ia", 6), ("II", 4)]:
            gp = f.create_group(f"Photometry/{t_type}/model0")
            L = 40
            gp["TID"] = np.arange(n) + (0 if t_type == "Ia" else 100)
            gp["z"] = rng.random(n) * 0.2
            gp["mjd"] = np.sort(rng.random((n, L)) * 100, axis=1)
            gp["filter"] = rng.choice([1, 2], size=(n, L))
            gp["mag_obs"] = 22 + rng.normal(size=(n, L))
            gp["mag_perfect"] = 22 + np.zeros((n, L))
            gs = f.create_group(f"Spectroscopy/{t_type}/model0")
            S = 30
            gs["TID"] = gp["TID"][...]
            gs["wavelength"] = np.tile(np.linspace(3000, 9000, S), (n, 1))
            gs["flux_obs"] = rng.random((n, S))
            gs["flux_perfect"] = np.ones((n, S))
    return str(path)


@pytest.fixture(scope="module")
def legacy_h5(tmp_path_factory):
    import h5py

    path = tmp_path_factory.mktemp("simlc") / "legacy.hdf5"
    rng = np.random.default_rng(1)
    with h5py.File(path, "w") as f:
        g = f.create_group("TransientTable/Ia/model0")
        n, L = 5, 30
        mjd = np.sort(rng.random((n, L)) * 50, axis=1)
        mag = 23 + rng.normal(size=(n, L))
        mag[:, -5:] = 99.0  # not-observed sentinel
        g["MJD"] = mjd
        g["mag_r"] = mag
        g["mwebv"] = rng.random(n) * 0.1
    return str(path)


def test_pack_ragged_rows_basic(rng):
    vals = {"t": np.arange(20, dtype=float).reshape(2, 10),
            "x": np.arange(20, dtype=float).reshape(2, 10) * 2}
    valid = np.zeros((2, 10), bool)
    valid[0, :4] = True   # undersize -> pad
    valid[1, :] = True    # oversize -> subsample to 6
    packed, mask = pack_ragged_rows(vals, valid, 6, rng, sort_by="t")
    assert mask[0].sum() == 4 and mask[1].sum() == 6
    # row 0 keeps all 4 valid values, sorted, then zeros
    np.testing.assert_array_equal(packed["t"][0], [0, 1, 2, 3, 0, 0])
    # row 1: 6 distinct values from the original 10, ascending
    row = packed["t"][1]
    assert len(set(row.tolist())) == 6
    assert (np.diff(row) > 0).all()
    # x stays aligned with t
    np.testing.assert_array_equal(packed["x"], packed["t"] * 2)


def test_zero_time_origin_rows():
    t = np.array([[5.0, 8.0, 0.0], [0.0, 0.0, 0.0]])
    m = np.array([[True, True, False], [False, False, False]])
    out = zero_time_origin_rows(t, m)
    np.testing.assert_array_equal(out, [[0.0, 3.0, 0.0], [0.0, 0.0, 0.0]])


def test_ingest_simulation_bimodal(sim_h5):
    ds = ingest_simulation(
        sim_h5, bands=("r", "g"), n_max_obs=16, n_max_obs_spec=20,
        combinations=("lightcurve", "spectral"), noise=False,
    )
    assert len(ds) == 10
    assert ds.arrays["x_lc"].shape == (10, 32)
    assert ds.arrays["x_sp"].shape == (10, 20)
    # noise=False -> perfect values: mags all (22-...) and flux all 1
    assert np.allclose(
        ds.arrays["x_sp"][ds.arrays["mask_sp"]], 1.0
    )
    # per-band zeroed times
    for b in range(2):
        band_t = ds.arrays["t_lc"][:, b * 16 : (b + 1) * 16]
        band_m = ds.arrays["mask_lc"][:, b * 16 : (b + 1) * 16]
        for i in range(10):
            if band_m[i].any():
                assert band_t[i][band_m[i]].min() == 0.0


def test_ingest_simulation_dataset_length(sim_h5):
    ds = ingest_simulation(
        sim_h5, bands=("r",), n_max_obs=8,
        combinations=("lightcurve",), dataset_length=7,
    )
    assert len(ds) == 7


def test_ingest_legacy_lightcurves(legacy_h5):
    ds = ingest_simulation_lightcurves(legacy_h5, bands=("r",), n_max_obs=32)
    assert len(ds) == 5
    x = ds.arrays["x_lc"]
    m = ds.arrays["mask_lc"]
    # sentinel rows dropped: 25 valid obs per row
    assert (m.sum(axis=1) == 25).all()
    # normalisation + extinction: values near (23 - 23.74)/1.6 ~ -0.46
    vals = x[m]
    assert -2 < vals.mean() < 1
    import h5py

    with h5py.File(legacy_h5, "r") as f:
        g = f["TransientTable/Ia/model0"]
        mag0 = g["mag_r"][0]
        mwebv0 = float(g["mwebv"][0])
    want = np.sort((mag0[mag0 < 98] - 23.74) / 1.6
                   - mwebv0 * 3.1 * CCM89_UNIT_AV_RV31["R"])
    got = np.sort(x[0][m[0]])
    np.testing.assert_allclose(got, want, rtol=1e-5)
