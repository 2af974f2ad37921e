import numpy as np
import pytest

from multimodal_supernovae_tpu.data import native
from multimodal_supernovae_tpu.data.extinction import CCM89_UNIT_AV_RV31
from multimodal_supernovae_tpu.data.ztfbts import (
    load_lightcurves,
    load_spectra,
    load_ztfbts,
)

from fixtures import write_mini_ztfbts


@pytest.fixture(scope="module")
def mini(tmp_path_factory):
    root = tmp_path_factory.mktemp("ztfbts")
    return write_mini_ztfbts(str(root), n=12, seed=0)


def test_lightcurve_ingest(mini):
    data_dir, _, ids = mini
    arrays, names = load_lightcurves(data_dir, n_max_obs=16)
    assert len(names) == 12
    t = arrays["t_lc"]
    assert t.shape == (12, 32)  # 2 bands x 16
    m = arrays["mask_lc"]
    # per-band valid prefix; valid times start at 0
    for i in range(len(names)):
        for b in range(2):
            band_t = t[i, b * 16 : (b + 1) * 16]
            band_m = m[i, b * 16 : (b + 1) * 16]
            if band_m.any():
                assert band_t[band_m].min() == 0.0
            assert (band_t[~band_m] == 0).all()


def test_extinction_applied(mini):
    """Magnitudes must be reduced by A_V * CCM89(lambda_band)/A_V exactly."""
    data_dir, _, ids = mini
    import pandas as pd

    arrays, names = load_lightcurves(data_dir, n_max_obs=100)
    sn = names[0]
    table = pd.read_csv(f"{data_dir}/ZTFBTS_TransientTable.csv")
    av = float(table[table.ZTFID == sn].A_V.iloc[0])
    raw = pd.read_csv(f"{data_dir}/light-curves/{sn}.csv")
    i = names.index(sn)
    # band R occupies the first block; compare the set of corrected values
    raw_r = np.sort(raw[raw.band == "R"].mag.to_numpy())
    got_r = np.sort(arrays["x_lc"][i][arrays["mask_lc"][i]][: len(raw_r)])
    expected = raw_r - av * CCM89_UNIT_AV_RV31["R"]
    np.testing.assert_allclose(got_r, expected, rtol=1e-5)


def test_spectra_ingest(mini):
    _, spectra_dir, ids = mini
    arrays, names = load_spectra(spectra_dir, n_max_obs=64, rescalefactor=1e14)
    assert len(names) == 11  # one spectrum deliberately missing
    x = arrays["x_sp"]
    assert x.shape == (11, 64)
    # rescaled to O(1), missing errors zero-filled
    assert 0.1 < np.abs(x[arrays["mask_sp"]]).mean() < 10
    assert np.isfinite(arrays["err_sp"]).all()


def test_unified_loader_intersection(mini):
    data_dir, spectra_dir, ids = mini
    ds, nband, folds = load_ztfbts(
        data_dir,
        spectra_dir,
        combinations=("host_galaxy", "lightcurve", "spectral"),
        max_data_len_lc=16,
        max_data_len_spec=64,
        n_classes=5,
        spectral_rescalefactor=1e14,
        kfolds=3,
    )
    # 12 - 1 (no image) - 1 (no spectrum) - 1 (NaN redshift) - 1 (SN IIn is
    # in the 5-way set; all fixture types are) ... compute: all types valid
    # for 5-way; so 12 - 3 = 9 rows
    assert len(ds) == 9
    assert nband == 2
    assert set(ds.arrays) >= {
        "x_img", "x_lc", "t_lc", "mask_lc", "err_lc",
        "x_sp", "t_sp", "mask_sp", "err_sp", "redshift", "label",
    }
    assert ds.arrays["x_img"].shape[-1] == 3  # NHWC
    assert len(folds) == 3
    for f in folds:
        assert len(f["train_indices"]) + len(f["test_indices"]) == 9
    # filenames are the manifest contract
    assert all(n.startswith("ZTF20test") for n in ds.filenames)


def test_native_csv_matches_pandas(mini, tmp_path):
    if not native.available():
        pytest.skip("libfastcsv.so not built")
    data_dir, spectra_dir, ids = mini
    import pandas as pd

    path = f"{data_dir}/light-curves/{ids[0]}.csv"
    got = native.read_csv(path, header=True)
    want = pd.read_csv(path)
    assert set(got) == set(want.columns)
    np.testing.assert_allclose(got["mag"], want["mag"].to_numpy())
    np.testing.assert_allclose(got["time"], want["time"].to_numpy())
    assert list(got["band"]) == list(want["band"])
    # headerless with missing cells (spectra style)
    spath = f"{spectra_dir}/{ids[0]}.csv"
    got = native.read_csv(spath, header=False)
    want = pd.read_csv(spath, header=None)
    np.testing.assert_allclose(got["0"], want[0].to_numpy())
    assert np.isnan(got["2"][0])  # empty first err cell -> NaN


def test_subset_by_filenames_roundtrip(mini):
    data_dir, spectra_dir, _ = mini
    ds, _, _ = load_ztfbts(
        data_dir, spectra_dir,
        combinations=("lightcurve", "spectral"),
        max_data_len_lc=16, max_data_len_spec=64, kfolds=None,
    )
    subset_names = ds.filenames[:4]
    sub = ds.subset_by_filenames(subset_names)
    assert sub.filenames == subset_names
    np.testing.assert_array_equal(sub.arrays["x_lc"], ds.arrays["x_lc"][:4])
