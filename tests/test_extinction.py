import numpy as np
import pytest

from multimodal_supernovae_tpu.data.extinction import (
    CCM89_UNIT_AV_RV31,
    ZTF_WAVE_EFF,
    ccm89,
    flat_lcdm_distmod,
)


def test_ccm89_v_band_anchor():
    # At x = 1.82 (lambda = 10000/1.82 A) the optical polynomials give
    # a=1, b=0 exactly, so A(lambda) = A_V for any R_V.
    wave = np.array([1e4 / 1.82])
    for av in [0.1, 1.0, 3.0]:
        for rv in [2.5, 3.1, 5.0]:
            assert ccm89(wave, av, rv)[0] == pytest.approx(av, rel=1e-12)


def test_ccm89_branch_continuity():
    # The four regimes must join continuously at x = 1.1, 3.3, 8.0.
    for x_edge in [1.1, 3.3, 8.0]:
        lo = ccm89(np.array([1e4 / (x_edge - 1e-6)]), 1.0, 3.1)[0]
        hi = ccm89(np.array([1e4 / (x_edge + 1e-6)]), 1.0, 3.1)[0]
        assert lo == pytest.approx(hi, abs=1e-3)


def test_ccm89_ztf_bands():
    # The R band (optical regime) must extinct less than the reference's
    # far-UV g-band wavelength; both positive and scale linearly in A_V.
    g = ccm89(np.array([ZTF_WAVE_EFF["g"]]), 1.0, 3.1)[0]
    r = ccm89(np.array([ZTF_WAVE_EFF["R"]]), 1.0, 3.1)[0]
    assert 0 < r < g
    assert ccm89(np.array([ZTF_WAVE_EFF["R"]]), 2.0, 3.1)[0] == pytest.approx(
        2 * r, rel=1e-12
    )
    # R-band A/A_V for R_V=3.1: published CCM89 curves give ~0.80-0.85 at
    # ~6366 A.
    assert 0.75 < r < 0.9
    assert CCM89_UNIT_AV_RV31["R"] == pytest.approx(r)


def test_ccm89_vectorized_matches_scalar():
    waves = np.array([1200.0, 4000.0, 6366.38, 9000.0, 22000.0])
    vec = ccm89(waves, 0.7, 3.1)
    for i, w in enumerate(waves):
        assert vec[i] == pytest.approx(ccm89(np.array([w]), 0.7, 3.1)[0])


def test_distmod_sanity():
    # Planck15 (H0=67.74, Om0=0.3089): mu(0.1) ~= 38.39, mu(0.5) ~= 42.33
    # (hand-checked via Simpson integration of 1/E(z)).
    assert flat_lcdm_distmod(0.1) == pytest.approx(38.39, abs=0.05)
    assert flat_lcdm_distmod(0.5) == pytest.approx(42.33, abs=0.05)
    z = np.array([0.01, 0.05, 0.1, 0.5, 1.0])
    mu = flat_lcdm_distmod(z)
    assert np.all(np.diff(mu) > 0)
