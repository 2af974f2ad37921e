import numpy as np
import pytest

from multimodal_supernovae_tpu.data.transforms import (
    FIVE_WAY_CLASSES,
    THREE_WAY_CLASSES,
    band_block_concat,
    factorize_classes,
    filter_to_available,
    pad_or_subsample,
    process_ragged_series,
    remap_to_three_way,
    zero_time_origin_per_band,
)


def test_pad_short_sequence(rng):
    idx, mask = pad_or_subsample(3, 10, rng)
    assert list(idx) == [0, 1, 2]
    assert mask.sum() == 3 and mask[:3].all() and not mask[3:].any()


def test_subsample_long_sequence(rng):
    idx, mask = pad_or_subsample(50, 10, rng)
    assert len(idx) == 10 and len(set(idx.tolist())) == 10  # no replacement
    assert mask.all()
    assert idx.max() < 50


def test_zero_time_origin():
    t = np.array([5.0, 7.0, 9.0, 0.0, 0.0])
    mask = np.array([True, True, True, False, False])
    out = zero_time_origin_per_band(t, mask)
    assert out[0] == 0.0 and out[1] == 2.0 and out[2] == 4.0
    assert (out[3:] == 0).all()
    # all-padded band untouched
    assert (zero_time_origin_per_band(t, np.zeros(5, bool)) == t).all()


def test_process_ragged_series(rng):
    t = np.array([100.0, 101.0, 105.0])
    v = np.array([1.0, 2.0, 3.0])
    tt, vv, ee, mask = process_ragged_series(t, v, None, 5, rng)
    assert tt.shape == (5,) and mask.sum() == 3
    assert tt[0] == 0.0 and tt[2] == 5.0
    assert (ee == 0).all()


def test_band_block_concat():
    a = np.arange(3.0)
    b = np.arange(3.0) + 10
    out = band_block_concat([a, b])
    assert (out[:3] == a).all() and (out[3:] == b).all()


def test_factorize_classes_five_way():
    types = ["SN Ia", "SN Ib", "SN Ic", "SN Ib/c", "SN IIP", "SLSN-I", "SN IIn", "SN Iax"]
    labels, keep, names = factorize_classes(types, 5)
    assert names == FIVE_WAY_CLASSES
    # SN Iax is dropped
    assert keep.sum() == 7 and not keep[-1]
    # merges: Ib/Ic/Ib-c -> Ibc (idx 4), IIP -> II (idx 1)
    assert list(labels) == [3, 4, 4, 4, 1, 0, 2]


def test_factorize_classes_three_way():
    types = ["SN Ia", "SN II", "SN Ibc", "SN IIn"]
    labels, keep, names = factorize_classes(types, 3)
    assert names == THREE_WAY_CLASSES
    assert list(labels) == [1, 0, 2] and not keep[-1]


def test_remap_to_three_way():
    five = np.array([0, 1, 2, 3, 4, 1, 3])
    remapped, keep = remap_to_three_way(five)
    # keeps classes {1, 3, 4} -> {0, 1, 2}
    assert list(remapped) == [0, 1, 2, 0, 1]
    assert keep.sum() == 5


def test_filter_to_available():
    avail = ["a", "b", "d"]
    names = ["a", "c", "d"]
    arrays = [np.array([1, 2, 3]), np.array([[1.0], [2.0], [3.0]])]
    keep, filt, arrs = filter_to_available(avail, names, arrays)
    assert list(filt) == ["a", "d"]
    assert list(arrs[0]) == [1, 3]
    assert arrs[1].shape == (2, 1)
