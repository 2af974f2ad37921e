"""scripts/fetch_data.py: local-mirror fetch, subset filtering, and the
layout validator (the offline-testable surface; the Hub path shares all of
it except the transfer backend)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

from multimodal_supernovae_tpu.cli import fetch_data  # noqa: E402
from fixtures import write_mini_sim_hdf5, write_mini_ztfbts  # noqa: E402


@pytest.fixture()
def mirror(tmp_path):
    src = tmp_path / "mirror"
    write_mini_ztfbts(str(src), n=6)
    os.makedirs(src / "sim_data", exist_ok=True)
    write_mini_sim_hdf5(str(src / "sim_data" / "ZTF_Pretrain_5Class.hdf5"),
                        n_per_type=4)
    return src


def test_local_fetch_all_then_verify_ok(mirror, tmp_path):
    dest = tmp_path / "data"
    rc = fetch_data.main([str(dest), "--source", str(mirror)])
    assert rc == 0
    assert (dest / "ZTFBTS" / "ZTFBTS_TransientTable.csv").is_file()
    assert (dest / "sim_data" / "ZTF_Pretrain_5Class.hdf5").is_file()
    assert fetch_data.verify(str(dest)) == []


def test_local_fetch_is_resumable(mirror, tmp_path):
    dest = tmp_path / "data"
    pats = fetch_data.SUBSETS["all"]
    n1 = fetch_data.fetch_local(str(mirror), str(dest), pats)
    n2 = fetch_data.fetch_local(str(mirror), str(dest), pats)
    assert n1 > 0 and n2 == 0  # second pass copies nothing


def test_subset_filtering(mirror, tmp_path):
    dest = tmp_path / "data"
    rc = fetch_data.main([str(dest), "--source", str(mirror),
                          "--subset", "sim"])
    assert rc == 0
    assert (dest / "sim_data").is_dir()
    assert not (dest / "ZTFBTS").exists()
    # ztfbts-only verify must not demand spectra or sim
    rc = fetch_data.main([str(dest), "--source", str(mirror),
                          "--subset", "ztfbts"])
    assert rc == 0


def test_verify_reports_partial_tree(mirror, tmp_path):
    dest = tmp_path / "data"
    fetch_data.fetch_local(str(mirror), str(dest),
                           fetch_data.SUBSETS["ztfbts"])
    problems = fetch_data.verify(str(dest), "all")
    assert any("spectra" in p for p in problems)
    assert any("hdf5" in p for p in problems)
    # corrupt the table header
    table = dest / "ZTFBTS" / "ZTFBTS_TransientTable.csv"
    lines = table.read_text().splitlines()
    table.write_text("\n".join(["bogus,header"] + lines[1:]) + "\n")
    problems = fetch_data.verify(str(dest), "ztfbts")
    assert any("ZTFID" in p for p in problems)


def test_verify_rejects_bad_hdf5_schema(mirror, tmp_path):
    import h5py

    dest = tmp_path / "data"
    os.makedirs(dest / "sim_data")
    with h5py.File(dest / "sim_data" / "bad.hdf5", "w") as f:
        g = f.create_group("Photometry/Ia/model0")
        g["TID"] = [1, 2]
    problems = fetch_data.verify(str(dest), "sim")
    assert any("missing datasets" in p for p in problems)


def test_cli_verify_only_exit_codes(mirror, tmp_path):
    dest = tmp_path / "data"
    fetch_data.fetch_local(str(mirror), str(dest), fetch_data.SUBSETS["all"])
    ok = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fetch_data.py"),
         str(dest), "--verify-only"],
        capture_output=True, text=True, timeout=300)
    assert ok.returncode == 0, ok.stderr
    assert "verify OK" in ok.stdout
    bad = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "fetch_data.py"),
         str(tmp_path / "empty"), "--verify-only"],
        capture_output=True, text=True, timeout=300)
    assert bad.returncode == 1
    assert "PROBLEM" in bad.stderr
