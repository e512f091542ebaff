"""End-to-end CLI tests: gen_banks -> precompute -> inspect (SURVEY.md §3.3-3.5).

Uses a tiny grid + synthetic scans; checks the reference's resume semantics
(skip-if-exists) at both stages and the output directory layout.
"""

import json
import os

import numpy as np
import pytest

from lidar_snow_sim_tpu.tools.gen_banks import main as gen_main
from lidar_snow_sim_tpu.tools.inspect import main as inspect_main
from lidar_snow_sim_tpu.tools.precompute import (
    main as precompute_main,
    reference_sample_order,
)


def test_reference_sample_order():
    ids = ["a,1", "b,2", "c,3", "d,4", "e,5"]
    # sorted stems: a_1 b_2 c_3 d_4 e_5; halves: [a_1 b_2 c_3], [d_4 e_5]
    # -> second half + reversed first half (precompute.py:62-68)
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(ids))
        path = f.name
    order = reference_sample_order(path)
    os.unlink(path)
    assert order == ["d_4", "e_5", "c_3", "b_2", "a_1"]


@pytest.mark.slow
def test_cli_pipeline(tmp_path, calib):
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    banks = tmp_path / "banks"
    # tiny grid: 1 rate x 1 velocity x gunn x 64 lines
    gen_args = [
        "--out-dir", str(banks), "--rates", "0.5", "--velocities", "2.0",
        "--modes", "gunn", "--lines", "64", "--workers", "4",
    ]
    assert gen_main(gen_args) == 0
    files = sorted(banks.glob("*.npy"))
    assert len(files) == 64
    mtimes = {f: f.stat().st_mtime_ns for f in files}
    assert gen_main(gen_args) == 0  # resume: nothing rewritten
    assert {f: f.stat().st_mtime_ns for f in files} == mtimes

    lidar = tmp_path / "lidar_hdl64_strongest"
    lidar.mkdir()
    ids = []
    for i in range(2):
        sid = f"2019-01-0{i + 1}_00-00-00,0000{i}"
        ids.append(sid)
        pc = synthetic_scan(n_azimuth=60, seed=i, calib=calib)
        pc.astype(np.float32).tofile(lidar / ("_".join(sid.split(",")) + ".bin"))
    split = tmp_path / "split.txt"
    split.write_text("\n".join(ids))

    pre_args = [
        "--split", str(split), "--lidar-dir", str(lidar),
        "--bank-dir", str(banks), "--modes", "gunn",
        "--rates", "0.5", "--velocities", "2.0", "--batch", "2",
        "--max-points", "8192", "--window-size", "512", "--no-fov-filter",
    ]
    assert precompute_main(pre_args) == 0
    out_dirs = list((tmp_path / "snowfall_simulation" / "gunn").iterdir())
    assert len(out_dirs) == 1
    assert out_dirs[0].name.startswith("lidar_hdl64_strongest_rainrate_")
    outs = sorted(out_dirs[0].glob("*.bin"))
    assert len(outs) == 2
    aug = np.fromfile(outs[0], np.float32).reshape(-1, 5)
    assert set(np.unique(aug[:, 4])) <= {0.0, 1.0, 2.0}
    assert precompute_main(pre_args) == 0  # resume path

    # headless inspect on one raw scan, snow augmentation + BEV dump
    scan = lidar / ("_".join(ids[0].split(",")) + ".bin")
    bev = tmp_path / "bev.png"
    assert inspect_main(
        [str(scan), "--augment", "snow", "--bank-dir", str(banks),
         "--bev", str(bev)]
    ) == 0
    assert bev.exists() and bev.stat().st_size > 0
