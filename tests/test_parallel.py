"""Parallel-layer tests on the virtual 8-device CPU mesh (SURVEY.md §4d).

Covers: mesh construction, the sharded snow+wet step, and mesh-sharded
datagen producing byte-identical outputs to the unsharded path.
"""

import numpy as np
import pytest

import jax

from lidar_snow_sim_tpu.config import SnowfallConfig, WetGroundConfig
from lidar_snow_sim_tpu.parallel.datagen import (
    iter_reference_grid,
    run_snowfall_datagen,
)
from lidar_snow_sim_tpu.parallel.mesh import make_mesh
from lidar_snow_sim_tpu.sampling.banks import build_bank


pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def small_cfg():
    return SnowfallConfig(
        max_points=4096, window_size=128, wide_capacity=32,
        max_occluders=16, max_bumps=8, point_chunk=512, ransac_trials=16,
    )


@pytest.fixture(scope="module")
def bank(small_particle_sets, small_cfg):
    return build_bank(
        small_particle_sets,
        window_size=small_cfg.window_size,
        wide_threshold=small_cfg.wide_threshold,
        wide_capacity=small_cfg.wide_capacity,
    )


def test_make_mesh_shapes():
    mesh = make_mesh(data=4, beam=2)
    assert mesh.shape == {"data": 4, "beam": 2}
    with pytest.raises(ValueError):
        make_mesh(data=16, beam=2)


def test_iter_reference_grid():
    combos = list(iter_reference_grid())
    assert len(combos) == 10  # 2 modes x 5 (rate, velocity) pairs
    modes = {m for m, _, _ in combos}
    assert modes == {"gunn", "sekhon"}
    for _, rr, occ in combos:
        assert rr > 0 and 0 < occ < 1


def test_mesh_datagen_matches_unsharded(tmp_path, calib, bank, small_cfg):
    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    scans = {
        f"f{i}": synthetic_scan(n_azimuth=60, seed=i, calib=calib)[:4096]
        for i in range(4)
    }
    ids = sorted(scans)

    def load_fn(sid):
        return scans[sid]

    plain_dir = tmp_path / "plain"
    mesh_dir = tmp_path / "mesh"
    kwargs = dict(
        batch=4, seed=0, shuffle_channels=False, overwrite=False,
    )
    s1 = run_snowfall_datagen(
        ids, load_fn, plain_dir, bank, calib, small_cfg, **kwargs
    )
    mesh = make_mesh(data=4, beam=2)
    s2 = run_snowfall_datagen(
        ids, load_fn, mesh_dir, bank, calib, small_cfg, mesh=mesh, **kwargs
    )
    assert s1.frames_done == s2.frames_done == 4
    assert s1.attenuated == s2.attenuated
    for sid in ids:
        a = (plain_dir / f"{sid}.bin").read_bytes()
        b = (mesh_dir / f"{sid}.bin").read_bytes()
        assert a == b, f"{sid}: sharded output differs"

    # resume: second run skips everything
    s3 = run_snowfall_datagen(
        ids, load_fn, mesh_dir, bank, calib, small_cfg, mesh=mesh, **kwargs
    )
    assert s3.frames_skipped == 4 and s3.frames_done == 0


def test_datagen_max_points_auto_grows(tmp_path, calib, bank, small_cfg):
    """An oversized scan must GROW max_points (reference never drops points,
    precompute.py:96-106) and produce byte-identical output to a run whose
    capacity was large from the start (VERDICT r2 weak #2)."""
    import dataclasses

    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    scan = synthetic_scan(n_azimuth=60, seed=1, calib=calib)[:3000]
    assert len(scan) == 3000

    def load_fn(sid):
        return scan

    small = dataclasses.replace(small_cfg, max_points=2048)
    kwargs = dict(batch=1, seed=0, shuffle_channels=False)
    s_small = run_snowfall_datagen(
        ["f0"], load_fn, tmp_path / "grown", bank, calib, small, **kwargs
    )
    s_big = run_snowfall_datagen(
        ["f0"], load_fn, tmp_path / "big", bank, calib, small_cfg, **kwargs
    )
    assert s_small.capacity_growths == 1 and s_small.points_dropped == 0
    assert s_small.points_in == s_big.points_in == 3000
    a = (tmp_path / "grown" / "f0.bin").read_bytes()
    b = (tmp_path / "big" / "f0.bin").read_bytes()
    assert a == b, "auto-grown output differs from large-capacity run"


def test_two_process_distributed_stats(tmp_path):
    """Real 2-process `jax.distributed` rehearsal on the CPU backend: each
    process datagens its share-nothing shard (`--shard i/2` semantics) into a
    shared directory, then `all_hosts_stats` must psum the per-host counters
    to the same global view on BOTH hosts (SURVEY.md §2.4/§5)."""
    import json
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = Path(__file__).parent / "_distributed_worker.py"
    env = dict(
        __import__("os").environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        PYTHONPATH=str(Path(__file__).parent.parent),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), str(port), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [l for l in out.splitlines() if l.startswith("RESULT ")][-1]
        rec = json.loads(line[len("RESULT "):])
        results[rec["pid"]] = rec

    assert results[0]["primary"] and not results[1]["primary"]
    # disjoint share-nothing shards covering all 4 frames
    assert set(results[0]["ids"]) | set(results[1]["ids"]) == {
        "f0", "f1", "f2", "f3"
    }
    assert not set(results[0]["ids"]) & set(results[1]["ids"])
    for f in results[0]["merged"]:
        want = results[0]["local"][f] + results[1]["local"][f]
        assert results[0]["merged"][f] == want, (f, results)
        assert results[1]["merged"][f] == want, (f, results)
    assert results[0]["merged"]["frames_done"] == 4
    assert results[0]["merged"]["attenuated"] > 0
    for sid in ("f0", "f1", "f2", "f3"):
        assert (tmp_path / f"{sid}.bin").exists()


def test_snow_wet_datagen(tmp_path, calib, bank, small_cfg):
    """wet_cfg chains wet ground on device; outputs stay valid N x 5 with
    a manifest recording the mode."""
    import json

    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    scans = {"f0": synthetic_scan(n_azimuth=60, seed=0, calib=calib)[:4096]}
    wet = WetGroundConfig(replace=False, min_ground_points=50)
    out = tmp_path / "wet"
    s = run_snowfall_datagen(
        ["f0"], lambda sid: scans[sid], out, bank, calib, small_cfg,
        batch=1, seed=0, wet_cfg=wet,
    )
    assert s.frames_done == 1
    aug = np.fromfile(out / "f0.bin", np.float32).reshape(-1, 5)
    assert set(np.unique(aug[:, 4])) <= {0.0, 1.0, 2.0}
    manifest = json.loads((out / "_manifest.json").read_text())
    assert manifest["wet_ground"] is True
    assert manifest["stats"]["frames_done"] == 1


def test_datagen_auto_grows_capacities(tmp_path, calib, bank, small_cfg):
    """Undersized capacities must self-tune (rerun with doubled caps), not
    silently truncate."""
    import dataclasses

    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    tiny = dataclasses.replace(
        small_cfg, assembly="dense", channel_capacity=64, block_points=16,
        slice_width=16, chunk_group=16, compact_capacity=512, pulse_chunk=512,
    )
    scans = {"f0": synthetic_scan(n_azimuth=60, seed=0, calib=calib)[:4096]}
    out = tmp_path / "grown"
    s = run_snowfall_datagen(
        ["f0"], lambda sid: scans[sid], out, bank, calib, tiny,
        batch=1, seed=0, shuffle_channels=False,
    )
    assert s.frames_done == 1
    aug = np.fromfile(out / "f0.bin", np.float32).reshape(-1, 5)
    # compare against a comfortably-sized run: identical output proves the
    # growth loop converged to full coverage
    ok = tmp_path / "ok"
    s2 = run_snowfall_datagen(
        ["f0"], lambda sid: scans[sid], ok, bank, calib,
        dataclasses.replace(small_cfg, assembly="dense", channel_capacity=128,
                            block_points=16, slice_width=512, chunk_group=16),
        batch=1, seed=0, shuffle_channels=False,
    )
    assert s2.frames_done == 1
    ref = np.fromfile(ok / "f0.bin", np.float32).reshape(-1, 5)
    np.testing.assert_array_equal(aug, ref)


def test_mesh_datagen_batch_mismatch(tmp_path, calib, bank, small_cfg):
    mesh = make_mesh(data=4, beam=2)
    with pytest.raises(ValueError, match="not divisible"):
        run_snowfall_datagen(
            ["a"], lambda s: np.zeros((10, 5), np.float32), tmp_path,
            bank, calib, small_cfg, batch=3, mesh=mesh,
        )


def test_datagen_stale_batches_do_not_cascade_growth(
    tmp_path, calib, bank, small_cfg
):
    """With several batches in flight, one overflow must grow a capacity
    ONCE: batches dispatched before the growth carry a stale config and are
    retried under the grown one instead of each doubling it again (the
    regression grew slice_width 1536 -> 12288 when 3072 sufficed)."""
    import dataclasses

    from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

    tiny = dataclasses.replace(
        small_cfg, assembly="dense", channel_capacity=64, block_points=16,
        slice_width=16, chunk_group=16, compact_capacity=512,
        pulse_chunk=512,
    )
    # enough frames that every pipeline slot holds a stale batch when the
    # first drain discovers the overflow (pipeline depth is 3)
    scans = {
        f"f{i}": synthetic_scan(n_azimuth=60, seed=0, calib=calib)[:4096]
        for i in range(5)
    }
    out = tmp_path / "stale"
    s = run_snowfall_datagen(
        sorted(scans), lambda sid: scans[sid], out, bank, calib, tiny,
        batch=1, seed=0, shuffle_channels=False,
    )
    assert s.frames_done == 5
    # identical frames need identical capacities: the growth count must be
    # what ONE frame needs (a stale-batch cascade would multiply it)
    solo = tmp_path / "solo"
    s1 = run_snowfall_datagen(
        ["f0"], lambda sid: scans[sid], solo, bank, calib, tiny,
        batch=1, seed=0, shuffle_channels=False,
    )
    assert s.capacity_growths == s1.capacity_growths
    a = np.fromfile(out / "f0.bin", np.float32)
    b = np.fromfile(solo / "f0.bin", np.float32)
    np.testing.assert_array_equal(a, b)
