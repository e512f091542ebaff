"""Golden tests: the NumPy oracle vs the ACTUAL reference code.

The whole device⇄oracle parity chain hangs on the oracle being a correct
transliteration of `/root/reference/tools/...`. These tests import the real
reference modules (pure NumPy; the unavailable `lib.OpenPCDet` calibration
import is stubbed) and assert the oracle reproduces them bit-for-bit (or to
f64 round-off) on synthetic scenes:

- sampling converters + `dart_throwing` RNG-stream bit-equality
  (`tools/snowfall/sampling.py:23-194`)
- per-beam occlusion dicts end-to-end through the geometry stack
  (`tools/snowfall/simulation.py:231-424`, `tools/snowfall/geometry.py`)
- `process_single_channel` pulse re-simulation (`simulation.py:50-194`)
- full `augment()` (`simulation.py:427-544`), plane injected on both sides
- `estimate_laser_parameters` + `ground_water_augmentation`
  (`tools/wet_ground/augmentation.py:25-266`)
- `calculate_plane` fallback semantics (`tools/wet_ground/planes.py:12-50`)

Skipped wholesale when /root/reference is absent.
"""

from __future__ import annotations

import pathlib
import sys
import types

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="/root/reference not available"
)


# ---------------------------------------------------------------------------
# reference import machinery
# ---------------------------------------------------------------------------

def _stub_module(name: str) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with the OpenPCDet calib import stubbed."""
    # `lib.OpenPCDet.pcdet` is an empty submodule dir in the image; stub the
    # exact import the reference makes (simulation.py:13).
    for name in (
        "lib",
        "lib.OpenPCDet",
        "lib.OpenPCDet.pcdet",
        "lib.OpenPCDet.pcdet.utils",
    ):
        _stub_module(name)
    calib_stub = _stub_module("lib.OpenPCDet.pcdet.utils.calibration_kitti")
    calib_stub.Calibration = object
    sys.modules["lib.OpenPCDet.pcdet.utils"].calibration_kitti = calib_stub

    if str(REF) not in sys.path:
        sys.path.insert(0, str(REF))

    import tools.snowfall.geometry as ref_geometry  # noqa: E402
    import tools.snowfall.sampling as ref_sampling  # noqa: E402
    import tools.snowfall.simulation as ref_simulation  # noqa: E402
    import tools.wet_ground.augmentation as ref_wet  # noqa: E402
    import tools.wet_ground.planes as ref_planes  # noqa: E402

    return types.SimpleNamespace(
        geometry=ref_geometry,
        sampling=ref_sampling,
        simulation=ref_simulation,
        wet=ref_wet,
        planes=ref_planes,
    )


class _LegacyIndexArray(np.ndarray):
    """Reproduces numpy<1.23 list-of-arrays indexing (treated as a tuple).

    The reference's noise-floor estimator indexes histogram edges with
    `xedges[idx1]` where `idx1 = [i + 1 for i in idx]` is a *list* holding one
    index array (`tools/wet_ground/augmentation.py:238-241`). On the numpy of
    the reference's era that meant tuple-indexing (1-D result, with a
    DeprecationWarning); on modern numpy it is advanced indexing (2-D result)
    which crashes the subsequent linregress/polyfit. This subclass restores
    the era semantics so the reference code runs as originally written.
    """

    def __getitem__(self, key):
        if isinstance(key, list) and any(
            isinstance(k, np.ndarray) for k in key
        ):
            key = tuple(key)
        return np.asarray(self)[key]


@pytest.fixture()
def era_numpy(ref, monkeypatch):
    """Patch np.histogram2d (as seen by the reference module) so its edge
    arrays index like era numpy — see _LegacyIndexArray."""
    real = np.histogram2d

    def histogram2d(*args, **kwargs):
        hist, xedges, yedges = real(*args, **kwargs)
        return hist, xedges.view(_LegacyIndexArray), yedges

    monkeypatch.setattr(ref.wet.np, "histogram2d", histogram2d)
    yield


# A plane in the convention calculate_plane's RANSAC branch outputs
# (planes.py:36-42): w = [coef_x, coef_y, -1]/norm (z-component NEGATIVE),
# h = intercept (≈ -mounting height). The synthetic scene's ground sits at
# z ≈ -1.75.
_W0 = np.array([0.002, -0.001, -1.0]) / np.linalg.norm([0.002, -0.001, -1.0])
_H0 = -1.75


@pytest.fixture(scope="module")
def channel_infos(ref):
    import yaml

    with open(REF / "calib" / "20171102_64E_S3.yaml") as f:
        d = yaml.safe_load(f)
    return d["lasers"]


def _particles(rng, n, r_max=60.0, r_lo=0.0005, r_hi=0.004):
    ang = rng.uniform(0, 2 * np.pi, n)
    d = np.sqrt(rng.uniform(0.01, 1, n)) * r_max
    r = rng.uniform(r_lo, r_hi, n)
    return np.column_stack([d * np.cos(ang), d * np.sin(ang), r])


def _write_particle_root(tmp_path, prefix, sets):
    """Reference layout: root/training/snowflakes/npy/{prefix}_{i+1}.npy."""
    npy = tmp_path / "training" / "snowflakes" / "npy"
    npy.mkdir(parents=True, exist_ok=True)
    for i, s in enumerate(sets):
        np.save(npy / f"{prefix}_{i + 1}.npy", s)
    return str(tmp_path)


# ---------------------------------------------------------------------------
# sampling (tools/snowfall/sampling.py)
# ---------------------------------------------------------------------------

class TestSampling:
    def test_converters_bit_equal(self, ref):
        from lidar_snow_sim_tpu.sampling.distributions import (
            compute_occupancy,
            diameter_rate_parameter,
            snowfall_rate_to_rainfall_rate,
        )

        for s, v in [(0.5, 2.0), (1.0, 1.6), (2.0, 2.0), (2.5, 1.6), (1.5, 0.6)]:
            assert compute_occupancy(s, v) == ref.sampling.compute_occupancy(s, v)
            assert snowfall_rate_to_rainfall_rate(
                s, v
            ) == ref.sampling.snowfall_rate_to_rainfall_rate(s, v)
        for rate in (0.5, 1.7, 9.4):
            assert diameter_rate_parameter(
                "sekhon", rate
            ) == ref.sampling.sekhon_srivastava(rate)
            assert diameter_rate_parameter(
                "gunn", rate
            ) == ref.sampling.gunn_marshall(rate)

    def test_dart_throwing_bit_equal(self, ref):
        """Same Generator seed ⇒ identical particle banks, bit for bit."""
        from lidar_snow_sim_tpu.sampling.dart import dart_throwing

        for seed, dist in [(0, "gunn"), (7, "sekhon")]:
            ours = dart_throwing(
                occupancy_ratio=2e-7,
                precipitation_rate=5.0,
                R_0=40.0,
                rng=np.random.default_rng(seed),
                distribution=dist,
            )
            theirs = ref.sampling.dart_throwing(
                occupancy_ratio=2e-7,
                precipitation_rate=5.0,
                R_0=40.0,
                rng=np.random.default_rng(seed),
                distribution=dist,
            )
            np.testing.assert_array_equal(ours, theirs)
            assert len(ours) > 5


# ---------------------------------------------------------------------------
# occlusion geometry (simulation.py:231-424 + geometry.py)
# ---------------------------------------------------------------------------

def _ref_occlusions(ref, tmp_path, beams, ranges, particles, beam_div_deg):
    npy = tmp_path / "training" / "snowflakes" / "npy"
    npy.mkdir(parents=True, exist_ok=True)
    np.save(npy / "golden_1.npy", particles)
    return ref.simulation.get_occlusions(
        beam_angles=beams.copy(),
        ranges_orig=ranges,
        root_path=str(tmp_path),
        particle_file="golden_1.npy",
        beam_divergence=beam_div_deg,
    )


def _beams_for_points(xy, beam_div_deg):
    """Reference beam-angle construction (simulation.py:91-101)."""
    center = np.arctan2(xy[:, 1], xy[:, 0])
    center[center < 0] += 2 * np.pi
    half = np.radians(beam_div_deg / 2)
    beams = np.column_stack([center - half, center + half])
    beams[beams < 0] += 2 * np.pi
    beams[beams > 2 * np.pi] -= 2 * np.pi
    return beams


class TestOcclusions:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_occlusion_dicts_golden(self, ref, tmp_path, seed):
        from lidar_snow_sim_tpu.oracle.snowfall import occlusion_dicts

        rng = np.random.default_rng(seed)
        beam_div_deg = float(np.degrees(3e-3))
        n_beams = 80
        # targets spread over the full circle incl. the 0/2π seam
        ang = rng.uniform(0, 2 * np.pi, n_beams)
        ranges = rng.uniform(2.0, 70.0, n_beams)
        xy = np.column_stack([ranges * np.cos(ang), ranges * np.sin(ang)])
        beams = _beams_for_points(xy, beam_div_deg)
        # dense particle field so most beams hit several flakes
        particles = _particles(rng, 4000, r_max=70.0, r_lo=0.002, r_hi=0.02)

        theirs = _ref_occlusions(
            ref, tmp_path, beams, ranges, particles, beam_div_deg
        )
        ours = occlusion_dicts(beams, ranges, particles, beam_div_deg)

        n_occluded = 0
        assert len(ours) == len(theirs) == n_beams
        for i, (od_ours, od_ref) in enumerate(zip(ours, theirs)):
            assert set(od_ours.keys()) == set(od_ref.keys()), f"beam {i}"
            n_occluded += len(od_ref) > 1
            for k in od_ref:
                d_ref, ratio_ref = od_ref[k]
                d_ours, ratio_ours = od_ours[k]
                assert d_ours == pytest.approx(d_ref, abs=1e-12), (i, k)
                assert ratio_ours == pytest.approx(ratio_ref, abs=1e-12), (i, k)
        assert n_occluded >= 10  # the scene must actually exercise occlusion

    def test_seam_beam_golden(self, ref, tmp_path):
        """Beams straddling the 0/2π discontinuity (right > left)."""
        from lidar_snow_sim_tpu.oracle.snowfall import occlusion_dicts

        rng = np.random.default_rng(3)
        beam_div_deg = 1.5  # wide beams => many seam-wrap corner cases
        ang = np.concatenate(
            [rng.uniform(-0.01, 0.01, 30) % (2 * np.pi), rng.uniform(0, 2 * np.pi, 10)]
        )
        ranges = rng.uniform(2.0, 50.0, ang.shape[0])
        xy = np.column_stack([ranges * np.cos(ang), ranges * np.sin(ang)])
        beams = _beams_for_points(xy, beam_div_deg)
        assert np.any(beams[:, 0] > beams[:, 1])  # seam cases present
        particles = _particles(rng, 3000, r_max=50.0, r_lo=0.003, r_hi=0.03)

        theirs = _ref_occlusions(
            ref, tmp_path, beams, ranges, particles, beam_div_deg
        )
        ours = occlusion_dicts(beams, ranges, particles, beam_div_deg)
        for i, (od_ours, od_ref) in enumerate(zip(ours, theirs)):
            assert set(od_ours.keys()) == set(od_ref.keys()), f"beam {i}"
            for k in od_ref:
                assert od_ours[k] == pytest.approx(od_ref[k], abs=1e-12), (i, k)


# ---------------------------------------------------------------------------
# pulse re-simulation (simulation.py:50-194)
# ---------------------------------------------------------------------------

class TestProcessSingleChannel:
    @pytest.mark.parametrize("channel", [5, 53])  # 53 has max_intensity=230
    def test_channel_golden(self, ref, tmp_path, channel_infos, channel):
        from lidar_snow_sim_tpu.oracle.snowfall import (
            occlusion_dicts,
            resimulate_channel,
        )

        rng = np.random.default_rng(channel)
        beam_div_deg = float(np.degrees(3e-3))
        n = 120
        ang = rng.uniform(-np.pi / 4, np.pi / 4, n)
        ranges = rng.uniform(2.0, 60.0, n)
        elev = rng.uniform(-0.3, 0.05, n)
        pc = np.column_stack(
            [
                ranges * np.cos(elev) * np.cos(ang),
                ranges * np.cos(elev) * np.sin(ang),
                ranges * np.sin(elev),
                rng.integers(0, 255, n).astype(np.float64),
                np.full(n, channel, dtype=np.float64),
            ]
        )
        sets = [_particles(rng, 2500, r_max=70.0, r_lo=0.002, r_hi=0.02)]
        root = _write_particle_root(tmp_path, "chan", sets)
        order = [0] * 64  # every channel reads file index 0

        diff_ref, idx_ref, pc_ref = ref.simulation.process_single_channel(
            root, "chan", pc.copy(), beam_div_deg, order, channel_infos, channel
        )

        info = channel_infos[channel]
        dist = np.linalg.norm(pc[:, :3], axis=1)
        beams = _beams_for_points(pc[:, :2], beam_div_deg)
        occl = occlusion_dicts(beams, dist, sets[0], beam_div_deg)
        diff_ours, pc_ours = resimulate_channel(
            pc.copy(),
            occl,
            channel,
            float(info.get("min_intensity", 0)),
            float(info["focal_distance"] * 100),
            float(info["focal_slope"]),
        )

        assert (pc_ref[:, 4] > 0).sum() > 5  # scene exercised the pulse path
        np.testing.assert_array_equal(idx_ref, np.arange(n))
        np.testing.assert_allclose(pc_ours, pc_ref, rtol=0, atol=1e-9)
        assert diff_ours == pytest.approx(diff_ref, abs=1e-9)


# ---------------------------------------------------------------------------
# full augment (simulation.py:427-544)
# ---------------------------------------------------------------------------

class TestAugment:
    def test_augment_golden(self, ref, tmp_path, monkeypatch, era_numpy):
        from lidar_snow_sim_tpu.calib import load_velodyne_yaml
        from lidar_snow_sim_tpu.oracle.snowfall import augment as oracle_augment
        from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

        calib = load_velodyne_yaml(REF / "calib" / "20171102_64E_S3.yaml")
        rng = np.random.default_rng(11)
        pc = synthetic_scan(n_azimuth=24, seed=4).astype(np.float32)
        if len(pc) > 900:
            pc = pc[np.sort(rng.choice(len(pc), 900, replace=False))]

        sets = [
            _particles(rng, 1200, r_max=70.0, r_lo=0.002, r_hi=0.015)
            for _ in range(64)
        ]
        root = _write_particle_root(tmp_path, "aug", sets)

        # Inject the same plane on both sides (the reference's calculate_plane
        # RANSAC uses an unseeded global RNG; see test_calculate_plane_fallback
        # for its semantics on this sklearn version).
        w0, h0 = _W0, _H0
        monkeypatch.setattr(
            ref.simulation, "calculate_plane", lambda _pc: (w0, h0)
        )

        stats_ref, aug_ref = ref.simulation.augment(
            pc=pc.copy(),
            particle_file_prefix="aug",
            beam_divergence=float(np.degrees(3e-3)),
            shuffle=False,
            only_camera_fov=False,
            root_path=root,
        )
        stats_ours, aug_ours = oracle_augment(
            pc.copy(),
            sets,
            calib,
            order=np.arange(64),
            beam_divergence_deg=float(np.degrees(3e-3)),
            plane=(w0, h0),
            legacy_sort=True,  # reference row order (unstable channel argsort)
        )

        assert stats_ours == tuple(stats_ref)
        assert aug_ours.shape == aug_ref.shape
        np.testing.assert_allclose(aug_ours, aug_ref, rtol=0, atol=1e-5)
        assert stats_ref[0] > 0  # num_attenuated: scene did real work


# ---------------------------------------------------------------------------
# wet ground (tools/wet_ground/augmentation.py, planes.py)
# ---------------------------------------------------------------------------

class TestWetGround:
    def test_calculate_plane_fallback(self, ref):
        """On this sklearn (no 'squared_loss') calculate_plane deterministically
        falls back to flat earth (planes.py:43-49) — documents why plane
        injection in the goldens is faithful."""
        from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

        pc = synthetic_scan(n_azimuth=64, seed=0)
        w, h = ref.planes.calculate_plane(pc)
        assert list(w) == [0, 0, 1] and h == -1.55

    def _scene(self, seed=0):
        from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

        return synthetic_scan(n_azimuth=160, seed=seed).astype(np.float64)

    @pytest.mark.parametrize("method", ["linear", "poly"])
    def test_estimate_laser_parameters_golden(self, ref, method, era_numpy):
        from lidar_snow_sim_tpu.oracle.fitting import estimate_laser_parameters

        pc = self._scene()
        hog = pc[:, :3] @ _W0 + _H0
        ground = np.abs(hog) < 0.5
        pcg = np.hstack([pc[ground], (pc[ground, :3] @ _W0)[:, None]])
        incident = np.arccos(
            (pcg[:, :3] @ _W0) / np.linalg.norm(pcg[:, :3], axis=1)
        )
        assert len(pcg) > 1000

        np.random.seed(123)  # reference ransac_polyfit uses global np.random
        ro_ref, thr_ref, p_ref, _ = ref.wet.estimate_laser_parameters(
            pcg, incident, debug=False, estimation_method=method
        )
        np.random.seed(123)
        ro_ours, thr_ours, p_ours = estimate_laser_parameters(
            pcg, incident, estimation_method=method
        )
        np.testing.assert_allclose(ro_ours, ro_ref, rtol=0, atol=1e-9)
        np.testing.assert_allclose(thr_ours, thr_ref, rtol=0, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(p_ours), np.asarray(p_ref)[: len(np.asarray(p_ours))],
            atol=1e-12,
        )

    @pytest.mark.parametrize("method", ["linear", "poly"])
    @pytest.mark.parametrize("flat_earth", [False, True])
    def test_ground_water_augmentation_golden(
        self, ref, method, flat_earth, monkeypatch, era_numpy
    ):
        from lidar_snow_sim_tpu.oracle.wet_ground import ground_water_augmentation

        pc = self._scene(seed=1)
        monkeypatch.setattr(
            ref.wet, "calculate_plane", lambda _pc: (_W0, _H0)
        )
        np.random.seed(7)
        out_ref = ref.wet.ground_water_augmentation(
            pc.copy(),
            debug=False,
            estimation_method=method,
            flat_earth=flat_earth,
        )
        np.random.seed(7)
        out_ours = ground_water_augmentation(
            pc.copy(),
            estimation_method=method,
            flat_earth=flat_earth,
            plane=(_W0, _H0),
        )
        assert out_ours.shape == out_ref.shape
        np.testing.assert_allclose(out_ours, out_ref, rtol=0, atol=1e-9)
        # the augmentation did real work: some ground dropped or re-lit
        assert out_ref.shape[0] < pc.shape[0] or not np.allclose(
            out_ref[:, 3], pc[: out_ref.shape[0], 3]
        )

    def test_ground_water_fallback_plane_bails(self, ref):
        """Literal quirk: calculate_plane's flat-earth FALLBACK plane
        (w=[0,0,1], h=-1.55, planes.py:30-33) puts `pc·w + h` at ≈ -3.3 for
        real ground (z≈-1.75), so ground_water_augmentation finds no ground
        points and returns the input unchanged. The oracle reproduces this."""
        from lidar_snow_sim_tpu.oracle.wet_ground import ground_water_augmentation

        pc = self._scene()
        out_ref = ref.wet.ground_water_augmentation(pc.copy(), debug=False)
        out_ours = ground_water_augmentation(
            pc.copy(), plane=([0, 0, 1], -1.55)
        )
        np.testing.assert_array_equal(out_ref, pc)
        np.testing.assert_array_equal(out_ours, pc)

    def test_ground_water_bailout_golden(self, ref, monkeypatch):
        """<1000 ground points ⇒ both return the input unchanged."""
        from lidar_snow_sim_tpu.oracle.wet_ground import ground_water_augmentation

        pc = self._scene()[:600]
        monkeypatch.setattr(
            ref.wet, "calculate_plane", lambda _pc: (_W0, _H0)
        )
        out_ref = ref.wet.ground_water_augmentation(pc.copy(), debug=False)
        out_ours = ground_water_augmentation(pc.copy(), plane=(_W0, _H0))
        np.testing.assert_array_equal(out_ref, pc)
        np.testing.assert_array_equal(out_ours, pc)
