"""Reference-signature API tests (`augment`, `ground_water_augmentation`)."""

import numpy as np
import pytest

from lidar_snow_sim_tpu.api import augment, ground_water_augmentation


@pytest.fixture(scope="module")
def bank_dir(tmp_path_factory, small_particle_sets):
    d = tmp_path_factory.mktemp("snowflakes")
    for i, s in enumerate(small_particle_sets):
        np.save(d / f"gunn_5.0_1e-06_{i + 1}.npy", s)
    return d


def test_augment_reference_signature(bank_dir, scan):
    stats, aug = augment(
        scan,
        particle_file_prefix="gunn_5.0_1e-06",
        beam_divergence=float(np.degrees(3e-3)),
        shuffle=False,
        only_camera_fov=False,
        root_path=str(bank_dir),
    )
    num_attenuated, num_removed, avg_diff = stats
    assert num_attenuated >= 0 and num_removed >= 0
    assert aug.shape[1] == 5
    assert len(aug) == len(scan) - num_removed
    assert set(np.unique(aug[:, 4])) <= {0.0, 1.0, 2.0}
    # cached augmenter: second call reuses the compiled kernel
    stats2, _ = augment(
        scan, "gunn_5.0_1e-06", float(np.degrees(3e-3)),
        shuffle=False, only_camera_fov=False, root_path=str(bank_dir),
    )
    assert stats2[0] >= 0


def test_augment_camera_fov_filter(bank_dir, scan):
    stats_fov, aug = augment(
        scan, "gunn_5.0_1e-06", float(np.degrees(3e-3)),
        shuffle=False, only_camera_fov=True, root_path=str(bank_dir),
    )
    # the default DENSE rig keeps the forward cone only
    az = np.degrees(np.arctan2(aug[:, 1], aug[:, 0]))
    assert np.abs(az).max() < 45.0

    # reference crop order (simulation.py:532-540): the FULL cloud is
    # augmented and the FOV crop happens at the END — so the FOV run's
    # num_removed equals the no-FOV run's num_removed plus the cropped
    # count, and num_attenuated / avg_intensity_diff are pre-crop values.
    stats_full, aug_full = augment(
        scan, "gunn_5.0_1e-06", float(np.degrees(3e-3)),
        shuffle=False, only_camera_fov=False, root_path=str(bank_dir),
    )
    assert stats_fov[0] == stats_full[0]
    assert stats_fov[2] == stats_full[2]
    assert stats_fov[1] == stats_full[1] + (len(aug_full) - len(aug))
    assert len(aug) == len(scan) - stats_fov[1]


def test_ground_water_reference_signature(scan):
    aug = ground_water_augmentation(scan, replace=True)
    assert aug.shape[1] == 5
    assert len(aug) <= len(scan)
    assert set(np.unique(aug[:, 4])) <= {0.0, 1.0}
