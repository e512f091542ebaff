"""KITTI-style camera calibration and camera-FOV point filtering.

TPU-native replacement for the consumed surface of
`lib/OpenPCDet/pcdet/utils/calibration_kitti.Calibration` — the only external
dependency inside the reference's core augmentation path
(`tools/snowfall/simulation.py:13,32-36,532-540` and
`tools/snowfall/precompute.py:29-33,96-99`). The reference loads
`lib/OpenPCDet/data/dense/calib_hdl64.txt` and uses exactly three operations:

- ``lidar_to_rect(pts_lidar)``  — LiDAR frame -> rectified-camera frame
- ``rect_to_img(pts_rect)``     — rectified frame -> pixel coords + depth
- ``get_fov_flag(pts_rect, img_shape, calib)`` — in-image-bounds mask with
  ``img_shape = (1024, 1920)`` (`simulation.py:536`)

Here the chain is a single fused affine + projective transform precomputed on
host (one 3x4 matrix each for rect and image space), evaluated in one matmul —
MXU-friendly and jittable, instead of three chained homogeneous multiplies.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

# Default DENSE (SeeingThroughFog) HDL-64 rig: shipped as a KITTI-format data
# file (data/calib_hdl64.txt — P2 intrinsics from the public STF
# calib_cam_stereo_left.json, extrinsic translations reconstructed; see the
# file header for provenance). Replace it with the submodule's original
# `lib/OpenPCDet/data/dense/calib_hdl64.txt` for exact parity.
DEFAULT_CALIB_FILE = Path(__file__).parent / "data" / "calib_hdl64.txt"

DEFAULT_IMG_SHAPE = (1024, 1920)  # (H, W), simulation.py:536


def _read_kitti_calib(path: str | Path) -> dict[str, np.ndarray]:
    """Parse a KITTI-format calib txt (``KEY: v0 v1 ...`` lines)."""
    out: dict[str, np.ndarray] = {}
    for line in Path(path).read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or ":" not in line:
            continue
        key, vals = line.split(":", 1)
        try:
            out[key.strip()] = np.array([float(v) for v in vals.split()])
        except ValueError:
            continue
    return out


@dataclasses.dataclass(frozen=True)
class CameraCalibration:
    """Pinhole camera calibration (KITTI convention).

    P2: (3, 4) camera projection, R0: (3, 3) rectification,
    V2C: (3, 4) LiDAR -> camera extrinsics.
    """

    P2: np.ndarray
    R0: np.ndarray
    V2C: np.ndarray

    @classmethod
    def from_file(cls, path: str | Path) -> "CameraCalibration":
        raw = _read_kitti_calib(path)
        p2 = raw["P2"].reshape(3, 4)
        r0 = raw.get("R0_rect", raw.get("R0", np.eye(3).ravel())).reshape(3, 3)
        v2c_key = "Tr_velo_to_cam" if "Tr_velo_to_cam" in raw else "Tr_velo2cam"
        v2c = raw[v2c_key].reshape(3, 4)
        return cls(P2=p2, R0=r0, V2C=v2c)

    @classmethod
    def default_dense_hdl64(cls) -> "CameraCalibration":
        """The DENSE rig from the shipped data file — same loader path as
        any user-supplied KITTI calib (reference `get_calib`,
        `simulation.py:32-36`)."""
        return cls.from_file(DEFAULT_CALIB_FILE)

    # --- fused transforms (host precompute, device matmul) ---

    @property
    def lidar_to_rect_matrix(self) -> np.ndarray:
        """(4, 3): right-multiply homogeneous lidar points -> rect frame."""
        m = np.vstack([self.R0 @ self.V2C, [0.0, 0.0, 0.0, 1.0]])  # (4,4)
        return m[:3].T  # transpose for hom @ M

    @property
    def cu(self) -> float:
        return float(self.P2[0, 2])

    @property
    def cv(self) -> float:
        return float(self.P2[1, 2])

    @property
    def fu(self) -> float:
        return float(self.P2[0, 0])

    @property
    def fv(self) -> float:
        return float(self.P2[1, 1])

    def lidar_to_rect(self, pts_lidar):
        """(N, 3) LiDAR points -> (N, 3) rectified-camera points (jittable)."""
        m = jnp.asarray(self.lidar_to_rect_matrix, jnp.float32)
        return pts_lidar @ m[:3] + m[3]

    def rect_to_img(self, pts_rect):
        """(N, 3) rect points -> ((N, 2) pixel coords, (N,) rect depth).

        Exact pcdet `calibration_kitti.Calibration.rect_to_img` semantics:
        pixel coordinates divide by the RECT-frame z (not the projected z),
        and the returned depth is ``proj_z - P2[2, 3]`` which equals the
        rect z. With ``P2[2, 3] != 0`` the two conventions disagree at image
        borders and on the depth >= 0 cut.
        """
        p2 = jnp.asarray(self.P2, jnp.float32)
        hom = jnp.concatenate(
            [pts_rect, jnp.ones_like(pts_rect[:, :1])], axis=1
        )
        proj = hom @ p2.T  # (N, 3)
        rz = pts_rect[:, 2]
        pts_img = proj[:, :2] / jnp.where(rz == 0, 1e-9, rz)[:, None]
        depth = proj[:, 2] - float(self.P2.T[3, 2])
        return pts_img, depth

    def lidar_to_img(self, pts_lidar):
        return self.rect_to_img(self.lidar_to_rect(pts_lidar))


def get_fov_flag(pts_rect, img_shape, calib: CameraCalibration):
    """In-camera-FOV mask (jittable); reference `simulation.py:39-47`.

    img_shape is (H, W); a point passes if its projection lands inside the
    image and its rect depth is non-negative.
    """
    pts_img, depth = calib.rect_to_img(pts_rect)
    h, w = img_shape
    inside = (
        (pts_img[:, 0] >= 0)
        & (pts_img[:, 0] < w)
        & (pts_img[:, 1] >= 0)
        & (pts_img[:, 1] < h)
    )
    return inside & (depth >= 0)


def camera_fov_mask(
    pts_lidar,
    calib: CameraCalibration | None = None,
    img_shape=DEFAULT_IMG_SHAPE,
):
    """One-call LiDAR-frame FOV mask, as used by `augment(..., noise_floor)`
    tail (`simulation.py:532-540`) and the datagen driver
    (`precompute.py:96-99`)."""
    if calib is None:
        calib = CameraCalibration.default_dense_hdl64()
    return get_fov_flag(calib.lidar_to_rect(pts_lidar), img_shape, calib)
