"""DROR — Dynamic Radius Outlier Removal de-snowing, TPU-native.

Equivalent of the consumed surface of the reference's `lib/cadc_devkit`
submodule (`pointcloud_viewer.py:47,82,2258-2299,2612-2649`):
``dynamic_radius_outlier_filter``, ``get_cube_mask`` and ``DROR_LEVELS``.
Defaults mirror the viewer (`pointcloud_viewer.py:267-270`): α = 0.45°
azimuth resolution, β = 3, k_min = 3, sr_min = 4 cm.

DROR (Charron et al., CRV'18) keeps a point iff at least ``k_min`` neighbours
lie within a range-proportional search radius
``sr = max(sr_min, β · α_rad · r)``. The reference runs it through PCL's
KD-tree (optional C++ dependency) or falls back to precomputed pickles.

TPU-native design: neighbour counting is reformulated as a blocked pairwise
distance computation — ``|xᵢ-xⱼ|² = |xᵢ|² + |xⱼ|² − 2 xᵢ·xⱼ`` — whose cross
term is a (block × N) matmul that lands on the MXU. No tree, no
data-dependent shapes: `lax.map` over point blocks, each block one matmul
against the full cloud. ~N²·4 FLOPs ≈ 40 GFLOP at N = 100k — well under a
chip-second, where a host KD-tree build alone takes longer.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Snow-severity bands by number of DROR-flagged points inside the analysis
# cube, as consumed from `create_image_sets.DROR_LEVELS`
# (`pointcloud_viewer.py:2631-2643`; the "heavy" band is open-ended).
DROR_LEVELS = {
    "light": (0, 249),
    "medium": (250, 499),
    "heavy": (500, 10**9),
}

# Analysis-cube crop used for severity estimation (cadc_devkit's get_cube_mask
# region: a forward box around the ego vehicle).
CUBE_X = (0.0, 20.0)
CUBE_Y = (-10.0, 10.0)
CUBE_Z = (-3.0, 3.0)


def get_cube_mask(pc: np.ndarray) -> np.ndarray:
    """Boolean mask of points inside the severity-analysis cube."""
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    return (
        (x >= CUBE_X[0]) & (x <= CUBE_X[1])
        & (y >= CUBE_Y[0]) & (y <= CUBE_Y[1])
        & (z >= CUBE_Z[0]) & (z <= CUBE_Z[1])
    )


def snow_level(num_snow_points: int) -> str:
    for name, (lo, hi) in DROR_LEVELS.items():
        if lo <= num_snow_points <= hi:
            return name
    return "heavy"


def _dror_kernel(xyz, mask, alpha_rad, beta, k_min, sr_min, block: int):
    """(N,) keep mask; blocked MXU pairwise-distance neighbour count."""
    n = xyz.shape[0]
    r = jnp.linalg.norm(xyz, axis=-1)
    sr2 = jnp.maximum(sr_min, beta * alpha_rad * r) ** 2
    sq = jnp.sum(xyz * xyz, axis=-1)

    n_blocks = (n + block - 1) // block
    pad = n_blocks * block - n
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0)))
    sq_p = jnp.pad(sq, (0, pad))
    sr2_p = jnp.pad(sr2, (0, pad))

    def one_block(args):
        bx, bsq, bsr2 = args
        # (block, N) squared distances via one matmul on the MXU
        d2 = bsq[:, None] + sq[None, :] - 2.0 * (bx @ xyz.T)
        inside = (d2 <= bsr2[:, None]) & mask[None, :]
        # self-match always counts once; subtract it
        return jnp.sum(inside, axis=1) - 1

    counts = jax.lax.map(
        one_block,
        (
            xyz_p.reshape(n_blocks, block, 3),
            sq_p.reshape(n_blocks, block),
            sr2_p.reshape(n_blocks, block),
        ),
    ).reshape(-1)[:n]
    return mask & (counts >= k_min)


_jit_dror = jax.jit(_dror_kernel, static_argnames=("block",))


def dynamic_radius_outlier_filter(
    pc: np.ndarray,
    alpha: float = 0.45,
    beta: float = 3.0,
    k_min: int = 3,
    sr_min: float = 0.04,
    block: int = 1024,
) -> np.ndarray:
    """Keep-mask over an (N, ≥3) cloud; True = inlier (not snow).

    Signature mirrors the live-PCL path of the reference
    (`pointcloud_viewer.py:2266-2270`): alpha in degrees, sr_min in meters.
    """
    pc = np.asarray(pc)
    n = pc.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    cap = ((n + block - 1) // block) * block
    xyz = np.zeros((cap, 3), np.float32)
    xyz[:n] = pc[:, :3]
    xyz[n:] = 1e6  # padding far away: never a neighbour
    mask = np.zeros(cap, dtype=bool)
    mask[:n] = True
    keep = _jit_dror(
        jnp.asarray(xyz),
        jnp.asarray(mask),
        jnp.float32(math.radians(alpha)),
        jnp.float32(beta),
        jnp.int32(k_min),
        jnp.float32(sr_min),
        block,
    )
    return np.asarray(keep)[:n]


def dror_snow_stats(pc: np.ndarray, **kwargs):
    """(num_snow_in_cube, severity_level): the viewer's severity readout
    (`pointcloud_viewer.py:2272-2282,2612-2649`)."""
    cube = pc[get_cube_mask(pc)]
    if len(cube) == 0:
        return 0, "light"
    keep = dynamic_radius_outlier_filter(cube, **kwargs)
    num_snow = int((~keep).sum())
    return num_snow, snow_level(num_snow)


# --- precomputed-index fallback (the reference's DROR.zip path) ---
#
# When live PCL DROR is unavailable the reference loads per-frame pickles of
# snow-point indices from `{DROR}/alpha_0.45/all/{sensor}/{signal}/{variant}/
# {frame}.pkl` (`pointcloud_viewer.py:94-111`), variant "full" for the filter
# mask and "crop" for the severity count (`:2612-2630`).


def _pickle_path(root, sensor, signal, variant, filename):
    from pathlib import Path

    name = Path(filename).name.replace(".bin", "")
    return (
        Path(root) / "alpha_0.45" / "all" / sensor / signal / variant
        / f"{name}.pkl"
    )


def precomputed_dror_mask(
    root, sensor: str, signal: str, variant: str, before: int, filename: str
) -> np.ndarray:
    """Keep-mask from a precomputed snow-index pickle; exact reference
    semantics (`pointcloud_viewer.py:98-111`): ones(before) with the pickled
    indices cleared. Raises FileNotFoundError like the reference's bare
    ``open``."""
    import pickle

    with open(_pickle_path(root, sensor, signal, variant, filename), "rb") as f:
        snow_indices = pickle.load(f)
    mask = np.ones(before, dtype=bool)
    mask[snow_indices] = False
    return mask


def precomputed_snow_severity(
    root, sensor: str, signal: str, filename: str
) -> tuple[int, str]:
    """(num_snow, severity label) from the crop-variant pickle — the
    viewer's DROR title readout (`pointcloud_viewer.py:2612-2643`).

    Returns (-1, "file not found") when the pickle is absent, and the
    open-ended "heavy" band when the count exceeds every DROR_LEVELS range,
    mirroring the reference's loop/default structure.
    """
    import pickle

    path = _pickle_path(root, sensor, signal, "crop", filename)
    if not path.exists():
        return -1, "file not found"
    with open(path, "rb") as f:
        num_snow = len(pickle.load(f))
    for key, (lo, hi) in DROR_LEVELS.items():
        if lo <= num_snow <= hi:
            return num_snow, key
    return num_snow, "heavy"
