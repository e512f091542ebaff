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
term is a (block × W) matmul that lands on the MXU. No tree, no
data-dependent shapes.

Two kernels share that body:

- ``_dror_kernel`` (fallback): each block against the FULL cloud —
  exact, O(N²) elementwise compares on the VPU.
- ``_dror_kernel_windowed`` (default): the search radius subtends a bounded
  azimuth arc — a neighbour within ``sr`` of a point at horizontal range ρ
  differs in azimuth by at most ``asin(min(1, sr/ρ))`` (widened to π when
  ``sr ≥ ρ``). So: one 6-operand azimuth sort, ±2π margin copies for the
  seam, a per-block ``searchsorted`` window over the sorted-extended array,
  and each block compares against only its window — O(N·W) with W ≪ N.
  Every way the static window/margin capacities could be exceeded is a
  COUNTED overflow (never a silent truncation); the host wrapper falls back
  to the full-N kernel when the count is nonzero, so results are always
  exact. Same routing recipe as the snowfall phase-A span LUT.

Boundary ties: both kernels evaluate ``d² ≤ sr²`` in f32 via the
``|xᵢ|²+|xⱼ|²−2xᵢ·xⱼ`` expansion, whose cancellation error (~|x|²·ε) can
flip pairs within ~1e-3 m of the radius boundary; the two kernels may
disagree with each other (different accumulation order) only on such
pairs. Measured: 2 flips in 51,200 points on a uniform random cloud, each
within 4e-4 m of the boundary. The reference's PCL KD-tree has its own
float behavior there.
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


def _dror_kernel_windowed(
    xyz, mask, alpha_rad, beta, k_min, sr_min,
    block: int, window: int, margin: int,
):
    """((N,) keep mask, overflow count); azimuth-windowed neighbour count.

    Exact whenever the returned overflow is 0 (the host wrapper reruns the
    full-N kernel otherwise). N must be a multiple of ``block``.
    """
    n = xyz.shape[0]
    margin = min(margin, n)      # static: copies can't exceed the cloud
    window = min(window, n + 2 * margin)
    r = jnp.linalg.norm(xyz, axis=-1)
    sr2 = jnp.maximum(sr_min, beta * alpha_rad * r) ** 2

    # azimuth key; masked padding parks at +pi (sorts after every real point
    # up to ties, which are harmless — all compares use true coordinates)
    theta = jnp.where(mask, jnp.arctan2(xyz[:, 1], xyz[:, 0]), jnp.pi)
    idx = jnp.arange(n, dtype=jnp.int32)
    th_s, xs, ys, zs, m_s, idx_s = jax.lax.sort(
        (theta, xyz[:, 0], xyz[:, 1], xyz[:, 2], mask.astype(jnp.int32), idx),
        num_keys=1,
    )
    m_s = m_s.astype(bool)
    xyz_s = jnp.stack([xs, ys, zs], axis=-1)
    sq_s = xs * xs + ys * ys + zs * zs
    r_s = jnp.sqrt(sq_s)
    rho_s = jnp.sqrt(xs * xs + ys * ys)
    sr_s = jnp.maximum(sr_min, beta * alpha_rad * r_s)
    sr2_s = sr_s * sr_s
    # angular reach: |Δazimuth| of any in-radius neighbour is bounded by
    # asin(sr/ρ) for sr < ρ (horizontal chord ≥ ρ·|sinΔ|); a point whose
    # radius reaches past its own horizontal range can neighbour ANY azimuth
    reach = jnp.where(
        sr_s >= rho_s,
        jnp.pi,
        jnp.arcsin(jnp.minimum(sr_s / jnp.maximum(rho_s, 1e-30), 1.0)),
    )
    reach = jnp.where(m_s, reach, 0.0)

    # sorted-extended arrays: the top/bottom `margin` REAL points copied
    # across the ±pi seam. n_real-aware slices keep the copies real when
    # padding is present (dynamic_slice clamps at the array edge).
    n_real = jnp.sum(mask.astype(jnp.int32))
    lo_start = jnp.maximum(n_real - margin, 0)
    lo_th = jax.lax.dynamic_slice(th_s, (lo_start,), (margin,)) - 2 * jnp.pi
    lo_xyz = jax.lax.dynamic_slice(xyz_s, (lo_start, 0), (margin, 3))
    lo_m = jax.lax.dynamic_slice(m_s, (lo_start,), (margin,))
    hi_th = th_s[:margin] + 2 * jnp.pi
    th_ext = jnp.concatenate([lo_th, th_s, hi_th])
    xyz_ext = jnp.concatenate([lo_xyz, xyz_s, xyz_s[:margin]])
    m_ext = jnp.concatenate([lo_m, m_s, m_s[:margin]])
    sq_ext = jnp.sum(xyz_ext * xyz_ext, axis=-1)

    nb = n // block
    th_blk = th_s.reshape(nb, block)
    m_blk = m_s.reshape(nb, block)
    has_real = jnp.any(m_blk, axis=1)
    # block bounds over REAL rows only: padding parks at +pi, so a block's
    # raw max would otherwise drag every padding entry into its window
    # (and all-padding blocks would claim the whole padding run as width)
    th_lo_b = jnp.min(jnp.where(m_blk, th_blk, jnp.inf), axis=1)
    th_hi_b = jnp.max(jnp.where(m_blk, th_blk, -jnp.inf), axis=1)
    reach_blk = jnp.max(reach.reshape(nb, block), axis=1)
    lo_theta = th_lo_b - reach_blk
    hi_theta = th_hi_b + reach_blk
    lo = jnp.searchsorted(th_ext, lo_theta, side="left").astype(jnp.int32)
    hi = jnp.searchsorted(th_ext, hi_theta, side="right").astype(jnp.int32)
    lo = jnp.where(has_real, lo, 0)
    hi = jnp.where(has_real, hi, 0)     # dead blocks: empty window
    width = hi - lo

    # every exactness hazard is counted: (a) window capacity, (b) margin
    # copies not deep enough for the widest seam reach, (c) a ≥2π angular
    # span would see both copies of one point (double count)
    ovf = jnp.sum(jnp.maximum(width - window, 0))
    ovf += jnp.sum(has_real & (lo_theta < th_ext[0]) & (reach_blk > 0))
    ovf += jnp.sum(has_real & (hi_theta > th_ext[-1]) & (reach_blk > 0))
    ovf += jnp.sum(has_real & (hi_theta - lo_theta >= 2 * jnp.pi))

    def one_block(args):
        b_xyz, b_sq, b_sr2, start, off, width_b = args
        w_xyz = jax.lax.dynamic_slice(xyz_ext, (start, 0), (window, 3))
        w_sq = jax.lax.dynamic_slice(sq_ext, (start,), (window,))
        w_m = jax.lax.dynamic_slice(m_ext, (start,), (window,))
        col = jnp.arange(window, dtype=jnp.int32)
        # valid columns are EXACTLY ext indices [lo, hi): a point and its
        # ±2π margin copy share xyz, so a wider mask could count one
        # neighbour twice when the slice start is edge-clamped below lo
        w_valid = w_m & (col >= off) & (col < off + width_b)
        d2 = b_sq[:, None] + w_sq[None, :] - 2.0 * (b_xyz @ w_xyz.T)
        inside = (d2 <= b_sr2[:, None]) & w_valid[None, :]
        # the block's own rows sit inside [lo, hi) by construction (side=
        # left/right brackets the block's azimuth range): self always counts
        return jnp.sum(inside, axis=1) - 1

    start = jnp.minimum(lo, jnp.int32(n + 2 * margin - window))
    counts = jax.lax.map(
        one_block,
        (
            xyz_s.reshape(nb, block, 3),
            sq_s.reshape(nb, block),
            sr2_s.reshape(nb, block),
            start,
            lo - start,
            width,
        ),
    ).reshape(-1)
    keep_sorted = m_s & (counts >= k_min)
    keep = jnp.zeros(n, bool).at[idx_s].set(keep_sorted)
    return keep, ovf


_jit_dror_windowed = jax.jit(
    _dror_kernel_windowed, static_argnames=("block", "window", "margin")
)


def dynamic_radius_outlier_filter(
    pc: np.ndarray,
    alpha: float = 0.45,
    beta: float = 3.0,
    k_min: int = 3,
    sr_min: float = 0.04,
    block: int = 1024,
    window: int = 2048,
    margin: int = 1024,
) -> np.ndarray:
    """Keep-mask over an (N, ≥3) cloud; True = inlier (not snow).

    Signature mirrors the live-PCL path of the reference
    (`pointcloud_viewer.py:2266-2270`): alpha in degrees, sr_min in meters.
    Runs the azimuth-windowed kernel first; any counted capacity overflow
    falls back to the full-N kernel (never a silent truncation). The result
    is exact w.r.t. the kernels' f32 ``|xᵢ|²+|xⱼ|²−2xᵢ·xⱼ`` distance
    expansion — every in-radius pair is COMPARED — with the module
    docstring's boundary-tie caveat as the one exception: pairs within
    ~1e-3 m of the radius boundary can flip between the windowed and
    full-N kernels (different accumulation order), so which of the two
    answers is returned depends on the overflow-triggered fallback.
    ``window=0`` forces the full-N kernel.
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
    args = (
        jnp.asarray(xyz),
        jnp.asarray(mask),
        jnp.float32(math.radians(alpha)),
        jnp.float32(beta),
        jnp.int32(k_min),
        jnp.float32(sr_min),
    )
    if window:
        # windowed fast path: a small azimuth-sorted block beats the big
        # full-N block (less padding, tighter windows). Any counted
        # overflow grows the window once (recompile, cached) before the
        # full-N fallback — the grow-and-rerun pattern of the other host
        # wrappers.
        wblock = min(block, 128)
        wcap = ((n + wblock - 1) // wblock) * wblock
        for w in (window, 2 * window):
            if w >= wcap + 2 * min(margin, wcap):
                break  # window covers the whole cloud: full-N is the same
            keep, ovf = _jit_dror_windowed(
                args[0][:wcap], args[1][:wcap], *args[2:],
                block=wblock, window=w, margin=margin,
            )
            if int(ovf) == 0:
                return np.asarray(keep)[:n]
    keep = _jit_dror(*args, block=block)
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
