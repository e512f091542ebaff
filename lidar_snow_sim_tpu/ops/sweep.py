"""First-claim angular sweep as a fixed-shape sort + reduction.

The reference resolves overlapping occlusion intervals with a Python loop over
distance-sorted particles, claiming elementary sub-intervals between sorted
unique endpoint angles (simulation.py:231-295). Because a sub-interval always
goes to the *nearest* particle whose interval covers it (particles iterate in
ascending range), the sweep is equivalently a per-sub-interval argmin over
covering particles — which is what this kernel computes, with no sequential
loop:

  endpoints  = sort([right', left] ++ starts ++ ends)         (2K+2,)
  midpoints  = (endpoints[:-1] + endpoints[1:]) / 2            (2K+1,)
  cover[j,k] = start_j <= mid_k <= end_j                       (K, 2K+1)
  winner_k   = argmin_j (cover ? rank_j : inf)                 (2K+1,)
  claimed_j  = sum_k diffs_k * [winner_k == rank_j]

Duplicate endpoints produce zero-width sub-intervals that claim zero length,
so the reference's set() dedup is unnecessary. Beams crossing 0/2pi are
unwrapped exactly like the reference (right limit and wrapped interval starts
shifted down by 2pi).
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi
_BIG = jnp.float32(3.0e38)


def occlusion_sweep(
    right,
    left,
    a1,
    a2,
    valid,
    beam_divergence_rad,
):
    """Resolve interval claims for one beam.

    Args:
      right, left: wrapped beam limits (scalars)
      a1, a2:      occlusion intervals of the K occluders, *already sorted by
                   ascending particle range* (claim priority = array order)
      valid:       (K,) occluder mask

    Returns:
      ratio:     (K,) claimed angle / beam divergence, clipped to [0, 1]
      remainder: scalar unclaimed ratio (the hard target's share), clipped
      touched:   (K,) bool — occluder claimed at least one sub-interval of
                 positive width (the reference's assignment_made flag)
    """
    k = a1.shape[0]

    # unwrap the 0/2pi discontinuity (simulation.py:259-263)
    wrapped_beam = right > left
    right = jnp.where(wrapped_beam, right - TWO_PI, right)
    a1 = jnp.where(wrapped_beam & (a1 > a2), a1 - TWO_PI, a1)

    # invalid occluders: collapse to a zero-width interval at the left limit
    a1 = jnp.where(valid, a1, left)
    a2 = jnp.where(valid, a2, left)

    endpoints = jnp.sort(jnp.concatenate([jnp.stack([right, left]), a1, a2]))
    diffs = jnp.diff(endpoints)                      # (2K+1,)
    mids = (endpoints[:-1] + endpoints[1:]) * 0.5

    cover = (
        (a1[:, None] <= mids[None, :])
        & (mids[None, :] <= a2[:, None])
        & valid[:, None]
    )                                                # (K, 2K+1)

    ranks = jnp.arange(k, dtype=jnp.float32)
    winner = jnp.min(
        jnp.where(cover, ranks[:, None], _BIG), axis=0
    )                                                # (2K+1,)

    claims = jnp.where(winner[None, :] == ranks[:, None], diffs[None, :], 0.0)
    claimed = jnp.sum(claims, axis=1)                # (K,)

    unclaimed = jnp.sum(jnp.where(winner == _BIG, diffs, 0.0))

    ratio = jnp.clip(claimed / beam_divergence_rad, 0.0, 1.0)
    remainder = jnp.clip(unclaimed / beam_divergence_rad, 0.0, 1.0)
    touched = claimed > 0.0
    return ratio, remainder, touched
