"""Beam–particle geometry as fixed-shape JAX kernels.

Vectorized reformulation of the reference's 2-D analytic geometry
(`tools/snowfall/geometry.py`), written per-(beam, candidate) so it vmaps over
beams and broadcasts over a candidate axis:

- The beam is the angular wedge [right, left] (wrapped to [0, 2pi); right >
  left iff the wedge crosses the 0/2pi discontinuity).
- A particle disk (center (x, y), radius r, not containing the origin)
  intersects the wedge iff its center lies inside, or it overlaps one of the
  two edge rays (distance of center to the edge *line* < r, and the center is
  in the ray's half-plane) — the reference's exact predicate
  (simulation.py:356-390), with numerically robust equivalents:
  point-line distance |x sin(t) - y cos(t)| instead of tan-based line
  coefficients, and cos(dt) > 0 instead of three wrapped |dt| < pi/2 tests.
- Its angular occlusion interval is [center_angle - asin(r/d),
  center_angle + asin(r/d)] (the tangent rays from the origin), clipped to the
  wedge edge it overlaps (geometry.py:14-29), in the same wrapped-angle
  convention as the reference (start > end iff the interval crosses 0/2pi).
"""

from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def wrap_02pi(a):
    """Wrap angles into [0, 2pi) the way the reference does (single add/sub,
    valid for inputs in (-2pi, 4pi))."""
    a = jnp.where(a < 0, a + TWO_PI, a)
    return jnp.where(a > TWO_PI, a - TWO_PI, a)


def beam_limits(x, y, beam_divergence_rad):
    """Beam wedge [right, left] around each point's azimuth
    (simulation.py:91-101). Returns wrapped (right, left)."""
    center = wrap_02pi(jnp.arctan2(y, x))
    right = wrap_02pi(center - beam_divergence_rad / 2)
    left = wrap_02pi(center + beam_divergence_rad / 2)
    return right, left


def _point_line_distance(px, py, theta):
    """Distance of (px, py) to the line through the origin at angle theta."""
    return jnp.abs(px * jnp.sin(theta) - py * jnp.cos(theta))


def _same_halfplane(theta, pang):
    """Whether the ray at theta (not its opposite) points toward pang."""
    return jnp.cos(theta - pang) > 0


def candidate_intervals(
    right,
    left,
    px,
    py,
    pr,
    pdist,
    pvalid,
    current_range,
):
    """Intersection test + clipped occlusion intervals for one beam.

    Args (candidate axis C broadcast; right/left/current_range scalar):
      right, left: wrapped beam limits
      px, py, pr, pdist: candidate particle center/radius/range, shape (C,)
      pvalid: candidate validity mask (C,)
      current_range: range of the hard target

    Returns:
      a1, a2:     occlusion interval per candidate (C,), wrapped convention
      intersects: bool (C,), True iff particle intersects the beam AND is
                  closer than the hard target AND valid
    """
    pang = wrap_02pi(jnp.arctan2(py, px))
    wrapped_beam = right > left

    center_in = (right <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right - TWO_PI <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right <= pang) & (pang <= left + TWO_PI)

    dist_r = _point_line_distance(px, py, right)
    dist_l = _point_line_distance(px, py, left)
    right_hit = (dist_r < pr) & _same_halfplane(right, pang)
    left_hit = (dist_l < pr) & _same_halfplane(left, pang)

    in_range = pdist < current_range
    intersects = (center_in | right_hit | left_hit) & in_range & pvalid

    # tangent rays from the origin: center +- asin(r/d)
    delta = jnp.arcsin(jnp.clip(pr / jnp.maximum(pdist, 1e-12), 0.0, 1.0))
    a1 = wrap_02pi(pang - delta)
    a2 = wrap_02pi(pang + delta)

    # clip to the wedge edge that the disk overlaps (geometry.py:26-27)
    a1 = jnp.where(right_hit, right, a1)
    a2 = jnp.where(left_hit, left, a2)
    return a1, a2, intersects
