"""Masked regression / RANSAC kernels (fixed shapes, jittable).

Device equivalents of the reference's host-side estimators:
- linregress (scipy.stats.linregress closed form) over masked points
- degree-2 polyfit via centered/scaled normal equations (f32-stable)
- RANSAC plane fit mirroring sklearn RANSACRegressor semantics as pinned in
  oracle/fitting.py (squared residual vs MAD threshold, best-trial inlier
  refit), with a fixed trial count and an injected PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def masked_mean(x, mask):
    n = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, x, 0.0)) / n


def masked_linregress(x, y, mask):
    """Least-squares slope/intercept over masked samples."""
    xm = masked_mean(x, mask)
    ym = masked_mean(y, mask)
    dx = jnp.where(mask, x - xm, 0.0)
    dy = jnp.where(mask, y - ym, 0.0)
    denom = jnp.sum(dx * dx)
    slope = jnp.sum(dx * dy) / jnp.maximum(denom, 1e-30)
    return slope, ym - slope * xm


def masked_polyfit2(x, y, mask):
    """Degree-2 least-squares fit; returns (p2, p1, p0), highest power first.

    Solved in a centered/scaled basis u = (x - mu)/sigma so the 3x3 normal
    equations stay well-conditioned in float32 even for x ~ 80 m ranges.
    """
    mu = masked_mean(x, mask)
    var = masked_mean((x - mu) ** 2, mask)
    sigma = jnp.sqrt(jnp.maximum(var, 1e-12))
    u = jnp.where(mask, (x - mu) / sigma, 0.0)
    w = mask.astype(x.dtype)

    cols = jnp.stack([u * u, u, w], axis=-1)          # (N, 3)
    g = cols.T @ cols                                  # (3, 3)
    b = cols.T @ jnp.where(mask, y, 0.0)               # (3,)
    a, bu, cu = jnp.linalg.solve(g + 1e-9 * jnp.eye(3), b)

    # expand p(u) = a u^2 + bu u + cu back to x
    p2 = a / (sigma * sigma)
    p1 = bu / sigma - 2 * a * mu / (sigma * sigma)
    p0 = a * mu * mu / (sigma * sigma) - bu * mu / sigma + cu
    return jnp.stack([p2, p1, p0])


def polyval2(p, x):
    return p[0] * x * x + p[1] * x + p[2]


def masked_median(x, mask):
    """Median over masked values (numpy semantics: mean of the two middle
    order statistics for even counts)."""
    n = jnp.sum(mask)
    big = jnp.float32(3.0e38)
    s = jnp.sort(jnp.where(mask, x, big))
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    return (s[lo] + s[hi]) * 0.5


def _merged_kth(s, p, n, m1, k):
    """k-th smallest (0-based) of the multiset {|s[i] - m1| : i < n} given
    ASCENDING s, without a second sort.

    |s - m1| over a sorted s is two sorted runs — A[t] = m1 - s[p-1-t]
    (the entries below m1, reversed) and B[u] = s[p+u] - m1 — so the k-th
    order statistic is a classic two-sorted-array selection: an O(log n)
    scalar binary search on how many elements the k+1 smallest take from A.
    The returned VALUE is |s[i] - m1| computed by the same f32 subtraction
    the sort-based path feeds jnp.sort, so order statistics are
    bit-identical to `masked_median(jnp.abs(x - m1), mask)`.
    """
    inf = jnp.float32(jnp.inf)
    nb = n - p

    def a_val(t):  # A[t], -inf/+inf outside [0, p)
        v = jnp.abs(s[jnp.clip(p - 1 - t, 0, s.shape[0] - 1)] - m1)
        return jnp.where(t < 0, -inf, jnp.where(t >= p, inf, v))

    def b_val(u):  # B[u], -inf/+inf outside [0, n - p)
        v = jnp.abs(s[jnp.clip(p + u, 0, s.shape[0] - 1)] - m1)
        return jnp.where(u < 0, -inf, jnp.where(u >= nb, inf, v))

    lo = jnp.maximum(k + 1 - nb, 0)
    hi = jnp.minimum(k + 1, p)
    steps = int(np.ceil(np.log2(max(int(s.shape[0]), 2)))) + 2

    def body(_, carry):
        lo, hi, ans, done = carry
        a = (lo + hi) // 2
        a_last, b_last = a_val(a - 1), b_val(k - a)
        a_next, b_next = a_val(a), b_val(k + 1 - a)
        too_many_a = a_last > b_next
        too_few_a = b_last > a_next
        val = jnp.maximum(a_last, b_last)
        ok = ~too_many_a & ~too_few_a
        return (
            jnp.where(~done & too_few_a, a + 1, lo),
            jnp.where(~done & too_many_a, a - 1, hi),
            jnp.where(~done & ok, val, ans),
            done | ok,
        )

    _, _, ans, _ = jax.lax.fori_loop(
        0, steps, body,
        (lo, hi, jnp.float32(0.0), jnp.bool_(False)),
    )
    return ans


def masked_median_and_mad(x, mask):
    """(median, median-of-|x - median|) over masked values from ONE sort.

    Bit-identical to `m = masked_median(x, mask);
    masked_median(jnp.abs(x - m), mask)` — which costs a second full-length
    sort (~0.5 ms per frame at bench shapes) — via two exact
    two-sorted-run order-statistic selections on the single sorted array
    (see _merged_kth)."""
    n = jnp.sum(mask)
    big = jnp.float32(3.0e38)
    s = jnp.sort(jnp.where(mask, x, big))
    lo = jnp.maximum((n - 1) // 2, 0)
    hi = jnp.maximum(n // 2, 0)
    m1 = (s[lo] + s[hi]) * 0.5
    # p = entries strictly below m1 among the n valid ones (the BIG filler
    # sorts after every valid value, and m1 <= BIG for n > 0)
    p = jnp.minimum(jnp.searchsorted(s, m1, side="left"), n)
    v_lo = _merged_kth(s, p, n, m1, jnp.maximum((n - 1) // 2, 0))
    v_hi = _merged_kth(s, p, n, m1, jnp.maximum(n // 2, 0))
    mad = (v_lo + v_hi) * 0.5
    # n == 0: the sort-based path would feed |BIG - m1| values; the caller
    # discards the fit (crop-size gate), so only finiteness matters
    return m1, jnp.where(n > 0, mad, big)


def _solve3(a, b):
    """Closed-form 3x3 solve (Cramer via adjugate): one fused elementwise
    expression instead of an LU custom-call. The vmapped RANSAC trial
    solves paid 0.4 ms/step in LuDecompositionBlock at bench shapes for
    64 tiny systems; this is ~free. Not used where exact golden parity
    pins the solver's float behavior (masked_polyfit2 keeps linalg.solve).

    Returns (solution, det) so callers can reject near-singular systems
    explicitly: unlike pivoted LU, the adjugate solve turns a degenerate
    sample (collinear or duplicate points) into large-but-finite garbage
    that would pass a bare isfinite gate."""
    c00 = a[1, 1] * a[2, 2] - a[1, 2] * a[2, 1]
    c01 = a[1, 2] * a[2, 0] - a[1, 0] * a[2, 2]
    c02 = a[1, 0] * a[2, 1] - a[1, 1] * a[2, 0]
    det = a[0, 0] * c00 + a[0, 1] * c01 + a[0, 2] * c02
    c10 = a[0, 2] * a[2, 1] - a[0, 1] * a[2, 2]
    c11 = a[0, 0] * a[2, 2] - a[0, 2] * a[2, 0]
    c12 = a[0, 1] * a[2, 0] - a[0, 0] * a[2, 1]
    c20 = a[0, 1] * a[1, 2] - a[0, 2] * a[1, 1]
    c21 = a[0, 2] * a[1, 0] - a[0, 0] * a[1, 2]
    c22 = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    adj = jnp.array([[c00, c10, c20], [c01, c11, c21], [c02, c12, c22]])
    return (adj @ b) / det, det


def _solve2(a, b):
    """Closed-form 2x2 solve (same rationale as _solve3)."""
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    return jnp.array(
        [a[1, 1] * b[0] - a[0, 1] * b[1], a[0, 0] * b[1] - a[1, 0] * b[0]]
    ) / det


def ransac_plane(
    xyz,
    mask,
    key,
    trials: int = 64,
    standard_height: float = -1.55,
):
    """RANSAC ground-plane fit with the reference's crop and fallback.

    Device port of oracle/fitting.ransac_plane (itself pinned to
    tools/wet_ground/planes.py:12-50). Returns (w, h): unit normal (3,) and
    raw intercept. Falls back to the flat-earth plane ([0,0,1], -1.55) when
    the crop has <= 3 points or the refit degenerates.
    """
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    crop = (
        mask
        & (z < -1.55)
        & (z > -1.86 - 0.01 * x)
        & (x > 10)
        & (x < 70)
        & (y > -3)
        & (y < 3)
    )
    n_crop = jnp.sum(crop)

    _, thresh = masked_median_and_mad(z, crop)

    # uniform sampling over crop points by inverse CDF: equivalent in
    # distribution to categorical over uniform logits, but O(N + T log N)
    # instead of T*3 gumbel fields over all N points (profiled hot).
    # c is integer-valued, so clamping u to c[-1] - 0.5 keeps searchsorted
    # strictly inside the last crop point (uniform*c[-1] can round up to
    # exactly c[-1], which would select index n -> a non-crop point); when
    # the crop is empty (c[-1] == 0) the `good` gate below discards the fit.
    c = jnp.cumsum(crop.astype(jnp.float32))
    u = jnp.minimum(jax.random.uniform(key, (trials, 3)) * c[-1], c[-1] - 0.5)
    # scan_unrolled: the default scan method lowers to a ~17-trip while
    # loop of tiny gathers (0.23 ms/step of dispatch at bench shapes);
    # unrolling removes the loop machinery for identical results
    idx = jnp.clip(
        jnp.searchsorted(c, u, side="right", method="scan_unrolled"),
        0, c.shape[0] - 1,
    )                                                             # (T, 3)

    pts = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)            # (N, 3)

    def trial(i3):
        a = pts[i3]                    # (3, 3) rows [x, y, 1]
        zz = z[i3]
        coef, det = _solve3(a + 1e-12 * jnp.eye(3), zz)
        resid = z - (x * coef[0] + y * coef[1] + coef[2])
        # |det| gate: crop coordinates are O(10-70) m, so any genuine
        # 3-point triangle has |det| >> 1e-6; collinear/duplicate samples
        # (searchsorted can return repeated indices) land near 0 and must
        # be rejected explicitly, not by numerical luck (ADVICE r4)
        ok = jnp.isfinite(coef).all() & (jnp.abs(det) > 1e-6)
        inl = crop & (resid**2 < thresh) & ok
        return jnp.sum(inl), inl

    counts, inliers = jax.vmap(trial)(idx)             # (T,), (T, N)
    best = jnp.argmax(counts)
    inl = inliers[best]

    # weighted least-squares refit on best-trial inliers (centered for f32)
    w_ = inl.astype(jnp.float32)
    n_in = jnp.maximum(jnp.sum(w_), 1.0)
    mx = jnp.sum(w_ * x) / n_in
    my = jnp.sum(w_ * y) / n_in
    mz = jnp.sum(w_ * z) / n_in
    cx, cy, cz = x - mx, y - my, z - mz
    sxx = jnp.sum(w_ * cx * cx)
    sxy = jnp.sum(w_ * cx * cy)
    syy = jnp.sum(w_ * cy * cy)
    sxz = jnp.sum(w_ * cx * cz)
    syz = jnp.sum(w_ * cy * cz)
    g = jnp.array([[sxx, sxy], [sxy, syy]])
    ab = _solve2(g + 1e-9 * jnp.eye(2), jnp.array([sxz, syz]))
    intercept = mz - ab[0] * mx - ab[1] * my

    w_vec = jnp.array([ab[0], ab[1], -1.0])
    w_vec = w_vec / jnp.linalg.norm(w_vec)

    good = (
        (n_crop > 3)
        & (jnp.sum(inl) >= 3)
        & jnp.isfinite(w_vec).all()
        & jnp.isfinite(intercept)
    )
    w_out = jnp.where(good, w_vec, jnp.array([0.0, 0.0, 1.0]))
    h_out = jnp.where(good, intercept, standard_height)
    return w_out, h_out
