"""BEV rotated-rectangle IoU and fixed-shape greedy NMS (pure JAX).

TPU-native equivalent of the rotated-box geometry the reference consumes
from OpenPCDet (`pcdet.ops.iou3d_nms` — CUDA polygon clipping) for its live
inference path (`pointcloud_viewer.py:2388-2436`). OpenPCDet's post
processing runs class-agnostic rotated NMS over BEV footprints of the
predicted (x, y, z, dx, dy, dz, heading) boxes; training-side target
assignment uses the same BEV rotated overlap (AxisAlignedTargetAssigner
with MATCH_HEIGHT False).

Design: instead of a data-dependent Sutherland–Hodgman loop (or the
angle-sorted vertex-enumeration shoelace, which costs a 24-element sort +
per-index gather PER PAIR — measured 795 ms for a 1024x1024 matrix on the
chip), the intersection area is computed as a boundary line integral:

    area(A∩B) = 1/2 ∮_{∂(A∩B)} (x dy - y dx)

The boundary of the intersection of two convex sets is exactly the union
of (a) the parts of A's edges inside B and (b) the parts of B's edges
inside A. Each part is one Liang–Barsky segment-vs-rectangle clip (pure
min/max arithmetic in the other box's local frame), and a straight segment
from g0 to g1 contributes cross(g0, g1)/2 to the integral. Because the
pieces tile one closed CCW loop, the SUM of the per-segment contributions
equals the area — in any order, so no sorting is needed. Coincident-edge
degeneracies (identical boxes, exterior touching, shared walls) are
handled by weighting any clipped segment that lies ON the other box's
boundary by 1/2: coincident traversals in the same direction merge to one
full contribution, opposite directions cancel to zero — both exactly what
the closed loop requires. Each pair is ~400 flops of straight-line
elementwise math (unrolled over the 8 edges), so the vmapped (N, M)
matrix is one fused VPU kernel with every intermediate a clean (N, M)
plane. Pairs are re-centred at the two boxes' midpoint so the cross
products stay well-conditioned in f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def box_corners_bev(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) [x, y, dx, dy, heading] -> (..., 4, 2) corners (CCW).

    Heading is the rotation of the dx axis about +z (OpenPCDet convention:
    box[6] rotates the box's dx/length axis from +x towards +y).
    """
    x, y, dx, dy, h = (boxes[..., i] for i in range(5))
    c, s = jnp.cos(h), jnp.sin(h)
    lx = 0.5 * dx
    ly = 0.5 * dy
    # CCW in the box frame: (+,+), (-,+), (-,-), (+,-)
    ox = jnp.stack([lx, -lx, -lx, lx], axis=-1)
    oy = jnp.stack([ly, ly, -ly, -ly], axis=-1)
    cx = x[..., None] + ox * c[..., None] - oy * s[..., None]
    cy = y[..., None] + ox * s[..., None] + oy * c[..., None]
    return jnp.stack([cx, cy], axis=-1)


_BOUND_EPS = 1e-5   # pcdet's check_in_box2d half-extent margin


def _corner_xy(x, y, c, s, lx, ly):
    """One rectangle corner from centre, cos/sin(heading), local offsets."""
    return x + lx * c - ly * s, y + lx * s + ly * c


def _clip_contrib(p0x, p0y, p1x, p1y, rx, ry, rc, rs, hx, hy):
    """Boundary-integral contribution of edge (p0 -> p1) clipped to rect.

    rect: centre (rx, ry), cos/sin(heading) (rc, rs), half extents (hx, hy).
    Returns (cross(g0, g1)/2 of the clipped sub-segment, on_boundary flag).
    Everything is scalar arithmetic — vmapped, each value is one (N, M)
    plane and the whole pair kernel fuses into a single VPU loop.
    """
    # segment endpoints in the rect's local frame
    t0x, t0y = p0x - rx, p0y - ry
    q0x = t0x * rc + t0y * rs
    q0y = -t0x * rs + t0y * rc
    t1x, t1y = p1x - rx, p1y - ry
    q1x = t1x * rc + t1y * rs
    q1y = -t1x * rs + t1y * rc

    t0 = jnp.zeros_like(p0x)
    t1 = jnp.ones_like(p0x)
    on_boundary = jnp.zeros_like(p0x, dtype=bool)
    for o, d, hh in ((q0x, q1x - q0x, hx), (q0y, q1y - q0y, hy)):
        # parallel threshold must exceed the f32 rotate/unrotate round-trip
        # noise on the corners (~1e-6 m at 10 m coords), else coincident
        # edges of identical boxes miss the half-weight path and the area
        # triple-counts. 1e-4 m of drift across a whole edge is far below
        # any heading difference that matters for IoU.
        par = jnp.abs(d) < 1e-4
        denom = jnp.where(par, 1.0, d)
        ta = (-hh - _BOUND_EPS - o) / denom
        tb = (hh + _BOUND_EPS - o) / denom
        tlo = jnp.minimum(ta, tb)
        thi = jnp.maximum(ta, tb)
        omid = o + 0.5 * d
        inside_par = jnp.abs(omid) <= hh + _BOUND_EPS
        tlo = jnp.where(par, jnp.where(inside_par, 0.0, 1.0), tlo)
        thi = jnp.where(par, jnp.where(inside_par, 1.0, 0.0), thi)
        t0 = jnp.maximum(t0, tlo)
        t1 = jnp.minimum(t1, thi)
        on_boundary |= par & (jnp.abs(omid) >= hh - _BOUND_EPS)
    t1 = jnp.maximum(t1, t0)          # empty clip -> zero-length segment

    ex, ey = p1x - p0x, p1y - p0y
    g0x, g0y = p0x + t0 * ex, p0y + t0 * ey
    g1x, g1y = p0x + t1 * ex, p0y + t1 * ey
    return 0.5 * (g0x * g1y - g1x * g0y), on_boundary


def _edges_contrib(box_a, box_b):
    """Sum of clipped-edge contributions of A's 4 edges against rect B.

    box_a / box_b are 5-tuples of broadcastable arrays (x, y, dx, dy, h) —
    NOT stacked (..., 5) arrays: a stacked minor dim of 5 pads 25x under
    the TPU's (8, 128) tiling, whereas column tuples keep every
    intermediate a full (N, M) plane (measured 3.19 s -> ms-scale on the
    321k-anchor x 32-gt assignment matrix).
    """
    ax, ay, adx, ady, ah = box_a
    bx, by, bdx, bdy, bh = box_b
    ac, as_ = jnp.cos(ah), jnp.sin(ah)
    bc, bs = jnp.cos(bh), jnp.sin(bh)
    lx, ly = 0.5 * adx, 0.5 * ady
    # CCW corners: (+,+), (-,+), (-,-), (+,-)
    corners = [
        _corner_xy(ax, ay, ac, as_, lx, ly),
        _corner_xy(ax, ay, ac, as_, -lx, ly),
        _corner_xy(ax, ay, ac, as_, -lx, -ly),
        _corner_xy(ax, ay, ac, as_, lx, -ly),
    ]
    total = jnp.zeros_like(ax)
    for i in range(4):
        p0x, p0y = corners[i]
        p1x, p1y = corners[(i + 1) % 4]
        contrib, on_b = _clip_contrib(
            p0x, p0y, p1x, p1y, bx, by, bc, bs, 0.5 * bdx, 0.5 * bdy
        )
        # boundary-coincident traversals carry half weight: same-direction
        # coincident pieces (shared wall of nested boxes) merge to one full
        # contribution, opposite directions (exterior touching) cancel.
        total = total + jnp.where(on_b, 0.5, 1.0) * contrib
    return total


def _pair_intersection_area(box_a, box_b):
    """Intersection area of BEV rectangles (5-tuples of broadcastables)."""
    # re-centre the pair so the shoelace cross products are O(extent), not
    # O(scene range) — keeps f32 cancellation error ~1e-6 m^2.
    midx = 0.5 * (box_a[0] + box_b[0])
    midy = 0.5 * (box_a[1] + box_b[1])
    a = (box_a[0] - midx, box_a[1] - midy) + tuple(box_a[2:])
    b = (box_b[0] - midx, box_b[1] - midy) + tuple(box_b[2:])
    area = _edges_contrib(a, b) + _edges_contrib(b, a)
    return jnp.maximum(area, 0.0)


def _cross_cols(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray):
    """(N, 5) x (M, 5) -> broadcast column 5-tuples ((N, 1) vs (1, M))."""
    a = tuple(boxes_a[:, i, None] for i in range(5))
    b = tuple(boxes_b[None, :, i] for i in range(5))
    return a, b


def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV rotated IoU matrix.

    boxes_a: (N, 5+) [x, y, dx, dy, heading, ...]; boxes_b: (M, 5+).
    Accepts 7-DoF boxes (x, y, z, dx, dy, dz, heading) too — columns are
    picked by name order, matching pcdet's boxes_iou_bev BEV projection.
    Returns (N, M) float32.
    """
    a5 = _as_bev5(boxes_a)
    b5 = _as_bev5(boxes_b)
    inter = _pair_intersection_area(*_cross_cols(a5, b5))
    area_a = (a5[:, 2] * a5[:, 3])[:, None]
    area_b = (b5[:, 2] * b5[:, 3])[None, :]
    union = jnp.maximum(area_a + area_b - inter, _EPS)
    return inter / union


def _as_bev5(boxes: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) [x, y, dx, dy, heading] view of 5- or 7-DoF boxes."""
    if boxes.shape[-1] >= 7:
        return boxes[..., [0, 1, 3, 4, 6]]
    return boxes[..., :5]


def boxes_overlap_bev(boxes_a: jnp.ndarray,
                      boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV intersection AREA (not IoU) — pcdet boxes_overlap_bev."""
    a5 = _as_bev5(boxes_a)
    b5 = _as_bev5(boxes_b)
    return _pair_intersection_area(*_cross_cols(a5, b5))


def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU of 7-DoF boxes (pcdet boxes_iou3d_gpu semantics:
    BEV rotated footprint overlap x z-extent overlap)."""
    inter_bev = boxes_overlap_bev(boxes_a, boxes_b)
    za0 = (boxes_a[:, 2] - boxes_a[:, 5] / 2)[:, None]
    za1 = (boxes_a[:, 2] + boxes_a[:, 5] / 2)[:, None]
    zb0 = (boxes_b[:, 2] - boxes_b[:, 5] / 2)[None, :]
    zb1 = (boxes_b[:, 2] + boxes_b[:, 5] / 2)[None, :]
    dz = jnp.maximum(jnp.minimum(za1, zb1) - jnp.maximum(za0, zb0), 0.0)
    inter = inter_bev * dz
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, _EPS)


def nms_rotated(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    iou_threshold: float,
    post_max: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy rotated NMS over fixed-shape inputs.

    boxes: (N, 5+) (already score-sorted or not — sorting happens here),
    scores: (N,), valid: (N,) bool. Returns (keep_idx (post_max,) int32 into
    the INPUT order with -1 padding, keep_count scalar).

    Matches pcdet `nms_gpu` semantics: candidates in descending score order;
    a box is suppressed if its BEV rotated IoU with any earlier KEPT box
    exceeds iou_threshold. Greedy NMS is a sequential recurrence, but a
    1024-step lax.scan costs ~1024 dispatch latencies on TPU; instead the
    recurrence is solved by fixpoint iteration on whole vectors:

        keep <- valid & not(any_{j<i} keep[j] & over[j, i])

    The greedy solution is the unique fixpoint, and every sweep extends the
    prefix on which the iterate agrees with it (entries [0, m) correct =>
    one application makes [0, m] correct, and in practice whole suppression
    chains resolve per sweep), so the while_loop runs a handful of
    (N, N)-masked-reduce sweeps instead of N scalar steps.
    """
    n = boxes.shape[0]
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg)                  # descending, invalid last
    sboxes = boxes[order]
    svalid = valid[order]

    iou = boxes_iou_bev(sboxes, sboxes)        # (N, N)
    # over[j, i]: j suppresses i (strictly earlier rank only)
    over = (iou > iou_threshold) & (
        jnp.arange(n)[:, None] < jnp.arange(n)[None, :]
    )

    def cond(state):
        kept, prev, it = state
        return jnp.any(kept != prev) & (it < n)

    def body(state):
        kept, _, it = state
        suppressed = jnp.any(kept[:, None] & over, axis=0)
        return svalid & ~suppressed, kept, it + 1

    kept, _, _ = jax.lax.while_loop(
        cond, body, (svalid, jnp.zeros(n, bool), jnp.int32(0))
    )
    keep_count = jnp.minimum(jnp.sum(kept), post_max)

    # compact kept ranks (ascending rank == descending score) to post_max
    rank = jnp.where(kept, jnp.arange(n), n)
    sel = jnp.argsort(rank)[:post_max]         # first keep_count are kept
    keep_idx = jnp.where(
        jnp.arange(post_max) < keep_count, order[sel], -1
    ).astype(jnp.int32)
    return keep_idx, keep_count
