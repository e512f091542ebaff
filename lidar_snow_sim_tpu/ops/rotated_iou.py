"""BEV rotated-rectangle IoU and fixed-shape greedy NMS (pure JAX).

TPU-native equivalent of the rotated-box geometry the reference consumes
from OpenPCDet (`pcdet.ops.iou3d_nms` — CUDA polygon clipping) for its live
inference path (`pointcloud_viewer.py:2388-2436`). OpenPCDet's post
processing runs class-agnostic rotated NMS over BEV footprints of the
predicted (x, y, z, dx, dy, dz, heading) boxes; training-side target
assignment uses the same BEV rotated overlap (AxisAlignedTargetAssigner
with MATCH_HEIGHT False).

Design: instead of a data-dependent Sutherland–Hodgman loop, the convex
quad–quad intersection polygon's vertices are enumerated as a FIXED set of
24 candidates (4 corners of A inside B, 4 of B inside A, 16 edge–edge
crossings), masked, angle-sorted around their mean, and integrated with the
shoelace formula (invalid slots collapse onto the first valid vertex, so
their edge contributions vanish). Everything is a fixed-shape elementwise /
small-sort computation that vmaps over arbitrary pair batches — no
data-dependent control flow, no scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8
_BIG = 1e30


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


def _point_in_rect(px, py, rect):
    """Point-in-rectangle via the rect's local frame (rect = (5,) box)."""
    x, y, dx, dy, h = (rect[i] for i in range(5))
    c, s = jnp.cos(h), jnp.sin(h)
    tx = px - x
    ty = py - y
    lx = tx * c + ty * s
    ly = -tx * s + ty * c
    # pcdet's check_in_box2d uses a 1e-5 margin on the half extents; keep a
    # small epsilon so shared-edge corners count as inside (area-neutral).
    return (jnp.abs(lx) <= 0.5 * dx + 1e-5) & (jnp.abs(ly) <= 0.5 * dy + 1e-5)


def _seg_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-edge crossing candidates of two quads.

    ca, cb: (4, 2) corner arrays. Returns (16, 2) points + (16,) validity.
    """
    a0 = ca                                   # (4, 2)
    a1 = jnp.roll(ca, -1, axis=0)
    b0 = cb
    b1 = jnp.roll(cb, -1, axis=0)

    # pairwise: i indexes A edges, j indexes B edges
    p = a0[:, None, :]                        # (4, 1, 2)
    r = (a1 - a0)[:, None, :]
    q = b0[None, :, :]                        # (1, 4, 2)
    s = (b1 - b0)[None, :, :]

    rxs = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]       # (4, 4)
    qp = q - p
    qpxr = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    qpxs = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    denom = jnp.where(jnp.abs(rxs) < _EPS, 1.0, rxs)
    t = qpxs / denom
    u = qpxr / denom
    ok = (jnp.abs(rxs) >= _EPS) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    pt = p + t[..., None] * r                                  # (4, 4, 2)
    return pt.reshape(16, 2), ok.reshape(16)


def _pair_intersection_area(box_a: jnp.ndarray, box_b: jnp.ndarray):
    """Intersection area of two BEV rectangles ((5,) boxes each)."""
    ca = box_corners_bev(box_a)               # (4, 2)
    cb = box_corners_bev(box_b)

    in_b = _point_in_rect(ca[:, 0], ca[:, 1], box_b)           # (4,)
    in_a = _point_in_rect(cb[:, 0], cb[:, 1], box_a)
    cross, cross_ok = _seg_intersections(ca, cb)

    pts = jnp.concatenate([ca, cb, cross], axis=0)             # (24, 2)
    valid = jnp.concatenate([in_b, in_a, cross_ok], axis=0)    # (24,)
    n_valid = jnp.sum(valid)

    # angular sort around the valid-point mean; invalid slots go last
    w = valid.astype(jnp.float32)
    center = jnp.sum(pts * w[:, None], axis=0) / jnp.maximum(n_valid, 1)
    ang = jnp.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    ang = jnp.where(valid, ang, _BIG)
    order = jnp.argsort(ang)
    pts = pts[order]
    valid = valid[order]

    # collapse invalid slots onto the first valid vertex -> degenerate edges
    first = pts[0]                                             # valid iff any
    pts = jnp.where(valid[:, None], pts, first[None, :])

    nxt = jnp.roll(pts, -1, axis=0)
    area2 = jnp.sum(pts[:, 0] * nxt[:, 1] - nxt[:, 0] * pts[:, 1])
    area = 0.5 * jnp.abs(area2)
    return jnp.where(n_valid >= 3, area, 0.0)


def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise BEV rotated IoU matrix.

    boxes_a: (N, 5+) [x, y, dx, dy, heading, ...]; boxes_b: (M, 5+).
    Accepts 7-DoF boxes (x, y, z, dx, dy, dz, heading) too — columns are
    picked by name order, matching pcdet's boxes_iou_bev BEV projection.
    Returns (N, M) float32.
    """
    a5 = _as_bev5(boxes_a)
    b5 = _as_bev5(boxes_b)
    inter = jax.vmap(
        lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(b5)
    )(a5)
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
    return jax.vmap(
        lambda a: jax.vmap(lambda b: _pair_intersection_area(a, b))(b5)
    )(a5)


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
    exceeds iou_threshold. The scan is over score rank (serial like every
    greedy NMS), with the pairwise IoU matrix precomputed in one shot.
    """
    n = boxes.shape[0]
    neg = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-neg)                  # descending, invalid last
    sboxes = boxes[order]
    svalid = valid[order]

    iou = boxes_iou_bev(sboxes, sboxes)        # (N, N)
    over = iou > iou_threshold

    def body(suppressed, i):
        keep_i = svalid[i] & ~suppressed[i]
        suppressed = suppressed | (keep_i & over[i] & (jnp.arange(n) > i))
        return suppressed, keep_i

    _, kept = jax.lax.scan(body, jnp.zeros(n, bool), jnp.arange(n))
    keep_count = jnp.minimum(jnp.sum(kept), post_max)

    # compact kept ranks (ascending rank == descending score) to post_max
    rank = jnp.where(kept, jnp.arange(n), n)
    sel = jnp.argsort(rank)[:post_max]         # first keep_count are kept
    keep_idx = jnp.where(
        jnp.arange(post_max) < keep_count, order[sel], -1
    ).astype(jnp.int32)
    return keep_idx, keep_count
