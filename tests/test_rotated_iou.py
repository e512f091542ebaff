"""Rotated BEV IoU + NMS vs the float64 Sutherland-Hodgman oracle."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from lidar_snow_sim_tpu.oracle import detector as oracle
from lidar_snow_sim_tpu.ops import rotated_iou as dev


def _random_boxes(rng, n, angle_scale=np.pi):
    return np.column_stack(
        [
            rng.uniform(-10, 10, n),
            rng.uniform(-10, 10, n),
            rng.uniform(0.5, 6.0, n),
            rng.uniform(0.5, 4.0, n),
            rng.uniform(-angle_scale, angle_scale, n),
        ]
    ).astype(np.float32)


def test_identical_boxes_iou_one():
    b = np.array([[1.0, 2.0, 4.0, 2.0, 0.7]], np.float32)
    iou = np.asarray(dev.boxes_iou_bev(jnp.asarray(b), jnp.asarray(b)))
    assert iou[0, 0] == pytest.approx(1.0, abs=1e-5)


def test_disjoint_boxes_iou_zero():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.3]], np.float32)
    b = np.array([[100.0, 0.0, 2.0, 2.0, -0.9]], np.float32)
    iou = np.asarray(dev.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    assert iou[0, 0] == 0.0


def test_axis_aligned_exact():
    # 2x2 squares offset by 1 in x: inter 2, union 6
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]], np.float32)
    b = np.array([[1.0, 0.0, 2.0, 2.0, 0.0]], np.float32)
    iou = np.asarray(dev.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    assert iou[0, 0] == pytest.approx(2.0 / 6.0, abs=1e-5)


def test_rotated_45_cross():
    # unit square vs itself rotated 45 deg: octagon, area 2*(sqrt(2)-1)
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.0]], np.float32)
    b = np.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]], np.float32)
    inter = np.asarray(dev.boxes_overlap_bev(jnp.asarray(a), jnp.asarray(b)))
    assert inter[0, 0] == pytest.approx(2 * (np.sqrt(2) - 1), abs=1e-4)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_iou_matrix_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    a = _random_boxes(rng, 12)
    b = _random_boxes(rng, 9)
    got = np.asarray(dev.boxes_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    want = oracle.iou_bev(a, b)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_iou3d_matches_oracle():
    rng = np.random.default_rng(7)
    a = np.column_stack(
        [
            rng.uniform(-5, 5, 8), rng.uniform(-5, 5, 8),
            rng.uniform(-1, 1, 8),
            rng.uniform(1, 5, 8), rng.uniform(1, 3, 8),
            rng.uniform(1, 2, 8),
            rng.uniform(-np.pi, np.pi, 8),
        ]
    ).astype(np.float32)
    got = np.asarray(dev.boxes_iou3d(jnp.asarray(a), jnp.asarray(a)))
    want = oracle.iou3d(a, a)
    np.testing.assert_allclose(got, want, atol=2e-3)
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-4)


@pytest.mark.parametrize("seed", [3, 4])
def test_nms_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n = 24
    boxes = _random_boxes(rng, n)
    # cluster some boxes so suppression actually happens
    boxes[12:18, :2] = boxes[:6, :2] + rng.normal(0, 0.3, (6, 2))
    scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
    keep_idx, count = dev.nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.ones(n, bool), iou_threshold=0.2, post_max=n,
    )
    got = [int(i) for i in np.asarray(keep_idx)[: int(count)]]
    want = oracle.nms_rotated(boxes, scores, 0.2)
    assert got == want


def test_nms_respects_validity_and_post_max():
    boxes = np.tile(np.array([[0.0, 0.0, 2.0, 2.0, 0.0]], np.float32), (8, 1))
    boxes[:, 0] = np.arange(8) * 10.0  # all disjoint
    scores = np.linspace(1.0, 0.3, 8).astype(np.float32)
    valid = np.array([True] * 6 + [False] * 2)
    keep_idx, count = dev.nms_rotated(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.01, post_max=4,
    )
    assert int(count) == 4
    assert list(np.asarray(keep_idx)) == [0, 1, 2, 3]
