"""pcdet DataAugmentor equivalents: world transforms + gt-sampling DB."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lidar_snow_sim_tpu.models.detector_augment import (  # noqa: E402
    GTSampleDB,
    WorldAugmentConfig,
    _bev_intersects,
    _points_in_box,
    parse_sample_groups,
    world_augment,
)


def _frame(rng, n=512, g=4, gmax=8):
    pts = rng.uniform([-20, -20, -2, 0], [20, 20, 1, 1], (n, 4)).astype(
        np.float32
    )
    gt = np.zeros((gmax, 8), np.float32)
    gt[:g, 0] = rng.uniform(-15, 15, g)
    gt[:g, 1] = rng.uniform(-15, 15, g)
    gt[:g, 2] = rng.uniform(-1.0, 0.0, g)
    gt[:g, 3:6] = [4.0, 1.8, 1.6]
    gt[:g, 6] = rng.uniform(-np.pi, np.pi, g)
    gt[:g, 7] = rng.integers(1, 3, g)
    return pts, gt


def test_world_augment_deterministic_and_varied():
    rng = np.random.default_rng(0)
    pts, gt = _frame(rng)
    p = jnp.asarray(pts[None])
    g = jnp.asarray(gt[None])
    k = jax.random.PRNGKey(7)
    p1, g1 = world_augment(k, p, g)
    p2, g2 = world_augment(k, p, g)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    p3, _ = world_augment(jax.random.PRNGKey(8), p, g)
    assert not np.allclose(np.asarray(p1), np.asarray(p3))


def test_world_augment_boxes_and_points_transform_together():
    """Interior points must stay interior under flip+rotation+scaling."""
    rng = np.random.default_rng(1)
    _, gt = _frame(rng, g=6)
    # build points ON the boxes: center + jittered offsets inside each box
    pts = []
    for row in gt[gt[:, 7] > 0]:
        c, s = np.cos(row[6]), np.sin(row[6])
        for _ in range(16):
            lx = rng.uniform(-0.45, 0.45) * row[3]
            ly = rng.uniform(-0.45, 0.45) * row[4]
            lz = rng.uniform(-0.45, 0.45) * row[5]
            pts.append([
                row[0] + lx * c - ly * s,
                row[1] + lx * s + ly * c,
                row[2] + lz,
                0.5,
            ])
    pts = np.asarray(pts, np.float32)
    for row, p in zip(gt[gt[:, 7] > 0], np.split(pts, 6)):
        assert _points_in_box(p, row[:7]).all()  # sanity pre-transform

    for seed in range(4):
        ap, ag = world_augment(
            jax.random.PRNGKey(seed), jnp.asarray(pts[None]),
            jnp.asarray(gt[None]),
        )
        ap, ag = np.asarray(ap)[0], np.asarray(ag)[0]
        for i, row in enumerate(ag[ag[:, 7] > 0]):
            chunk = ap[16 * i: 16 * (i + 1)]
            assert _points_in_box(chunk, row[:7]).all(), (seed, i)


def test_world_augment_semantics():
    """Flip negates y and yaw; scaling multiplies everything spatial;
    rotation preserves radii. Checked against a hand computation with the
    draws extracted from the same key stream."""
    pts = np.array([[3.0, 4.0, -1.0, 0.7]], np.float32)
    gt = np.zeros((1, 8), np.float32)
    gt[0] = [6.0, -2.0, -0.5, 4.0, 1.8, 1.6, 0.3, 1.0]
    k = jax.random.PRNGKey(3)
    ap, ag = world_augment(k, jnp.asarray(pts[None]), jnp.asarray(gt[None]))
    ap, ag = np.asarray(ap)[0], np.asarray(ag)[0]

    kf, kr, ks = jax.random.split(k, 3)
    flip = bool(jax.random.bernoulli(kf, 0.5, (1,))[0])
    ang = float(jax.random.uniform(
        kr, (1,), minval=-np.pi / 4, maxval=np.pi / 4)[0])
    sc = float(jax.random.uniform(ks, (1,), minval=0.95, maxval=1.05)[0])

    y = -4.0 if flip else 4.0
    want_x = (3.0 * np.cos(ang) - y * np.sin(ang)) * sc
    want_y = (3.0 * np.sin(ang) + y * np.cos(ang)) * sc
    np.testing.assert_allclose(ap[0, :3], [want_x, want_y, -sc], rtol=1e-5)
    assert ap[0, 3] == np.float32(0.7)  # intensity untouched
    gy = 2.0 if flip else -2.0
    gyaw = (-0.3 if flip else 0.3) + ang
    np.testing.assert_allclose(
        ag[0, :7],
        [
            (6.0 * np.cos(ang) - gy * np.sin(ang)) * sc,
            (6.0 * np.sin(ang) + gy * np.cos(ang)) * sc,
            -0.5 * sc, 4.0 * sc, 1.8 * sc, 1.6 * sc, gyaw,
        ],
        rtol=1e-5,
    )
    assert ag[0, 7] == 1.0  # class id untouched


def test_bev_intersects_exact_cases():
    a = np.array([[0, 0, 0, 4.0, 2.0, 1.0, 0.0]], np.float32)
    # touching-but-rotated, clearly-overlapping, clearly-separate
    rot45 = np.array([[3.0, 0, 0, 4.0, 2.0, 1.0, np.pi / 4]], np.float32)
    over = np.array([[1.0, 0.5, 0, 4.0, 2.0, 1.0, 0.7]], np.float32)
    far = np.array([[10.0, 0, 0, 4.0, 2.0, 1.0, 0.2]], np.float32)
    assert _bev_intersects(a, over)[0, 0]
    assert not _bev_intersects(a, far)[0, 0]
    # rotated box at x=3: its closest corner reaches 3 - sqrt(2)*... compute:
    # half-diagonal along -x is (4/2*cos45 + 2/2*sin45) = 2.121 -> reaches
    # 0.879 < a's +x face at 2.0 -> overlap
    assert _bev_intersects(a, rot45)[0, 0]


def _labeled_corpus(tmp_path, n_frames=6):
    """Synthetic corpus: .bin scans + KITTI label files with boxes that
    contain points."""
    rng = np.random.default_rng(42)
    scans = tmp_path / "scans"
    labels = tmp_path / "labels"
    scans.mkdir()
    labels.mkdir()
    for f in range(n_frames):
        pts = rng.uniform([-20, -20, -2, 0], [20, 20, 1, 255], (3000, 4))
        rows = []
        for b in range(3):
            cx, cy = rng.uniform(-12, 12, 2)
            yaw = rng.uniform(-np.pi, np.pi)
            name = "PassengerCar" if b % 2 == 0 else "Pedestrian"
            l, w, h = (4.0, 1.8, 1.6) if b % 2 == 0 else (0.8, 0.7, 1.8)
            # cluster of points inside the box
            local = rng.uniform(-0.4, 0.4, (30, 3)) * [l, w, h]
            c, s = np.cos(yaw), np.sin(yaw)
            world = np.column_stack([
                cx + local[:, 0] * c - local[:, 1] * s,
                cy + local[:, 0] * s + local[:, 1] * c,
                -0.5 + local[:, 2],
                rng.uniform(0, 255, 30),
            ])
            pts = np.concatenate([pts, world])
            # z in the file is box BOTTOM (read_label_file adds h/2)
            rows.append(
                f"{name} 0 0 0 0 0 50 50 {h} {w} {l} "
                f"{cx} {cy} {-0.5 - h / 2} {yaw}"
            )
        stem = f"frame_{f:04d}"
        pad5 = np.zeros((len(pts), 5), np.float32)
        pad5[:, :4] = pts
        pad5.tofile(scans / f"{stem}.bin")
        (labels / f"{stem}.txt").write_text("\n".join(rows) + "\n")
    return scans, labels


def test_gt_sample_db_build_and_paste(tmp_path):
    scans, labels = _labeled_corpus(tmp_path)
    class_names = ("PassengerCar", "Pedestrian")
    db = GTSampleDB.build(scans, labels, class_names, min_points=5)
    st = db.stats()
    assert st["PassengerCar"] >= 6 and st["Pedestrian"] >= 6

    name_to_id = {n: i + 1 for i, n in enumerate(class_names)}
    # a scene with one existing box and padded points
    rng = np.random.default_rng(5)
    pts, gt = _frame(rng, n=400, g=1, gmax=16)
    pts[380:, :3] = 1e3  # padding rows
    groups = parse_sample_groups("PassengerCar:5,Pedestrian:4")
    out_pts, out_gt, n_pasted = db.sample_into(
        np.random.default_rng(0), pts, gt, groups, name_to_id
    )
    assert n_pasted > 0
    assert out_pts.shape == pts.shape and out_gt.shape == gt.shape
    new = out_gt[out_gt[:, 7] > 0]
    assert len(new) == 1 + n_pasted

    # no pasted box may overlap any other box in BEV
    inter = _bev_intersects(new[:, :7], new[:, :7])
    np.fill_diagonal(inter, False)
    assert not inter.any()

    # pasted boxes carry their interior points; scene points inside them
    # were removed, so every point inside a pasted box must come from the db
    live = out_pts[~np.all(out_pts[:, :3] >= 1e3, axis=1)]
    for row in new[1:]:
        inside = live[_points_in_box(live, row[:7])]
        assert len(inside) >= 5

    # determinism under the same rng seed
    out2 = db.sample_into(
        np.random.default_rng(0), pts, gt, groups, name_to_id
    )
    np.testing.assert_array_equal(out_pts, out2[0])
    np.testing.assert_array_equal(out_gt, out2[1])

    # class totals never exceed the requested counts
    for name, want in groups.items():
        have = int(np.sum(new[:, 7] == name_to_id[name]))
        assert have <= want


def test_gt_sampling_respects_existing_boxes(tmp_path):
    """Samples colliding with a scene box must be rejected."""
    scans, labels = _labeled_corpus(tmp_path, n_frames=3)
    class_names = ("PassengerCar", "Pedestrian")
    db = GTSampleDB.build(scans, labels, class_names, min_points=5)
    name_to_id = {n: i + 1 for i, n in enumerate(class_names)}

    # a scene box placed exactly on top of one db entry
    box7, _ = db.entries["PassengerCar"][0]
    gt = np.zeros((8, 8), np.float32)
    gt[0, :7] = box7
    gt[0, 7] = 1.0
    pts = np.random.default_rng(2).uniform(
        [-20, -20, -2, 0], [20, 20, 1, 1], (200, 4)
    ).astype(np.float32)
    out_pts, out_gt, n = db.sample_into(
        np.random.default_rng(1), pts, gt, {"PassengerCar": 8}, name_to_id
    )
    new = out_gt[out_gt[:, 7] > 0]
    inter = _bev_intersects(new[:, :7], new[:, :7])
    np.fill_diagonal(inter, False)
    assert not inter.any()


def test_parse_sample_groups():
    assert parse_sample_groups("Car:15, Pedestrian:10") == {
        "Car": 15, "Pedestrian": 10,
    }
    assert parse_sample_groups("") == {}
