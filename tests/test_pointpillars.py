"""PointPillars engine: voxelizer vs literal-pcdet oracle, coder
roundtrip, anchor layout, and the full jitted forward."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lidar_snow_sim_tpu.models import pointpillars as pp
from lidar_snow_sim_tpu.oracle import detector as oracle

TINY = pp.PointPillarsConfig(
    class_names=("Car", "Pedestrian"),
    point_cloud_range=(0.0, -8.0, -3.0, 16.0, 8.0, 1.0),
    voxel_size=(0.5, 0.5, 4.0),
    max_points_per_pillar=8,
    max_pillars=128,
    pfn_filters=(16,),
    layer_nums=(1, 1, 1),
    layer_strides=(2, 2, 2),
    num_filters=(16, 32, 64),
    upsample_strides=(1, 2, 4),
    num_upsample_filters=(16, 16, 16),
    anchor_sizes=((3.9, 1.6, 1.56), (0.8, 0.6, 1.73)),
    anchor_bottom_heights=(-1.78, -0.6),
    anchor_match_thresholds=(0.6, 0.5),
    anchor_unmatch_thresholds=(0.45, 0.35),
    nms_pre_max=64,
    nms_post_max=16,
)


def _cloud(rng, n, frac_out=0.1):
    pts = np.column_stack(
        [
            rng.uniform(-2, 18, n),
            rng.uniform(-10, 10, n),
            rng.uniform(-4, 2, n),
            rng.uniform(0, 1, n),
        ]
    ).astype(np.float32)
    return pts


@pytest.mark.parametrize("seed,n", [(0, 400), (1, 2000)])
def test_voxelize_matches_pcdet_oracle(seed, n):
    rng = np.random.default_rng(seed)
    pts = _cloud(rng, n)
    got = jax.jit(
        lambda p, v: pp.voxelize(p, v, TINY)
    )(jnp.asarray(pts), jnp.ones(n, bool))

    want_vox, want_coords, want_counts, want_pd, want_vd = oracle.voxelize(
        pts, TINY.point_cloud_range, TINY.voxel_size,
        TINY.max_points_per_pillar, TINY.max_pillars,
    )
    nv = int(got.num_pillars)
    assert nv == len(want_vox)
    np.testing.assert_array_equal(np.asarray(got.coords)[:nv], want_coords)
    np.testing.assert_array_equal(np.asarray(got.num_points)[:nv], want_counts)
    np.testing.assert_array_equal(np.asarray(got.pillars)[:nv], want_vox)
    assert int(got.points_dropped) == want_pd
    assert int(got.pillars_dropped) == want_vd


def test_voxelize_overflow_counted():
    # 300 distinct pillars > max_pillars=128, 20 points in one pillar > 8
    xs = (np.arange(300) % 32) * 0.5 + 0.1
    ys = (np.arange(300) // 32) * 0.5 - 7.9
    many = np.column_stack(
        [xs, ys, np.zeros(300), np.ones(300)]
    ).astype(np.float32)
    dup = np.tile(np.array([[5.1, 0.1, 0.0, 1.0]], np.float32), (20, 1))
    pts = np.concatenate([many, dup])
    got = pp.voxelize(jnp.asarray(pts), jnp.ones(len(pts), bool), TINY)
    assert int(got.pillars_dropped) > 0
    assert int(got.points_dropped) > 0
    w = oracle.voxelize(
        pts, TINY.point_cloud_range, TINY.voxel_size,
        TINY.max_points_per_pillar, TINY.max_pillars,
    )
    assert int(got.pillars_dropped) == w[4]
    assert int(got.points_dropped) == w[3]


@pytest.mark.parametrize("n", [1000, 40000])
def test_voxelize_large_max_pillars(n):
    # pcdet's stock config uses max_pillars=40000. At that vmax the packed
    # (run counter, rank) i32 key only fits for n <= ~32k points, so
    # voxelize statically falls back to the rank gather for dense clouds
    # (ADVICE r3). Oracle-check both regimes: n=1000 takes the packed path
    # (shift=16), n=40000 the gather fallback.
    import dataclasses

    big = dataclasses.replace(TINY, max_pillars=40000)
    rng = np.random.default_rng(n)
    pts = _cloud(rng, n)
    got = jax.jit(lambda p, v: pp.voxelize(p, v, big))(
        jnp.asarray(pts), jnp.ones(n, bool)
    )
    want_vox, want_coords, want_counts, want_pd, want_vd = oracle.voxelize(
        pts, big.point_cloud_range, big.voxel_size,
        big.max_points_per_pillar, big.max_pillars,
    )
    nv = int(got.num_pillars)
    assert nv == len(want_vox)
    np.testing.assert_array_equal(np.asarray(got.coords)[:nv], want_coords)
    np.testing.assert_array_equal(np.asarray(got.num_points)[:nv], want_counts)
    np.testing.assert_array_equal(np.asarray(got.pillars)[:nv], want_vox)
    assert int(got.points_dropped) == want_pd
    assert int(got.pillars_dropped) == want_vd


def test_coder_roundtrip():
    rng = np.random.default_rng(3)
    anchors = np.column_stack(
        [
            rng.uniform(0, 16, 32), rng.uniform(-8, 8, 32),
            rng.uniform(-2, 0, 32),
            rng.uniform(1, 4, 32), rng.uniform(1, 2, 32),
            rng.uniform(1, 2, 32),
            rng.uniform(-np.pi, np.pi, 32),
        ]
    ).astype(np.float32)
    gt = anchors + rng.normal(0, 0.1, anchors.shape).astype(np.float32)
    enc = pp.encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    dec = pp.decode_boxes(enc, jnp.asarray(anchors))
    np.testing.assert_allclose(np.asarray(dec), gt, atol=1e-4)


def test_anchor_grid_layout():
    anchors = pp.generate_anchors(TINY)
    h, w = TINY.feature_map_size
    assert anchors.shape == (h, w, 4, 7)  # 2 classes x 2 rotations
    # class-major then rotation: slots [car_0, car_90, ped_0, ped_90]
    assert anchors[0, 0, 0, 3] == pytest.approx(3.9)
    assert anchors[0, 0, 1, 3] == pytest.approx(3.9)
    assert anchors[0, 0, 1, 6] == pytest.approx(1.5707963)
    assert anchors[0, 0, 2, 3] == pytest.approx(0.8)
    # corners span the range (pcdet align_center=False)
    assert anchors[0, 0, 0, 0] == pytest.approx(0.0)
    assert anchors[0, -1, 0, 0] == pytest.approx(16.0)
    assert anchors[0, 0, 0, 1] == pytest.approx(-8.0)
    assert anchors[-1, 0, 0, 1] == pytest.approx(8.0)
    # z = bottom + h/2
    assert anchors[0, 0, 0, 2] == pytest.approx(-1.78 + 1.56 / 2)


def test_param_shapes_and_init():
    shapes = pp.param_shapes(TINY)
    params = pp.init_params(TINY, jax.random.PRNGKey(0))
    assert set(params) == set(shapes)
    for k, s in shapes.items():
        assert params[k].shape == tuple(s), k
    # pcdet head init specials
    prior = -np.log((1 - 0.01) / 0.01)
    np.testing.assert_allclose(
        np.asarray(params["dense_head.conv_cls.bias"]), prior
    )
    assert float(jnp.std(params["dense_head.conv_box.weight"])) < 0.01
    # every BN affine weight is 1
    np.testing.assert_allclose(
        np.asarray(params["backbone_2d.blocks.0.2.weight"]), 1.0
    )


def test_full_forward_jits_and_is_deterministic():
    rng = np.random.default_rng(11)
    pts = _cloud(rng, 600)
    params = pp.init_params(TINY, jax.random.PRNGKey(1))
    anchors = jnp.asarray(pp.generate_anchors(TINY))

    fn = jax.jit(
        lambda p, v: pp.detect(p, v, params, anchors, TINY)
    )
    out1 = fn(jnp.asarray(pts), jnp.ones(len(pts), bool))
    out2 = fn(jnp.asarray(pts), jnp.ones(len(pts), bool))
    assert out1.boxes.shape == (TINY.nms_post_max, 7)
    assert out1.scores.shape == (TINY.nms_post_max,)
    np.testing.assert_array_equal(np.asarray(out1.boxes), np.asarray(out2.boxes))
    k = int(out1.count)
    assert 0 <= k <= TINY.nms_post_max
    arr = pp.predictions_array(out1)
    assert arr.shape == (k, 9)
    if k:
        assert set(np.unique(arr[:, 7])) <= {1.0, 2.0}
        assert np.all(arr[:, 8] > TINY.score_thresh)
    # padding rows beyond count are zeroed
    assert np.all(np.asarray(out1.scores)[k:] == 0)


def test_padded_points_do_not_change_results():
    rng = np.random.default_rng(5)
    pts = _cloud(rng, 300)
    params = pp.init_params(TINY, jax.random.PRNGKey(1))
    anchors = jnp.asarray(pp.generate_anchors(TINY))

    out_a = pp.detect(
        jnp.asarray(pts), jnp.ones(300, bool), params, anchors, TINY
    )
    padded = np.concatenate([pts, np.full((50, 4), 7.77, np.float32)])
    valid = np.array([True] * 300 + [False] * 50)
    out_b = pp.detect(
        jnp.asarray(padded), jnp.asarray(valid), params, anchors, TINY
    )
    np.testing.assert_array_equal(
        np.asarray(out_a.boxes), np.asarray(out_b.boxes)
    )
    np.testing.assert_array_equal(
        np.asarray(out_a.scores), np.asarray(out_b.scores)
    )


def test_config_from_openpcdet_yaml(tmp_path):
    yaml_text = """
CLASS_NAMES: ['Car', 'Pedestrian', 'Cyclist']
DATA_CONFIG:
    POINT_CLOUD_RANGE: [0, -39.68, -3, 69.12, 39.68, 1]
    DATA_PROCESSOR:
        - NAME: mask_points_and_boxes_outside_range
        - NAME: transform_points_to_voxels
          VOXEL_SIZE: [0.16, 0.16, 4]
          MAX_POINTS_PER_VOXEL: 32
          MAX_NUMBER_OF_VOXELS: {train: 16000, test: 40000}
MODEL:
    NAME: PointPillar
    VFE:
        NAME: PillarVFE
        NUM_FILTERS: [64]
    BACKBONE_2D:
        NAME: BaseBEVBackbone
        LAYER_NUMS: [3, 5, 5]
        LAYER_STRIDES: [2, 2, 2]
        NUM_FILTERS: [64, 128, 256]
        UPSAMPLE_STRIDES: [1, 2, 4]
        NUM_UPSAMPLE_FILTERS: [128, 128, 128]
    DENSE_HEAD:
        NAME: AnchorHeadSingle
        DIR_OFFSET: 0.78539
        DIR_LIMIT_OFFSET: 0.0
        NUM_DIR_BINS: 2
        ANCHOR_GENERATOR_CONFIG: [
            {class_name: Car, anchor_sizes: [[3.9, 1.6, 1.56]],
             anchor_rotations: [0, 1.57], anchor_bottom_heights: [-1.78],
             feature_map_stride: 2,
             matched_threshold: 0.6, unmatched_threshold: 0.45},
            {class_name: Pedestrian, anchor_sizes: [[0.8, 0.6, 1.73]],
             anchor_rotations: [0, 1.57], anchor_bottom_heights: [-0.6],
             feature_map_stride: 2,
             matched_threshold: 0.5, unmatched_threshold: 0.35},
            {class_name: Cyclist, anchor_sizes: [[1.76, 0.6, 1.73]],
             anchor_rotations: [0, 1.57], anchor_bottom_heights: [-0.6],
             feature_map_stride: 2,
             matched_threshold: 0.5, unmatched_threshold: 0.35},
        ]
    POST_PROCESSING:
        SCORE_THRESH: 0.1
        NMS_CONFIG:
            NMS_THRESH: 0.01
            NMS_PRE_MAXSIZE: 4096
            NMS_POST_MAXSIZE: 500
"""
    p = tmp_path / "pointpillar.yaml"
    p.write_text(yaml_text)
    cfg = pp.config_from_openpcdet_yaml(p)
    assert cfg.class_names == ("Car", "Pedestrian", "Cyclist")
    assert cfg.max_pillars == 40000
    assert cfg.grid_size == (432, 496, 1)
    assert cfg.feature_map_size == (248, 216)
    assert cfg.anchor_rotations == (0.0, 1.57)
    assert cfg.anchor_match_thresholds == (0.6, 0.5, 0.5)
    assert cfg.nms_post_max == 500
    shapes = pp.param_shapes(cfg)
    assert shapes["dense_head.conv_cls.weight"] == (18, 384, 1, 1)
    assert shapes["dense_head.conv_box.weight"] == (42, 384, 1, 1)
    assert shapes["vfe.pfn_layers.0.linear.weight"] == (64, 10)


@pytest.mark.parametrize("stride,cin,cout", [(1, 8, 16), (2, 8, 16), (4, 16, 8)])
def test_deconv_matches_torch(stride, cin, cout):
    """_deconv must reproduce torch ConvTranspose2d exactly — the checkpoint
    conversion contract (pcdet weights are (I, O, k, k)). The
    transpose_kernel=False/IOHW form convolves with the kernel spatially
    mirrored and silently breaks converted-.pth parity for k > 1."""
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, cin, 6, 6)).astype(np.float32)
    w = rng.standard_normal((cin, cout, stride, stride)).astype(np.float32)
    want = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=stride
    ).numpy()
    # _deconv IO is NHWC (TPU-native); the kernel layout stays torch OIHW
    got = np.asarray(pp._deconv(
        jnp.asarray(x).transpose(0, 2, 3, 1), jnp.asarray(w), stride
    )).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_voxelize_gather_matches_scatter_and_packed_bev():
    """The gather-built pillar buffer (cfg.pillar_gather, one packed i32
    scatter + sorted-run gathers) must be BIT-identical to the scatter
    path on every VoxelizeResult leaf — including under pillar/point
    drops — and the bitcast-packed BEV canvas (cfg.bev_packed) identical
    to the plain bf16 row scatter. These are the layout-only perf paths
    of the detector engine (perf ledger, round 5)."""
    import dataclasses

    rng = np.random.default_rng(11)
    n = 5000
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(0, 70, n)
    pts[:, 1] = rng.uniform(-40, 40, n)
    pts[:, 2] = rng.uniform(-3, 1, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    valid = rng.random(n) > 0.1
    # tiny caps force both drop counters to be nonzero
    cfg_g = dataclasses.replace(
        pp.PointPillarsConfig(), max_pillars=512, max_points_per_pillar=4,
        compute_dtype="bfloat16",
    )
    cfg_s = dataclasses.replace(cfg_g, pillar_gather=False, bev_packed=False)
    vg = pp.voxelize(jnp.asarray(pts), jnp.asarray(valid), cfg_g)
    vs = pp.voxelize(jnp.asarray(pts), jnp.asarray(valid), cfg_s)
    assert int(vg.points_dropped) > 0 and int(vg.pillars_dropped) > 0
    for f in vg._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(vg, f)), np.asarray(getattr(vs, f)), err_msg=f
        )
    pf = jnp.asarray(rng.standard_normal((512, 64)), jnp.bfloat16)
    bg = pp.scatter_bev(pf, vg, cfg_g)
    bs = pp.scatter_bev(pf, vs, cfg_s)
    np.testing.assert_array_equal(
        np.asarray(bg, np.float32), np.asarray(bs, np.float32)
    )


def test_two_stage_topk_matches_global_sort():
    """cfg.topk_block_m (two-stage exact top-k) must be BIT-identical to
    the global stable sort whenever no block hides more than m true-top
    members — including tie order — and must COUNT (never silently drop)
    a possible miss when one does."""
    import dataclasses

    cfg2 = dataclasses.replace(
        pp.PointPillarsConfig(), nms_pre_max=1024, compute_dtype="bfloat16"
    )
    cfg1 = dataclasses.replace(cfg2, topk_block_m=0)
    rng = np.random.default_rng(0)
    a = cfg2.num_anchors_per_loc
    h, w = cfg2.feature_map_size
    ncls = len(cfg2.class_names)
    anchors = jnp.asarray(pp.generate_anchors(cfg2))
    for scale in (0.3, 3.0):      # sparse and absurdly dense candidates
        cls_c = jnp.asarray(
            rng.normal(-3, scale, (a * ncls, h, w)), jnp.float32
        )
        box_c = jnp.asarray(rng.normal(0, 0.1, (a * 7, h, w)), jnp.float32)
        dir_c = jnp.asarray(rng.normal(0, 1, (a * 2, h, w)), jnp.float32)
        p1 = pp.post_process(cls_c, box_c, dir_c, anchors, cfg1)
        p2 = pp.post_process(cls_c, box_c, dir_c, anchors, cfg2)
        for f in ("boxes", "scores", "labels", "count", "nms_pre_overflow"):
            np.testing.assert_array_equal(
                np.asarray(getattr(p1, f)), np.asarray(getattr(p2, f)),
                err_msg=f,
            )
    # adversarial: 40 of the true top-64 packed into ONE 128-anchor block
    # (> m = 16) — the two-stage path must raise the overflow counter
    cfg2s = dataclasses.replace(cfg2, nms_pre_max=64, nms_post_max=32)
    cfg1s = dataclasses.replace(cfg2s, topk_block_m=0)
    logits = np.full((a * ncls, h, w), -9.0, np.float32)
    cls4 = logits.reshape(a, ncls, h, w)
    for j, fo in enumerate(rng.choice(128, 40, replace=False)):
        ix = 7 * 128 + int(fo)
        ai, rem = divmod(ix, h * w)
        yi, xi = divmod(rem, w)
        cls4[ai, 0, yi, xi] = 5.0 + 0.01 * j
    z7 = jnp.zeros((a * 7, h, w), jnp.float32)
    z2 = jnp.zeros((a * 2, h, w), jnp.float32)
    p1 = pp.post_process(jnp.asarray(logits), z7, z2, anchors, cfg1s)
    p2 = pp.post_process(jnp.asarray(logits), z7, z2, anchors, cfg2s)
    assert int(p2.nms_pre_overflow) > int(p1.nms_pre_overflow)


def test_voxel_active_points_prefix():
    """cfg.voxel_active_points slices the five voxelizer scatters to a
    static sorted prefix: BIT-identical whenever the scan's in-range
    count fits, with any in-range point beyond the prefix COUNTED in
    prefix_overflow (never silent) and threaded through detect()."""
    import dataclasses

    rng = np.random.default_rng(2)
    n = 8000
    pts = np.zeros((n, 4), np.float32)
    pts[:, 0] = rng.uniform(-70, 70, n)   # half behind the sensor
    pts[:, 1] = rng.uniform(-40, 40, n)
    pts[:, 2] = rng.uniform(-3, 1, n)
    pts[:, 3] = rng.uniform(0, 1, n)
    valid = rng.random(n) > 0.05
    base = dataclasses.replace(
        pp.PointPillarsConfig(), max_pillars=4096, compute_dtype="bfloat16"
    )
    v0 = pp.voxelize(jnp.asarray(pts), jnp.asarray(valid), base)
    big = dataclasses.replace(base, voxel_active_points=6144)
    v1 = pp.voxelize(jnp.asarray(pts), jnp.asarray(valid), big)
    for f in v0._fields:
        np.testing.assert_array_equal(
            np.asarray(getattr(v0, f)), np.asarray(getattr(v1, f)),
            err_msg=f,
        )
    small = dataclasses.replace(base, voxel_active_points=1024)
    v2 = pp.voxelize(jnp.asarray(pts), jnp.asarray(valid), small)
    assert int(v2.prefix_overflow) > 0
    # a straddling run's count covers only its scattered rows: counts
    # must never exceed the number of actually-written slots
    assert int(jnp.sum(v2.num_points)) <= 1024
    # threaded through the public entry
    params = pp.init_params(small, jax.random.PRNGKey(0))
    anchors = jnp.asarray(pp.generate_anchors(small))
    preds = pp.detect(
        jnp.asarray(pts), jnp.asarray(valid), params, anchors, small
    )
    assert int(preds.prefix_overflow) == int(v2.prefix_overflow)
