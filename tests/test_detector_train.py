"""Detector training: target assignment semantics, loss behavior, and the
dp-sharded train step (pcdet AnchorHeadTemplate contract)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lidar_snow_sim_tpu.models import detector_train as dt
from lidar_snow_sim_tpu.models import pointpillars as pp
from tests.test_pointpillars import TINY, _cloud


def _flat_anchors():
    return jnp.asarray(pp.generate_anchors(TINY)).reshape(-1, 7)


def _gt(rows):
    g = np.zeros((8, 8), np.float32)
    for i, r in enumerate(rows):
        g[i] = r
    return jnp.asarray(g)


def test_assign_exact_anchor_is_positive():
    anchors = _flat_anchors()
    # gt == some car anchor exactly -> iou 1 -> positive with its class
    target = np.asarray(anchors[400])  # class 0 (car) slot at some cell
    a_idx = 400
    assert (a_idx % TINY.num_anchors_per_loc) // 2 == 0
    gt = _gt([list(target) + [1.0]])
    labels, reg_t, reg_w = dt.assign_targets(anchors, gt, TINY)
    labels = np.asarray(labels)
    assert labels[a_idx] == 1
    # its regression target is the zero residual
    np.testing.assert_allclose(np.asarray(reg_t[a_idx]), 0.0, atol=1e-5)
    assert np.asarray(reg_w)[a_idx] == 1.0
    # anchors far away are background, not ignore
    assert labels[0] == 0
    # the same box with class 2 must not match car anchors
    gt2 = _gt([list(target) + [2.0]])
    labels2 = np.asarray(dt.assign_targets(anchors, gt2, TINY)[0])
    assert labels2[a_idx] == 0 or labels2[a_idx] == -1


def test_assign_force_match_low_iou_gt():
    anchors = _flat_anchors()
    # a tiny pedestrian box between grid cells: best iou < matched
    # threshold, but pcdet force-matches the argmax anchor
    gt = _gt([[5.27, 1.13, -0.5, 0.4, 0.3, 1.0, 0.3, 2.0]])
    labels, _, reg_w = dt.assign_targets(anchors, gt, TINY)
    labels = np.asarray(labels)
    assert (labels == 2).sum() >= 1
    assert np.asarray(reg_w).sum() >= 1


def test_assign_ignore_band():
    anchors = _flat_anchors()
    # overlap engineered between unmatched (0.45) and matched (0.6) for car:
    # shift a car-sized gt by ~a quarter length
    base = np.asarray(anchors[400])
    shifted = base.copy()
    shifted[0] += base[3] * 0.28
    gt = _gt([list(shifted) + [1.0]])
    labels = np.asarray(dt.assign_targets(anchors, gt, TINY)[0])
    # the exact anchor is in the ignore band OR positive via force-match —
    # but never background
    assert labels[400] != 0
    # and SOME anchor is positive (force match guarantees it)
    assert (labels == 1).sum() >= 1


def test_empty_gt_all_background():
    anchors = _flat_anchors()
    labels, _reg_t, reg_w = dt.assign_targets(anchors, _gt([]), TINY)
    assert np.all(np.asarray(labels) == 0)
    assert float(jnp.sum(reg_w)) == 0.0


def test_loss_decreases_on_fixed_scene():
    rng = np.random.default_rng(0)
    b, n = 2, 500
    pts = np.stack([_cloud(rng, n) for _ in range(b)])
    valid = np.ones((b, n), bool)
    anchors = pp.generate_anchors(TINY)
    flat = jnp.asarray(anchors).reshape(-1, 7)
    # gts sitting on anchors so positives exist
    gt = np.zeros((b, 8, 8), np.float32)
    gt[0, 0, :7] = np.asarray(flat[400]); gt[0, 0, 7] = 1
    gt[1, 0, :7] = np.asarray(flat[2001]); gt[1, 0, 7] = (2001 % 4) // 2 + 1
    params = pp.init_params(TINY, jax.random.PRNGKey(0))

    import optax

    step, init = dt.make_train_step(TINY, anchors, optax.adam(1e-3))
    step = jax.jit(step)
    state = init(params)
    losses = []
    for _ in range(8):
        state, m = step(
            state, jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(gt)
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert float(m["num_pos"]) >= 1
    assert losses[-1] < losses[0] * 0.9, losses
    # BN running stats actually moved
    rm = state.params["backbone_2d.blocks.0.2.running_mean"]
    assert float(jnp.abs(rm).sum()) > 0


def test_train_step_dp_sharded_matches_unsharded():
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs >= 4 virtual devices")
    ndev = 4
    rng = np.random.default_rng(1)
    b, n = ndev, 400
    pts = np.stack([_cloud(rng, n) for _ in range(b)])
    valid = np.ones((b, n), bool)
    anchors = pp.generate_anchors(TINY)
    flat = np.asarray(anchors).reshape(-1, 7)
    gt = np.zeros((b, 8, 8), np.float32)
    for i in range(b):
        gt[i, 0, :7] = flat[100 + 37 * i]
        gt[i, 0, 7] = ((100 + 37 * i) % 4) // 2 + 1
    params = pp.init_params(TINY, jax.random.PRNGKey(2))

    opt = optax.sgd(1e-3)  # moment-free: keeps the comparison exact-ish
    step, init = dt.make_train_step(TINY, anchors, opt)
    state0 = init(params)
    ref_state, ref_m = jax.jit(step)(
        state0, jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(gt)
    )

    mesh = Mesh(np.array(devs[:ndev]), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    sp = jax.device_put(jnp.asarray(pts), sharding)
    sv = jax.device_put(jnp.asarray(valid), sharding)
    sg = jax.device_put(jnp.asarray(gt), sharding)
    with mesh:
        sh_state, sh_m = jax.jit(step)(state0, sp, sv, sg)

    np.testing.assert_allclose(
        float(sh_m["loss"]), float(ref_m["loss"]), rtol=2e-5
    )
    for k in ref_state.params:
        np.testing.assert_allclose(
            np.asarray(sh_state.params[k]),
            np.asarray(ref_state.params[k]),
            atol=1e-5,
            err_msg=k,
        )


def test_train_forward_honors_compute_dtype():
    """cfg.compute_dtype must not be a silent no-op in training: the bf16
    path rides the MXU like the inference path (forward_features) and its
    head outputs differ numerically from the f32 run."""
    import dataclasses

    rng = np.random.default_rng(7)
    pts = jnp.asarray(_cloud(rng, 256))[None]
    valid = jnp.ones((1, 256), bool)
    params = pp.init_params(TINY, jax.random.PRNGKey(0))

    outs = {}
    for dtype in ("float32", "bfloat16"):
        cfg = dataclasses.replace(TINY, compute_dtype=dtype)
        cls, box, dir_, _ = jax.jit(
            lambda p, v: dt.train_forward(p, v, params, cfg)
        )(pts, valid)
        assert cls.dtype == jnp.float32  # head re-casts to f32
        assert np.isfinite(np.asarray(cls)).all()
        outs[dtype] = np.asarray(cls)
    assert not np.array_equal(outs["float32"], outs["bfloat16"])
