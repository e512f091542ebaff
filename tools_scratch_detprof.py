"""Ad-hoc micro-attribution: voxelize internals + post_process internals."""
import dataclasses as dc
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

from lidar_snow_sim_tpu.calib import load_hdl64_calib
from lidar_snow_sim_tpu.models import pointpillars as pp
from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud
from lidar_snow_sim_tpu.utils.synthetic import synthetic_scan

BATCH = 4


def build_scene():
    calib = load_hdl64_calib()
    pc = synthetic_scan(n_azimuth=870, seed=0, calib=calib)
    return pad_cloud(pc, 1 << int(np.ceil(np.log2(len(pc)))))


def main():
    cfg = dc.replace(pp.PointPillarsConfig(), nms_pre_max=1024,
                     compute_dtype="bfloat16")
    params = pp.init_params(cfg, jax.random.PRNGKey(0))
    params["dense_head.conv_cls.weight"] = (
        params["dense_head.conv_cls.weight"] * 0.01
    )
    anchors = jnp.asarray(pp.generate_anchors(cfg))
    padded = build_scene()
    pts4 = np.asarray(padded.points)[:, :4].copy()
    pts4[:, 3] /= 255.0
    pts_b = jnp.broadcast_to(jnp.asarray(pts4), (BATCH,) + pts4.shape)
    msk_b = jnp.broadcast_to(jnp.asarray(padded.mask),
                             (BATCH,) + padded.mask.shape)

    n = pts4.shape[0]
    vmax, pmax = cfg.max_pillars, cfg.max_points_per_pillar
    r = cfg.point_cloud_range
    nx, ny, nz = cfg.grid_size

    def vox_sort(p, m):
        points, valid = p, m
        ix = jnp.floor((points[:, 0] - r[0]) / cfg.voxel_size[0]).astype(jnp.int32)
        iy = jnp.floor((points[:, 1] - r[1]) / cfg.voxel_size[1]).astype(jnp.int32)
        iz = jnp.floor((points[:, 2] - r[2]) / cfg.voxel_size[2]).astype(jnp.int32)
        in_range = (valid & (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                    & (iz >= 0) & (iz < nz))
        vid = jnp.where(in_range, (iz * ny + iy) * nx + ix,
                        jnp.int32(2**31 - 1))
        idx = jnp.arange(n, dtype=jnp.int32)
        outs = jax.lax.sort(
            (vid, idx, in_range.astype(jnp.int32),
             points[:, 0], points[:, 1], points[:, 2], points[:, 3]),
            num_keys=1)
        return sum(jnp.sum(o.astype(jnp.float32)) for o in outs)

    def vox_ranks(p, m):
        points, valid = p, m
        ix = jnp.floor((points[:, 0] - r[0]) / cfg.voxel_size[0]).astype(jnp.int32)
        iy = jnp.floor((points[:, 1] - r[1]) / cfg.voxel_size[1]).astype(jnp.int32)
        iz = jnp.floor((points[:, 2] - r[2]) / cfg.voxel_size[2]).astype(jnp.int32)
        in_range = (valid & (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                    & (iz >= 0) & (iz < nz))
        vid = jnp.where(in_range, (iz * ny + iy) * nx + ix,
                        jnp.int32(2**31 - 1))
        idx = jnp.arange(n, dtype=jnp.int32)
        svid, sidx, sval32, c0, c1, c2, c3 = jax.lax.sort(
            (vid, idx, in_range.astype(jnp.int32),
             points[:, 0], points[:, 1], points[:, 2], points[:, 3]),
            num_keys=1)
        sval = sval32.astype(bool)
        boundary = jnp.concatenate([jnp.ones((1,), bool),
                                    svid[1:] != svid[:-1]])
        head = boundary & sval
        pos = jnp.arange(n, dtype=jnp.int32)
        head_pos = jax.lax.cummax(jnp.where(head, pos, -1))
        head_key = jnp.where(head, sidx, jnp.int32(n))
        _, run_rank_order = jax.lax.sort((head_key, pos), num_keys=1)
        _, rank_of_pos = jax.lax.sort((run_rank_order, pos), num_keys=1)
        vrank = rank_of_pos[jnp.maximum(head_pos, 0)]
        return (jnp.sum(vrank.astype(jnp.float32))
                + jnp.sum(c0) + jnp.sum(c1) + jnp.sum(c2) + jnp.sum(c3))

    def vox_full(p, m):
        v = pp.voxelize(p, m, cfg)
        return (jnp.sum(v.pillars) + jnp.sum(v.coords.astype(jnp.float32))
                + jnp.sum(v.num_points.astype(jnp.float32)))

    def pp_sort_only(p, m):
        cls, box, dir_, vox = pp.forward_features(p, m, params, cfg)
        scores_all = jax.nn.sigmoid(cls.reshape(-1, cls.shape[-1]))
        scores = jnp.max(scores_all, axis=-1)
        ok = scores > cfg.score_thresh
        masked = jnp.where(ok, scores, -1.0)
        _, top_ix = jax.lax.sort(
            (-masked, jnp.arange(masked.shape[0], dtype=jnp.int32)),
            num_keys=1)
        return jnp.sum(top_ix[:cfg.nms_pre_max].astype(jnp.float32))

    def pp_decode(p, m):
        cls, box, dir_, vox = pp.forward_features(p, m, params, cfg)
        scores_all = jax.nn.sigmoid(cls.reshape(-1, cls.shape[-1]))
        scores = jnp.max(scores_all, axis=-1)
        ok = scores > cfg.score_thresh
        masked = jnp.where(ok, scores, -1.0)
        _, top_ix = jax.lax.sort(
            (-masked, jnp.arange(masked.shape[0], dtype=jnp.int32)),
            num_keys=1)
        top_ix = top_ix[:cfg.nms_pre_max]
        boxes = pp.decode_boxes(box.reshape(-1, 7)[top_ix],
                                anchors.reshape(-1, 7)[top_ix])
        dl = jnp.argmax(dir_.reshape(-1, cfg.num_dir_bins)[top_ix], axis=-1)
        return jnp.sum(boxes) + jnp.sum(dl.astype(jnp.float32))

    def full(p, m):
        out = pp.detect(p, m, params, anchors, cfg)
        return jnp.sum(out.scores)

    for name, fn in [("vox_sort", vox_sort), ("vox_ranks", vox_ranks),
                     ("vox_full", vox_full), ("pp_sort", pp_sort_only),
                     ("pp_decode", pp_decode), ("full", full)]:
        vfn = jax.vmap(fn, in_axes=(0, 0))

        def chain(pts, msk, n_):
            def body(c, _):
                s = jnp.sum(vfn(c, msk))
                return pts + s * 0.0, s
            _, ss = jax.lax.scan(body, pts, None, length=n_)
            return ss

        cj = jax.jit(chain, static_argnames=("n_",))

        def run(k, reps=3):
            ts = []
            for _ in range(reps):
                t0 = time.time()
                np.asarray(cj(pts_b, msk_b, k))
                ts.append(time.time() - t0)
            return min(ts)

        t_s = run(2)
        t_l = run(18)
        dt = (t_l - t_s) / 16
        print(f"{name:10s} {dt / BATCH * 1e3:7.3f} ms/scan", flush=True)


if __name__ == "__main__":
    main()
