"""TPU-native PointPillars detector (OpenPCDet-compatible).

The reference's live-inference path (`pointcloud_viewer.py:2388-2498`) builds
an OpenPCDet network from an experiment directory (`init_config` picks the
``*.yaml``, `init_model` the ``*.pth``), feeds the currently displayed cloud
through ``model.forward`` and renders ``pred_boxes/pred_labels/pred_scores``
as a (N, 9) prediction array (`:2428-2436`). This module provides the same
contract TPU-first:

- parameters are a flat ``{openpcdet_state_dict_name: array}`` dict, so a
  trained OpenPCDet checkpoint converts mechanically
  (`tools/convert_checkpoint.py`) and `init_params` creates the same shapes
  from scratch;
- the whole forward pass is one jittable fixed-shape function: sort-based
  pillar voxelization (no serial voxel hashing), PFN matmul, one unique-index
  BEV scatter, an NCHW conv backbone that rides the MXU, and a fixed-shape
  rotated NMS (`ops/rotated_iou.py`);
- every capacity (pillars, points/pillar, NMS pre/post) is static, with
  dropped-work COUNTERS in the output — OpenPCDet itself truncates voxels
  and points silently; here the truncation is reproduced (it is reference
  semantics) but counted.

Semantics follow the public OpenPCDet PointPillars implementation consumed
by the reference (`pcdet/models/detectors/pointpillar.py` and friends —
the submodule is not checked into the reference snapshot, so hyperparameters
are carried by `PointPillarsConfig` and can be loaded from the experiment's
own yaml via `config_from_openpcdet_yaml`): PillarVFE 10-feature encoding,
PointPillarScatter, BaseBEVBackbone (3 stages + upsample concat),
AnchorHeadSingle with the 7-DoF residual box coder and two direction bins.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Mapping, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_snow_sim_tpu.ops.rotated_iou import nms_rotated

_BN_EPS = 1e-3  # pcdet uses BatchNorm(eps=1e-3, momentum=0.01) throughout


@dataclasses.dataclass(frozen=True)
class PointPillarsConfig:
    """Static PointPillars hyperparameters (OpenPCDet yaml equivalents).

    Defaults mirror OpenPCDet's public ``pointpillar.yaml`` (KITTI); the
    DENSE experiments ship their own yaml inside the experiment directory,
    which `config_from_openpcdet_yaml` maps onto these fields.
    """

    class_names: tuple = ("Car", "Pedestrian", "Cyclist")
    # DATA_CONFIG.POINT_CLOUD_RANGE [x0, y0, z0, x1, y1, z1]
    point_cloud_range: tuple = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    # DATA_PROCESSOR transform_points_to_voxels
    voxel_size: tuple = (0.16, 0.16, 4.0)
    max_points_per_pillar: int = 32
    max_pillars: int = 12000
    # MODEL.VFE
    pfn_filters: tuple = (64,)
    # MODEL.BACKBONE_2D
    layer_nums: tuple = (3, 5, 5)
    layer_strides: tuple = (2, 2, 2)
    num_filters: tuple = (64, 128, 256)
    upsample_strides: tuple = (1, 2, 4)
    num_upsample_filters: tuple = (128, 128, 128)
    # MODEL.DENSE_HEAD (AnchorHeadSingle); one (sizes, bottom, rots) per class
    anchor_sizes: tuple = (
        (3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)
    )
    anchor_bottom_heights: tuple = (-1.78, -0.6, -0.6)
    anchor_rotations: tuple = (0.0, 1.5707963)
    anchor_match_thresholds: tuple = (0.6, 0.5, 0.5)
    anchor_unmatch_thresholds: tuple = (0.45, 0.35, 0.35)
    feature_map_stride: int = 2
    dir_offset: float = 0.78539
    dir_limit_offset: float = 0.0
    num_dir_bins: int = 2
    # MODEL.POST_PROCESSING
    score_thresh: float = 0.1
    nms_thresh: float = 0.01
    nms_pre_max: int = 4096
    nms_post_max: int = 500
    # compute dtype for the conv backbone ("float32" | "bfloat16"); bf16
    # feeds the MXU at 2x, outputs/decodes stay f32
    compute_dtype: str = "float32"
    # build the (V, P, 4) pillar buffer by GATHERING sorted-run windows
    # instead of four n-update f32 scatters (bit-identical either way).
    # MEASURED SLOWER on chip (round 5, same-session interleaved A/B at
    # batch 4: 53.0 vs 34.8 ms/step) — the (4, V*P)-cell column gather
    # costs more than the four n-update scatters it replaces. Kept as an
    # A/B arm (tools/ab.py detect 'g=pillar_gather:1').
    pillar_gather: bool = False
    # bitcast-pack bf16 canvas updates to i32 pairs before the BEV row
    # scatter (halves scattered cells; bit-identical). MEASURED a wash-to-
    # slightly-worse (round 5 A/B: 56.2 vs 53.0 ms/step, ~1x spread) —
    # the scatter is per-update-row-bound, not per-cell-bound, at V=12k.
    bev_packed: bool = False
    # two-stage exact top-k in post_process: per-128-anchor-block top-m
    # candidates (one minor-dim sort) feed the final nms_pre_max sort —
    # ~8x fewer rows than the global ~321k sort. Selection completeness
    # is PROVEN per step (a missed anchor must STRICTLY beat the weakest
    # selected score from behind some block's m-th pick) and any possible
    # miss is COUNTED into nms_pre_overflow, never silent. Bit-identical
    # to the global stable sort for distinct scores (tie order included);
    # under EXACT score ties spanning a block's top-m boundary (untrained
    # bf16 nets mass-produce these) a different tied representative may
    # be selected — both orders are valid pcdet tie semantics, and real
    # trained-score ties are measure-zero. 0 = global sort.
    topk_block_m: int = 16
    # static scatter-update prefix for the voxelizer: after the vid sort
    # every in-range point sits in a prefix (sentinel vids sort last), so
    # the five pillar/coords scatters — near-serial per UPDATE on TPU —
    # can process only the first `voxel_active_points` sorted rows.
    # EXACT whenever the scan's in-range count fits (bit-identical;
    # points beyond the prefix are COUNTED into points_dropped, never
    # silent). 0 = all n rows (always exact).
    voxel_active_points: int = 0

    @property
    def grid_size(self) -> tuple:
        """(nx, ny, nz) full-resolution voxel grid."""
        r = self.point_cloud_range
        v = self.voxel_size
        return (
            int(round((r[3] - r[0]) / v[0])),
            int(round((r[4] - r[1]) / v[1])),
            int(round((r[5] - r[2]) / v[2])),
        )

    @property
    def feature_map_size(self) -> tuple:
        """(ny_f, nx_f) anchor/head grid (backbone output stride)."""
        nx, ny, _ = self.grid_size
        s = self.feature_map_stride
        return (ny // s, nx // s)

    @property
    def num_anchors_per_loc(self) -> int:
        return len(self.class_names) * len(self.anchor_rotations)


def config_from_openpcdet_yaml(path) -> PointPillarsConfig:
    """Parse the subset of an OpenPCDet experiment yaml this engine needs.

    Mirrors the fields `init_config` touches (`pointcloud_viewer.py:
    2438-2457`); unknown sections are ignored so any pointpillar-family
    experiment yaml loads.
    """
    import yaml

    with open(path) as f:
        cfg = yaml.safe_load(f)

    kw: dict = {}
    if "CLASS_NAMES" in cfg:
        kw["class_names"] = tuple(cfg["CLASS_NAMES"])
    data = cfg.get("DATA_CONFIG", {})
    if "POINT_CLOUD_RANGE" in data:
        kw["point_cloud_range"] = tuple(float(v) for v in data["POINT_CLOUD_RANGE"])
    for proc in data.get("DATA_PROCESSOR", []):
        if proc.get("NAME") == "transform_points_to_voxels":
            kw["voxel_size"] = tuple(float(v) for v in proc["VOXEL_SIZE"])
            kw["max_points_per_pillar"] = int(proc["MAX_POINTS_PER_VOXEL"])
            mv = proc.get("MAX_NUMBER_OF_VOXELS", {})
            if isinstance(mv, Mapping):
                kw["max_pillars"] = int(mv.get("test", mv.get("train", 12000)))
            else:
                kw["max_pillars"] = int(mv)
    model = cfg.get("MODEL", {})
    vfe = model.get("VFE", {})
    if "NUM_FILTERS" in vfe:
        kw["pfn_filters"] = tuple(int(v) for v in vfe["NUM_FILTERS"])
    bb = model.get("BACKBONE_2D", {})
    for src, dst in (
        ("LAYER_NUMS", "layer_nums"), ("LAYER_STRIDES", "layer_strides"),
        ("NUM_FILTERS", "num_filters"),
        ("UPSAMPLE_STRIDES", "upsample_strides"),
        ("NUM_UPSAMPLE_FILTERS", "num_upsample_filters"),
    ):
        if src in bb:
            kw[dst] = tuple(int(v) for v in bb[src])
    head = model.get("DENSE_HEAD", {})
    agc = head.get("ANCHOR_GENERATOR_CONFIG", [])
    if agc:
        kw["anchor_sizes"] = tuple(
            tuple(float(x) for x in a["anchor_sizes"][0]) for a in agc
        )
        kw["anchor_bottom_heights"] = tuple(
            float(a["anchor_bottom_heights"][0]) for a in agc
        )
        kw["anchor_rotations"] = tuple(
            float(r) for r in agc[0]["anchor_rotations"]
        )
        kw["anchor_match_thresholds"] = tuple(
            float(a["matched_threshold"]) for a in agc
        )
        kw["anchor_unmatch_thresholds"] = tuple(
            float(a["unmatched_threshold"]) for a in agc
        )
        kw["feature_map_stride"] = int(
            agc[0].get("feature_map_stride", 2)
        )
    if "DIR_OFFSET" in head:
        kw["dir_offset"] = float(head["DIR_OFFSET"])
    if "DIR_LIMIT_OFFSET" in head:
        kw["dir_limit_offset"] = float(head["DIR_LIMIT_OFFSET"])
    if "NUM_DIR_BINS" in head:
        kw["num_dir_bins"] = int(head["NUM_DIR_BINS"])
    post = model.get("POST_PROCESSING", {})
    if "SCORE_THRESH" in post:
        kw["score_thresh"] = float(post["SCORE_THRESH"])
    nms = post.get("NMS_CONFIG", {})
    if "NMS_THRESH" in nms:
        kw["nms_thresh"] = float(nms["NMS_THRESH"])
    if "NMS_PRE_MAXSIZE" in nms:
        kw["nms_pre_max"] = int(nms["NMS_PRE_MAXSIZE"])
    if "NMS_POST_MAXSIZE" in nms:
        kw["nms_post_max"] = int(nms["NMS_POST_MAXSIZE"])
    return PointPillarsConfig(**kw)


# ---------------------------------------------------------------------------
# parameters


def param_shapes(cfg: PointPillarsConfig) -> dict:
    """{openpcdet_state_dict_name: shape} for every learnable/stat array."""
    shapes: dict = {}

    def bn(prefix, c):
        shapes[f"{prefix}.weight"] = (c,)
        shapes[f"{prefix}.bias"] = (c,)
        shapes[f"{prefix}.running_mean"] = (c,)
        shapes[f"{prefix}.running_var"] = (c,)

    in_ch = 10
    for i, c in enumerate(cfg.pfn_filters):
        shapes[f"vfe.pfn_layers.{i}.linear.weight"] = (c, in_ch)
        bn(f"vfe.pfn_layers.{i}.norm", c)
        in_ch = c

    c_in = cfg.pfn_filters[-1]
    for i, (n, s, c) in enumerate(
        zip(cfg.layer_nums, cfg.layer_strides, cfg.num_filters)
    ):
        # Sequential [ZeroPad2d, Conv2d, BN, ReLU, (Conv2d, BN, ReLU) * n]
        shapes[f"backbone_2d.blocks.{i}.1.weight"] = (c, c_in, 3, 3)
        bn(f"backbone_2d.blocks.{i}.2", c)
        for j in range(n):
            shapes[f"backbone_2d.blocks.{i}.{3 * j + 4}.weight"] = (c, c, 3, 3)
            bn(f"backbone_2d.blocks.{i}.{3 * j + 5}", c)
        c_in = c
    for i, (u, c, cu) in enumerate(
        zip(cfg.upsample_strides, cfg.num_filters, cfg.num_upsample_filters)
    ):
        if u >= 1:
            # ConvTranspose2d(c, cu, u, stride=u): torch weight (in, out, k, k)
            shapes[f"backbone_2d.deblocks.{i}.0.weight"] = (c, cu, u, u)
        else:  # downsample conv variant (stride 1/u)
            k = int(round(1 / u))
            shapes[f"backbone_2d.deblocks.{i}.0.weight"] = (cu, c, k, k)
        bn(f"backbone_2d.deblocks.{i}.1", cu)

    c_cat = sum(cfg.num_upsample_filters)
    a = cfg.num_anchors_per_loc
    ncls = len(cfg.class_names)
    shapes["dense_head.conv_cls.weight"] = (a * ncls, c_cat, 1, 1)
    shapes["dense_head.conv_cls.bias"] = (a * ncls,)
    shapes["dense_head.conv_box.weight"] = (a * 7, c_cat, 1, 1)
    shapes["dense_head.conv_box.bias"] = (a * 7,)
    shapes["dense_head.conv_dir_cls.weight"] = (a * cfg.num_dir_bins, c_cat, 1, 1)
    shapes["dense_head.conv_dir_cls.bias"] = (a * cfg.num_dir_bins,)
    return shapes


def init_params(cfg: PointPillarsConfig, key: jax.Array) -> dict:
    """Random-init parameters (kaiming-style fans; pcdet head init:
    conv_cls bias = -log((1-0.01)/0.01), conv_box.weight ~ N(0, 0.001)).

    Every 1-D `.weight` in the shape table is a BN affine (the PFN linear
    and all convs are bias-free except the three head convs), so init is
    decided by shape: 1-D weight -> 1, bias/mean -> 0, var -> 1."""
    shapes = param_shapes(cfg)
    params: dict = {}
    keys = jax.random.split(key, len(shapes))
    for (name, shape), k in zip(sorted(shapes.items()), keys):
        if name == "dense_head.conv_cls.bias":
            params[name] = jnp.full(
                shape, -math.log((1 - 0.01) / 0.01), jnp.float32
            )
        elif name == "dense_head.conv_box.weight":
            params[name] = 0.001 * jax.random.normal(k, shape, jnp.float32)
        elif len(shape) == 1:
            one = name.endswith(("running_var",)) or name.endswith(".weight")
            params[name] = (
                jnp.ones(shape, jnp.float32) if one
                else jnp.zeros(shape, jnp.float32)
            )
        else:
            fan_in = int(np.prod(shape[1:]))
            std = math.sqrt(2.0 / max(fan_in, 1))
            params[name] = std * jax.random.normal(k, shape, jnp.float32)
    return params


# ---------------------------------------------------------------------------
# voxelization


class VoxelizeResult(NamedTuple):
    """Pillar tensors + truncation counters (a pytree)."""

    pillars: Any         # (V, P, 4)
    coords: Any          # (V, 3) int32, (z, y, x)
    num_points: Any      # (V,) int32
    num_pillars: Any     # scalar int32
    points_dropped: Any  # scalar int32
    pillars_dropped: Any  # scalar int32
    prefix_overflow: Any = 0  # in-range points beyond voxel_active_points


def voxelize(points: jnp.ndarray, valid: jnp.ndarray,
             cfg: PointPillarsConfig) -> VoxelizeResult:
    """Fixed-shape pillar voxelization with OpenPCDet VoxelGenerator
    semantics: pillars ordered by FIRST APPEARANCE of their voxel in the
    point stream, each keeping its first `max_points_per_pillar` points in
    stream order; pillars beyond `max_pillars` and points beyond the
    per-pillar cap are dropped (as pcdet does) but COUNTED.

    points: (N, 4) [x, y, z, feat]; valid: (N,) bool.
    Returns pillars (V, P, 4), coords (V, 3) int32 (z, y, x order — pcdet's
    coordinate convention), num_points (V,), num_pillars scalar, and the
    points_dropped / pillars_dropped counters. Implementation is three
    multi-operand sorts + per-column unique-index scatters — no serial
    hashing, no data-dependent shapes. Ledger-driven layout (BASELINE.md):
    the point columns ride the voxel-id sort as payload operands instead
    of being gathered afterwards, the first-appearance rank permutation is
    inverted by a (perm, iota) sort instead of a scatter, and the pillar
    buffer fills with four 1-D scatters instead of one (N, 4) row scatter
    (slope-measured 25.6 -> ~7 ms/step at batch 4 on-chip).
    """
    n = points.shape[0]
    vmax, pmax = cfg.max_pillars, cfg.max_points_per_pillar
    r = cfg.point_cloud_range
    nx, ny, nz = cfg.grid_size

    ix = jnp.floor((points[:, 0] - r[0]) / cfg.voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((points[:, 1] - r[1]) / cfg.voxel_size[1]).astype(jnp.int32)
    iz = jnp.floor((points[:, 2] - r[2]) / cfg.voxel_size[2]).astype(jnp.int32)
    in_range = (
        valid
        & (ix >= 0) & (ix < nx)
        & (iy >= 0) & (iy < ny)
        & (iz >= 0) & (iz < nz)
    )
    vid = jnp.where(in_range, (iz * ny + iy) * nx + ix, jnp.int32(2**31 - 1))

    idx = jnp.arange(n, dtype=jnp.int32)
    # ONE stable sort by vid: stream order within runs is automatic, and
    # the point columns ride along as payload operands (== lexsort((idx,
    # vid)) + four per-index gathers, without the gathers). Validity does
    # NOT ride as an operand: it is recomputed from the sentinel key
    # (multi-operand sort cost scales with total payload width).
    svid, sidx, c0, c1, c2, c3 = jax.lax.sort(
        (vid, idx,
         points[:, 0], points[:, 1], points[:, 2], points[:, 3]),
        num_keys=1,
    )
    sval = svid != jnp.int32(2**31 - 1)

    boundary = jnp.concatenate(
        [jnp.ones((1,), bool), svid[1:] != svid[:-1]]
    )
    head = boundary & sval
    # position of the current run's head (positions ascend, so cummax works)
    pos = jnp.arange(n, dtype=jnp.int32)
    head_pos = jax.lax.cummax(jnp.where(head, pos, -1))
    within = pos - head_pos                       # rank inside the pillar

    # pillar rank = first-appearance order = rank of the head's stream idx
    # among heads (at a head, head_pos == pos, so sidx IS the head's stream
    # idx — no gather); the rank permutation is inverted by a second
    # (perm, iota) sort — a 50k inverse-permutation scatter is near-serial
    # on TPU
    head_key = jnp.where(head, sidx, jnp.int32(n))
    _, run_rank_order = jax.lax.sort((head_key, pos), num_keys=1)
    _, rank_of_pos = jax.lax.sort((run_rank_order, pos), num_keys=1)
    # Distribute each head's rank down its run WITHOUT the 50k-index
    # rank_of_pos[head_pos] gather (1-D gathers pay PER-INDEX on TPU —
    # perf ledger): head ranks are NOT monotone in sorted position
    # (first appearance can order a later run earlier), so a plain cummax
    # of masked ranks is wrong — instead pack (run counter, clamped rank)
    # into one monotone i32 key. cumsum(head) is nondecreasing and strictly
    # increases at heads, so within a run the head's packed key dominates
    # and cummax copies it forward; ranks are clamped to vmax (shift bits)
    # which preserves the only two consumers: `vrank < vmax` and the
    # head_slot sentinel at vmax. When (n heads, vmax) can't fit a packed
    # i32 — e.g. pcdet's stock max_pillars=40000 with dense clouds — fall
    # back to the rank gather (slower, always correct). n and vmax are
    # trace-time constants, so the branch is static.
    shift = max(vmax, 1).bit_length()  # clamped rank can equal vmax
    if n <= ((1 << 31) - 1 - vmax) >> shift:
        run_ctr = jnp.cumsum(head.astype(jnp.int32))
        packed = run_ctr * (1 << shift) + jnp.where(
            head, jnp.minimum(rank_of_pos, vmax), 0
        )
        vrank = jax.lax.cummax(packed) & ((1 << shift) - 1)
    else:
        # head_pos is -1 only before the first head, where sval (and thus
        # every consumer mask) is False — clamp to 0 for a safe gather.
        vrank = rank_of_pos[jnp.maximum(head_pos, 0)]

    ok = sval & (vrank < vmax) & (within < pmax)
    points_dropped = jnp.sum(sval & ~ok)  # over-cap or dropped-pillar points
    # static scatter prefix (see cfg.voxel_active_points): valid rows live
    # in a sorted prefix, so slicing the scatter updates to ap rows is
    # bit-identical whenever sum(sval) <= ap; in-range points beyond the
    # prefix are COUNTED (they are dropped points, same contract as the
    # over-cap drops above)
    ap = cfg.voxel_active_points
    prefix_overflow = jnp.int32(0)
    if not ap or ap >= n:
        ap = n
    else:
        prefix_overflow = jnp.sum(ok[ap:]).astype(jnp.int32)
    n_pillars_total = jnp.sum(head[:ap])
    num_pillars = jnp.minimum(n_pillars_total, vmax)
    pillars_dropped = n_pillars_total - num_pillars

    # per-pillar counts = min(run length, pmax) at the heads (every point
    # of a real-vid run is valid — invalid points carry the sentinel vid
    # and cluster in the final run). Run length = next boundary - head pos,
    # via an exclusive reverse cummin over boundary positions.
    head_slot = jnp.where(head & (vrank < vmax), vrank, vmax)
    hsel = head & (vrank < vmax)
    bpos = jnp.where(boundary, pos, jnp.int32(n))
    next_boundary = jnp.concatenate(
        [jax.lax.cummin(bpos[::-1])[::-1][1:], jnp.full((1,), n, jnp.int32)]
    )
    # run length clipped at the scatter prefix: a run straddling ap only
    # counts its scattered rows (no-op when ap == n, since boundaries
    # never exceed n; nonzero clipping implies counted prefix drops)
    rlen = jnp.minimum(jnp.minimum(next_boundary, ap) - pos, pmax)

    rbits = pmax.bit_length()  # rlen in [0, pmax]
    if cfg.pillar_gather and n <= ((1 << 31) - 1) >> rbits:
        # ONE packed (head position, run length) i32 scatter replaces BOTH
        # the four n-update f32 pillar-column scatters (~1.2 ms EACH at
        # batch 4 on chip — scatter cost scales with update count, near-
        # serial per row) and the separate coords/counts scatter. Pillars
        # are then GATHERED from the sorted columns: runs are contiguous in
        # sorted order, so pillar v slot p is sorted position
        # startpos[v] + p (p < counts[v]) — bit-identical to the scatter
        # path by construction (same points, zeros elsewhere; unwritten
        # slots decode to startpos 0 / count 0, so every consumer mask
        # sees the same benign values). Coords come from one vmax-scale
        # gather of the sorted vid plane at the head positions.
        packed = jnp.zeros((vmax + 1,), jnp.int32).at[head_slot[:ap]].set(
            jnp.where(hsel, (pos << rbits) | rlen, 0)[:ap], mode="drop"
        )[:-1]
        startpos = packed >> rbits
        counts = packed & ((1 << rbits) - 1)
        written = counts > 0  # hsel heads always have rlen >= 1
        pvid = jnp.where(written, svid[startpos], 0)
        coords = jnp.stack(
            [pvid // (nx * ny), (pvid // nx) % ny, pvid % nx], axis=-1
        )
        p_iota = jnp.arange(pmax, dtype=jnp.int32)[None, :]
        gidx = startpos[:, None] + p_iota                    # (V, P)
        gflat = jnp.where(p_iota < counts[:, None], gidx, n).reshape(-1)
        # one fused 4-row column gather (per-cell cost) with a zero
        # sentinel column at index n for dead slots
        cols4 = jnp.pad(
            jnp.stack([c0, c1, c2, c3], axis=0), ((0, 0), (0, 1))
        )                                                    # (4, n + 1)
        pillars = jnp.transpose(
            cols4[:, gflat].reshape(4, vmax, pmax), (1, 2, 0)
        )
    else:
        # scatter fallback (and A/B arm): four 1-D unique scatters instead
        # of one (N, 4) row scatter (row scatters pay per cell with a
        # padded minor dim; 1-D is ~2x)
        slot = jnp.where(ok, vrank * pmax + within, vmax * pmax)[:ap]
        cols = []
        for c in (c0, c1, c2, c3):
            col = jnp.zeros((vmax * pmax + 1,), points.dtype).at[slot].set(
                jnp.where(ok, c, 0.0)[:ap], mode="drop"
            )
            cols.append(col[:-1])
        pillars = jnp.stack(cols, axis=-1).reshape(vmax, pmax, 4)

        # coords + counts ride ONE packed i32 scatter when (svid, rlen)
        # fit 31 bits: packed = svid << b | rlen, b = bits(pmax).
        # Unwritten slots default to 0 -> svid 0, count 0. Lossless by
        # construction (svid < nz*ny*nx, rlen <= pmax); falls back to
        # per-column scatters when the static bit budget doesn't fit.
        if nz * ny * nx <= ((1 << 31) - 1) >> rbits:
            packed = jnp.zeros(
                (vmax + 1,), jnp.int32
            ).at[head_slot[:ap]].set(
                jnp.where(hsel, (svid << rbits) | rlen, 0)[:ap], mode="drop"
            )[:-1]
            pvid = packed >> rbits
            counts = packed & ((1 << rbits) - 1)
            coords = jnp.stack(
                [pvid // (nx * ny), (pvid // nx) % ny, pvid % nx], axis=-1
            )
        else:
            ccols = []
            for c in (svid // (nx * ny), (svid // nx) % ny, svid % nx):
                col = jnp.zeros(
                    (vmax + 1,), jnp.int32
                ).at[head_slot[:ap]].set(
                    jnp.where(hsel, c.astype(jnp.int32), 0)[:ap],
                    mode="drop",
                )
                ccols.append(col[:-1])
            coords = jnp.stack(ccols, axis=-1)
            counts = jnp.zeros((vmax + 1,), jnp.int32).at[head_slot[:ap]].set(
                jnp.where(hsel, rlen, 0)[:ap], mode="drop"
            )[:-1]

    return VoxelizeResult(
        pillars=pillars,
        coords=coords,
        num_points=counts,
        num_pillars=num_pillars,
        points_dropped=points_dropped,
        pillars_dropped=pillars_dropped,
        prefix_overflow=prefix_overflow,
    )


# ---------------------------------------------------------------------------
# network blocks


_BN_MOMENTUM = 0.01  # pcdet BatchNorm momentum


def _bn(x, params, prefix, axis=-1, *, train=False, stats=None, mask=None):
    """Batch norm (pcdet eps=1e-3, momentum=0.01).

    Inference: running stats. Training (train=True): batch statistics over
    every non-`axis` dim (optionally `mask`-weighted, for fixed-shape pads
    pcdet's dynamic shapes never see), with updated running stats written
    into the `stats` dict (same keys as params — merge after the step).
    """
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]

    def g(s):
        return params[f"{prefix}.{s}"].astype(x.dtype).reshape(shape)

    if train:
        red = tuple(i for i in range(x.ndim) if i != axis % x.ndim)
        xf = x.astype(jnp.float32)
        if mask is None:
            mean = jnp.mean(xf, axis=red)
            var = jnp.mean(jnp.square(xf), axis=red) - jnp.square(mean)
            nf = float(np.prod([x.shape[i] for i in red]))
            bessel = nf / max(nf - 1.0, 1.0)
        else:
            w = jnp.broadcast_to(mask.astype(jnp.float32), x.shape)
            n = jnp.maximum(jnp.sum(w, axis=red), 1.0)
            mean = jnp.sum(xf * w, axis=red) / n
            var = jnp.sum(jnp.square(xf) * w, axis=red) / n - jnp.square(mean)
            bessel = n / jnp.maximum(n - 1.0, 1.0)
        if stats is not None:
            # torch semantics: normalize with the biased batch variance but
            # update running_var with the UNBIASED one (Bessel-corrected) —
            # pinned by tests/test_pointpillars_torch_golden.py
            m = _BN_MOMENTUM
            stats[f"{prefix}.running_mean"] = (
                (1 - m) * params[f"{prefix}.running_mean"] + m * mean
            )
            stats[f"{prefix}.running_var"] = (
                (1 - m) * params[f"{prefix}.running_var"] + m * var * bessel
            )
        inv = jax.lax.rsqrt(var + _BN_EPS).astype(x.dtype).reshape(shape)
        mu = mean.astype(x.dtype).reshape(shape)
        return (x - mu) * inv * g("weight") + g("bias")

    inv = jax.lax.rsqrt(
        params[f"{prefix}.running_var"].astype(jnp.float32) + _BN_EPS
    ).astype(x.dtype).reshape(shape)
    return (x - g("running_mean")) * inv * g("weight") + g("bias")


def pillar_features(vox: VoxelizeResult, cfg: PointPillarsConfig):
    """PillarVFE's 10-feature encoding: [xyzi, cluster offset, center
    offset] with padded points zeroed (pcdet PillarVFE.forward)."""
    pts = vox.pillars                                     # (V, P, 4)
    cnt = jnp.maximum(vox.num_points, 1)[:, None, None].astype(pts.dtype)
    pmask = (
        jnp.arange(cfg.max_points_per_pillar)[None, :]
        < vox.num_points[:, None]
    )[..., None].astype(pts.dtype)                        # (V, P, 1)

    mean = jnp.sum(pts[..., :3] * pmask, axis=1, keepdims=True) / cnt
    f_cluster = pts[..., :3] - mean

    r = cfg.point_cloud_range
    vx, vy, vz = cfg.voxel_size
    cx = vox.coords[:, 2:3].astype(pts.dtype) * vx + (vx / 2 + r[0])
    cy = vox.coords[:, 1:2].astype(pts.dtype) * vy + (vy / 2 + r[1])
    cz = vox.coords[:, 0:1].astype(pts.dtype) * vz + (vz / 2 + r[2])
    f_center = jnp.stack(
        [
            pts[..., 0] - cx[:, None, 0],
            pts[..., 1] - cy[:, None, 0],
            pts[..., 2] - cz[:, None, 0],
        ],
        axis=-1,
    )
    feat = jnp.concatenate([pts, f_cluster, f_center], axis=-1)  # (V, P, 10)
    return feat * pmask


def pfn_forward(feat, params, cfg: PointPillarsConfig, *,
                train=False, stats=None, live=None):
    """PFN: linear -> BN -> ReLU -> max over points. (V, P, 10) -> (V, C).

    In training, batch stats are weighted by the `live` pillar mask —
    pcdet's pillar tensors are dynamically sized so dead fixed-shape slots
    must not dilute the statistics (padded POINTS inside a live pillar do
    contribute, as in pcdet)."""
    x = feat
    mask = None if live is None else live[..., None, None]
    for i, _c in enumerate(cfg.pfn_filters):
        w = params[f"vfe.pfn_layers.{i}.linear.weight"]    # (C, in)
        x = jnp.einsum("...pf,cf->...pc", x, w.astype(x.dtype))
        x = _bn(x, params, f"vfe.pfn_layers.{i}.norm",
                train=train, stats=stats, mask=mask)
        x = jax.nn.relu(x)
    return jnp.max(x, axis=-2)                             # (V, C)


def scatter_bev(pfeat, vox, cfg: PointPillarsConfig):
    """PointPillarScatter: (V, C) -> (ny, nx, C) via one unique scatter.

    NHWC output: the canvas scatter's natural (ny*nx, C) layout IS the
    conv input layout, so no transpose copy — the old (C, ny, nx) emit
    paid a full-canvas layout copy (~0.9 ms/step at batch 4 on chip).
    Dead pillars scatter to the out-of-bounds row ny*nx and are DROPPED
    (mode="drop") — no sentinel row, so no post-scatter slice copy. With
    cfg.bev_packed, bf16 feature pairs are bitcast-packed to i32 before
    the scatter (half the scattered cells, bit-identical on unpack)."""
    nx, ny, _ = cfg.grid_size
    v, c = pfeat.shape
    # counts-based liveness: equivalent to `arange < num_pillars` (real
    # pillar slots always hold >= 1 point; unwritten slots hold 0) and
    # robust under voxel_active_points prefix overflow, where rank-based
    # masks could admit a never-written ghost slot
    live = vox.num_points > 0
    flat_ix = jnp.where(
        live, vox.coords[:, 1] * nx + vox.coords[:, 2], ny * nx
    )
    upd = jnp.where(live[:, None], pfeat, 0)
    if cfg.bev_packed and pfeat.dtype == jnp.bfloat16 and c % 2 == 0:
        upd_i = jax.lax.bitcast_convert_type(
            upd.reshape(v, c // 2, 2), jnp.int32
        )
        canvas = jnp.zeros((ny * nx, c // 2), jnp.int32).at[flat_ix].set(
            upd_i, mode="drop"
        )
        return jax.lax.bitcast_convert_type(
            canvas, jnp.bfloat16
        ).reshape(ny, nx, c)
    canvas = jnp.zeros((ny * nx, c), pfeat.dtype).at[flat_ix].set(
        upd, mode="drop"
    )
    return canvas.reshape(ny, nx, c)


def _conv(x, w, stride=1, padding=1, out_chw=False):
    """NHWC conv with the torch OIHW kernel layout (checkpoint contract).

    NHWC is the TPU-native conv layout (channels on lanes); the old NCHW
    path paid layout-assignment copies around every stage. `out_chw`
    emits NCHW instead — used by the head's 1x1 convs, whose few output
    channels (12-72) would pad 2-10x as an NHWC minor dim while (c, h, w)
    tiles cleanly."""
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding)] * 2,
        dimension_numbers=("NHWC", "OIHW", "NCHW" if out_chw else "NHWC"),
    )


def _deconv(x, w, stride):
    # torch ConvTranspose2d(k=stride, stride=stride, pad 0): weight (I,O,k,k).
    # transpose_kernel=True + an OIHW spec is the form that reproduces torch
    # exactly (gradient-of-conv semantics: spatial flip + I/O swap applied to
    # the declared spec); the IOHW/False form convolves with the kernel
    # spatially mirrored and breaks .pth checkpoint parity for k > 1
    # (verified bit-exact against torch.nn.functional.conv_transpose2d —
    # tests/test_pointpillars.py::test_deconv_matches_torch). IO rides NHWC
    # (TPU-native); the kernel spec stays OIHW.
    return jax.lax.conv_transpose(
        x, w.astype(x.dtype), (stride, stride), "VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"), transpose_kernel=True,
    )


def backbone_forward(spatial, params, cfg: PointPillarsConfig, *,
                     train=False, stats=None):
    """BaseBEVBackbone: stages of stride-s conv + n 3x3 convs, each stage
    upsampled back to stride `feature_map_stride` and channel-concat.
    Accepts (ny, nx, C) single-frame or (B, ny, nx, C) batched NHWC input;
    returns (B, H, W, sum(num_upsample_filters)) NHWC."""
    x = spatial[None] if spatial.ndim == 3 else spatial
    ups = []
    for i, (n, s) in enumerate(zip(cfg.layer_nums, cfg.layer_strides)):
        # pcdet pads with ZeroPad2d(1) then convs with padding=0: same as
        # a padding-1 strided conv
        x = _conv(x, params[f"backbone_2d.blocks.{i}.1.weight"], stride=s)
        x = _bn(x, params, f"backbone_2d.blocks.{i}.2",
                train=train, stats=stats)
        x = jax.nn.relu(x)
        for j in range(n):
            x = _conv(x, params[f"backbone_2d.blocks.{i}.{3 * j + 4}.weight"])
            x = _bn(x, params, f"backbone_2d.blocks.{i}.{3 * j + 5}",
                    train=train, stats=stats)
            x = jax.nn.relu(x)
        u = cfg.upsample_strides[i]
        w = params[f"backbone_2d.deblocks.{i}.0.weight"]
        if u >= 1:
            y = _deconv(x, w, u)
        else:
            k = int(round(1 / u))
            y = _conv(x, w, stride=k, padding=0)
        y = _bn(y, params, f"backbone_2d.deblocks.{i}.1",
                train=train, stats=stats)
        ups.append(jax.nn.relu(y))
    return jnp.concatenate(ups, axis=-1)               # (B, H, W, 384)


def head_forward_chw(feat, params, cfg: PointPillarsConfig):
    """AnchorHeadSingle 1x1 convs, CHANNEL-MAJOR outputs: (B, A*c, H, W)
    f32 per head. The inference path consumes these directly — any
    (H*W*A, c) flattening materializes a ~321k-row array whose tiny minor
    dim pads up to 42x under (8, 128) HBM tiling (~5 ms/step measured at
    batch 4; the repo-wide "never put a small K on the minor dim" rule)."""
    outs = []
    for name in ("conv_cls", "conv_box", "conv_dir_cls"):
        y = _conv(feat, params[f"dense_head.{name}.weight"], padding=0,
                  out_chw=True)
        y = y + params[f"dense_head.{name}.bias"].astype(y.dtype)[
            None, :, None, None
        ]
        outs.append(y.astype(jnp.float32))
    return tuple(outs)


def head_forward(feat, params, cfg: PointPillarsConfig, *, batched=False):
    """AnchorHeadSingle 1x1 convs -> (H, W, A, {ncls, 7, nbins}) per frame
    ((B, ...) with batched=True) — pcdet's NCHW->NHWC permute layout (the
    training/golden contract; inference uses head_forward_chw)."""
    b = feat.shape[0]
    h, w = feat.shape[1], feat.shape[2]
    a = cfg.num_anchors_per_loc
    ncls = len(cfg.class_names)
    cls_c, box_c, dir_c = head_forward_chw(feat, params, cfg)

    def nhwc(y):
        return jnp.transpose(y, (0, 2, 3, 1))

    cls = nhwc(cls_c).reshape(b, h, w, a, ncls)
    box = nhwc(box_c).reshape(b, h, w, a, 7)
    dir_ = nhwc(dir_c).reshape(b, h, w, a, cfg.num_dir_bins)
    if not batched:
        return cls[0], box[0], dir_[0]
    return cls, box, dir_


# ---------------------------------------------------------------------------
# anchors + box coder


def generate_anchors(cfg: PointPillarsConfig) -> np.ndarray:
    """(H, W, A, 7) anchor grid, A ordered class-major then rotation —
    matching pcdet AnchorGenerator (align_center=False: anchors sit on
    grid_size/stride cell corners scaled to the range) and the head's
    channel layout."""
    h, w = cfg.feature_map_size
    r = cfg.point_cloud_range
    # pcdet (align_center False): x_stride = (x1 - x0) / (nx_f - 1)
    xs = np.linspace(r[0], r[3], w, dtype=np.float64)
    ys = np.linspace(r[1], r[4], h, dtype=np.float64)
    anchors = np.zeros((h, w, cfg.num_anchors_per_loc, 7), np.float64)
    a = 0
    for ci, size in enumerate(cfg.anchor_sizes):
        z = cfg.anchor_bottom_heights[ci] + size[2] / 2
        for rot in cfg.anchor_rotations:
            anchors[:, :, a, 0] = xs[None, :]
            anchors[:, :, a, 1] = ys[:, None]
            anchors[:, :, a, 2] = z
            anchors[:, :, a, 3:6] = size
            anchors[:, :, a, 6] = rot
            a += 1
    return anchors.astype(np.float32)


def decode_boxes(box_preds, anchors):
    """pcdet ResidualCoder.decode_torch (7-DoF, angle as residual)."""
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors, 7, axis=-1)
    xt, yt, zt, dxt, dyt, dzt, rt = jnp.split(box_preds, 7, axis=-1)
    diag = jnp.sqrt(dxa**2 + dya**2)
    xg = xt * diag + xa
    yg = yt * diag + ya
    zg = zt * dza + za
    dxg = jnp.exp(dxt) * dxa
    dyg = jnp.exp(dyt) * dya
    dzg = jnp.exp(dzt) * dza
    rg = rt + ra
    return jnp.concatenate([xg, yg, zg, dxg, dyg, dzg, rg], axis=-1)


def encode_boxes(gt, anchors):
    """pcdet ResidualCoder.encode_torch (dx/dy/dz floored at 1e-5)."""
    xa, ya, za, dxa, dya, dza, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, dxg, dyg, dzg, rg = jnp.split(gt, 7, axis=-1)
    dxg = jnp.maximum(dxg, 1e-5)
    dyg = jnp.maximum(dyg, 1e-5)
    dzg = jnp.maximum(dzg, 1e-5)
    diag = jnp.sqrt(dxa**2 + dya**2)
    return jnp.concatenate(
        [
            (xg - xa) / diag, (yg - ya) / diag, (zg - za) / dza,
            jnp.log(dxg / dxa), jnp.log(dyg / dya), jnp.log(dzg / dza),
            rg - ra,
        ],
        axis=-1,
    )


def limit_period(val, offset, period):
    return val - jnp.floor(val / period + offset) * period


# ---------------------------------------------------------------------------
# full forward


class Predictions(NamedTuple):
    """Fixed-shape detections (padded to nms_post_max) + counters."""

    boxes: Any            # (post_max, 7)
    scores: Any           # (post_max,)
    labels: Any           # (post_max,) int32, 1-based like pcdet
    count: Any            # scalar int32
    points_dropped: Any = 0
    pillars_dropped: Any = 0
    # candidates above score_thresh beyond nms_pre_max (pcdet drops them
    # silently by top-k; here the truncation is counted)
    nms_pre_overflow: Any = 0
    # in-range points beyond cfg.voxel_active_points (NOT pcdet
    # semantics: a nonzero count means the static scatter prefix was
    # undersized for this scan — raise the capacity)
    prefix_overflow: Any = 0


def _features_bev(points, valid, params, cfg: PointPillarsConfig):
    """(N, 4) cloud -> ((1, H, W, C) NHWC backbone output, vox)."""
    vox = voxelize(points, valid, cfg)
    feat = pillar_features(vox, cfg)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    pfeat = pfn_forward(feat.astype(dtype), params, cfg)
    live = (vox.num_points > 0)[:, None]  # see scatter_bev: counts-based
    spatial = scatter_bev(pfeat * live.astype(pfeat.dtype), vox, cfg)
    return backbone_forward(spatial, params, cfg), vox


def forward_features(points, valid, params, cfg: PointPillarsConfig):
    """points (N, 4) -> (cls, box, dir) feature-map predictions + vox
    ((H, W, A, c) pcdet layout — the golden/training contract)."""
    bev, vox = _features_bev(points, valid, params, cfg)
    cls, box, dir_ = head_forward(bev, params, cfg)
    return cls, box, dir_, vox


def post_process(cls_c, box_c, dir_c, anchors, cfg: PointPillarsConfig):
    """Sigmoid scores -> class-agnostic rotated NMS (pcdet post_processing
    with MULTI_CLASSES_NMS False): per-anchor best class, score threshold,
    top `nms_pre_max`, rotated NMS at `nms_thresh`, keep `nms_post_max`.

    Inputs are CHANNEL-MAJOR single-frame head outputs from
    `head_forward_chw` — (A*ncls, H, W) / (A*7, H, W) / (A*nbins, H, W) —
    and the (H, W, A, 7) anchor grid. Everything at anchor scale (~321k)
    stays (a, h, w)-shaped (clean (8, 128) tiling); per-candidate rows are
    gathered only at top-k scale. Flat anchor indices are (a, y, x)-order;
    vs the old (y, x, a) order this permutes tie-breaking among EQUAL
    scores only (real scores are continuous; masked-out entries never pass
    the validity gate)."""
    a = cfg.num_anchors_per_loc
    ncls = len(cfg.class_names)
    h, w = cls_c.shape[1], cls_c.shape[2]

    cls4 = cls_c.reshape(a, ncls, h, w)
    # per-anchor best class: sigmoid is monotone, so reduce logits first
    scores = jax.nn.sigmoid(jnp.max(cls4, axis=1)).reshape(-1)  # (a*h*w,)

    ok = scores > cfg.score_thresh
    pre_overflow = jnp.maximum(
        jnp.sum(ok.astype(jnp.int32)) - cfg.nms_pre_max, 0
    )
    # top-k by multi-operand descending sort: lax.top_k with k=1024 over
    # ~320k anchors measured 50 ms on-chip; one (key, payload) sort is ~1 ms
    # (repo perf ledger: TPU sorts beat per-element selection machinery).
    masked = jnp.where(ok, scores, -1.0)
    n_anch = masked.shape[0]
    m = cfg.topk_block_m
    if (m and m < 128 and n_anch % 128 == 0
            and (n_anch // 128) * m >= cfg.nms_pre_max):
        # two-stage exact top-k: stage 1 sorts each 128-anchor block on
        # the minor dim (7 bitonic passes vs 18 for the global sort) and
        # keeps its top m; stage 2 sorts only the blocks*m candidates.
        # Tie order matches the global stable sort exactly: within-block
        # ties keep ascending index (stable iota payload), candidate
        # rows are block-major, and the stage-2 sort is stable. A true
        # top-k member can be missed only if some block had > m of them;
        # then that block's (m+1)-th score beats the weakest selected
        # score — counted below, never silent.
        blocks = n_anch // 128
        sb = (-masked).reshape(blocks, 128)
        widx = jnp.broadcast_to(
            jnp.arange(128, dtype=jnp.int32)[None, :], (blocks, 128)
        )
        neg_sorted, widx_s = jax.lax.sort((sb, widx), num_keys=1)
        cand_scores = -neg_sorted[:, :m].reshape(-1)       # block-major
        cand_idx = (
            jnp.arange(blocks, dtype=jnp.int32)[:, None] * 128
            + widx_s[:, :m]
        ).reshape(-1)
        bound = -neg_sorted[:, m]        # per-block (m+1)-th best score
        _, order = jax.lax.sort(
            (-cand_scores,
             jnp.arange(cand_scores.shape[0], dtype=jnp.int32)),
            num_keys=1,
        )
        sel = order[: cfg.nms_pre_max]
        top_ix = cand_idx[sel]
        top_scores = cand_scores[sel]
        kth = top_scores[cfg.nms_pre_max - 1]
        pre_overflow = pre_overflow + jnp.sum(
            (bound > kth).astype(jnp.int32)
        )
    else:
        _, top_ix = jax.lax.sort(
            (-masked, jnp.arange(n_anch, dtype=jnp.int32)), num_keys=1
        )
        top_ix = top_ix[: cfg.nms_pre_max]
        top_scores = masked[top_ix]
    top_valid = top_scores > cfg.score_thresh

    # decode/classify ONLY the selected rows (k-row gathers; elementwise
    # work on all ~320k anchors is wasted HBM traffic on the 99.7% that
    # never reach NMS, and flattening to (321k, small) pads up to 42x)
    a_ix = top_ix // (h * w)
    rem = top_ix % (h * w)
    y_ix = rem // w
    x_ix = rem % w
    labels = jnp.argmax(
        cls4[a_ix, :, y_ix, x_ix], axis=-1
    ).astype(jnp.int32) + 1
    boxes = decode_boxes(
        box_c.reshape(a, 7, h, w)[a_ix, :, y_ix, x_ix],
        anchors[y_ix, x_ix, a_ix],
    )
    dir_labels = jnp.argmax(
        dir_c.reshape(a, cfg.num_dir_bins, h, w)[a_ix, :, y_ix, x_ix],
        axis=-1,
    )
    period = 2 * math.pi / cfg.num_dir_bins
    rot = limit_period(
        boxes[:, 6] - cfg.dir_offset, cfg.dir_limit_offset, period
    )
    heading = rot + cfg.dir_offset + period * dir_labels.astype(jnp.float32)
    top_boxes = boxes.at[:, 6].set(heading)
    keep, count = nms_rotated(
        top_boxes[:, [0, 1, 3, 4, 6]], top_scores, top_valid,
        iou_threshold=cfg.nms_thresh, post_max=cfg.nms_post_max,
    )
    sel = jnp.maximum(keep, 0)
    kmask = keep >= 0
    return Predictions(
        boxes=jnp.where(kmask[:, None], top_boxes[sel], 0.0),
        scores=jnp.where(kmask, top_scores[sel], 0.0),
        labels=jnp.where(kmask, labels[sel], 0),
        count=count.astype(jnp.int32),
        nms_pre_overflow=pre_overflow,
    )


def detect(points, valid, params, anchors, cfg: PointPillarsConfig):
    """Full jittable inference: (N, 4) cloud -> Predictions + counters.

    The (K, 9) array the viewer renders (`pointcloud_viewer.py:2428-2433`:
    [box7, label, score]) is `predictions_array(preds)` of this output.
    """
    bev, vox = _features_bev(points, valid, params, cfg)
    cls_c, box_c, dir_c = head_forward_chw(bev, params, cfg)
    preds = post_process(cls_c[0], box_c[0], dir_c[0], anchors, cfg)
    return preds._replace(
        points_dropped=vox.points_dropped,
        pillars_dropped=vox.pillars_dropped,
        prefix_overflow=vox.prefix_overflow,
    )


def predictions_array(preds: Predictions) -> np.ndarray:
    """(count, 9) numpy [x y z dx dy dz heading label score] — the
    reference's prediction-array contract (`pointcloud_viewer.py:2428-2436`)."""
    k = int(preds.count)
    out = np.zeros((k, 9), np.float32)
    out[:, :7] = np.asarray(preds.boxes)[:k]
    out[:, 7] = np.asarray(preds.labels)[:k]
    out[:, 8] = np.asarray(preds.scores)[:k]
    return out
