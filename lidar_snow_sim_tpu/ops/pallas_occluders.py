"""Fused occluder-selection Pallas kernel (dense-assembly phase A).

The XLA dense path materializes per-chunk (block_points x slice_width)
interval/hit/score arrays in HBM (~0.8 GB of traffic per scan at the bench
shapes). This kernel keeps everything in VMEM: per grid step it DMAs one
bank slice (row, lo..lo+W) plus the wide list into scratch, runs the exact
intersection test + tangent-interval computation (ops.geometry semantics),
and extracts the K nearest intersecting particles with an iterative
masked-argmin loop — identical value-then-lowest-index ordering to
jax.lax.top_k, which is the reference's claim priority
(simulation.py:412-417).

Mosaic has no atan2/asin lowering, so the kernel is TRANSCENDENTAL-FREE:
particle azimuth and tangent half-width are precomputed bank columns
(ParticleBank.data_t rows 4-5), per-point trig (sin/cos of the beam edges)
is computed outside in XLA and passed as an 8-row feature block, and the
half-plane test cos(edge - pang) > 0 is evaluated algebraically as
cos_e*px + sin_e*py > 0 (same sign; divide by the positive range).

Point-feature rows: [d_orig, right, left, sin_r, cos_r, sin_l, cos_l,
wrapped_beam]. Bank property rows: [x, y, r, dist, azimuth_02pi, halfwidth].
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi
_BIG = 3.0e38  # plain float: a jnp scalar here would be a captured constant

N_FEAT = 9   # point-feature rows
N_PROP = 8   # bank property rows (1 spare)


def point_features(x, y, z, beam_rad: float):
    """Per-point feature rows for the kernel from separate coordinate
    PLANES (a stacked (..., 3) input would make 3 the HBM minormost dim and
    pad 42x under (8, 128) tiling), computed in XLA (atan2/sin/cos are not
    lowerable inside Mosaic). Row 8 is the SIGNED azimuth, used by the
    banded kernel's per-point coverage check against the bank's signed
    sort-angle property row."""
    d = jnp.sqrt(x * x + y * y + z * z)
    az = jnp.arctan2(y, x)
    center = jnp.where(az < 0, az + TWO_PI, az)
    right = center - beam_rad / 2
    right = jnp.where(right < 0, right + TWO_PI, right)
    left = center + beam_rad / 2
    left = jnp.where(left > TWO_PI, left - TWO_PI, left)
    return jnp.stack(
        [
            d, right, left,
            jnp.sin(right), jnp.cos(right), jnp.sin(left), jnp.cos(left),
            (right > left).astype(jnp.float32),
            az,
        ],
        axis=-1,
    )


def _prep_side(feat, cand, n_row, *, blk: int, w_sl: int, k_occ: int):
    """Intersection test + interval computation for one (blk, C) chunk.

    Returns (score, a1b, a2b, overflow (blk,) i32, block_k scalar) — the
    inputs of the iterative nearest-K extraction loop.
    """
    d_orig = feat[:, 0:1]
    right = feat[:, 1:2]
    left = feat[:, 2:3]
    sin_r = feat[:, 3:4]
    cos_r = feat[:, 4:5]
    sin_l = feat[:, 5:6]
    cos_l = feat[:, 6:7]
    wrapped_beam = feat[:, 7:8] > 0.5

    px = cand[0:1, :]                                 # (1, C)
    py = cand[1:2, :]
    pr = cand[2:3, :]
    pdist = cand[3:4, :]
    pang = cand[4:5, :]
    halfw = cand[5:6, :]

    # ---- exact intersection test (ops/geometry.candidate_intervals) ----
    center_in = (right <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right - TWO_PI <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right <= pang) & (pang <= left + TWO_PI)

    dist_r = jnp.abs(px * sin_r - py * cos_r)
    dist_l = jnp.abs(px * sin_l - py * cos_l)
    # half-plane: cos(edge - pang) > 0  <=>  cos_e*px + sin_e*py > 0
    right_hit = (dist_r < pr) & (cos_r * px + sin_r * py > 0)
    left_hit = (dist_l < pr) & (cos_l * px + sin_l * py > 0)

    hit = (center_in | right_hit | left_hit) & (pdist < d_orig)  # (blk, C)

    # wrap-pad dedup (banks.py layout): slice entries repeat with period
    # count[row], so a seam-spanning slice wider than the narrow count hits
    # the same particle twice. Keep only the first copy (slice offset <
    # count); wide-list columns (offset >= w_sl) are never duplicated.
    col_1c = jax.lax.broadcasted_iota(jnp.int32, (1, hit.shape[1]), 1)
    hit = hit & ((col_1c >= w_sl) | (col_1c < n_row))

    a1_raw = pang - halfw
    a1_raw = jnp.where(a1_raw < 0, a1_raw + TWO_PI, a1_raw)
    a2_raw = pang + halfw
    a2_raw = jnp.where(a2_raw > TWO_PI, a2_raw - TWO_PI, a2_raw)
    a1 = jnp.where(right_hit, right, a1_raw)          # (blk, C)
    a2 = jnp.where(left_hit, left, a2_raw)

    n_hit = jnp.sum(hit.astype(jnp.int32), axis=1)
    ovf = jnp.maximum(n_hit - k_occ, 0)

    score = jnp.where(hit, jnp.broadcast_to(pdist, hit.shape), _BIG)
    c = score.shape[1]
    a1b = jnp.broadcast_to(a1, (blk, c))
    a2b = jnp.broadcast_to(a2, (blk, c))
    block_k = jnp.minimum(jnp.max(n_hit), k_occ)
    return score, a1b, a2b, ovf, block_k


def _extract_step(k, score, col, a1b, a2b, out, s: int, k_occ: int):
    """One masked-argmin extraction trip (== top_k value/index order);
    writes the k-th occluder of output block row `s` into the MERGED
    (3K, blk) output (rows [0,K) = a1, [K,2K) = a2, [2K,3K) = dist — one
    array so the downstream compaction gather is ONE gather launch instead
    of three; validity is derivable as dist < _BIG) and returns the score
    with the winner retired."""
    c = score.shape[1]
    m = jnp.min(score, axis=1, keepdims=True)          # (blk, 1)
    eq = score == m
    first = jnp.min(jnp.where(eq, col, c), axis=1, keepdims=True)
    onehot = col == first
    blk = score.shape[0]
    c0 = s * blk  # pair kernel: side s's lane columns of the (3K, 2*blk) block
    out[pl.ds(k, 1), pl.ds(c0, blk)] = jnp.sum(
        jnp.where(onehot, a1b, 0.0), axis=1
    )[None, :]
    out[pl.ds(k_occ + k, 1), pl.ds(c0, blk)] = jnp.sum(
        jnp.where(onehot, a2b, 0.0), axis=1
    )[None, :]
    out[pl.ds(2 * k_occ + k, 1), pl.ds(c0, blk)] = m[:, 0][None, :]
    return jnp.where(onehot, _BIG, score)


def _kernel(
    w0b_ref,       # (n_chunks,) i32, scalar-prefetch: feat block per chunk
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    los_ref,       # (n_chunks,) i32, scalar-prefetch
    has_ref,       # (n_chunks,) i32, scalar-prefetch: 1 if the chunk holds
    #                any valid (in-channel) row, 0 for dead spill windows
    counts_ref,    # (C_banks,) i32, scalar-prefetch: narrow count per row
    feat_ref,      # (1, blk, N_FEAT) VMEM block
    bank_ref,      # (C_banks, N_PROP, K_ext) in HBM/ANY (ParticleBank.data_t)
    wide_ref,      # (C_banks, N_PROP, Wc) in HBM/ANY (ParticleBank.wide_t)
    a12d_out,      # (3K, blk) block of the (3K, n_chunks*blk) output —
    #                K OUTER: the downstream compaction gather's (3K, n2)
    #                layout directly, no XLA transpose copy
    ovf_out,       # (1, 1, blk) i32
    cand_scr,      # VMEM (N_PROP, W + Wc)
    sems,          # DMA semaphores (2,)
    *,
    blk: int,
    w_sl: int,
    wide_cap: int,
    k_occ: int,
):
    i = pl.program_id(0)
    row = rows_ref[i]
    lo = pl.multiple_of(los_ref[i], 128)  # caller aligns slice starts

    # DEAD chunks (~20% at bench shapes: window alignment + the one spill
    # window per channel leave windows with no in-channel row) skip the
    # DMAs, the intersection prep, and the extraction loop entirely. Every
    # downstream consumer masks by valid_blk (occ_valid, occ_of), so the
    # skipped outputs only need the dist-plane sentinel (and ovf zeros) the
    # live path would have produced for hit-free rows — bit-identical.
    @pl.when(has_ref[i] == 0)
    def _dead():
        a12d_out[pl.ds(0, 2 * k_occ), :] = jnp.zeros(
            (2 * k_occ, blk), jnp.float32
        )
        a12d_out[pl.ds(2 * k_occ, k_occ), :] = jnp.full(
            (k_occ, blk), _BIG, jnp.float32
        )
        ovf_out[0, 0, :] = jnp.zeros((blk,), jnp.int32)

    @pl.when(has_ref[i] != 0)
    def _live():
        slice_cp = pltpu.make_async_copy(
            bank_ref.at[row, :, pl.ds(lo, w_sl)],
            cand_scr.at[:, pl.ds(0, w_sl)],
            sems.at[0],
        )
        wide_cp = pltpu.make_async_copy(
            wide_ref.at[row], cand_scr.at[:, pl.ds(w_sl, wide_cap)],
            sems.at[1],
        )
        slice_cp.start()
        wide_cp.start()
        feat = feat_ref[0]                            # (blk, N_FEAT)
        slice_cp.wait()
        wide_cp.wait()

        score, a1b, a2b, ovf, block_k = _prep_side(
            feat, cand_scr[:, :], counts_ref[row],
            blk=blk, w_sl=w_sl, k_occ=k_occ,
        )
        ovf_out[0, 0, :] = ovf
        col = jax.lax.broadcasted_iota(
            jnp.int32, (blk, score.shape[1]), 1
        )

        a12d_out[pl.ds(0, 2 * k_occ), :] = jnp.zeros(
            (2 * k_occ, blk), jnp.float32
        )
        a12d_out[pl.ds(2 * k_occ, k_occ), :] = jnp.full(
            (k_occ, blk), _BIG, jnp.float32
        )

        # Trip count is the block's max occluder count (occluders are
        # sparse: typically <= 8 of K=24), with untaken slots pre-cleared.
        def body(k, score):
            return _extract_step(
                k, score, col, a1b, a2b, a12d_out, 0, k_occ
            )

        jax.lax.fori_loop(0, block_k, body, score)


def _prep_side_t(featT, candT, n_row, *, w_sl: int, k_occ: int):
    """Transposed-layout `_prep_side`: candidates on SUBLANES, points on
    LANES. featT is (N_FEAT, blk); candT is (C, N_PROP). All winner
    reductions become sublane (axis-0) reductions whose (1, blk) results
    are already in the a12d output layout, eliminating the three per-trip
    (blk,) sublane->lane relayouts of the row-major kernel. The arithmetic
    is identical ops over identical value sets (min / one-hot sums are
    order-exact), so outputs are bit-identical to `_prep_side`."""
    d_orig = featT[0:1, :]                            # (1, blk)
    right = featT[1:2, :]
    left = featT[2:3, :]
    sin_r = featT[3:4, :]
    cos_r = featT[4:5, :]
    sin_l = featT[5:6, :]
    cos_l = featT[6:7, :]
    wrapped_beam = featT[7:8, :] > 0.5

    px = candT[:, 0:1]                                # (C, 1)
    py = candT[:, 1:2]
    pr = candT[:, 2:3]
    pdist = candT[:, 3:4]
    pang = candT[:, 4:5]
    halfw = candT[:, 5:6]

    center_in = (right <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right - TWO_PI <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right <= pang) & (pang <= left + TWO_PI)

    dist_r = jnp.abs(px * sin_r - py * cos_r)
    dist_l = jnp.abs(px * sin_l - py * cos_l)
    right_hit = (dist_r < pr) & (cos_r * px + sin_r * py > 0)
    left_hit = (dist_l < pr) & (cos_l * px + sin_l * py > 0)

    hit = (center_in | right_hit | left_hit) & (pdist < d_orig)  # (C, blk)

    row_c1 = jax.lax.broadcasted_iota(jnp.int32, (hit.shape[0], 1), 0)
    hit = hit & ((row_c1 >= w_sl) | (row_c1 < n_row))

    a1_raw = pang - halfw
    a1_raw = jnp.where(a1_raw < 0, a1_raw + TWO_PI, a1_raw)
    a2_raw = pang + halfw
    a2_raw = jnp.where(a2_raw > TWO_PI, a2_raw - TWO_PI, a2_raw)
    a1 = jnp.where(right_hit, right, a1_raw)          # (C, blk)
    a2 = jnp.where(left_hit, left, a2_raw)

    n_hit = jnp.sum(hit.astype(jnp.int32), axis=0, keepdims=True)  # (1, blk)
    ovf = jnp.maximum(n_hit - k_occ, 0)

    score = jnp.where(hit, jnp.broadcast_to(pdist, hit.shape), _BIG)
    blk = score.shape[1]
    a1b = jnp.broadcast_to(a1, (score.shape[0], blk))
    a2b = jnp.broadcast_to(a2, (score.shape[0], blk))
    block_k = jnp.minimum(jnp.max(n_hit), k_occ)
    return score, a1b, a2b, ovf, block_k


def _extract_step_t(k, score, row, a1b, a2b, out, s: int, k_occ: int):
    """Transposed-layout `_extract_step`: one masked-argmin trip with
    sublane reductions; winner rows land directly as (1, blk) lane
    vectors."""
    c = score.shape[0]
    m = jnp.min(score, axis=0, keepdims=True)          # (1, blk)
    eq = score == m
    first = jnp.min(jnp.where(eq, row, c), axis=0, keepdims=True)
    onehot = row == first
    blk = score.shape[1]
    c0 = s * blk
    out[pl.ds(k, 1), pl.ds(c0, blk)] = jnp.sum(
        jnp.where(onehot, a1b, 0.0), axis=0, keepdims=True
    )
    out[pl.ds(k_occ + k, 1), pl.ds(c0, blk)] = jnp.sum(
        jnp.where(onehot, a2b, 0.0), axis=0, keepdims=True
    )
    out[pl.ds(2 * k_occ + k, 1), pl.ds(c0, blk)] = m
    return jnp.where(onehot, _BIG, score)


def _kernel_t(
    w0b_ref,       # (n_chunks,) i32, scalar-prefetch: feat block per chunk
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    los_ref,       # (n_chunks,) i32, scalar-prefetch
    counts_ref,    # (C_banks,) i32, scalar-prefetch
    feat_ref,      # (1, N_FEAT, blk) VMEM block (feature rows, point lanes)
    bank_ref,      # (C_banks, N_PROP, K_ext) in HBM/ANY
    wide_ref,      # (C_banks, N_PROP, Wc) in HBM/ANY
    a12d_out,      # (1, 3K, blk) merged [a1; a2; dist]
    ovf_out,       # (1, 1, blk) i32
    cand_scr,      # VMEM (N_PROP, W + Wc)
    sems,          # DMA semaphores (2,)
    *,
    blk: int,
    w_sl: int,
    wide_cap: int,
    k_occ: int,
):
    """Transposed-layout twin of `_kernel` (see `_prep_side_t`). The bank
    slice still DMAs property-major ((N_PROP, C) — the HBM layout that
    doesn't pad); one in-kernel (N_PROP, C)->(C, N_PROP) transpose buys
    relayout-free extraction trips."""
    i = pl.program_id(0)
    row = rows_ref[i]
    lo = pl.multiple_of(los_ref[i], 128)

    slice_cp = pltpu.make_async_copy(
        bank_ref.at[row, :, pl.ds(lo, w_sl)],
        cand_scr.at[:, pl.ds(0, w_sl)],
        sems.at[0],
    )
    wide_cp = pltpu.make_async_copy(
        wide_ref.at[row], cand_scr.at[:, pl.ds(w_sl, wide_cap)], sems.at[1]
    )
    slice_cp.start()
    wide_cp.start()
    featT = feat_ref[0]                               # (N_FEAT, blk)
    slice_cp.wait()
    wide_cp.wait()
    candT = cand_scr[:, :].T                          # (C, N_PROP)

    score, a1b, a2b, ovf, block_k = _prep_side_t(
        featT, candT, counts_ref[row], w_sl=w_sl, k_occ=k_occ,
    )
    ovf_out[0, :, :] = ovf
    row_i = jax.lax.broadcasted_iota(
        jnp.int32, (score.shape[0], score.shape[1]), 0
    )

    a12d_out[pl.ds(0, 2 * k_occ), :] = jnp.zeros(
        (2 * k_occ, blk), jnp.float32
    )
    a12d_out[pl.ds(2 * k_occ, k_occ), :] = jnp.full(
        (k_occ, blk), _BIG, jnp.float32
    )

    def body(k, score):
        return _extract_step_t(k, score, row_i, a1b, a2b, a12d_out, 0, k_occ)

    jax.lax.fori_loop(0, block_k, body, score)


def _prep_banded(feat, cand, keep, *, k_occ: int):
    """Banded intersection test + interval computation.

    feat: (blk, N_FEAT) point features, row p = group p // group's point.
    cand: (G, 1, C) per-property candidate rows (group g's two bands
    followed by the shared wide list). keep: (G, 1, C) dedup mask (wrap
    period + inter-band overlap). Semantics identical to _prep_side; only
    the shapes differ — each group's points test their own narrow bands.
    """
    g_dim, _, c = cand[0].shape
    blk = feat.shape[0]
    group = blk // g_dim

    def fcol(j):
        return feat[:, j : j + 1].reshape(g_dim, group, 1)

    d_orig, right, left = fcol(0), fcol(1), fcol(2)
    sin_r, cos_r, sin_l, cos_l = fcol(3), fcol(4), fcol(5), fcol(6)
    wrapped_beam = fcol(7) > 0.5

    px, py, pr, pdist, pang, halfw = cand

    center_in = (right <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right - TWO_PI <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right <= pang) & (pang <= left + TWO_PI)

    dist_r = jnp.abs(px * sin_r - py * cos_r)
    dist_l = jnp.abs(px * sin_l - py * cos_l)
    right_hit = (dist_r < pr) & (cos_r * px + sin_r * py > 0)
    left_hit = (dist_l < pr) & (cos_l * px + sin_l * py > 0)

    hit = (center_in | right_hit | left_hit) & (pdist < d_orig) & keep

    a1_raw = pang - halfw
    a1_raw = jnp.where(a1_raw < 0, a1_raw + TWO_PI, a1_raw)
    a2_raw = pang + halfw
    a2_raw = jnp.where(a2_raw > TWO_PI, a2_raw - TWO_PI, a2_raw)
    a1 = jnp.where(right_hit, jnp.broadcast_to(right, hit.shape), a1_raw)
    a2 = jnp.where(left_hit, jnp.broadcast_to(left, hit.shape), a2_raw)

    n_hit = jnp.sum(hit.astype(jnp.int32), axis=2)       # (G, group)
    ovf = jnp.maximum(n_hit - k_occ, 0)

    score = jnp.where(hit, jnp.broadcast_to(pdist, hit.shape), _BIG)
    block_k = jnp.minimum(jnp.max(n_hit), k_occ)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (g_dim, group, c), 2)
    return score, a1, a2, ovf, block_k, col3


def _kernel_banded(
    w0b_ref,       # (n_chunks,) i32, scalar-prefetch: feat block per chunk
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    gloc_ref,      # (n_chunks,) i32: chunk-wide slice starts
    gloa_ref,      # (n_chunks * G,) i32: head-anchored band starts
    glob_ref,      # (n_chunks * G,) i32: tail-anchored band starts
    counts_ref,    # (C_banks,) i32, scalar-prefetch
    feat_ref,      # (1, blk, N_FEAT) VMEM block
    glo_vec_ref,   # (1, G, 2) i32 VMEM block: [loA, loB] per group (G on
    # the sublane axis — a (2, G) layout would need an unsupported
    # lane->sublane shape cast to broadcast per group)
    bank_ref,      # (C_banks, N_PROP, K_ext) in HBM/ANY
    wide_ref,      # (C_banks, N_PROP, Wc) in HBM/ANY
    a12d_out,      # (3K, blk) block merged [a1; a2; dist] (K outer)
    ovf_out,       # (1, 2, blk) i32: [occluder overflow; uncovered]
    slice_scr,     # VMEM (N_PROP, W_chunk)
    wide_scr,      # VMEM (N_PROP, Wc)
    sems,          # DMA semaphores (2,)
    *,
    blk: int,
    band: int,
    group: int,
    w_chunk: int,
    wide_sl: int,
    k_occ: int,
    delta: float,
):
    """Sliced dual-banded phase A.

    ONE chunk-wide slice DMA (plus the wide list) per grid step — per-group
    DMAs were measured at ~0.09 us of issue overhead each, which at 2 x 16
    bands x 4608 chunk-steps dominated the banded kernel — then each
    band_group of consecutive (azimuth-sorted) points carves TWO narrow
    bands out of the in-VMEM slice with scalar-driven 128-aligned lane
    slices: one anchored at the group's left window edge, one ending at its
    right edge. For gap-free groups the bands overlap (the overlap is
    deduped by global index); box-shadow azimuth gaps give two disjoint
    clusters, each covered by its own band. Coverage is verified PER POINT
    in-kernel against the bands' signed sort-angle edges (bank property
    row 6 vs feature row 8) — the conservative XLA hull check cannot
    express a gap — and reported in ovf_out row 1 so capacity growth stays
    loud, never silent."""
    i = pl.program_id(0)
    row = rows_ref[i]
    g_dim = blk // group
    count = counts_ref[row]
    lo_c = pl.multiple_of(gloc_ref[i], 128)

    slice_cp = pltpu.make_async_copy(
        bank_ref.at[row, :, pl.ds(lo_c, w_chunk)], slice_scr, sems.at[0]
    )
    slice_cp.start()
    wide_cp = pltpu.make_async_copy(wide_ref.at[row], wide_scr, sems.at[1])
    wide_cp.start()
    feat = feat_ref[0]                                    # (blk, N_FEAT)
    lo_a_v = glo_vec_ref[0, :, 0:1][:, :, None]           # (G, 1, 1)
    lo_b_v = glo_vec_ref[0, :, 1:2][:, :, None]
    d_ab = lo_b_v - lo_a_v                                # (G, 1, 1) i32
    slice_cp.wait()
    wide_cp.wait()

    # in-VMEM band views: all offsets are 128-aligned differences of
    # 128-aligned starts (the XLA side clamps band anchors into the chunk
    # window), so the dynamic lane slices keep Mosaic's tiling alignment.
    # Reads are per PROPERTY ROW (a sliced row of a stacked value keeps a
    # sublane offset that Mosaic's concat rejects; fresh row reads don't).
    off_a = [
        pl.multiple_of(gloa_ref[i * g_dim + g] - lo_c, 128)
        for g in range(g_dim)
    ]
    off_b = [
        pl.multiple_of(glob_ref[i * g_dim + g] - lo_c, 128)
        for g in range(g_dim)
    ]

    def band_rows(offs, p):
        return jnp.stack(
            [slice_scr[p, pl.ds(offs[g], band)] for g in range(g_dim)]
        )                                                 # (G, band)

    c_tot = 2 * band + wide_sl
    col3 = jax.lax.broadcasted_iota(jnp.int32, (g_dim, 1, c_tot), 2)
    is_a = col3 < band
    is_b = (col3 >= band) & (col3 < 2 * band)
    j_b = col3 - band
    # dedup: keep one wrap-period copy anchored at loA (translation
    # invariant: global - loA < count), and drop B columns already present
    # in A (global index < loA + band). Pure boolean algebra — a select on
    # i1 vectors does not lower in Mosaic ("unsupported truncation").
    keep = (
        (is_a & (col3 < count))
        | (is_b & (d_ab + j_b >= band) & (d_ab + j_b < count))
        | (col3 >= 2 * band)
    )

    # per-property candidate rows: band A ++ band B ++ shared wide list
    cand = tuple(
        jnp.concatenate(
            [
                band_rows(off_a, p),
                band_rows(off_b, p),
                jnp.broadcast_to(wide_scr[p : p + 1, :wide_sl],
                                 (g_dim, wide_sl)),
            ],
            axis=1,
        )[:, None, :]                                     # (G, 1, C)
        for p in range(6)
    )

    score, a1b, a2b, ovf, block_k, col3 = _prep_banded(
        feat, cand, keep, k_occ=k_occ,
    )

    # --- per-point coverage: the point's needed sort-angle window
    # [az - delta, az + delta] must lie inside band A, band B, or (when the
    # bands overlap/adjoin) their union; a full wrap period in one band
    # covers everything. Uncovered points are COUNTED (ovf row 1).
    azp = feat[:, 8:9].reshape(g_dim, group, 1)
    sang_a = band_rows(off_a, 6)                          # (G, band)
    sang_b = band_rows(off_b, 6)
    s_a0 = sang_a[:, 0:1][:, :, None]                     # (G, 1, 1)
    s_a1 = sang_a[:, band - 1 : band][:, :, None]
    s_b0 = sang_b[:, 0:1][:, :, None]
    s_b1 = sang_b[:, band - 1 : band][:, :, None]
    need_l = azp - delta
    need_r = azp + delta
    in_a = (s_a0 <= need_l) & (need_r <= s_a1)
    in_b = (s_b0 <= need_l) & (need_r <= s_b1)
    in_j = (d_ab <= band) & (s_a0 <= need_l) & (need_r <= s_b1)
    covered = (count <= band) | in_a | in_b | in_j
    unc = (~covered[:, :, 0]).astype(jnp.int32)           # (G, group)

    ovf_out[0, 0:1, :] = ovf.reshape(1, blk)
    ovf_out[0, 1:2, :] = unc.reshape(1, blk)

    a12d_out[pl.ds(0, 2 * k_occ), :] = jnp.zeros(
        (2 * k_occ, blk), jnp.float32
    )
    a12d_out[pl.ds(2 * k_occ, k_occ), :] = jnp.full(
        (k_occ, blk), _BIG, jnp.float32
    )

    c = score.shape[2]

    def body(k, score):
        m = jnp.min(score, axis=2, keepdims=True)          # (G, group, 1)
        eq = score == m
        first = jnp.min(jnp.where(eq, col3, c), axis=2, keepdims=True)
        onehot = col3 == first
        a12d_out[pl.ds(k, 1), :] = jnp.sum(
            jnp.where(onehot, a1b, 0.0), axis=2
        ).reshape(1, blk)
        a12d_out[pl.ds(k_occ + k, 1), :] = jnp.sum(
            jnp.where(onehot, a2b, 0.0), axis=2
        ).reshape(1, blk)
        a12d_out[pl.ds(2 * k_occ + k, 1), :] = m[:, :, 0].reshape(1, blk)
        return jnp.where(onehot, _BIG, score)

    jax.lax.fori_loop(0, block_k, body, score)


def _kernel_routed(
    w0b_ref,       # (n_chunks,) i32, scalar-prefetch: feat block per chunk
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    los_ref,       # (n_chunks,) i32, scalar-prefetch: chunk slice starts
    gloa_ref,      # (n_chunks * G,) i32: per-group 128-aligned band starts
    mode_ref,      # (n_chunks,) i32: 0 dead, 1 full-slice, 2 fast-banded
    counts_ref,    # (C_banks,) i32, scalar-prefetch
    feat_ref,      # (1, blk, N_FEAT) VMEM block
    bank_ref,      # (C_banks, N_PROP, K_ext) in HBM/ANY
    wide_ref,      # (C_banks, N_PROP, Wc) in HBM/ANY
    a12d_out,      # (3K, blk) block merged [a1; a2; dist] (K outer)
    ovf_out,       # (1, 1, blk) i32
    cand_scr,      # VMEM (N_PROP, W + Wc)
    sems,          # DMA semaphores (2,)
    *,
    blk: int,
    w_sl: int,
    wide_cap: int,
    k_occ: int,
    band: int,
    group: int,
    wide_sl: int,
):
    """Span-ROUTED phase A: one kernel, two gated bodies.

    The XLA side classifies each chunk by its per-group candidate spans
    (conservative LUT bounds): chunks whose every band_group fits one
    `band`-wide 128-aligned window take the FAST body — a single-band
    variant of `_kernel_banded` carving per-group in-VMEM views out of the
    one chunk-wide slice DMA — and the remainder (~2% at bench shapes:
    box-shadow azimuth gaps) takes the full-slice body. Soundness lives in
    the ROUTING, not in dual bands: the LUT bounds are conservative
    (lo' <= true lo, hi' >= true hi), so a fast-routed group's window
    provably fits its band and the dual-band machinery (second band,
    inter-band dedup, per-point in-kernel coverage checks) that ate the
    round-3 single-band win (BASELINE.md ledger) is not needed. Bit-exact
    vs the full-slice kernel: identical ops over identical value sets per
    (point, candidate); the kept wrap-period copy can differ between
    layouts but copies carry bit-identical x/y/r/dist/azimuth properties.
    """
    i = pl.program_id(0)
    row = rows_ref[i]
    lo_c = pl.multiple_of(los_ref[i], 128)
    mode = mode_ref[i]
    g_dim = blk // group

    @pl.when(mode == 0)
    def _dead():
        a12d_out[pl.ds(0, 2 * k_occ), :] = jnp.zeros(
            (2 * k_occ, blk), jnp.float32
        )
        a12d_out[pl.ds(2 * k_occ, k_occ), :] = jnp.full(
            (k_occ, blk), _BIG, jnp.float32
        )
        ovf_out[0, 0, :] = jnp.zeros((blk,), jnp.int32)

    @pl.when(mode != 0)
    def _live():
        slice_cp = pltpu.make_async_copy(
            bank_ref.at[row, :, pl.ds(lo_c, w_sl)],
            cand_scr.at[:, pl.ds(0, w_sl)],
            sems.at[0],
        )
        wide_cp = pltpu.make_async_copy(
            wide_ref.at[row], cand_scr.at[:, pl.ds(w_sl, wide_cap)],
            sems.at[1],
        )
        slice_cp.start()
        wide_cp.start()
        feat = feat_ref[0]                            # (blk, N_FEAT)
        count = counts_ref[row]
        slice_cp.wait()
        wide_cp.wait()

        a12d_out[pl.ds(0, 2 * k_occ), :] = jnp.zeros(
            (2 * k_occ, blk), jnp.float32
        )
        a12d_out[pl.ds(2 * k_occ, k_occ), :] = jnp.full(
            (k_occ, blk), _BIG, jnp.float32
        )

        @pl.when(mode == 1)
        def _full():
            score, a1b, a2b, ovf, block_k = _prep_side(
                feat, cand_scr[:, :], count,
                blk=blk, w_sl=w_sl, k_occ=k_occ,
            )
            ovf_out[0, 0, :] = ovf
            col = jax.lax.broadcasted_iota(
                jnp.int32, (blk, score.shape[1]), 1
            )

            def body(k, score):
                return _extract_step(
                    k, score, col, a1b, a2b, a12d_out, 0, k_occ
                )

            jax.lax.fori_loop(0, block_k, body, score)

        @pl.when(mode == 2)
        def _fast():
            # per-group band views: 128-aligned differences of 128-aligned
            # starts (the XLA side clamps band anchors into the chunk
            # window). One 2-D (N_PROP, band) slice per group — NOT the 6
            # per-property row reads of the dual-band kernel (full-height
            # slices carry no sublane offset, so the stack lowers).
            stacked = jnp.stack(
                [
                    cand_scr[
                        :,
                        pl.ds(
                            pl.multiple_of(
                                gloa_ref[i * g_dim + g] - lo_c, 128
                            ),
                            band,
                        ),
                    ]
                    for g in range(g_dim)
                ]
            )                                     # (G, N_PROP, band)
            wide_b = jnp.broadcast_to(
                cand_scr[:, pl.ds(w_sl, wide_sl)][None],
                (g_dim, N_PROP, wide_sl),
            )
            cand_all = jnp.concatenate([stacked, wide_b], axis=2)
            cand = tuple(cand_all[:, p : p + 1, :] for p in range(6))

            c_tot = band + wide_sl
            col3 = jax.lax.broadcasted_iota(
                jnp.int32, (g_dim, 1, c_tot), 2
            )
            # wrap-period dedup: keep one copy anchored at the band start
            # (translation invariant); wide columns are never duplicated
            keep = (col3 < count) | (col3 >= band)

            score, a1b, a2b, ovf, block_k, col3 = _prep_banded(
                feat, cand, keep, k_occ=k_occ,
            )
            ovf_out[0, 0, :] = ovf.reshape(blk)

            c = score.shape[2]

            def body(k, score):
                m = jnp.min(score, axis=2, keepdims=True)  # (G, group, 1)
                eq = score == m
                first = jnp.min(
                    jnp.where(eq, col3, c), axis=2, keepdims=True
                )
                onehot = col3 == first
                a12d_out[pl.ds(k, 1), :] = jnp.sum(
                    jnp.where(onehot, a1b, 0.0), axis=2
                ).reshape(1, blk)
                a12d_out[pl.ds(k_occ + k, 1), :] = jnp.sum(
                    jnp.where(onehot, a2b, 0.0), axis=2
                ).reshape(1, blk)
                a12d_out[pl.ds(2 * k_occ + k, 1), :] = m[:, :, 0].reshape(
                    1, blk
                )
                return jnp.where(onehot, _BIG, score)

            jax.lax.fori_loop(0, block_k, body, score)


def _kernel_pair(
    w0b_ref,       # (n_chunks,) i32, scalar-prefetch: feat block per chunk
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    los_ref,       # (n_chunks,) i32, scalar-prefetch
    counts_ref,    # (C_banks,) i32, scalar-prefetch
    feat_a_ref,    # (1, blk, N_FEAT) VMEM block of chunk 2i
    feat_b_ref,    # (1, blk, N_FEAT) VMEM block of chunk 2i + 1
    bank_ref,      # (C_banks, N_PROP, K_ext) in HBM/ANY
    wide_ref,      # (C_banks, N_PROP, Wc) in HBM/ANY
    a12d_out,      # (3K, 2*blk) block merged [a1; a2; dist] (K outer)
    ovf_out,       # (2, 1, blk) i32
    cand_scr,      # VMEM (2, N_PROP, W + Wc)
    sems,          # DMA semaphores (4,)
    *,
    blk: int,
    w_sl: int,
    wide_cap: int,
    k_occ: int,
):
    """Two chunks per grid step with their extraction loops INTERLEAVED.

    The single-chunk loop body is one serial dependence chain of small
    reduce/broadcast ops (min -> eq -> argmin -> masked sums), so the VPU
    sits ~55% idle on latency. Interleaving two independent chains doubles
    the ILP the scheduler can exploit; the price is a shared trip count
    max(block_k_a, block_k_b) and 2x scratch."""
    i = pl.program_id(0)
    cps = []
    for s in (0, 1):
        row = rows_ref[2 * i + s]
        lo = pl.multiple_of(los_ref[2 * i + s], 128)
        slice_cp = pltpu.make_async_copy(
            bank_ref.at[row, :, pl.ds(lo, w_sl)],
            cand_scr.at[s, :, pl.ds(0, w_sl)],
            sems.at[2 * s],
        )
        wide_cp = pltpu.make_async_copy(
            wide_ref.at[row],
            cand_scr.at[s, :, pl.ds(w_sl, wide_cap)],
            sems.at[2 * s + 1],
        )
        slice_cp.start()
        wide_cp.start()
        cps.append((slice_cp, wide_cp, row))

    sides = []
    for s, (slice_cp, wide_cp, row) in enumerate(cps):
        feat = (feat_a_ref if s == 0 else feat_b_ref)[0]
        slice_cp.wait()
        wide_cp.wait()
        score, a1b, a2b, ovf, block_k = _prep_side(
            feat, cand_scr[s], counts_ref[row],
            blk=blk, w_sl=w_sl, k_occ=k_occ,
        )
        ovf_out[s, 0, :] = ovf
        a12d_out[pl.ds(0, 2 * k_occ), pl.ds(s * blk, blk)] = jnp.zeros(
            (2 * k_occ, blk), jnp.float32
        )
        a12d_out[pl.ds(2 * k_occ, k_occ), pl.ds(s * blk, blk)] = jnp.full(
            (k_occ, blk), _BIG, jnp.float32
        )
        sides.append((score, a1b, a2b, block_k))

    col = jax.lax.broadcasted_iota(jnp.int32, (blk, sides[0][0].shape[1]), 1)
    block_k = jnp.maximum(sides[0][3], sides[1][3])

    def body(k, carry):
        return tuple(
            _extract_step(
                k, carry[s], col, sides[s][1], sides[s][2],
                a12d_out, s, k_occ,
            )
            for s in (0, 1)
        )

    jax.lax.fori_loop(0, block_k, body, (sides[0][0], sides[1][0]))


def make_pallas_occluder_phase(
    *, blk: int, w_sl: int, wide_cap: int, k_occ: int, beam_rad: float,
    interpret: bool = False, pair: bool = False,
    band: int = 0, band_group: int = 8, wide_sl: int = 0,
    transposed: bool = False, batch_fold: bool = False,
    route_band: int = 0,
):
    """Build the fused phase-A callable for fixed static shapes.

    The returned function takes (feats_b, w0_blocks, rows, los, counts,
    bank_data_t, bank_wide_t[, has]) and returns (a12d, overflow) shaped
    ((3K, n_chunks * blk), (n_chunks, blk)) — rows [0,K) = a1, [K,2K) = a2,
    [2K,3K) = dist, K OUTER with blk on the lane dim; occluder validity is
    dist < 1e37. One merged array (instead of a1/a2/dist/valid separately)
    keeps the downstream compaction gather to ONE launch — three separate
    (cap, K) gathers were ~0.94 ms each — and drops the per-trip valid-row
    store. K outer means `reshape(3K, n_chunks * blk)` is free, so the
    former per-step (n_chunks, 3K, blk) -> (3K, n2) transpose copy
    (0.73 ms/step) disappears. Transposing to (..., blk, 3K) would
    materialize arrays whose minor dim pads to 128 lanes (HBM waste at n2
    scale); callers should gather first and transpose at compact scale.

    `has` (i32 (n_chunks,), default all-live) gates the whole kernel body
    per chunk: dead spill windows (no in-channel row) skip the DMAs, the
    prep, and the extraction loop (~20% of chunks at bench shapes).

    feats_b is `point_features` over the (channel, azimuth)-SORTED point
    order, reshaped (n_pad // blk, blk, F); chunk i reads feature block
    w0_blocks[i] via the scalar-prefetch-driven index map. Sorted-order
    windows make the slot layout gather-free: the caller carries x/y/z/etc
    as sort payloads instead of gathering them into (C, pch) slots (the two
    slot gathers were 25% of the bench step).

    With band > 0 the DUAL-BANDED kernel runs: pass per-GROUP head/tail
    band starts gloa/glob flattened (n_chunks * blk/band_group,) plus the
    same pair as a (n_chunks, 2, G) i32 vector array; w_sl is ignored.
    Returns an extra (n_chunks, blk) uncovered-point plane (the in-kernel
    per-point coverage check).
    """
    if band:
        g_dim = blk // band_group
        assert blk % band_group == 0
        w_used = wide_sl or wide_cap

        def run_banded(feats_b, w0_blocks, rows, gloc, gloa, glob, glo_vec,
                       counts, bank_data_t, bank_wide_t, delta: float):
            n_chunks = rows.shape[0]
            kern = functools.partial(
                _kernel_banded, blk=blk, band=band, group=band_group,
                w_chunk=w_sl, wide_sl=w_used, k_occ=k_occ, delta=delta,
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec(
                        (1, blk, N_FEAT), lambda i, w0b, *_: (w0b[i], 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, g_dim, 2), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (3 * k_occ, blk), lambda i, *_: (0, i),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 2, blk), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((N_PROP, w_sl), jnp.float32),
                    pltpu.VMEM((N_PROP, bank_wide_t.shape[2]), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            a12d, ovf = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct(
                        (3 * k_occ, n_chunks * blk), jnp.float32
                    ),
                    jax.ShapeDtypeStruct((n_chunks, 2, blk), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
                interpret=interpret,
            )(w0_blocks, rows, gloc, gloa, glob, counts, feats_b, glo_vec,
              bank_data_t, bank_wide_t)
            return a12d, ovf[:, 0, :], ovf[:, 1, :]

        return run_banded
    if route_band:
        g_dim = blk // band_group
        assert blk % band_group == 0
        w_used = wide_sl or wide_cap

        def run_routed(feats_b, w0_blocks, rows, los, gloa, mode, counts,
                       bank_data_t, bank_wide_t):
            """mode (n_chunks,) i32: 0 dead, 1 full-slice, 2 fast-banded;
            gloa (n_chunks * G,) absolute 128-aligned per-group band starts
            (clamped into [los, los + w_sl - route_band] by the caller)."""
            n_chunks = rows.shape[0]
            kern = functools.partial(
                _kernel_routed, blk=blk, w_sl=w_sl, wide_cap=wide_cap,
                k_occ=k_occ, band=route_band, group=band_group,
                wide_sl=w_used,
            )
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(n_chunks,),
                in_specs=[
                    pl.BlockSpec(
                        (1, blk, N_FEAT), lambda i, w0b, *_: (w0b[i], 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec(
                        (3 * k_occ, blk), lambda i, *_: (0, i),
                        memory_space=pltpu.VMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, blk), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((N_PROP, w_sl + wide_cap), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            a12d, ovf = pl.pallas_call(
                kern,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct(
                        (3 * k_occ, n_chunks * blk), jnp.float32
                    ),
                    jax.ShapeDtypeStruct((n_chunks, 1, blk), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
                interpret=interpret,
            )(w0_blocks, rows, los, gloa, mode, counts, feats_b,
              bank_data_t, bank_wide_t)
            return a12d, ovf[:, 0, :]

        return run_routed
    if pair:
        kernel = functools.partial(
            _kernel_pair, blk=blk, w_sl=w_sl, wide_cap=wide_cap, k_occ=k_occ,
        )
    elif transposed:
        kernel = functools.partial(
            _kernel_t, blk=blk, w_sl=w_sl, wide_cap=wide_cap, k_occ=k_occ,
        )
    else:
        kernel = functools.partial(
            _kernel, blk=blk, w_sl=w_sl, wide_cap=wide_cap, k_occ=k_occ,
        )

    def run(feats_b, w0_blocks, rows, los, counts, bank_data_t, bank_wide_t,
            has=None):
        n_chunks = rows.shape[0]
        gated = not pair and not transposed
        if gated and has is None:
            has = jnp.ones((n_chunks,), jnp.int32)
        if pair:
            assert n_chunks % 2 == 0, "pair=True needs an even chunk count"
            grid = (n_chunks // 2,)
            feat_specs = [
                pl.BlockSpec(
                    (1, blk, N_FEAT),
                    lambda i, w0b, *_: (w0b[2 * i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, blk, N_FEAT),
                    lambda i, w0b, *_: (w0b[2 * i + 1], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            feat_args = (feats_b, feats_b)
            blk0 = 2
            scratch = [
                pltpu.VMEM((2, N_PROP, w_sl + wide_cap), jnp.float32),
                pltpu.SemaphoreType.DMA((4,)),
            ]
        else:
            grid = (n_chunks,)
            feat_specs = [
                pl.BlockSpec(
                    (1, N_FEAT, blk) if transposed else (1, blk, N_FEAT),
                    lambda i, w0b, *_: (w0b[i], 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            feat_args = (feats_b,)
            blk0 = 1
            scratch = [
                pltpu.VMEM((N_PROP, w_sl + wide_cap), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5 if gated else 4,
            grid=grid,
            in_specs=feat_specs + [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (3 * k_occ, blk0 * blk), lambda i, *_: (0, i),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (blk0, 1, blk), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=scratch,
        )
        prefetch = (
            (w0_blocks, rows, los, has, counts) if gated
            else (w0_blocks, rows, los, counts)
        )
        a12d, ovf = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct(
                    (3 * k_occ, n_chunks * blk), jnp.float32
                ),
                jax.ShapeDtypeStruct((n_chunks, 1, blk), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                # allow wide blocks (blk x slice intersection state)
                vmem_limit_bytes=(128 if pair else 64) * 1024 * 1024,
            ),
            interpret=interpret,
        )(*prefetch, *feat_args, bank_data_t, bank_wide_t)
        return a12d, ovf[:, 0, :]

    # Under vmap over a frame batch the scalar-prefetch pallas_call falls
    # back to a serial while loop (one launch per frame). batch_fold=True
    # instead folds the batch into ONE grid via custom_vmap: chunk
    # metadata flattens, feature-block indices shift by the frame's block
    # offset, and the K-outer (3K, B*n2) output splits back along its
    # contiguous lane axis — identical per-frame results (pure index
    # arithmetic; every chunk computes exactly what it did unfolded).
    # MUST stay off under GSPMD sharding (see SnowfallConfig.batch_fold).
    if not batch_fold or pair or transposed:
        return run

    from jax import custom_batching

    def folded(feats_b, w0_blocks, rows, los, has, counts,
               bank_data_t, bank_wide_t):
        return run(feats_b, w0_blocks, rows, los, counts,
                   bank_data_t, bank_wide_t, has=has)

    cv = custom_batching.custom_vmap(folded)

    @cv.def_vmap
    def _fold_rule(axis_size, in_batched, feats_b, w0b, rows, los, has,
                   counts, data_t, wide_t):
        assert in_batched[:5] == [True] * 5 and not any(in_batched[5:]), (
            "batch_fold expects per-frame chunk metadata batched and "
            "banks/calib broadcast"
        )
        b = axis_size
        nb = feats_b.shape[1]
        n_chunks = rows.shape[1]
        fb = feats_b.reshape((b * nb,) + feats_b.shape[2:])
        w0 = (
            w0b + (jnp.arange(b, dtype=w0b.dtype) * nb)[:, None]
        ).reshape(-1)
        a12d, ovf = run(
            fb, w0, rows.reshape(-1), los.reshape(-1), counts,
            data_t, wide_t, has=has.reshape(-1),
        )
        a12d_b = jnp.moveaxis(a12d.reshape(3 * k_occ, b, -1), 1, 0)
        return (a12d_b, ovf.reshape(b, n_chunks, -1)), (True, True)

    def run_folded(feats_b, w0_blocks, rows, los, counts,
                   bank_data_t, bank_wide_t, has=None):
        if has is None:
            has = jnp.ones((rows.shape[0],), jnp.int32)
        return cv(feats_b, w0_blocks, rows, los, has, counts,
                  bank_data_t, bank_wide_t)

    return run_folded
