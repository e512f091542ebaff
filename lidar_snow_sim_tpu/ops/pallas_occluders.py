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

N_FEAT = 8   # point-feature rows
N_PROP = 8   # bank property rows (2 spare)


def point_features(x, y, z, beam_rad: float):
    """Per-point feature rows for the kernel from separate coordinate
    PLANES (a stacked (..., 3) input would make 3 the HBM minormost dim and
    pad 42x under (8, 128) tiling), computed in XLA (atan2/sin/cos are not
    lowerable inside Mosaic)."""
    d = jnp.sqrt(x * x + y * y + z * z)
    center = jnp.arctan2(y, x)
    center = jnp.where(center < 0, center + TWO_PI, center)
    right = center - beam_rad / 2
    right = jnp.where(right < 0, right + TWO_PI, right)
    left = center + beam_rad / 2
    left = jnp.where(left > TWO_PI, left - TWO_PI, left)
    return jnp.stack(
        [
            d, right, left,
            jnp.sin(right), jnp.cos(right), jnp.sin(left), jnp.cos(left),
            (right > left).astype(jnp.float32),
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


def _extract_step(k, score, col, a1b, a2b, a1_out, a2_out, dist_out,
                  valid_out, s: int):
    """One masked-argmin extraction trip (== top_k value/index order);
    writes the k-th occluder of output block row `s` and returns the score
    with the winner retired."""
    c = score.shape[1]
    m = jnp.min(score, axis=1, keepdims=True)          # (blk, 1)
    eq = score == m
    first = jnp.min(jnp.where(eq, col, c), axis=1, keepdims=True)
    onehot = col == first
    valid = m < _BIG
    a1_out[s, pl.ds(k, 1), :] = jnp.sum(
        jnp.where(onehot, a1b, 0.0), axis=1
    )[None, :]
    a2_out[s, pl.ds(k, 1), :] = jnp.sum(
        jnp.where(onehot, a2b, 0.0), axis=1
    )[None, :]
    dist_out[s, pl.ds(k, 1), :] = m[:, 0][None, :]
    valid_out[s, pl.ds(k, 1), :] = valid[:, 0].astype(jnp.float32)[None, :]
    return jnp.where(onehot, _BIG, score)


def _kernel(
    w0b_ref,       # (n_chunks,) i32, scalar-prefetch: feat block per chunk
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    los_ref,       # (n_chunks,) i32, scalar-prefetch
    counts_ref,    # (C_banks,) i32, scalar-prefetch: narrow count per row
    feat_ref,      # (1, blk, N_FEAT) VMEM block
    bank_ref,      # (C_banks, N_PROP, K_ext) in HBM/ANY (ParticleBank.data_t)
    wide_ref,      # (C_banks, N_PROP, Wc) in HBM/ANY (ParticleBank.wide_t)
    a1_out,        # (1, K, blk) — K on the sublane axis so each k-step
    a2_out,        #               writes one contiguous lane row
    dist_out,      # (1, K, blk)
    valid_out,     # (1, K, blk) f32 0/1
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
    feat = feat_ref[0]                                # (blk, N_FEAT)
    slice_cp.wait()
    wide_cp.wait()

    score, a1b, a2b, ovf, block_k = _prep_side(
        feat, cand_scr[:, :], counts_ref[row],
        blk=blk, w_sl=w_sl, k_occ=k_occ,
    )
    ovf_out[0, 0, :] = ovf
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, score.shape[1]), 1)

    a1_out[0] = jnp.zeros((k_occ, blk), jnp.float32)
    a2_out[0] = jnp.zeros((k_occ, blk), jnp.float32)
    dist_out[0] = jnp.full((k_occ, blk), _BIG, jnp.float32)
    valid_out[0] = jnp.zeros((k_occ, blk), jnp.float32)

    # Trip count is the block's max occluder count (occluders are sparse:
    # typically <= 8 of K=24), with untaken slots pre-cleared.
    def body(k, score):
        return _extract_step(
            k, score, col, a1b, a2b,
            a1_out, a2_out, dist_out, valid_out, 0,
        )

    jax.lax.fori_loop(0, block_k, body, score)


def _prep_banded(feat, cand, n_row, *, w_band: int, k_occ: int):
    """Banded intersection test + interval computation.

    feat: (blk, N_FEAT) point features, row p = group p // group's point.
    cand: (G, 1, C) per-property candidate rows (group g's band followed by
    the shared wide list). Semantics identical to _prep_side; only the
    shapes differ — each group's 8 points test their own narrow band.
    Returns (score, a1b, a2b, ovf (G, group), block_k) with (G, group, C)
    score/interval arrays.
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

    hit = (center_in | right_hit | left_hit) & (pdist < d_orig)

    # wrap-pad dedup (banks.py layout): entries repeat with period
    # count[row]; keeping band-local offset < count keeps exactly one
    # period starting at the band's lo (translation-invariant — the band
    # start drops out). Wide columns (offset >= w_band) never duplicate.
    col3 = jax.lax.broadcasted_iota(jnp.int32, (g_dim, group, c), 2)
    hit = hit & ((col3 >= w_band) | (col3 < n_row))

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
    return score, a1, a2, ovf, block_k, col3


def _kernel_banded(
    w0b_ref,       # (n_chunks,) i32, scalar-prefetch: feat block per chunk
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    glo_ref,       # (n_chunks * G,) i32, scalar-prefetch: per-GROUP band lo
    counts_ref,    # (C_banks,) i32, scalar-prefetch
    feat_ref,      # (1, blk, N_FEAT) VMEM block
    bank_ref,      # (C_banks, N_PROP, K_ext) in HBM/ANY
    wide_ref,      # (C_banks, N_PROP, Wc) in HBM/ANY
    a1_out,        # (1, K, blk)
    a2_out,
    dist_out,
    valid_out,
    ovf_out,       # (1, 1, blk) i32
    band_scr,      # VMEM (G, N_PROP, w_band)
    wide_scr,      # VMEM (N_PROP, Wc)
    sems,          # DMA semaphores (G + 1,)
    *,
    blk: int,
    w_band: int,
    group: int,
    wide_sl: int,
    k_occ: int,
):
    """Banded phase A: each band_group consecutive (azimuth-sorted) points
    share one narrow w_band-wide bank band instead of the whole chunk-wide
    slice — same exact semantics, ~4x fewer vector cells per extraction
    trip (the full-width kernel spends most of its VPU work testing
    candidates that can only ever belong to other groups)."""
    i = pl.program_id(0)
    row = rows_ref[i]
    g_dim = blk // group

    wide_cp = pltpu.make_async_copy(wide_ref.at[row], wide_scr, sems.at[g_dim])
    wide_cp.start()
    cps = []
    for g in range(g_dim):
        lo = pl.multiple_of(glo_ref[i * g_dim + g], 128)
        cp = pltpu.make_async_copy(
            bank_ref.at[row, :, pl.ds(lo, w_band)],
            band_scr.at[g],
            sems.at[g],
        )
        cp.start()
        cps.append(cp)
    feat = feat_ref[0]                                    # (blk, N_FEAT)
    wide_cp.wait()
    for cp in cps:
        cp.wait()

    # per-property candidate rows: group band ++ shared wide list
    cand = tuple(
        jnp.concatenate(
            [
                band_scr[:, p, :],
                jnp.broadcast_to(wide_scr[p : p + 1, :wide_sl],
                                 (g_dim, wide_sl)),
            ],
            axis=1,
        )[:, None, :]                                     # (G, 1, C)
        for p in range(6)
    )

    score, a1b, a2b, ovf, block_k, col3 = _prep_banded(
        feat, cand, counts_ref[row], w_band=w_band, k_occ=k_occ,
    )
    ovf_out[0] = ovf.reshape(1, blk)

    a1_out[0] = jnp.zeros((k_occ, blk), jnp.float32)
    a2_out[0] = jnp.zeros((k_occ, blk), jnp.float32)
    dist_out[0] = jnp.full((k_occ, blk), _BIG, jnp.float32)
    valid_out[0] = jnp.zeros((k_occ, blk), jnp.float32)

    c = score.shape[2]

    def body(k, score):
        m = jnp.min(score, axis=2, keepdims=True)          # (G, group, 1)
        eq = score == m
        first = jnp.min(jnp.where(eq, col3, c), axis=2, keepdims=True)
        onehot = col3 == first
        a1_out[0, pl.ds(k, 1), :] = jnp.sum(
            jnp.where(onehot, a1b, 0.0), axis=2
        ).reshape(1, blk)
        a2_out[0, pl.ds(k, 1), :] = jnp.sum(
            jnp.where(onehot, a2b, 0.0), axis=2
        ).reshape(1, blk)
        dist_out[0, pl.ds(k, 1), :] = m[:, :, 0].reshape(1, blk)
        valid_out[0, pl.ds(k, 1), :] = (
            (m[:, :, 0] < _BIG).astype(jnp.float32).reshape(1, blk)
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
    a1_out,        # (2, K, blk)
    a2_out,
    dist_out,
    valid_out,
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
        a1_out[s] = jnp.zeros((k_occ, blk), jnp.float32)
        a2_out[s] = jnp.zeros((k_occ, blk), jnp.float32)
        dist_out[s] = jnp.full((k_occ, blk), _BIG, jnp.float32)
        valid_out[s] = jnp.zeros((k_occ, blk), jnp.float32)
        sides.append((score, a1b, a2b, block_k))

    col = jax.lax.broadcasted_iota(jnp.int32, (blk, sides[0][0].shape[1]), 1)
    block_k = jnp.maximum(sides[0][3], sides[1][3])

    def body(k, carry):
        return tuple(
            _extract_step(
                k, carry[s], col, sides[s][1], sides[s][2],
                a1_out, a2_out, dist_out, valid_out, s,
            )
            for s in (0, 1)
        )

    jax.lax.fori_loop(0, block_k, body, (sides[0][0], sides[1][0]))


def make_pallas_occluder_phase(
    *, blk: int, w_sl: int, wide_cap: int, k_occ: int, beam_rad: float,
    interpret: bool = False, pair: bool = False,
    band: int = 0, band_group: int = 8, wide_sl: int = 0,
):
    """Build the fused phase-A callable for fixed static shapes.

    The returned function takes (feats_b, w0_blocks, rows, los, counts,
    bank_data_t, bank_wide_t) and returns (a1, a2, dist, valid, overflow)
    shaped ((n_chunks, K, blk) x 4, (n_chunks, blk)) — K-MAJOR, i.e. the
    kernel's native output layout with blk on the lane dim. Transposing to
    (..., blk, K) here would materialize arrays whose 24-wide minor dim
    pads to 128 lanes (5.3x HBM waste at n2 scale); callers that need
    point-major slices should gather first and transpose at compact scale.

    feats_b is `point_features` over the (channel, azimuth)-SORTED point
    order, reshaped (n_pad // blk, blk, F); chunk i reads feature block
    w0_blocks[i] via the scalar-prefetch-driven index map. Sorted-order
    windows make the slot layout gather-free: the caller carries x/y/z/etc
    as sort payloads instead of gathering them into (C, pch) slots (the two
    slot gathers were 25% of the bench step).

    With band > 0 the BANDED kernel runs: `los` must then be the per-GROUP
    band starts, flattened (n_chunks * blk/band_group,), and w_sl is
    ignored (each group DMAs its own band-wide slice).
    """
    if band:
        g_dim = blk // band_group
        assert blk % band_group == 0
        w_used = wide_sl or wide_cap
        kernel = functools.partial(
            _kernel_banded, blk=blk, w_band=band, group=band_group,
            wide_sl=w_used, k_occ=k_occ,
        )

        def run_banded(feats_b, w0_blocks, rows, glo, counts,
                       bank_data_t, bank_wide_t):
            n_chunks = rows.shape[0]
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=4,
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
                        (1, k_occ, blk), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ] * 4 + [
                    pl.BlockSpec(
                        (1, 1, blk), lambda i, *_: (i, 0, 0),
                        memory_space=pltpu.VMEM,
                    ),
                ],
                scratch_shapes=[
                    pltpu.VMEM((g_dim, N_PROP, band), jnp.float32),
                    pltpu.VMEM((N_PROP, bank_wide_t.shape[2]), jnp.float32),
                    pltpu.SemaphoreType.DMA((g_dim + 1,)),
                ],
            )
            a1, a2, dist, valid, ovf = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                    jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                    jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                    jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                    jax.ShapeDtypeStruct((n_chunks, 1, blk), jnp.int32),
                ],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024,
                ),
                interpret=interpret,
            )(w0_blocks, rows, glo, counts, feats_b, bank_data_t,
              bank_wide_t)
            return a1, a2, dist, valid > 0.5, ovf[:, 0, :]

        return run_banded
    if pair:
        kernel = functools.partial(
            _kernel_pair, blk=blk, w_sl=w_sl, wide_cap=wide_cap, k_occ=k_occ,
        )
    else:
        kernel = functools.partial(
            _kernel, blk=blk, w_sl=w_sl, wide_cap=wide_cap, k_occ=k_occ,
        )

    def run(feats_b, w0_blocks, rows, los, counts, bank_data_t, bank_wide_t):
        n_chunks = rows.shape[0]
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
                    (1, blk, N_FEAT), lambda i, w0b, *_: (w0b[i], 0, 0),
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
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=feat_specs + [
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=[
                pl.BlockSpec(
                    (blk0, k_occ, blk), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ] * 4 + [
                pl.BlockSpec(
                    (blk0, 1, blk), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            scratch_shapes=scratch,
        )
        a1, a2, dist, valid, ovf = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, k_occ, blk), jnp.float32),
                jax.ShapeDtypeStruct((n_chunks, 1, blk), jnp.int32),
            ],
            compiler_params=pltpu.CompilerParams(
                # allow wide blocks (blk x slice intersection state)
                vmem_limit_bytes=(128 if pair else 64) * 1024 * 1024,
            ),
            interpret=interpret,
        )(w0_blocks, rows, los, counts, *feat_args, bank_data_t, bank_wide_t)
        return a1, a2, dist, valid > 0.5, ovf[:, 0, :]

    # NOTE: under vmap over a frame batch the scalar-prefetch pallas_call
    # falls back to a serial while loop (one launch per frame). Folding the
    # batch into the grid via custom_vmap was MEASURED SLOWER (76.2 vs
    # 70.9 ms/step at batch 8: +330 MB XLA-visible traffic, likely lost
    # carry aliasing) — keep the serial form.
    return run
