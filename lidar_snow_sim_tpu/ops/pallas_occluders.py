"""Fused occluder-selection Pallas kernel (dense-assembly phase A).

The XLA dense path materializes per-chunk (block_points x slice_width)
interval/hit/score arrays in HBM (~0.8 GB of traffic per scan at the bench
shapes). This kernel keeps everything in VMEM: per grid step it DMAs one
bank slice (row, lo..lo+W) plus the wide list into scratch, runs the exact
intersection test + tangent-interval computation (ops.geometry semantics,
inlined in beam-broadcast form), and extracts the K nearest intersecting
particles with an iterative masked-argmin loop — bit-identical to
jax.lax.top_k's value-then-lowest-index ordering, which is the reference's
claim priority (simulation.py:412-417).

Outputs per point: clipped interval angles a1/a2, particle range, validity,
and the overflow count beyond K. The caller masks by point validity and
feeds the compacted sweep/pulse phases exactly as with the XLA path.
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


def _wrap_02pi(a):
    a = jnp.where(a < 0, a + TWO_PI, a)
    return jnp.where(a > TWO_PI, a - TWO_PI, a)


def _kernel(
    rows_ref,      # (n_chunks,) i32, scalar-prefetch
    los_ref,       # (n_chunks,) i32, scalar-prefetch
    pts_ref,       # (1, blk, 3) VMEM block
    bank_ref,      # (C_banks, K_ext, 4) in HBM/ANY
    wide_ref,      # (C_banks, Wc, 4) in HBM/ANY
    a1_out,        # (1, K, blk) — K on the sublane axis so each k-step
    a2_out,        #               writes one contiguous lane row
    dist_out,      # (1, K, blk)
    valid_out,     # (1, K, blk) f32 0/1
    ovf_out,       # (1, 1, blk) i32
    cand_scr,      # VMEM (W + Wc, 4)
    sems,          # DMA semaphores (2,)
    *,
    blk: int,
    w_sl: int,
    wide_cap: int,
    k_occ: int,
    beam_rad: float,
):
    i = pl.program_id(0)
    row = rows_ref[i]
    lo = los_ref[i]

    slice_cp = pltpu.make_async_copy(
        bank_ref.at[row, pl.ds(lo, w_sl), :], cand_scr.at[pl.ds(0, w_sl), :],
        sems.at[0],
    )
    wide_cp = pltpu.make_async_copy(
        wide_ref.at[row], cand_scr.at[pl.ds(w_sl, wide_cap), :], sems.at[1]
    )
    slice_cp.start()
    wide_cp.start()

    xyz = pts_ref[0]                                  # (blk, 3)
    x, y = xyz[:, 0:1], xyz[:, 1:2]                   # (blk, 1)
    d_orig = jnp.sqrt(jnp.sum(xyz * xyz, axis=1, keepdims=True))
    center = _wrap_02pi(jnp.arctan2(y, x))
    right = _wrap_02pi(center - beam_rad / 2)
    left = _wrap_02pi(center + beam_rad / 2)
    wrapped_beam = right > left
    sin_r, cos_r = jnp.sin(right), jnp.cos(right)
    sin_l, cos_l = jnp.sin(left), jnp.cos(left)

    slice_cp.wait()
    wide_cp.wait()

    cand = cand_scr[:]                                # (C, 4)
    px = cand[:, 0][None, :]                          # (1, C)
    py = cand[:, 1][None, :]
    pr = cand[:, 2][None, :]
    pdist = cand[:, 3][None, :]

    # ---- exact intersection test (ops/geometry.candidate_intervals) ----
    pang = _wrap_02pi(jnp.arctan2(py, px))            # (1, C) -> broadcast
    center_in = (right <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right - TWO_PI <= pang) & (pang <= left)
    center_in |= wrapped_beam & (right <= pang) & (pang <= left + TWO_PI)

    dist_r = jnp.abs(px * sin_r - py * cos_r)
    dist_l = jnp.abs(px * sin_l - py * cos_l)
    right_hit = (dist_r < pr) & (jnp.cos(right - pang) > 0)
    left_hit = (dist_l < pr) & (jnp.cos(left - pang) > 0)

    hit = (center_in | right_hit | left_hit) & (pdist < d_orig)  # (blk, C)

    delta = jnp.arcsin(jnp.clip(pr / jnp.maximum(pdist, 1e-12), 0.0, 1.0))
    a1 = jnp.where(right_hit, right, _wrap_02pi(pang - delta))  # (blk, C)
    a2 = jnp.where(left_hit, left, _wrap_02pi(pang + delta))

    n_hit = jnp.sum(hit.astype(jnp.int32), axis=1)
    ovf_out[0, 0, :] = jnp.maximum(n_hit - k_occ, 0)

    # ---- iterative nearest-K extraction (== top_k value/index order) ----
    score = jnp.where(hit, jnp.broadcast_to(pdist, hit.shape), _BIG)
    c = score.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (blk, c), 1)

    a1b = jnp.broadcast_to(a1, (blk, c))
    a2b = jnp.broadcast_to(a2, (blk, c))
    for k in range(k_occ):
        m = jnp.min(score, axis=1, keepdims=True)          # (blk, 1)
        eq = score == m
        first = jnp.min(jnp.where(eq, col, c), axis=1, keepdims=True)
        onehot = col == first
        valid = m < _BIG
        a1_out[0, k, :] = jnp.sum(jnp.where(onehot, a1b, 0.0), axis=1)
        a2_out[0, k, :] = jnp.sum(jnp.where(onehot, a2b, 0.0), axis=1)
        dist_out[0, k, :] = m[:, 0]
        valid_out[0, k, :] = valid[:, 0].astype(jnp.float32)
        score = jnp.where(onehot, _BIG, score)


def make_pallas_occluder_phase(
    *, blk: int, w_sl: int, wide_cap: int, k_occ: int, beam_rad: float,
    interpret: bool = False,
):
    """Build the fused phase-A callable for fixed static shapes."""
    kernel = functools.partial(
        _kernel, blk=blk, w_sl=w_sl, wide_cap=wide_cap, k_occ=k_occ,
        beam_rad=beam_rad,
    )

    def run(pts_blk, rows, los, bank_data, bank_wide):
        n_chunks = pts_blk.shape[0]
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(
                    (1, blk, 3), lambda i, *_: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
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
                pltpu.VMEM((w_sl + wide_cap, 4), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
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
            interpret=interpret,
        )(rows, los, pts_blk, bank_data, bank_wide)
        tr = lambda v: jnp.swapaxes(v, 1, 2)          # -> (n_chunks, blk, K)
        return tr(a1), tr(a2), tr(dist), tr(valid) > 0.5, ovf[:, 0, :]

    return run
