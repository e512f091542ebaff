"""Fused sweep + pulse-resimulation Pallas kernel (dense-assembly phase C).

Per compacted occluded point this fuses:
1. the first-claim angular sweep (ops/sweep.py semantics) as an iterative
   extract-min walk over the interval endpoints: each trip retires ALL
   copies of the current minimum (duplicates form zero-width sub-intervals
   that claim nothing), so the trip count is bounded by the block's distinct
   endpoint count (2*max_valid_occluders + 3, typically ~19 of 50), and
2. the received-pulse waveform accumulation + argmax over the 1230-bin
   quantized grid (ops/waveform.py semantics, angle-addition form), with the
   occluder-bump loop stopping at the block's last active bump.

EVERYTHING IS TRANSPOSED: points ride the LANE axis. Inputs are K-OUTER
(rows, cap) planes — a1/a2/rr/valid (K, cap), phase factors (K+1, cap),
features (F, cap) — consumed as (rows, blk) blocks, so

- the XLA staging never materializes (cap, K) arrays whose 24-wide minor
  dim pads 5.3x under TPU (8, 128) tiling (the former layout cost several
  0.7 ms fusions per step writing padded HBM temps), and
- the sweep state is (K, blk) / (M_e, blk): VMEM tiles are fully dense,
  where the old (blk, K) layout used 24 of 128 lanes (81% of every vector
  op wasted). The waveform accumulates as (M_bins, blk) with bins on
  sublanes; peak/argmax become sublane reductions whose (1, blk) results
  land directly in the output rows.

All reductions are min/max/one-hot-sum over identical value sets, so
outputs are bit-identical to the row-major formulation (and the window
path) — verified by tests/test_dense_assembly.py.

Mosaic has no sin/cos lowering here either, so the per-bump phase factors
cos/sin(2 pi r / ctau) and the xsi ramp are computed OUTSIDE in XLA and
passed as inputs; the kernel is transcendental-free.

Bump set = every occluder with nonzero claimed ratio plus the hard target —
i.e. max_bumps == max_occluders semantics. That is exactly the reference
pipeline whenever bump_overflow would be zero (the only state the host
wrapper accepts); configs with max_bumps < max_occluders that would overflow
raise in either path.

Outputs per point: peak value, peak bin index, touched flag (any nonzero
claim). The label/intensity decision tail stays in XLA (cheap elementwise).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TWO_PI = 2.0 * math.pi
_BIG = 3.0e38


def _side_state(feat, a1, a2, rr, valid, *, blk, k_occ, beam_rad, ipm,
                c_tau, xsi_r1, xsi_r2):
    """Pre-loop sweep state + post-sweep waveform inputs for one block.

    feat is (F, blk) rows [d_orig, right, left, amp_scale]; a1/a2/rr are
    (K, blk); valid is (K, blk) bool. Returns (endpoints (M_e, blk),
    a1_adj, a2_adj, valid, trips, finish) where finish(claimed, unclaimed)
    computes (rr_all (K+1, blk), amp_all, last_active, touched (1, blk),
    remainder (1, blk)).
    """
    d_orig = feat[0:1, :]                                 # (1, blk)
    right = feat[1:2, :]
    left = feat[2:3, :]
    amp_scale = feat[3:4, :]

    wrapped = right > left
    right_u = jnp.where(wrapped, right - TWO_PI, right)
    a1 = jnp.where(wrapped & (a1 > a2), a1 - TWO_PI, a1)
    a1 = jnp.where(valid, a1, jnp.broadcast_to(left, a1.shape))
    a2 = jnp.where(valid, a2, jnp.broadcast_to(left, a2.shape))

    endpoints = jnp.concatenate([right_u, left, a1, a2], axis=0)  # (M_e, blk)
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=0)            # (blk,)
    m_e = 2 * k_occ + 2
    trips = jnp.minimum(2 * jnp.max(n_valid) + 3, m_e)

    def finish(claimed, unclaimed):
        ratio = jnp.clip(claimed / beam_rad, 0.0, 1.0)     # (K, blk)
        remainder = jnp.clip(unclaimed / beam_rad, 0.0, 1.0)  # (1, blk)
        touched = jnp.any(claimed > 0.0, axis=0, keepdims=True)

        def xsi(r):
            return jnp.clip((r - xsi_r1) / (xsi_r2 - xsi_r1), 0.0, 1.0)

        rr_all = jnp.concatenate([rr, d_orig], axis=0)     # (K+1, blk)
        share = jnp.concatenate([ratio, remainder], axis=0)
        # share == 0 zeroes the bump; clamp r so 1/r^2 of filler occluders
        # (dist ~ 3e38) cannot produce 0 * inf = NaN
        r_amp = jnp.clip(rr_all, 1e-6, 1e6)
        amp_all = amp_scale * share * xsi(r_amp) / (r_amp * r_amp)
        row_k = jax.lax.broadcasted_iota(jnp.int32, (k_occ, ratio.shape[1]), 0)
        last_active = jnp.max(jnp.where(ratio > 0.0, row_k + 1, 0))
        return rr_all, amp_all, last_active, touched, remainder

    return endpoints, a1, a2, valid, trips, finish


def _sweep_step(k, carry, a1, a2, valid, row_k, k_occ):
    """One extract-min sweep trip in (K, blk) layout: retire ALL copies of
    the current minimum endpoint; claim the elementary sub-interval for the
    first (nearest) covering occluder."""
    score, prev, claimed, unclaimed = carry
    cur = jnp.min(score, axis=0, keepdims=True)            # (1, blk)
    live = cur < _BIG / 2                                  # row not done
    width = jnp.where((k > 0) & live, cur - prev, 0.0)     # (1, blk)
    mid = 0.5 * (cur + prev)
    cover_k = (a1 <= mid) & (mid <= a2) & valid            # (K, blk)
    widx = jnp.min(
        jnp.where(cover_k, row_k, k_occ), axis=0, keepdims=True
    )
    claimed = claimed + jnp.where(row_k == widx, width, 0.0)
    unclaimed = unclaimed + jnp.where(widx >= k_occ, width, 0.0)
    score = jnp.where(score == cur, _BIG, score)
    prev = jnp.where(live, cur, prev)
    return score, prev, claimed, unclaimed


def _sweep_init(endpoints, blk, k_occ):
    return (
        endpoints,
        jnp.zeros((1, blk), jnp.float32),
        jnp.zeros((k_occ, blk), jnp.float32),
        jnp.zeros((1, blk), jnp.float32),
    )


def _make_wave_fns(cosg_ref, sing_ref, blk, k_occ, ipm, c_tau):
    """Waveform helpers in (M_bins, blk) layout: bins on SUBLANES, points
    on LANES — every per-point bump parameter is a (1, blk) lane row, so no
    relayouts enter the accumulation loop."""
    cos_g = cosg_ref[0][:, None]                           # (M, 1)
    sin_g = sing_ref[0][:, None]
    m_bins = cos_g.shape[0]
    bins = jax.lax.broadcasted_iota(jnp.int32, (m_bins, 1), 0).astype(
        jnp.float32
    )

    def bump_wave(r_b, amp_b, cb, sb):
        # r_b/amp_b/cb/sb: (1, blk); result (M, blk)
        window = (bins >= r_b * ipm) & (bins <= (r_b + c_tau) * ipm)
        pulse = 0.5 * (1.0 - (cos_g * cb + sin_g * sb))
        return jnp.where(window, amp_b * pulse, 0.0)

    row_b = jax.lax.broadcasted_iota(jnp.int32, (k_occ + 1, blk), 0)

    def wave_side(b, wave, rr_all, amp_all, cb_all, sb_all):
        sel = row_b == b
        pick = lambda v: jnp.sum(
            jnp.where(sel, v, 0.0), axis=0, keepdims=True
        )
        return wave + bump_wave(
            pick(rr_all), pick(amp_all), pick(cb_all), pick(sb_all)
        )

    def peak_of(wave):
        peak = jnp.max(wave, axis=0, keepdims=True)        # (1, blk)
        rows = jax.lax.broadcasted_iota(jnp.int32, wave.shape, 0)
        first = jnp.min(
            jnp.where(wave == peak, rows, m_bins), axis=0, keepdims=True
        )
        return peak, first

    return bump_wave, wave_side, peak_of


def _kernel(
    feat_ref,      # (F, blk) block: rows [d_orig, right, left, amp_scale]
    a1_ref,        # (K, blk) occluder interval starts
    a2_ref,        # (K, blk) occluder interval ends
    rr_ref,        # (K, blk) occluder ranges
    valid_ref,     # (K, blk) f32 0/1 occluder validity
    cosb_ref,      # (K+1, blk) cos(2 pi r / ctau) per bump + target
    sinb_ref,      # (K+1, blk) sin per bump + target
    cosg_ref,      # (1, M) grid table cos(2 pi R / ctau)
    sing_ref,      # (1, M) grid table sin
    peak_ref,      # (1, 1, blk) f32 peak value
    idx_ref,       # (1, 1, blk) i32 peak bin
    touched_ref,   # (1, 1, blk) f32 0/1
    remainder_ref, # (1, 1, blk) f32 unclaimed ratio
    *,
    blk: int,
    k_occ: int,
    beam_rad: float,
    ipm: float,
    c_tau: float,
    xsi_r1: float,
    xsi_r2: float,
):
    endpoints, a1, a2, valid, trips, finish = _side_state(
        feat_ref[...], a1_ref[...], a2_ref[...], rr_ref[...],
        valid_ref[...] > 0.5,
        blk=blk, k_occ=k_occ, beam_rad=beam_rad, ipm=ipm, c_tau=c_tau,
        xsi_r1=xsi_r1, xsi_r2=xsi_r2,
    )
    row_k = jax.lax.broadcasted_iota(jnp.int32, (k_occ, blk), 0)

    def sweep_body(k, carry):
        return _sweep_step(k, carry, a1, a2, valid, row_k, k_occ)

    # distinct endpoint values <= 2 * (block max valid occluders) + 2;
    # +1 because trip 0 only primes `prev`
    _, _, claimed, unclaimed = jax.lax.fori_loop(
        0, trips, sweep_body, _sweep_init(endpoints, blk, k_occ)
    )

    rr_all, amp_all, last_active, touched, remainder = finish(
        claimed, unclaimed
    )
    touched_ref[0, 0, :] = touched[0].astype(jnp.float32)
    remainder_ref[0, 0, :] = remainder[0]

    bump_wave, wave_side, peak_of = _make_wave_fns(
        cosg_ref, sing_ref, blk, k_occ, ipm, c_tau
    )
    cb_all = cosb_ref[...]                                 # (K+1, blk)
    sb_all = sinb_ref[...]

    # hard-target bump (row K) unconditionally
    wave0 = bump_wave(
        rr_all[k_occ:, :], amp_all[k_occ:, :],
        cb_all[k_occ:, :], sb_all[k_occ:, :],
    )

    def wave_body(b, wave):
        return wave_side(b, wave, rr_all, amp_all, cb_all, sb_all)

    # occluder bumps beyond the block's last active one contribute zero for
    # every point (amp == 0), so the loop stops there — EXACT, and typically
    # ~3 trips instead of K
    wave = jax.lax.fori_loop(0, last_active, wave_body, wave0)

    peak, first = peak_of(wave)
    peak_ref[0, 0, :] = peak[0]
    idx_ref[0, 0, :] = first[0]


def _kernel_pair(
    feat_ref,      # (F, 2*blk) block: chunks 2i | 2i+1 on the lane axis
    a1_ref,        # (K, 2*blk)
    a2_ref,
    rr_ref,
    valid_ref,
    cosb_ref,      # (K+1, 2*blk)
    sinb_ref,
    cosg_ref,      # (1, M)
    sing_ref,
    peak_ref,      # (2, 1, blk)
    idx_ref,
    touched_ref,
    remainder_ref,
    *,
    blk: int,
    k_occ: int,
    beam_rad: float,
    ipm: float,
    c_tau: float,
    xsi_r1: float,
    xsi_r2: float,
):
    """Two pulse blocks per grid step, sweep + wave loops INTERLEAVED.

    The sweep walk is a sequential dependence chain of small reduce ops;
    two independent chains double the exploitable ILP. Count-bucketed
    compaction (models/snowfall.py phase B) sorts blocks by occluder
    count, so ADJACENT blocks have near-equal trip counts and the shared
    max(trips_a, trips_b) costs ~nothing. Extra trips on the shorter side
    are exact no-ops (live-row guard in the sweep; amp == 0 bumps in the
    wave). Measured SLOWER than the single-block kernel at bench shapes
    (BASELINE.md round-2 tail) — kept as the opt-in `pulse_pair` knob."""
    kw = dict(
        blk=blk, k_occ=k_occ, beam_rad=beam_rad, ipm=ipm, c_tau=c_tau,
        xsi_r1=xsi_r1, xsi_r2=xsi_r2,
    )
    sides = []
    for s in (0, 1):
        lane = pl.ds(s * blk, blk)
        sides.append((
            _side_state(
                feat_ref[:, lane], a1_ref[:, lane], a2_ref[:, lane],
                rr_ref[:, lane], valid_ref[:, lane] > 0.5, **kw,
            ),
            cosb_ref[:, lane], sinb_ref[:, lane],
        ))

    row_k = jax.lax.broadcasted_iota(jnp.int32, (k_occ, blk), 0)
    trips = jnp.maximum(sides[0][0][4], sides[1][0][4])

    def sweep_body(k, carry):
        return tuple(
            _sweep_step(
                k, carry[s], sides[s][0][1], sides[s][0][2], sides[s][0][3],
                row_k, k_occ,
            )
            for s in (0, 1)
        )

    carries = jax.lax.fori_loop(
        0, trips, sweep_body,
        (
            _sweep_init(sides[0][0][0], blk, k_occ),
            _sweep_init(sides[1][0][0], blk, k_occ),
        ),
    )

    bump_wave, wave_side, peak_of = _make_wave_fns(
        cosg_ref, sing_ref, blk, k_occ, ipm, c_tau
    )

    waves = []
    for s in (0, 1):
        (_, _, _, _, _, finish), cb_all, sb_all = sides[s]
        _, _, claimed, unclaimed = carries[s]
        rr_all, amp_all, last_active, touched, remainder = finish(
            claimed, unclaimed
        )
        touched_ref[s, 0, :] = touched[0].astype(jnp.float32)
        remainder_ref[s, 0, :] = remainder[0]
        wave0 = bump_wave(
            rr_all[k_occ:, :], amp_all[k_occ:, :],
            cb_all[k_occ:, :], sb_all[k_occ:, :],
        )
        waves.append((wave0, rr_all, amp_all, cb_all, sb_all, last_active))

    last_active = jnp.maximum(waves[0][5], waves[1][5])

    def wave_body(b, carry):
        return tuple(
            wave_side(b, carry[s], *waves[s][1:5]) for s in (0, 1)
        )

    final = jax.lax.fori_loop(
        0, last_active, wave_body, (waves[0][0], waves[1][0])
    )

    for s in (0, 1):
        peak, first = peak_of(final[s])
        peak_ref[s, 0, :] = peak[0]
        idx_ref[s, 0, :] = first[0]


def make_pallas_pulse_phase(
    *, blk: int, k_occ: int, beam_rad: float, ipm: float, c_tau: float,
    xsi_r1: float, xsi_r2: float, interpret: bool = False, pair: bool = False,
):
    """Build the fused phase-C callable for fixed static shapes.

    Takes K-OUTER planes — feats (F, cap) rows [d_orig, right, left,
    amp_scale], a1/a2/rr/valid (K, cap), cos_b/sin_b (K+1, cap), grid
    tables cos_g/sin_g (M,) — and returns (peak, idx, touched, remainder)
    each (cap // blk, blk). Occluder properties are separate planes with
    the ROW axis minor-most never materialized: a (cap, K) layout would
    pad its 24-wide minor dim 5.3x under TPU (8, 128) tiling both in HBM
    temps and in VMEM tiles (24 of 128 lanes used by every sweep op).
    """
    if pair:
        kernel = functools.partial(
            _kernel_pair, blk=blk, k_occ=k_occ, beam_rad=beam_rad, ipm=ipm,
            c_tau=c_tau, xsi_r1=xsi_r1, xsi_r2=xsi_r2,
        )
    else:
        kernel = functools.partial(
            _kernel, blk=blk, k_occ=k_occ, beam_rad=beam_rad, ipm=ipm,
            c_tau=c_tau, xsi_r1=xsi_r1, xsi_r2=xsi_r2,
        )

    def run(feats, a1, a2, rr, valid, cos_b, sin_b, cos_g, sin_g):
        cap = feats.shape[1]
        n_blk = cap // blk
        m_bins = cos_g.shape[0]

        if pair:
            assert n_blk % 2 == 0, "pair=True needs an even block count"
            grid = (n_blk // 2,)
            lanes = 2 * blk
            blk0 = 2
        else:
            grid = (n_blk,)
            lanes = blk
            blk0 = 1

        def spec(rows):
            # rows == the full first dim, so the block is always
            # Mosaic-legal regardless of K/F divisibility
            return pl.BlockSpec((rows, lanes), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        in_specs = (
            [spec(feats.shape[0])]
            + [spec(k_occ)] * 4
            + [spec(k_occ + 1)] * 2
            + [
                pl.BlockSpec((1, m_bins), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, m_bins), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ]
        )
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((blk0, 1, blk), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ] * 4,
            out_shape=[
                jax.ShapeDtypeStruct((n_blk, 1, blk), jnp.float32),
                jax.ShapeDtypeStruct((n_blk, 1, blk), jnp.int32),
                jax.ShapeDtypeStruct((n_blk, 1, blk), jnp.float32),
                jax.ShapeDtypeStruct((n_blk, 1, blk), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                # wave (M_bins, blk) + window state; the default 16 MB
                # scoped budget is for small kernels
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(feats, a1, a2, rr, valid, cos_b, sin_b,
          cos_g[None, :], sin_g[None, :])
        peak, idx, touched, remainder = out
        return (
            peak[:, 0, :], idx[:, 0, :], touched[:, 0, :] > 0.5,
            remainder[:, 0, :],
        )

    return run
