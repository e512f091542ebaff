"""Static configuration pytrees for the simulation engines.

All sizes here are *static* (shape-defining) so that the jitted kernels compile
to fixed shapes; data-dependent quantities (particle counts, ground-point
counts, ...) are carried as masks/counts at runtime.

Reference semantics pinned here (file:line refer to SysCV/LiDAR_snow_sim):
- beam divergence default: degrees(3e-3) rad, `tools/snowfall/precompute.py:104`
- lidar_range=120 m, 10 intervals/m, tau_h=1e-8 s, beta_0=1e-6/pi,
  `tools/snowfall/simulation.py:106-109`
- noise_floor=0.7, `tools/snowfall/simulation.py:428`
- wet ground defaults, `tools/wet_ground/augmentation.py:25-27`
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np

SPEED_OF_LIGHT = 299792458.0  # m/s (scipy.constants.speed_of_light)

# Default beam divergence used by the offline datagen driver
# (reference tools/snowfall/precompute.py:104): 3 mrad total opening, in degrees.
DEFAULT_BEAM_DIVERGENCE_DEG = float(np.degrees(3e-3))


@dataclasses.dataclass(frozen=True)
class SnowfallConfig:
    """Static configuration of the snowfall augmentation kernel.

    Shape-defining capacities (tune per workload; overflow is *tracked*, never
    silently wrong — see SnowfallResult.diagnostics):

    - max_points:      padded point capacity of one scan
    - window_size:     angular-window candidate capacity per beam (particles
                       gathered from the angle-sorted bank around the beam)
    - wide_capacity:   capacity of the per-bank "wide particle" list (particles
                       whose angular half-width exceeds `wide_threshold`; they
                       are tested against every beam)
    - max_occluders:   max intersecting particles kept per beam for the
                       angular-interval sweep (kept = nearest by range,
                       matching the reference first-claim priority,
                       simulation.py:412-417)
    - max_bumps:       max occluders with nonzero occlusion ratio fed to the
                       pulse re-simulation (plus one hard-target bump)
    """

    # physics / reference constants
    beam_divergence_deg: float = DEFAULT_BEAM_DIVERGENCE_DEG
    noise_floor: float = 0.7
    lidar_range: float = 120.0
    intervals_per_meter: int = 10
    tau_h: float = 1e-8
    beta_0: float = 1e-6 / math.pi
    xsi_r1: float = 0.9   # receiver overlap ramp start (simulation.py:553)
    xsi_r2: float = 1.0   # receiver overlap ramp end
    range_tolerance: float = 0.2  # |d_max - d_orig| threshold (simulation.py:158)

    # capacities (static shapes). Defaults are sized from measured populations
    # on the heaviest reference rate (2.5 mm/h, ~18k particles/channel):
    # window max 64, intersecting occluders max 14, wide particles max 2 —
    # with ~2x headroom. Overflows raise in the host wrapper, never silently
    # truncate, so denser custom banks fail loudly; bump the capacities then.
    max_points: int = 32768
    window_size: int = 128
    wide_capacity: int = 16
    max_occluders: int = 24
    max_bumps: int = 16
    point_chunk: int = 2048

    # candidate windowing
    wide_threshold: float = 5e-3  # rad; particles with angular half-width
    # above this go to the wide list instead of the angle-sorted window

    # dense-slice assembly (assembly="dense"): points are laid out
    # (channel, azimuth)-sorted into (num_channels, channel_capacity) slots;
    # each block of block_points consecutive beams shares ONE contiguous
    # bank slice of slice_width particles (a dynamic slice, not a gather).
    # chunk_group blocks are vmapped per lax.map step for VPU occupancy.
    assembly: str = "window"        # "window" | "dense"
    channel_capacity: int = 1024    # max points per channel (dense)
    block_points: int = 128         # beams per shared slice (dense)
    slice_width: int = 768          # particles per shared slice (dense)
    chunk_group: int = 8            # blocks vmapped together (dense)
    # sweep + pulse re-simulation run only on points with >= 1 occluder,
    # compacted to this capacity (0 = auto: a quarter of the slot count;
    # overflow is counted in compact_overflow and raised by the wrapper).
    # Occluded fraction at the heaviest reference rate is ~20-30%.
    compact_capacity: int = 0
    # phase-D scatter compaction: UNTOUCHED compacted points scatter back
    # bit-identical values (the scale factor is exactly 1.0 and the decision
    # tail keeps the original intensity/label), so only label > 0 points
    # need the intensity+label scatter and only label == 2 points (the ones
    # the pulse MOVES) need the xyz scatters — and TPU scatter cost scales
    # with the update count. touch_capacity bounds the intensity scatter
    # set, scatter_capacity the xyz scatter set (0 = auto: 3/4 resp. 1/4
    # of the compact capacity — the bench scan at the heaviest reference
    # rate touches ~66% of compact capacity but moves only ~9.5%).
    # Misses count into compact_overflow and the
    # host wrappers grow compact_capacity (auto caps scale along).
    touch_capacity: int = 0
    scatter_capacity: int = 0
    pulse_chunk: int = 2048         # compacted points per pulse-phase step
    pulse_block: int = 512          # Pallas pulse-kernel block width (points);
                                    # falls back to the largest divisor of the
                                    # compact capacity
    # fused Pallas occluder-selection kernel for phase A (dense assembly);
    # auto-falls back to XLA off-TPU. pallas_interpret forces the pallas
    # interpreter (CPU testing only).
    use_pallas: bool = True
    pallas_interpret: bool = False
    # BANDED phase A (opt-in; default OFF): points and bank are both
    # azimuth-sorted, so each band_group of consecutive beams only ever
    # intersects a narrow band of the chunk's slice. With band_width > 0
    # each group carves TWO band_width-wide aligned views (head- and
    # tail-anchored; azimuth gaps from box shadows give two clusters) out
    # of the chunk's in-VMEM slice, with per-point in-kernel coverage
    # verification. MEASURED SLOWER than the full-slice kernel at bench
    # shapes despite 4x fewer tested cells (BASELINE.md round-3 ledger:
    # the honest dual-band variants cost 43.5-44.5 ms/step vs 40.5; the
    # extraction trips and per-step overheads dominate, not candidate
    # width) — kept as a tested opt-in because the economics flip for
    # denser banks (wider slices) on future hardware.
    band_width: int = 0
    band_group: int = 8
    # span-ROUTED phase A (supersedes band_width when set): the XLA side
    # classifies each chunk by its per-group conservative LUT spans; chunks
    # whose every band_group fits ONE route_band-wide 128-aligned window
    # (~98% at bench shapes — p99 group span is ~100 columns) run a
    # single-band fast body over (group, route_band + wide) candidates,
    # the rest (box-shadow azimuth-gap chunks) run the full-slice body —
    # both gated bodies of ONE kernel, so no output merge is needed.
    # Soundness by routing (the LUT bounds are conservative), not by the
    # dual-band machinery that ate the round-3 single-band win.
    route_band: int = 0
    # interleave two chunks per phase-A grid step (independent extraction
    # chains double the ILP of the latency-bound masked-argmin loop);
    # requires an even chunk count, else falls back to single-chunk
    pallas_pair: bool = False
    # TRANSPOSED phase-A layout: candidates on sublanes, points on lanes.
    # The per-trip winner reductions become sublane reductions whose
    # (1, blk) results are already in the a12d output layout — the
    # row-major kernel instead pays three (blk,)->(1, blk) sublane->lane
    # relayouts per extraction trip. Bit-identical outputs (same value
    # sets through min / one-hot sums). Ignored when band_width > 0 or
    # pallas_pair is set.
    pallas_transposed: bool = False
    # same idea for the pulse kernel: count-bucketed compaction makes
    # adjacent blocks trip-count-homogeneous, so the shared max(trips)
    # is ~free there
    pulse_pair: bool = False
    # fold a frame batch into the phase-A kernel grid via custom_vmap
    # (one pallas launch instead of a serial while loop over frames).
    # MUST be False under GSPMD sharding: a folded pallas_call spanning
    # the data-sharded batch axis would force an all-gather
    # (parallel.batched sharded builders disable it).
    batch_fold: bool = False

    # plane fit / laser parameter estimation
    ransac_trials: int = 64
    ground_delta: float = 0.5  # |w.p + h| band for ground points (simulation.py:450)

    @property
    def beam_divergence_rad(self) -> float:
        return float(np.radians(self.beam_divergence_deg))

    @property
    def num_bins(self) -> int:
        """Extended waveform grid size (simulation.py:113): ceil(M + c*tau*ipm)."""
        m = self.lidar_range * self.intervals_per_meter
        return int(np.ceil(m + SPEED_OF_LIGHT * self.tau_h * self.intervals_per_meter))

    @property
    def pulse_width_m(self) -> float:
        return SPEED_OF_LIGHT * self.tau_h

    def range_grid(self) -> np.ndarray:
        """The reference's quantized range grid R (simulation.py:116).

        round(linspace(0, range + c*tau, num_bins), 2) computed in float64 on
        host then cast to float32 for the device. The 2-decimal rounding wobble
        (linspace step is 0.10008 m, not 0.1 m) is part of the reference
        semantics and is reproduced exactly.
        """
        extended = self.lidar_range + SPEED_OF_LIGHT * self.tau_h
        r = np.round(np.linspace(0.0, extended, self.num_bins), 2)
        return r.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class WetGroundConfig:
    """Static configuration for wet-ground reflectance augmentation.

    Defaults mirror reference `tools/wet_ground/augmentation.py:25-27`.
    """

    water_height: float = 0.001
    pavement_depth: float = 0.0012
    noise_floor: float = 0.7
    power_factor: float = 15.0
    estimation_method: str = "linear"  # 'linear' | 'poly'
    flat_earth: bool = False
    delta: float = 0.5
    replace: bool = True
    min_ground_points: int = 1000  # bail-out threshold (augmentation.py:51)
    n_air: float = 1.0003
    n_water: float = 1.33
    min_reflectivity: float = 0.05
    ransac_trials: int = 64


@dataclasses.dataclass(frozen=True)
class PlaneFitConfig:
    """RANSAC ground-plane fit configuration.

    Mirrors the semantics of reference `tools/wet_ground/planes.py:12-50`
    (sklearn RANSACRegressor with squared loss against a MAD threshold, then a
    least-squares refit on the best trial's inliers) with a fixed, seeded trial
    count so results are reproducible on device.
    """

    trials: int = 64
    min_samples: int = 3
    standard_height: float = -1.55
    # ground crop (planes.py:21-26)
    x_min: float = 10.0
    x_max: float = 70.0
    y_abs: float = 3.0
    z_max: float = -1.55
    z_slope: float = -0.01
    z_base: float = -1.86
