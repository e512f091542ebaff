"""LISA — LiDAR light-scattering augmentation (rain/fog), TPU-native.

Equivalent of the consumed surface of the reference's `lib/LISA` submodule
(`pointcloud_viewer.py:45,1664-1666,2794-2796,2888-2937`): a ``LISA`` class
constructed with sensor/atmosphere parameters exposing ``augment(pc, Rr)``,
``Nd(D, Rr)`` and ``alpha(Rr)``. The submodule (Kilic et al., arXiv
2107.07004) is a per-point Python Monte-Carlo loop using PyMieScatt; here the
same physics runs as one fused jittable kernel:

- Mie extinction/backscatter cross-sections come from a host-baked LUT
  (ops/mie.py), integrated against the Marshall–Palmer drop-size distribution
  ``N(D) = 8000·exp(-4.1·Rr^{-0.21}·D)`` [m⁻³ mm⁻¹] to get the extinction
  coefficient α(Rr) [1/m].
- Per point, droplets form a Poisson process of mean λ = density·cone volume.
  A fixed-shape kernel samples the ``max_droplets`` NEAREST droplets exactly
  (radial order statistics: with U = (r/d)³ uniform in cone volume, the i-th
  nearest droplet sits at U₍ᵢ₎ = Gᵢ/λ where Gᵢ is the i-th arrival of a unit
  Poisson process — a cumsum of Exp(1) draws — and exists iff Gᵢ < λ), plus
  the ``tail_droplets`` LARGEST-diameter droplets of the residual population
  beyond them (diameter order statistics via the DSD inverse CDF at quantile
  1 − Hⱼ/λ_res). The strongest return is the max over both candidate sets;
  a non-sampled residual droplet has both r > r_k and D < D_tail_min, so its
  power is bounded and the bound is CHECKED per point — when it could beat
  the current winner the event is counted in ``droplet_overflow`` (never
  silently clamped; the host wrapper grows ``max_droplets`` and reruns).
- Signal model ('strongest' return): the hard target competes with each
  droplet's occlusion-weighted backscatter; below the min-detectable power the
  point is lost. Output follows the submodule's exact contract as consumed by
  the viewer (`pointcloud_viewer.py:2901-2929`): an (N, 6) array
  [x, y, z, intensity, label, intensity_diff] with label 0 = lost (point
  moved to the origin), 1 = attenuated, 2 = scattered by a droplet, and the
  caller filters label != 0. Modes: 'rain' (Marshall-Palmer), snow with
  'gunn' / 'sekhon' size distributions (the viewer's dropdown,
  `pointcloud_viewer.py:943`), and 'fog'.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_snow_sim_tpu.ops.mie import bake_mie_lut

# Shettle & Fenn 1979 modified-gamma fog presets (see LISA.Nd docstring):
# name -> (a [cm^-3 um^-(alpha+1)], alpha, b [um^-1]) over droplet RADIUS.
_FOG_PRESETS = {
    "strong_advection": (0.027, 3, 0.3),
    "moderate_radiation": (607.5, 6, 3.0),
}


class LisaResult(NamedTuple):
    points: jax.Array   # (N, 6): x, y, z, intensity, label, intensity_diff
    keep: jax.Array     # (N,) label > 0
    num_lost: jax.Array
    num_scattered: jax.Array
    num_attenuated: jax.Array
    droplet_overflow: jax.Array  # i32: points where a non-sampled residual
    # droplet's power bound exceeds the winner (capacity too small)


class LISA:
    """Physics-based scattering augmentation for rain (and spray-like fog).

    Argument names/defaults mirror the reference submodule's constructor
    (`pointcloud_viewer.py:1664-1666`): wavelength [nm], r_min/r_max [m],
    beam_divergence [rad], min_diameter [mm], range_accuracy [m].
    """

    def __init__(
        self,
        wavelength: float = 905.0,
        mode: str = "rain",
        r_min: float = 0.9,
        r_max: float = 120.0,
        beam_divergence: float = 3e-3,
        min_diameter: float = 0.05,
        range_accuracy: float = 0.09,
        signal: str = "strongest",
        max_droplets: int = 32,
        tail_droplets: int = 8,
        dsd_points: int = 128,
        fog_preset: str = "strong_advection",
        show_progressbar: bool = False,
        mxu_lookup: str = "auto",
    ):
        self.wavelength = wavelength
        self.mode = mode
        self.r_min = r_min
        self.r_max = r_max
        self.beam_divergence = beam_divergence
        self.min_diameter = min_diameter
        self.range_accuracy = range_accuracy
        self.signal = signal
        self.max_droplets = max_droplets
        self.tail_droplets = tail_droplets
        self.fog_preset = fog_preset
        self.show_progressbar = show_progressbar  # accepted for API parity

        # ice refractive index for snow mode (Warren & Brandt 2008, 905 nm);
        # water otherwise
        from lidar_snow_sim_tpu.ops.mie import WATER_M_905NM

        snow_modes = ("snow", "gunn", "sekhon")
        m = complex(1.302, 2.9e-7) if mode in snow_modes else WATER_M_905NM
        self._lut = bake_mie_lut(wavelength_nm=wavelength, m=m)
        # quadrature grid over diameter for alpha(Rr) and the DSD inverse CDF;
        # fog droplets live at µm scales, precipitation at mm scales
        if mode == "fog":
            d_lo = min(min_diameter, 1e-3)
            d_hi = 0.1
        else:
            d_lo, d_hi = min_diameter, 10.0
        self._d_grid = np.geomspace(d_lo, d_hi, dsd_points)  # mm
        self._qext = self._lut.interp_qext(self._d_grid)
        self._qback = self._lut.interp_qback(self._d_grid)
        # geomspace grid => exactly uniform in log(D): Mie lookups in the
        # kernel are direct index arithmetic, never a searchsorted (TPU
        # lowers jnp.interp to a while-loop binary search; measured 603
        # ms/scan at bench scale before this, ~350x the fog kernel)
        self._log_d0 = math.log(d_lo)
        self._inv_dlog = (dsd_points - 1) / math.log(d_hi / d_lo)
        # the ~21M-index Mie lookup rides a Pallas one-hot-MXU kernel on
        # TPU (XLA's gather pays ~1.8 ns PER ROW — 38+15 ms/step at bench
        # shapes, 70% of the whole kernel; measured round 5, BASELINE.md);
        # results agree with the XLA pairs path within 1 ULP (FMA fusion).
        # "auto" = TPU only (<=128 knots); True forces the interpreted
        # kernel off-TPU (tests); False keeps the XLA gather.
        if mxu_lookup == "auto":
            self._mxu_lookup = (
                jax.default_backend() == "tpu" and dsd_points <= 128
            )
        else:
            self._mxu_lookup = bool(mxu_lookup) and dsd_points <= 128
        self._jit_augment = jax.jit(self._augment_core)

    # ---- particle-size distributions (exponential family) ----

    def Nd(self, D, Rr):
        """Particle-size distribution [m⁻³ mm⁻¹] at diameter D [mm] for
        precipitation rate Rr [mm/h], by mode. Constants are the PUBLISHED
        exponential-DSD fits (not invented):

        - rain: Marshall & Palmer 1948 (J. Meteor. 5), N₀ = 8000 m⁻³ mm⁻¹,
          Λ = 4.1·Rr^-0.21 mm⁻¹ — the distribution LISA's paper (Kilic et
          al., arXiv 2107.07004, eq. 11) uses for rain.
        - snow 'gunn': Gunn & Marshall 1958 (J. Meteor. 15),
          N₀ = 3800·Rr^-0.87 m⁻³ mm⁻¹, Λ = 2.55·Rr^-0.48 mm⁻¹ — the same
          Λ as the reference's sampling.py:81-87 (25.5 cm⁻¹ = 2.55 mm⁻¹;
          tested equal in tests/test_weather_baselines.py).
        - snow 'sekhon': Sekhon & Srivastava 1970 (J. Atmos. Sci. 27),
          N₀ = 2500·Rr^-0.94, Λ = 2.29·Rr^-0.45 mm⁻¹ (= sampling.py:72-79's
          22.9 cm⁻¹).
        - fog: the PUBLISHED modified-gamma fog models of Shettle & Fenn
          1979 (AFGL-TR-79-0214, "Models for the aerosols of the lower
          atmosphere"), the standard presets of automotive-lidar fog studies
          (Rasshofer et al. 2011, Adv. Radio Sci. 9): droplet-radius
          distribution n(rad) = a·rad^α·exp(-b·rad) [cm⁻³ µm⁻¹] with
            'strong_advection':    a = 0.027,  α = 3, b = 0.3  (20 cm⁻³,
                                   modal radius 10 µm)
            'moderate_radiation':  a = 607.5,  α = 6, b = 3.0  (200 cm⁻³,
                                   modal radius 2 µm)
          converted here to m⁻³ mm⁻¹ over diameter D [mm] (rad = 500·D µm;
          ×1e6 cm⁻³→m⁻³, ×500 per-µm-radius→per-mm-diameter). Rr is reused
          as a dimensionless density multiplier (1.0 = the preset's nominal
          density), matching how the viewer drives fog strength with one
          slider.
        """
        D = np.asarray(D)
        if self.mode in ("snow", "gunn"):
            lam = 2.55 * Rr ** (-0.48)     # gunn_marshall, sampling.py:81
            return 3800.0 * Rr ** (-0.87) * np.exp(-lam * D)
        if self.mode == "sekhon":
            lam = 2.29 * Rr ** (-0.45)     # sekhon_srivastava, sampling.py:72
            return 2500.0 * Rr ** (-0.94) * np.exp(-lam * D)
        if self.mode == "fog":
            a, alpha, b = _FOG_PRESETS[self.fog_preset]
            rad_um = 500.0 * D             # droplet radius in µm
            return Rr * a * rad_um**alpha * np.exp(-b * rad_um) * 1e6 * 500.0
        lam = 4.1 * Rr ** (-0.21)
        return 8000.0 * np.exp(-lam * D)

    @property
    def D(self):
        """Diameter quadrature grid [mm] (the viewer reads `lisa.D`,
        pointcloud_viewer.py:2794)."""
        return self._d_grid

    def alpha(self, curve_or_Rr):
        """Extinction coefficient [1/m]: ∫ Qext(D)·(π/4)D²·N(D) dD, D in mm
        (10⁻⁶ converts mm² to m²).

        Accepts either a precipitation rate Rr [mm/h] or a density curve
        N(D) evaluated on `self.D` (the viewer passes `lisa.Nd(lisa.D, Rr)`,
        pointcloud_viewer.py:2794-2795).
        """
        nd = np.asarray(curve_or_Rr)
        if nd.ndim == 0:
            nd = self.Nd(self._d_grid, float(nd))
        integrand = self._qext * (np.pi / 4.0) * self._d_grid**2 * nd * 1e-6
        return float(np.trapezoid(integrand, self._d_grid))

    def droplet_density(self, Rr):
        """Total droplet number density [m⁻³]."""
        nd = self.Nd(self._d_grid, Rr)
        return float(np.trapezoid(nd, self._d_grid))

    def _dsd_lambda(self, Rr):
        """Exponential-DSD rate parameter Λ [mm⁻¹] by mode (the published
        fits of Nd); None for the modified-gamma fog presets."""
        if self.mode in ("snow", "gunn"):
            return 2.55 * Rr ** (-0.48)
        if self.mode == "sekhon":
            return 2.29 * Rr ** (-0.45)
        if self.mode == "fog":
            return None
        return 4.1 * Rr ** (-0.21)

    def _dsd_tables(self, Rr):
        """Device inputs for DSD inverse-transform sampling and the Mie
        lookups, with NO on-device searchsorted (TPU lowers jnp.interp to a
        while-loop binary search — measured ~600 ms/scan at bench scale):

        - (lam, e_lo, e_span): the truncated-exponential inverse CDF of the
          precipitation DSDs is analytic, D(q) = -ln(e_lo − q·e_span)/Λ
          over [d_lo, d_hi] — exact, no table at all (zeros for fog);
        - inv_pairs (Q, 2): for the fog modified-gamma DSD, a host-baked
          uniform-quantile inverse-CDF table (knot i covers q ∈
          [i/Q, (i+1)/Q]; rows are (D(qᵢ), D(qᵢ₊₁)) so one row gather +
          lerp replaces the searchsorted);
        - qb_pairs (G−1, 2): Qback knot pairs on the geomspace grid —
          uniform in log(D), so the bracketing cell is index arithmetic;
        - cap_pairs (G−1, 4): knot pairs of cummax(Qback) and
          cummax(Qback·D²) for the residual-droplet power bound (any
          droplet with D ≤ Dm satisfies Qback·occl ≤ min(cummax_q(Dm),
          cummax_qd2(Dm)/w(r)²))."""
        lam = self._dsd_lambda(Rr)
        if lam is None:
            nd = self.Nd(self._d_grid, Rr)
            cdf = np.concatenate([[0.0], np.cumsum(
                0.5 * (nd[1:] + nd[:-1]) * np.diff(self._d_grid)
            )])
            cdf /= cdf[-1]
            q = np.linspace(0.0, 1.0, 513)
            inv = np.interp(q, cdf, self._d_grid)
            inv_pairs = np.column_stack([inv[:-1], inv[1:]])
            lam, e_lo, e_span = 1.0, 0.0, 0.0
        else:
            d_lo, d_hi = float(self._d_grid[0]), float(self._d_grid[-1])
            e_lo = math.exp(-lam * d_lo)
            e_span = e_lo - math.exp(-lam * d_hi)
            inv_pairs = np.zeros((1, 2))
        qb = self._qback
        qmax = np.maximum.accumulate(qb)
        qd2 = np.maximum.accumulate(qb * self._d_grid**2)
        qb_pairs = np.column_stack([qb[:-1], qb[1:]])
        if self._mxu_lookup:
            from lidar_snow_sim_tpu.ops.lut_lookup import bake_parts_table

            try:
                qb_parts = bake_parts_table(qb_pairs)
            except AssertionError:
                # a table value whose bf16x4 residual cascade is not
                # exactly reconstructible (never observed for baked Mie
                # tables; defensive): fall back to the XLA gather path
                # rather than serve approximate physics
                import logging

                logging.getLogger(__name__).warning(
                    "Qback table not exactly bf16x4-splittable; "
                    "falling back to the XLA lookup path"
                )
                self._mxu_lookup = False
                qb_parts = np.zeros((8, 128), jnp.bfloat16)
        else:
            qb_parts = np.zeros((8, 128), jnp.bfloat16)
        return (
            jnp.float32(lam),
            jnp.float32(e_lo),
            jnp.float32(e_span),
            jnp.asarray(inv_pairs, jnp.float32),
            jnp.asarray(qb_pairs, jnp.float32),
            jnp.asarray(
                np.column_stack([qmax[:-1], qmax[1:], qd2[:-1], qd2[1:]]),
                jnp.float32,
            ),
            jnp.asarray(qb_parts, jnp.bfloat16),
        )

    # ---- fused augmentation kernel ----

    def _augment_core(self, points, mask, key, alpha, density,
                      lam_dsd, e_lo, e_span, inv_pairs, qb_pairs, cap_pairs,
                      qb_parts):
        """points carry intensity on the LISA-normalized [0, 1] scale.

        Table args come from _dsd_tables; every lookup here is index
        arithmetic + one row gather (no searchsorted — see _dsd_tables),
        and the hot (n, k1+k2) Qback lookup rides the Pallas one-hot-MXU
        kernel (ops/lut_lookup.py) when self._mxu_lookup."""
        gm1 = float(self._d_grid.size - 1)

        def mie_lookup(pairs, d_mm):
            """Lerp packed knot-pair rows at diameter d_mm [mm]: pairs row i
            holds (y_i..., y_{i+1}...) interleaved on the log-uniform grid;
            returns one value per pair of columns."""
            p = jnp.clip(
                (jnp.log(d_mm) - self._log_d0) * self._inv_dlog, 0.0, gm1
            )
            i = jnp.minimum(p.astype(jnp.int32), int(gm1) - 1)
            f = (p - i.astype(jnp.float32))[..., None]
            rows = pairs[i]
            return rows[..., 0::2] * (1.0 - f) + rows[..., 1::2] * f

        if self.mode == "fog":
            nq = inv_pairs.shape[0]

            def dsd_inv_cdf(q):
                p = jnp.clip(q, 0.0, 1.0) * nq
                i = jnp.minimum(p.astype(jnp.int32), nq - 1)
                f = p - i.astype(jnp.float32)
                rows = inv_pairs[i]
                return rows[..., 0] * (1.0 - f) + rows[..., 1] * f
        else:

            def dsd_inv_cdf(q):
                # exact truncated-exponential inverse CDF (no table)
                return -jnp.log(
                    jnp.maximum(e_lo - jnp.clip(q, 0.0, 1.0) * e_span, 1e-38)
                ) / lam_dsd

        bdiv = self.beam_divergence
        xyz = points[:, :3]
        intensity = points[:, 3]
        d = jnp.maximum(jnp.linalg.norm(xyz, axis=-1), 1e-6)
        n = points.shape[0]
        k1 = self.max_droplets       # nearest-droplet slots
        k2 = self.tail_droplets      # largest-diameter residual slots
        tan_h = jnp.tan(bdiv / 2.0)

        # min detectable power: 90%-reflective target at r_max (LISA's Pmin)
        p_min = 0.9 / self.r_max**2

        kc, kt, kp, kd, kj = jax.random.split(key, 5)
        # droplet population in the beam cone of length d: Poisson with mean
        # λ = density · V,  V = π/3·(d·tanθ)²·d
        vol = (math.pi / 3.0) * (tan_h * d) ** 2 * d
        lam = density * vol

        # --- the k1 NEAREST droplets, exactly (radial order statistics) ---
        # U = (r/d)³ is uniform in cone volume, so droplet positions are a
        # unit-rate Poisson process in u·λ: the i-th nearest sits at
        # Uᵢ = Gᵢ/λ (Gᵢ = cumsum of Exp(1)) and exists iff Gᵢ < λ. This is
        # an exact sample of the near population — NOT a clamped subsample.
        g = jnp.cumsum(jax.random.exponential(kc, (n, k1)), axis=1)
        t1 = g / jnp.maximum(lam[:, None], 1e-30)
        live1 = t1 < 1.0
        r1 = jnp.maximum(
            d[:, None] * jnp.minimum(t1, 1.0) ** (1.0 / 3.0), self.r_min
        )
        q1 = jax.random.uniform(kd, (n, k1))
        dmm1 = dsd_inv_cdf(q1)                  # diameters ~ DSD, iid

        # --- the k2 LARGEST-DIAMETER droplets of the residual population
        # (r beyond the k1-th nearest): diameter order statistics via the
        # DSD inverse CDF at quantile 1 − Hⱼ/λ_res; positions iid uniform in
        # the residual cone shell (position ⊥ diameter).
        t_last = jnp.minimum(t1[:, -1], 1.0)
        lam_res = lam * (1.0 - t_last)          # E[#droplets beyond slot k1]
        h = jnp.cumsum(jax.random.exponential(kt, (n, k2)), axis=1)
        u2 = h / jnp.maximum(lam_res[:, None], 1e-30)
        live2 = live1[:, -1:] & (u2 < 1.0)
        dmm2 = dsd_inv_cdf(1.0 - u2)
        v2 = jax.random.uniform(kp, (n, k2))
        t2 = t_last[:, None] + (1.0 - t_last[:, None]) * v2
        r2 = jnp.maximum(d[:, None] * t2 ** (1.0 / 3.0), self.r_min)

        r_drop = jnp.concatenate([r1, r2], axis=1)        # (n, k1+k2)
        d_mm = jnp.concatenate([dmm1, dmm2], axis=1)
        live = jnp.concatenate([live1, live2], axis=1)
        if self._mxu_lookup:
            from lidar_snow_sim_tpu.ops.lut_lookup import lut_lookup_pairs

            pos = jnp.clip(
                (jnp.log(d_mm) - self._log_d0) * self._inv_dlog, 0.0, gm1
            )
            qback = lut_lookup_pairs(
                pos, qb_parts, int(gm1),
                interpret=jax.default_backend() != "tpu",
            )
        else:
            qback = mie_lookup(qb_pairs, d_mm)[..., 0]

        # droplet return: backscatter efficiency × beam-occlusion fraction,
        # two-way attenuated; occlusion = (D / beam width at r)² capped at 1
        beam_w = 2.0 * r_drop * tan_h * 1e3  # mm
        occl = jnp.clip((d_mm / jnp.maximum(beam_w, 1e-9)) ** 2, 0.0, 1.0)
        p_drop = (
            qback * occl * jnp.exp(-2.0 * alpha * r_drop) / r_drop**2
        )
        p_drop = jnp.where(live, p_drop, 0.0)

        # hard-target return, two-way attenuated
        p_hard = intensity * jnp.exp(-2.0 * alpha * d) / d**2

        # winner by two REDUCTIONS, not argmax + take_along_axis: TPU
        # lowers take_along_axis to a batched 1-element gather at ~17 ns
        # per row — 18.5 ms/step at bench shapes vs 0.2 for the masked
        # reductions (round 5, BASELINE.md). On exact f32 power ties the
        # nearer droplet wins (argmax picked the first slot; continuous
        # powers make real ties measure-zero, and all-dead rows give
        # p_best = 0 where r_best is never consumed).
        p_best = jnp.max(p_drop, axis=1)
        r_best = jnp.min(
            jnp.where(p_drop == p_best[:, None], r_drop, jnp.inf), axis=1
        )

        # --- residual power bound: every NON-sampled droplet has both
        # r > r_k1 (beyond the nearest set) and D < min(tail diameters), so
        # p ≤ min(Qmax(Dm), Qd2max(Dm)/w(rk)²)·exp(-2α·rk)/rk², which is
        # decreasing in r. If that bound can beat the current winner AND
        # clear the detection floor, the fixed capacity may have changed the
        # outcome — counted, never silent (host wrapper grows + reruns).
        rk = r1[:, -1]
        dm_tail = dmm2[:, -1]
        caps = mie_lookup(cap_pairs, dm_tail)
        q_cap, qd2_cap = caps[..., 0], caps[..., 1]
        w_rk = 2.0 * rk * tan_h * 1e3
        p_bound = (
            jnp.minimum(q_cap, qd2_cap / jnp.maximum(w_rk, 1e-9) ** 2)
            * jnp.exp(-2.0 * alpha * rk) / rk**2
        )
        residual_nonempty = live1[:, -1] & (u2[:, -1] < 1.0)
        overflow = (
            residual_nonempty
            & (p_bound > jnp.maximum(p_best, p_hard))
            & (p_bound >= p_min)
        )

        droplet_wins = p_best > p_hard
        p_ret = jnp.where(droplet_wins, p_best, p_hard)
        lost = p_ret < p_min

        # range jitter on droplet returns (range_accuracy, LISA's σ_r)
        r_jit = r_best + self.range_accuracy * jax.random.normal(kj, (n,))
        r_new = jnp.clip(r_jit, self.r_min, d)
        scale = jnp.where(droplet_wins & ~lost, r_new / d, 1.0)
        # lost points move to the origin (the submodule's convention; the
        # viewer filters label != 0, pointcloud_viewer.py:2929)
        new_xyz = jnp.where(lost[:, None], 0.0, xyz * scale[:, None])

        i_new = jnp.where(
            droplet_wins, p_best * r_new**2, intensity * jnp.exp(-2.0 * alpha * d)
        )
        i_new = jnp.where(lost, 0.0, jnp.clip(i_new, 0.0, 1.0))

        # labels: 0 lost, 1 attenuated, 2 scattered (viewer:2905-2907)
        label = jnp.where(
            lost, 0.0, jnp.where(droplet_wins, 2.0, 1.0)
        )
        attenuated = ~lost & ~droplet_wins
        diff = jnp.where(attenuated, intensity - i_new, 0.0)
        keep = mask & ~lost
        out = jnp.concatenate(
            [new_xyz, i_new[:, None], label[:, None], diff[:, None]], axis=1
        )
        return LisaResult(
            points=out,
            keep=keep,
            num_lost=jnp.sum(mask & lost).astype(jnp.int32),
            num_scattered=jnp.sum(keep & droplet_wins).astype(jnp.int32),
            num_attenuated=jnp.sum(keep & ~droplet_wins).astype(jnp.int32),
            droplet_overflow=jnp.sum(mask & overflow).astype(jnp.int32),
        )

    def augment(self, pc: np.ndarray, Rr: float = 10.0,
                fixed_seed: bool = False, seed: int = 0) -> np.ndarray:
        """Augment an (N, >=4) cloud at precipitation rate Rr [mm/h].

        Reference contract (`pointcloud_viewer.py:2901-2929`): returns an
        (N, 6) array [x, y, z, intensity, label, intensity_diff]; label
        0 = lost (point at origin), 1 = attenuated, 2 = scattered; the caller
        filters label != 0. Intensity scale is preserved: inputs on [0, 1]
        (the submodule's convention) stay normalized; inputs on [0, 255] are
        normalized internally and rescaled on output (the diff column stays
        on the normalized scale, as the viewer multiplies it by 255).
        """
        res, scale_back = self._run(pc, Rr, fixed_seed, seed)
        out = np.asarray(res.points[: len(pc)]).copy()
        out[:, 3] *= scale_back
        return out

    def augment_compact(self, pc: np.ndarray, Rr: float = 10.0,
                        fixed_seed: bool = False, seed: int = 0):
        """Convenience wrapper: (kept points (M, 5), stats dict) with lost
        points removed — the shape the rest of this package works in."""
        res, scale_back = self._run(pc, Rr, fixed_seed, seed)
        res = jax.device_get(res)
        kept = res.points[res.keep][:, :5].copy()
        kept[:, 3] *= scale_back
        stats = {
            "num_lost": int(res.num_lost),
            "num_scattered": int(res.num_scattered),
            "num_attenuated": int(res.num_attenuated),
            "droplet_overflow": int(res.droplet_overflow),
        }
        return kept, stats

    def _run(self, pc: np.ndarray, Rr: float, fixed_seed: bool, seed: int):
        from lidar_snow_sim_tpu.utils.pointcloud import pad_cloud

        pc = np.asarray(pc)
        n = pc.shape[0]
        cap = 1 << max(int(np.ceil(np.log2(max(n, 2)))), 1)
        pc5 = np.zeros((n, 5), np.float32)
        pc5[:, : min(pc.shape[1], 5)] = pc[:, :5]
        i_max = float(pc5[:, 3].max()) if n else 0.0
        scale_back = 255.0 if i_max > 1.5 else 1.0
        pc5[:, 3] /= scale_back
        padded = pad_cloud(pc5, cap)

        alpha = self.alpha(Rr)
        density = self.droplet_density(Rr)
        grids = self._dsd_tables(Rr)
        key = jax.random.PRNGKey(
            seed if fixed_seed else np.random.randint(2**31)
        )
        # self-tuning capacity (the repo-wide no-silent-truncation contract):
        # if the residual-droplet power bound says a non-sampled droplet
        # could have changed any point's outcome, double the candidate sets
        # and rerun (a recompile)
        for _attempt in range(6):
            res = jax.device_get(
                self._jit_augment(
                    jnp.asarray(padded.points),
                    jnp.asarray(padded.mask),
                    key,
                    jnp.float32(alpha),
                    jnp.float32(density),
                    *grids,
                )
            )
            if int(res.droplet_overflow) == 0:
                break
            import logging

            self.max_droplets *= 2
            self.tail_droplets *= 2
            self._jit_augment = jax.jit(self._augment_core)
            logging.getLogger(__name__).warning(
                "LISA droplet capacity grew to (%d nearest, %d tail) after "
                "%d overflowing points",
                self.max_droplets, self.tail_droplets,
                int(res.droplet_overflow),
            )
        else:
            raise RuntimeError(
                f"LISA droplet overflow persisted: {int(res.droplet_overflow)}"
                f" points at max_droplets={self.max_droplets}"
            )
        return res, scale_back
