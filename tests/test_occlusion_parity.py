"""Golden parity: JAX occlusion geometry + sweep vs the literal NumPy oracle.

Scenes are random beams against random particle fields (including the
reference's hand-written 11-particle smoke scene, simulation.py:596-606).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_snow_sim_tpu.ops.geometry import candidate_intervals
from lidar_snow_sim_tpu.ops.sweep import occlusion_sweep
from lidar_snow_sim_tpu.oracle.snowfall import (
    _beam_intervals,
    occlusion_dict_for_beam,
    occlusion_dicts,
)

PI = np.pi
BEAM_DIV_DEG = float(np.degrees(3e-3))
BEAM_RAD = 3e-3

REFERENCE_SMOKE_PARTICLES = np.array(
    [
        [10, 2, 1], [15, 4, 2], [3, 4, 1], [12, 10, 3], [17, 12, 1],
        [0, 6, 1], [7, 0, 1], [18, 1, 1], [2, 9, 2], [3, -1, 1.1],
        [30, 12, 3],
    ],
    dtype=np.float64,
)


def _random_scene(seed, n_particles=300, r_scale=0.05, wide_divergence=None):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(0, 2 * PI, n_particles)
    d = np.sqrt(rng.uniform(0.5, 1, n_particles)) * 40
    r = rng.uniform(0.2, 1.0, n_particles) * r_scale
    particles = np.column_stack([d * np.cos(ang), d * np.sin(ang), r])
    return particles


@jax.jit
def _jax_beam_batch(rights, lefts, particles, ranges, beam_rad):
    """Device pipeline for a batch of beams against one particle set."""
    px, py, pr = particles[:, 0], particles[:, 1], particles[:, 2]
    pd = jnp.sqrt(px**2 + py**2)
    valid = jnp.ones(px.shape, bool)
    k_occ = min(64, particles.shape[0])

    def one(right, left, rng):
        a1, a2, hit = candidate_intervals(
            right, left, px, py, pr, pd, valid, rng
        )
        score = jnp.where(hit, pd, jnp.inf)
        neg_top, idx = jax.lax.top_k(-score, k_occ)
        occ_valid = neg_top > -jnp.inf
        ratio, remainder, touched = occlusion_sweep(
            right, left, a1[idx], a2[idx], occ_valid, beam_rad
        )
        return ratio, remainder, touched, occ_valid, pd[idx]

    return jax.vmap(one)(rights, lefts, ranges)


def _jax_ratios_batch(rights, lefts, particles, ranges, beam_rad):
    """Returns per-beam dicts rank->(dist, ratio) plus remainders, matching
    the oracle's distance-sorted key convention."""
    ratio, remainder, touched, occ_valid, dist = jax.device_get(
        _jax_beam_batch(
            jnp.asarray(rights, jnp.float32),
            jnp.asarray(lefts, jnp.float32),
            jnp.asarray(particles, jnp.float32),
            jnp.asarray(ranges, jnp.float32),
            beam_rad,
        )
    )
    outs = []
    for b in range(len(rights)):
        out = {}
        rank = 0
        for j in range(ratio.shape[1]):
            if not occ_valid[b, j]:
                continue
            if touched[b, j]:
                out[rank] = (float(dist[b, j]), float(ratio[b, j]))
            rank += 1
        outs.append(out)
    return outs, remainder


@pytest.mark.parametrize("seed", range(6))
def test_sweep_matches_oracle_random_scenes(seed):
    particles = _random_scene(seed)
    rng = np.random.default_rng(100 + seed)
    n_beams = 60
    centers = rng.uniform(0, 2 * PI, n_beams)
    rights = (centers - BEAM_RAD / 2) % (2 * PI)
    lefts = (centers + BEAM_RAD / 2) % (2 * PI)
    ranges = rng.uniform(10, 60, n_beams)

    gots, got_rems = _jax_ratios_batch(rights, lefts, particles, ranges, BEAM_RAD)

    dists = np.hypot(particles[:, 0], particles[:, 1])
    n_mismatch = 0
    for b in range(n_beams):
        in_range = particles[dists < ranges[b]]
        intervals = _beam_intervals(in_range, rights[b], lefts[b])
        want = occlusion_dict_for_beam(
            rights[b], lefts[b], intervals, ranges[b], BEAM_DIV_DEG
        )
        want_rem = want.pop(-1)[1]
        got = gots[b]
        if set(got) != set(want):
            n_mismatch += 1
            continue
        for k in want:
            assert got[k][0] == pytest.approx(want[k][0], rel=1e-5)
            assert got[k][1] == pytest.approx(want[k][1], rel=5e-3, abs=5e-4)
        assert got_rems[b] == pytest.approx(want_rem, rel=5e-3, abs=5e-4)
    # f32 vs f64 boundary flips may disturb the key set very occasionally
    assert n_mismatch <= 1


def test_sweep_on_reference_smoke_scene():
    """The reference's embedded smoke harness (simulation.py:572-606):
    360-degree fan at 0.35-degree resolution, ranges 25 m, 11 particles."""
    res = np.radians(0.35)
    start = np.radians(-22.5)
    n_beams = int(np.floor(2 * PI / res))
    rights = (start + np.arange(n_beams) * res) % (2 * PI)
    lefts = (start + (np.arange(n_beams) + 1) * res) % (2 * PI)
    ranges = 25 * np.ones(n_beams)
    beams = np.column_stack([rights, lefts])

    oracle = occlusion_dicts(
        beams, ranges, REFERENCE_SMOKE_PARTICLES, float(np.degrees(res))
    )
    gots, got_rems = _jax_ratios_batch(
        rights, lefts, REFERENCE_SMOKE_PARTICLES, ranges, res
    )
    total_claimed = 0
    for i in range(n_beams):
        want = dict(oracle[i])
        want_rem = want.pop(-1)[1]
        got = gots[i]
        assert set(got) == set(want), f"beam {i}"
        for k in want:
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-3, abs=1e-4)
        assert got_rems[i] == pytest.approx(want_rem, rel=1e-3, abs=1e-4)
        total_claimed += len(want)
        # ratios sum to 1 (simulation.py:249)
        s = sum(v for _, v in got.values()) + got_rems[i]
        assert s == pytest.approx(1.0, abs=1e-3)
    assert total_claimed > 100  # the scene occludes a good fraction of beams


def test_masked_median_and_mad_matches_two_sort_form():
    """The single-sort median+MAD (ops/fitting.masked_median_and_mad) must
    be bit-identical to the two-sort form it replaces (the RANSAC threshold,
    planes.py:12-50 semantics), including ties and sparse masks."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from lidar_snow_sim_tpu.ops.fitting import (
        masked_median,
        masked_median_and_mad,
    )

    @jax.jit
    def ref(x, m):
        m1 = masked_median(x, m)
        return m1, masked_median(jnp.abs(x - m1), m)

    new = jax.jit(masked_median_and_mad)
    rng = np.random.default_rng(0)
    n = 257
    for trial in range(60):
        x = rng.normal(0, 3, n).astype(np.float32)
        if trial % 7 == 0:
            x = np.round(x).astype(np.float32)  # force ties
        mask = rng.random(n) < rng.uniform(0.02, 1.0)
        if not mask.any():
            continue
        r = ref(jnp.asarray(x), jnp.asarray(mask))
        v = new(jnp.asarray(x), jnp.asarray(mask))
        assert float(r[0]) == float(v[0]), trial
        assert float(r[1]) == float(v[1]), trial
