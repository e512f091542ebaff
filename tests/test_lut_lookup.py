"""Unit tests for the Pallas one-hot-MXU knot-table lookup
(ops/lut_lookup.py) — LISA's TPU hot path for the Mie Qback lerp."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from lidar_snow_sim_tpu.ops.lut_lookup import (
    bake_parts_table,
    lut_lookup_pairs,
)


def _xla_ref(pairs, p, g1):
    """The exact XLA formula the kernel replaces (models/lisa.py)."""
    i = jnp.minimum(p.astype(jnp.int32), g1 - 1)
    f = p - i.astype(jnp.float32)
    rows = jnp.asarray(pairs)[i]
    return rows[..., 0] * (1.0 - f) + rows[..., 1] * f


@pytest.mark.parametrize("g", [64, 128])
def test_lookup_matches_xla_pairs(g):
    """Interpret-mode kernel vs the XLA knot-pair gather: equal within
    1 ULP (FMA fusion difference only) on random tables, including the
    g < 128 case (padded lanes) and boundary positions."""
    rng = np.random.default_rng(g)
    qb = rng.uniform(0.2, 36.7, g).astype(np.float32)
    pairs = np.stack([qb[:-1], qb[1:]], axis=1)
    tab = jnp.asarray(bake_parts_table(pairs))
    p = jnp.asarray(
        np.concatenate([
            rng.uniform(0, g - 1, 5000),
            [0.0, g - 1.0, g - 1.5, 0.5],      # edges + clamp cell
        ]).astype(np.float32)
    )
    got = lut_lookup_pairs(p, tab, g - 1, interpret=True)
    ref = _xla_ref(pairs, p, g - 1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-7, atol=3e-6
    )
    # exact at the knots themselves (f == 0: no lerp rounding at all)
    knots = jnp.arange(g - 1, dtype=jnp.float32)
    got_k = lut_lookup_pairs(knots, tab, g - 1, interpret=True)
    np.testing.assert_array_equal(np.asarray(got_k), qb[:-1])


def test_parts_table_split_is_exact():
    """The bf16x4 residual cascade reconstructs every f32 table value
    EXACTLY (the property that makes the one-default-precision MXU pass
    return exact f32 knots)."""
    rng = np.random.default_rng(7)
    # adversarial magnitudes: denormal-adjacent, huge, negative
    vals = np.concatenate([
        rng.uniform(1e-6, 1e6, 104),
        -rng.uniform(0.1, 50.0, 20),
        [0.0, 1.0, np.float32(np.pi)],
    ]).astype(np.float32)
    assert vals.shape == (127,)
    pairs = np.stack([vals, vals[::-1]], axis=1)
    tab = np.asarray(bake_parts_table(pairs), np.float32)  # (8, 128)
    lo = ((tab[0] + tab[1]) + tab[2]) + tab[3]
    hi = ((tab[4] + tab[5]) + tab[6]) + tab[7]
    np.testing.assert_array_equal(lo[:127], vals)
    np.testing.assert_array_equal(hi[:127], vals[::-1])


def test_lookup_arbitrary_shapes_and_padding():
    """Any input shape works; the flatten-pad-reshape roundtrip must not
    leak padded lanes into the output."""
    rng = np.random.default_rng(3)
    qb = rng.uniform(0.5, 2.0, 128).astype(np.float32)
    pairs = np.stack([qb[:-1], qb[1:]], axis=1)
    tab = jnp.asarray(bake_parts_table(pairs))
    for shape in [(7,), (3, 5), (2, 11, 13)]:
        p = jnp.asarray(rng.uniform(0, 126.9, shape), jnp.float32)
        got = lut_lookup_pairs(p, tab, 127, interpret=True)
        assert got.shape == shape
        ref = _xla_ref(pairs, p, 127)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=3e-7, atol=3e-6
        )
