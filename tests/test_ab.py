"""Tests for the permanent interleaved A/B harness (tools/ab.py).

The engine is the load-bearing part of every perf claim (BASELINE.md's
measurement-honesty methodology), so its math — median-of-reps endpoints,
slope, spread, overflow gate, interleaving order — is pinned here without
needing a TPU. The chain runner itself is exercised on CPU with a real
jitted step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lidar_snow_sim_tpu.tools import ab


def test_parse_variants_predefined_and_inline():
    v = ab.parse_variants(
        "snow", ["base", "batch16", "k12=max_occluders:12,batch:4",
                 "s=assembly:window"]
    )
    assert v["base"] == {}
    assert v["batch16"] == {"batch": 16}
    assert v["k12"] == {"max_occluders": 12, "batch": 4}
    assert v["s"] == {"assembly": "window"}  # string value survives


def test_parse_variants_float():
    v = ab.parse_variants("dror", ["a=alpha:0.9,window:0"])
    assert v["a"] == {"alpha": 0.9, "window": 0}
    assert isinstance(v["a"]["alpha"], float)


def test_interleaved_ab_median_slope_and_order():
    # fake arms with a deterministic clock: arm A costs 10 ms/step with one
    # congested outlier rep, arm B costs 20 ms/step. The median must reject
    # A's outlier; the call order must interleave (A,B,A,B,...), not batch.
    calls = []

    def make(name, step_s, outlier_rep=None):
        state = {"rep": 0}

        def run(n):
            calls.append((name, n))
            t = 1.0 + step_s * n
            if outlier_rep is not None and state["rep"] == outlier_rep:
                t += 5.0  # one congested RPC
            if n == 12:  # count full (short, long) rounds
                state["rep"] += 1
            return t, 0

        return ab.Arm(run, batch=8)

    arms = {"A": make("A", 0.010, outlier_rep=2), "B": make("B", 0.020)}
    out = ab.interleaved_ab(arms, short=2, long_=12, reps=5, verbose=False)
    assert out["A"]["step_ms"] == pytest.approx(10.0, rel=1e-6)
    assert out["B"]["step_ms"] == pytest.approx(20.0, rel=1e-6)
    # spread reports the outlier the median rejected
    assert out["A"]["spread_ms"] == pytest.approx(500.0, rel=1e-6)
    assert out["B"]["spread_ms"] == pytest.approx(0.0, abs=1e-9)
    # interleaving: within each rep round, every arm runs once before any
    # arm runs again (compile pass = first 2 calls per arm)
    meas = calls[4:]
    rounds = [meas[i:i + 4] for i in range(0, len(meas), 4)]
    for rnd in rounds:
        assert [c[0] for c in rnd] == ["A", "A", "B", "B"]
        assert [c[1] for c in rnd] == [2, 12, 2, 12]


def test_interleaved_ab_rejects_overflowing_arm():
    ok = ab.Arm(lambda n: (0.1 * n, 0), batch=4)
    bad = ab.Arm(lambda n: (0.1 * n, 3), batch=4)
    with pytest.raises(ValueError, match="overflowed"):
        ab.interleaved_ab({"ok": ok, "bad": bad}, reps=1, verbose=False)


def test_full_leaf_dep_covers_every_leaf():
    out = {"a": jnp.ones((3,)), "b": (jnp.arange(4), jnp.array(True))}
    dep = ab.full_leaf_dep(out)
    assert float(dep) == 3.0 + 6.0 + 1.0


def test_make_runner_real_chain_cpu():
    # a real jitted chain on CPU: the step must see DIFFERENT keys each
    # chain step (fold_in of the carry) and its overflow must be summed
    seen = []

    def step(inputs, keys):
        (x,) = inputs
        contrib = jax.vmap(
            lambda k: jax.random.uniform(k) * 0.0
        )(keys).sum()
        dep = x.sum() + contrib
        return dep, jnp.int32(1)  # 1 "overflow" per step

    run = ab.make_runner(step, (jnp.ones((4, 8)),), batch=4)
    t, ovf = run(3)
    assert t > 0
    assert ovf == 3
    del seen
