"""Device mesh + sharding helpers.

The workload's parallel axes (SURVEY.md §2.4):
- 'data': frames (scans) — embarrassingly parallel, the production datagen axis
- 'beam': points/beams within a scan — sequence-parallel analog; global
  reductions (plane fit, noise polynomial, statistics) become XLA collectives
  inserted automatically by GSPMD when the point axis is sharded.

The reference's ThreadPool-over-channels (simulation.py:496-504) has no
device-level equivalent here: channels are just a gather index on the particle
bank, so 'beam' sharding subsumes it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 1, beam: int = 1, devices=None) -> Mesh:
    """Create a (data, beam) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = data * beam
    if n > len(devices):
        raise ValueError(f"mesh {data}x{beam} needs {n} devices, have {len(devices)}")
    dev = np.asarray(devices[:n]).reshape(data, beam)
    return Mesh(dev, axis_names=("data", "beam"))


def batch_shardings(mesh: Mesh):
    """Shardings for a batch of padded scans: points (B, N, 5), mask (B, N)
    sharded batch-over-'data' and points-over-'beam'; everything else
    (bank, calib, config scalars) replicated."""
    points = NamedSharding(mesh, P("data", "beam", None))
    mask = NamedSharding(mesh, P("data", "beam"))
    replicated = NamedSharding(mesh, P())
    return points, mask, replicated
