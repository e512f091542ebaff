"""Multi-host (pod / pod-slice) bootstrap and cross-host aggregation.

The reference is single-host (SURVEY.md §2.4); the TPU rebuild scales offline
datagen across hosts in two composable ways:

1. **Share-nothing sharding** (default, no networking): every host runs
   `tools/precompute.py --shard i/n` against shared storage; the
   skip-if-exists manifest makes any overlap idempotent. Use this unless you
   need a single global mesh.
2. **Global mesh** (`jax.distributed`): `initialize()` below wires the hosts
   into one runtime, after which `parallel.mesh.make_mesh` sees every chip in
   the slice and GSPMD shards one step across ICI/DCN.

`all_hosts_stats` merges per-host DatagenStats with a psum over the global
device set — the only cross-host communication the workload needs (file
output stays per-shard; SURVEY.md §5).
"""

from __future__ import annotations

import dataclasses
import os

from lidar_snow_sim_tpu.parallel.datagen import DatagenStats

_SUMMED_FIELDS = (
    "frames_done", "frames_skipped", "frames_failed",
    "points_in", "points_out", "attenuated", "removed",
)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize `jax.distributed` when running multi-host; no-op otherwise.

    Arguments default to the standard JAX env vars / TPU metadata discovery.
    Returns True when a multi-process runtime was initialized.
    """
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if num_processes in (None, 1) and coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary_host() -> bool:
    import jax

    return jax.process_index() == 0


def all_hosts_stats(local: DatagenStats) -> DatagenStats:
    """Global DatagenStats: sum the counters over every host (psum across the
    global device set), max the wall time. Single-host: returns `local`."""
    import jax
    import jax.numpy as jnp

    if jax.process_count() == 1:
        return local

    vals = jnp.asarray(
        [float(getattr(local, f)) for f in _SUMMED_FIELDS] + [local.wall_s],
        jnp.float32,
    )
    summed = jax.device_get(
        jax.pmap(lambda x: jax.lax.psum(x, "hosts"), axis_name="hosts")(
            vals[None].repeat(jax.local_device_count(), 0)
        )[0]
    ) / jax.local_device_count()  # every local device contributed a copy

    merged = dataclasses.replace(
        local,
        **{f: int(round(float(v)))
           for f, v in zip(_SUMMED_FIELDS, summed[:-1])},
    )
    merged.wall_s = local.wall_s  # per-host wall time is the honest number
    return merged
