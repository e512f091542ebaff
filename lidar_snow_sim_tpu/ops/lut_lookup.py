"""Pallas TPU kernel: piecewise-linear lookup of a small knot table.

Why a kernel: LISA's Mie-efficiency lookup evaluates a 128-knot
log-uniform LUT at every (point, droplet) candidate — ~21M indices per
bench step. XLA lowers that to a gather whose cost is PER ROW (~1.8 ns
regardless of row width <= 4 — measured round 5, see BASELINE.md), i.e.
~38 ms/step before the layout copy; 1-D flat-table gathers are 4-8x
worse still. On TPU the right primitive is the MXU: a 128-wide one-hot
contraction IS a table lookup. Per 128 elements the kernel builds one
(G, 128) one-hot (knots on sublanes, elements on lanes) and contracts
it with a (8, G) bf16 PARTS table — each f32 knot split into four bf16
terms whose ordered sum reconstructs the f32 value EXACTLY (asserted at
bake time), so one default-precision bf16 MXU pass returns the exact
f32 knots qb[i] and qb[i+1]; the lerp then runs in f32 on the VPU with
the same expression as the XLA path.

Equivalent of the reference LISA submodule's per-droplet PyMieScatt
evaluation (consumed via `pointcloud_viewer.py:2888-2937`); the 128-knot
interpolation contract itself is documented in PARITY.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_G = 128          # max knot count handled by one one-hot (sublane dim)
_LANES = 1024     # elements per row: wide lanes amortize the per-row MXU
# dispatch (a (64, 128)-block variant with one narrow dot per 128
# elements measured 22.4 ms/step at 21M lookups — latency-bound on 64
# tiny MXU launches; 8 wide dots per 8192-element block cut that ~4x)
_ROWS = 8         # sublane rows per block: (8, 1024) f32 = 32 KB


def bake_parts_table(pairs: np.ndarray) -> np.ndarray:
    """(G-1, 2) f32 knot pairs -> (8, 128) bf16 parts table.

    Row layout: rows 0-3 = bf16 split of pairs[:, 0] (lo knot), rows 4-7
    = split of pairs[:, 1] (hi knot); columns are knot cells (padded to
    128). The split is the standard residual cascade — p0 = bf16(x),
    p1 = bf16(x - p0), ... — and ((p0 + p1) + p2) + p3 == x is ASSERTED
    for every table value, so the MXU one-hot contraction is exact.
    """
    pairs = np.asarray(pairs, np.float32)
    g1 = pairs.shape[0]
    assert g1 <= _G, f"knot table too wide for one lane tile: {g1}"
    out = np.zeros((8, _G), np.float32)
    for c in range(2):
        x = pairs[:, c].astype(np.float32)
        rem = x.copy()
        parts = []
        for _ in range(4):
            p = rem.astype(jnp.bfloat16).astype(np.float32)
            parts.append(p)
            rem = (rem - p).astype(np.float32)
        recon = ((parts[0] + parts[1]) + parts[2]) + parts[3]
        assert np.array_equal(recon, x), "bf16x4 split must be exact"
        for j in range(4):
            out[4 * c + j, :g1] = parts[j]
    return out.astype(jnp.bfloat16)


def _lookup_kernel(p_ref, tab_ref, out_ref, *, g1: int):
    """One (ROWS, LANES) block: per row, MXU one-hot lookup + f32 lerp."""
    tab = tab_ref[:]                                   # (8, 128) bf16
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (_G, _LANES), 0)

    def row(r, _):
        p = p_ref[r, :].reshape(1, _LANES)             # (1, LANES) f32
        i = jnp.minimum(p.astype(jnp.int32), g1 - 1)   # cell index
        f = p - i.astype(jnp.float32)
        oh = (sub_iota == i).astype(jnp.bfloat16)      # (G knots, LANES el)
        parts = jax.lax.dot_general(
            tab, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (8, LANES el)
        lo = ((parts[0] + parts[1]) + parts[2]) + parts[3]
        hi = ((parts[4] + parts[5]) + parts[6]) + parts[7]
        out_ref[r, :] = (lo * (1.0 - f) + hi * f)[0]
        return 0

    jax.lax.fori_loop(0, _ROWS, row, 0)


@functools.partial(jax.jit, static_argnames=("g1", "interpret"))
def _lookup_flat(p2d, tab, *, g1: int, interpret: bool):
    blocks = p2d.shape[0] // _ROWS
    return pl.pallas_call(
        functools.partial(_lookup_kernel, g1=g1),
        out_shape=jax.ShapeDtypeStruct(p2d.shape, jnp.float32),
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((_ROWS, _LANES), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _G), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ROWS, _LANES), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(p2d, tab)


def lut_lookup_pairs(p, parts_table, g1: int, *, interpret: bool = False):
    """Lerp a <=128-cell knot-pair table at fractional positions `p`.

    p: any-shape f32 of positions in [0, g1] (cell = floor, clamped to
    g1-1 — identical index/lerp arithmetic to the XLA pairs path).
    parts_table: from `bake_parts_table`. Returns f32 of p's shape.
    Elements are processed in (8, 1024) blocks (measured 5.5 ms/step at
    21M lookups on-chip — 10x the XLA pairs gather, bit-identical); the
    flattened array is zero-padded to a block multiple (zeros look up
    cell 0 and are discarded by the caller's reshape).
    """
    shape = p.shape
    flat = p.reshape(-1)
    m = flat.shape[0]
    per = _ROWS * _LANES
    pad = (-m) % per
    if pad:
        flat = jnp.pad(flat, (0, pad))
    out = _lookup_flat(
        flat.reshape(-1, _LANES), parts_table, g1=g1, interpret=interpret
    )
    return out.reshape(-1)[:m].reshape(shape)
