"""Pallas TPU wavefront kernel for the banded edit-distance verify (P5).

Layout (VPU-shaped): candidates ride the 128-lane axis (``lanes`` per grid
program, a multiple of 128), the band rides the sublane axis — each grid
program advances a (band, lanes) DP wavefront over one candidate tile,
entirely in registers/VMEM, one read position per step.

Mosaic constraints found on real v5e hardware (round 1 shipped an
interpreter-only kernel; round 2 fixed each in turn):
- dynamic sublane-slice offsets must be 8-aligned -> the wavefront runs in
  *aligned chunks of 8 steps*: each outer iteration loads one (8, lanes)
  read-row chunk and one (CH, lanes) window chunk at an 8-multiple offset
  (``pl.multiple_of`` hint); the 8 inner steps use only static slices of
  those register values.
- only i32 scalar arithmetic is supported -> step indices are broadcast
  vectors, never scalars.
- i16 vector compares are unsupported ("Target does not support this
  comparison") -> cells and masks are int32 throughout.

The window tensor is pre-transposed and pad-shifted so step ``i`` needs
rows ``[i, i+band)``; pad code 4 never matches, and pad paths are dominated
by free-start/free-end paths, so the distance is unaffected.  The in-row
deletion dependency is a log-step min-plus scan (ceil(log2 band) shifted
minimums instead of a band-long serial chain).

Matches ``ops.dp.banded_edit_distance`` bit-for-bit — including dead lanes,
which both engines clamp to exactly INF.  Asserted in interpreter-mode CPU
tests always, and on the real chip when ``GWA_TEST_TPU=1``
(tests/test_dp_pallas.py::test_pallas_on_tpu_hardware).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 20  # saturation value, matches ops.dp.INF
LANES = 512  # candidates per grid program (multiple of 128)
_STEP = 8  # wavefront steps per aligned chunk (int32 sublane tile height)


def _kernel(reads_ref, len_ref, win_ref, dist_ref, endb_ref, *, L, W, k, band, lanes, CH):
    lengths = len_ref[0, :]  # (lanes,) int32
    boff = jax.lax.broadcasted_iota(jnp.int32, (band, lanes), 0) - k
    inf = jnp.int32(INF)
    T = -(-L // _STEP)  # aligned outer chunks

    D0 = jnp.where(boff >= 0, jnp.int32(0), inf)

    def outer(t, D):
        base = pl.multiple_of(t * _STEP, _STEP)
        rchunk = reads_ref[pl.ds(base, _STEP), :]  # (8, lanes) int32
        wchunk = win_ref[pl.ds(base, CH), :]  # (CH, lanes) int32
        # i32 scalar -> broadcast vector once per chunk; per-step index math
        # stays vector-shaped (Mosaic supports only i32 scalar arithmetic)
        basev = jnp.zeros((1, lanes), jnp.int32) + base

        for s in range(_STEP):
            iv = basev + s  # (1, lanes)
            active = iv < lengths[None, :]
            rchar = rchunk[s, :][None, :]  # (1, lanes)
            wrows = wchunk[s : s + band, :]  # (band, lanes) static slice
            sub = jnp.where((wrows == rchar) & (rchar < 4), jnp.int32(0), jnp.int32(1))
            diag = D + sub
            ins = jnp.concatenate([D[1:, :], jnp.full((1, lanes), inf)], axis=0) + 1
            tmp = jnp.minimum(diag, ins)
            # j = i + b - k must be a real window position for this cell to exist
            j = iv + boff
            tmp = jnp.where((j >= 0) & (j < W), tmp, inf)
            # window-deletion running min: min-plus scan, log2(band) shifted mins
            r = tmp
            sh = 1
            while sh < band:
                shifted = jnp.concatenate(
                    [jnp.full((sh, lanes), inf), r[:-sh, :]], axis=0
                ) + sh
                r = jnp.minimum(r, shifted)
                sh <<= 1
            D = jnp.where(active, r, D)
        return D

    D = jax.lax.fori_loop(0, T, outer, D0)

    j_end = lengths[None, :] + boff
    Df = jnp.where((j_end >= 0) & (j_end <= W), D, inf)
    # Mosaic lacks integer argmin: fold the band slot into a composite key
    # (min(Df, INF) <= 2^20, band <= 17 -> key < 2^25, no overflow)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (band, lanes), 0)
    key = jnp.min(jnp.minimum(Df, inf) * band + b_idx, axis=0)
    # dead lanes saturate to exactly INF (same clamp as ops.dp)
    dist_ref[0, :] = jnp.minimum(key // band, inf)
    endb_ref[0, :] = key % band


@partial(jax.jit, static_argnames=("k", "interpret", "lanes"))
def banded_edit_distance_pallas(
    reads: jax.Array,  # (Q, L) int codes
    lengths: jax.Array,  # (Q,)
    windows: jax.Array,  # (Q, W) int codes
    k: int,
    interpret: bool = False,
    lanes: int = LANES,
):
    """Drop-in for ops.dp.banded_edit_distance; Q padded to a lane multiple.

    NOTE dead-lane end_b may differ from the jnp engine (both are garbage
    there); dist is bit-identical everywhere.
    """
    Q, L = reads.shape
    W = windows.shape[1]
    band = 4 * k + 1
    if L >= INF:  # distances must stay below the saturation value
        raise ValueError(f"read length {L} >= {INF}: kernel would saturate")
    Qp = -(-Q // lanes) * lanes
    T = -(-L // _STEP)
    Lp = T * _STEP  # read rows padded to the chunk height
    CH = -(-(band + _STEP - 1) // _STEP) * _STEP  # window rows per chunk
    H = (T - 1) * _STEP + CH  # max chunk end; multiple of 8

    readsT = jnp.zeros((Lp, Qp), jnp.int32).at[:L, :Q].set(reads.astype(jnp.int32).T)
    # pad-shift: padded[j + k] = windows[j]; height covers the last chunk
    padT = jnp.full((H, Qp), 4, jnp.int32)
    take = min(W, H - k)
    padT = padT.at[k : k + take, :Q].set(windows.astype(jnp.int32)[:, :take].T)
    lenp = jnp.zeros((1, Qp), jnp.int32).at[0, :Q].set(lengths.astype(jnp.int32))

    dist, endb = kernel_call(
        readsT, lenp, padT, L=L, W=W, k=k, lanes=lanes, interpret=interpret
    )
    return dist[0, :Q], endb[0, :Q]


@partial(jax.jit, static_argnames=("L", "W", "k", "lanes", "interpret"))
def kernel_call(readsT, lenp, padT, *, L, W, k, lanes, interpret=False):
    """The bare pallas_call on pre-formatted (transposed, padded) inputs —
    the hot-loop entry the bench times separately from the layout work
    (transposes/pads are per-batch XLA cost, not kernel cost)."""
    band = 4 * k + 1
    Lp = readsT.shape[0]
    H = padT.shape[0]
    Qp = readsT.shape[1]
    CH = -(-(band + _STEP - 1) // _STEP) * _STEP
    grid = (Qp // lanes,)
    return pl.pallas_call(
        partial(_kernel, L=L, W=W, k=k, band=band, lanes=lanes, CH=CH),
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lp, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(readsT, lenp, padT)
