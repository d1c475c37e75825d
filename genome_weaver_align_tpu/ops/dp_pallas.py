"""Pallas TPU wavefront kernel for the banded edit-distance verify (P5).

Layout (VPU-shaped): candidates ride the 128-lane axis (``lanes`` per grid
program, a multiple of 128), the band rides the sublane axis — each grid
program advances a (band, lanes) DP wavefront over one candidate tile,
entirely in registers/VMEM, one read position per step.  The window tensor
is pre-transposed and pad-shifted so step ``i`` reads rows ``[i, i+band)``
— a static-size dynamic slice, no masking in the inner loop (pad code 4
never matches; pad paths are dominated by free-start/free-end paths, so the
distance is unaffected).

Cells are int16 (half the VPU tiles of int32; distances are <= L << 2^12)
and the in-row deletion dependency is a log-step min-plus scan
(ceil(log2 band) shifted minimums instead of a band-long serial chain).

Matches ``ops.dp.banded_edit_distance`` bit-for-bit — including dead lanes,
which both engines clamp to exactly INF (asserted in tests, which run the
kernel in interpreter mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 20  # public (int32) saturation value, matches ops.dp.INF
_INF16 = 1 << 12  # in-kernel int16 infinity; real distances are <= L < 2^12
LANES = 512  # candidates per grid program (multiple of 128)


def _kernel(reads_ref, len_ref, win_ref, dist_ref, endb_ref, *, L, W, k, band, lanes):
    # everything inside the loop is int16 (values and comparisons) so Mosaic
    # keeps one (16, 128) layout — mixing int32-derived i1 masks into int16
    # selects forces an unsupported relayout
    lengths = len_ref[0, :]  # (lanes,) int16
    boff32 = jax.lax.broadcasted_iota(jnp.int32, (band, lanes), 0) - k
    boff = boff32.astype(jnp.int16)
    inf16 = jnp.int16(_INF16)
    W16 = jnp.int16(W)

    D0 = jnp.where(boff >= 0, jnp.int16(0), inf16)

    def step(i, D):
        i16 = i.astype(jnp.int16)
        active = (i16 < lengths)[None, :]
        # refs stay int32 (dynamic sublane loads of int16 are unsupported);
        # cast to int16 right after the load
        rchar = reads_ref[i, :][None, :].astype(jnp.int16)  # (1, lanes)
        wrows = win_ref[pl.ds(i, band), :].astype(jnp.int16)  # (band, lanes)
        sub = jnp.where((wrows == rchar) & (rchar < 4), jnp.int16(0), jnp.int16(1))
        diag = D + sub
        ins = jnp.concatenate([D[1:, :], jnp.full((1, lanes), inf16)], axis=0) + jnp.int16(1)
        tmp = jnp.minimum(diag, ins)
        # j = i + b - k must be a real window position for this cell to exist
        j = i16 + boff
        tmp = jnp.where((j >= 0) & (j < W16), tmp, inf16)
        # window-deletion running min: min-plus scan, log2(band) shifted mins
        r = tmp
        s = 1
        while s < band:
            shifted = jnp.concatenate(
                [jnp.full((s, lanes), inf16), r[:-s, :]], axis=0
            ) + jnp.int16(s)
            r = jnp.minimum(r, shifted)
            s <<= 1
        return jnp.where(active, r, D)

    D = jax.lax.fori_loop(0, L, step, D0)

    j_end = lengths.astype(jnp.int32)[None, :] + boff32
    Df = jnp.where((j_end >= 0) & (j_end <= W), D.astype(jnp.int32), INF)
    # Mosaic lacks integer argmin: fold the band slot into a composite key
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (band, lanes), 0)
    key = jnp.min(jnp.minimum(Df, _INF16) * band + b_idx, axis=0)
    dist = key // band
    # dead lanes saturate to exactly INF (same clamp as ops.dp)
    dist_ref[0, :] = jnp.where(dist >= _INF16, INF, dist)
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
    Qp = -(-Q // lanes) * lanes

    readsT = jnp.zeros((L, Qp), jnp.int32).at[:, :Q].set(reads.astype(jnp.int32).T)
    # pad-shift: padded[j + k] = windows[j]; height covers i + band - 1
    H = L + 4 * k + 1
    padT = jnp.full((H, Qp), 4, jnp.int32)
    take = min(W, H - k)
    padT = padT.at[k : k + take, :Q].set(windows.astype(jnp.int32)[:, :take].T)
    lenp = jnp.zeros((1, Qp), jnp.int16).at[0, :Q].set(lengths.astype(jnp.int16))

    grid = (Qp // lanes,)
    dist, endb = pl.pallas_call(
        partial(_kernel, L=L, W=W, k=k, band=band, lanes=lanes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, lanes), lambda q: (0, q), memory_space=pltpu.VMEM),
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
    return dist[0, :Q], endb[0, :Q]
