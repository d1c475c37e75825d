"""Pallas TPU wavefront kernel for the banded edit-distance verify (P5).

Layout (VPU-shaped): candidates ride the 128-lane axis, the band rides the
sublane axis — each grid program advances a (band, 128) DP wavefront over one
128-candidate tile, entirely in registers/VMEM, one read position per step.
The window tensor is pre-transposed and pad-shifted so step ``i`` reads rows
``[i, i+band)`` — a static-size dynamic slice, no masking in the inner loop
(pad code 4 never matches; pad paths are dominated by free-start/free-end
paths, so the distance is unaffected).

Matches ``ops.dp.banded_edit_distance`` bit-for-bit (asserted in tests, which
run the kernel in interpreter mode on CPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1 << 20  # plain int: jnp scalars would be captured consts in the kernel
LANES = 128


def _kernel(reads_ref, len_ref, win_ref, dist_ref, endb_ref, *, L, W, k, band):
    lengths = len_ref[0, :]  # (LANES,)
    boff = jax.lax.broadcasted_iota(jnp.int32, (band, LANES), 0) - k

    D0 = jnp.where(boff >= 0, 0, INF)

    def step(i, D):
        active = (i < lengths)[None, :]
        rchar = reads_ref[i, :][None, :]  # (1, LANES)
        wrows = win_ref[pl.ds(i, band), :]  # (band, LANES)
        sub = jnp.where((wrows == rchar) & (rchar < 4), 0, 1)
        diag = D + sub
        ins = jnp.concatenate([D[1:, :], jnp.full((1, LANES), INF)], axis=0) + 1
        tmp = jnp.minimum(diag, ins)
        # j = i + b - k must be a real window position for this cell to exist
        j = i + boff
        tmp = jnp.where((j >= 0) & (j < W), tmp, INF)
        rows = [tmp[0:1, :]]
        for b in range(1, band):
            rows.append(jnp.minimum(tmp[b : b + 1, :], rows[-1] + 1))
        Dn = jnp.concatenate(rows, axis=0)
        return jnp.where(active, Dn, D)

    D = jax.lax.fori_loop(0, L, step, D0)

    j_end = lengths[None, :] + boff
    Df = jnp.where((j_end >= 0) & (j_end <= W), D, INF)
    # Mosaic lacks integer argmin: fold the band slot into a composite key
    # (dist * band + b fits int32 comfortably; INF = 2^20, band <= 17)
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (band, LANES), 0)
    key = jnp.min(Df * band + b_idx, axis=0)
    dist_ref[0, :] = key // band
    endb_ref[0, :] = key % band


@partial(jax.jit, static_argnames=("k", "interpret"))
def banded_edit_distance_pallas(
    reads: jax.Array,  # (Q, L) int codes
    lengths: jax.Array,  # (Q,)
    windows: jax.Array,  # (Q, W) int codes
    k: int,
    interpret: bool = False,
):
    """Drop-in for ops.dp.banded_edit_distance; Q padded to a lane multiple."""
    Q, L = reads.shape
    W = windows.shape[1]
    band = 4 * k + 1
    Qp = -(-Q // LANES) * LANES

    readsT = jnp.zeros((L, Qp), jnp.int32).at[:, :Q].set(reads.astype(jnp.int32).T)
    # pad-shift: padded[j + k] = windows[j]; height covers i + band - 1
    H = L + 4 * k + 1
    padT = jnp.full((H, Qp), 4, jnp.int32)
    take = min(W, H - k)
    padT = padT.at[k : k + take, :Q].set(windows.astype(jnp.int32)[:, :take].T)
    lenp = jnp.zeros((1, Qp), jnp.int32).at[0, :Q].set(lengths.astype(jnp.int32))

    grid = (Qp // LANES,)
    dist, endb = pl.pallas_call(
        partial(_kernel, L=L, W=W, k=k, band=band),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, LANES), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, LANES), lambda q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, LANES), lambda q: (0, q), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda q: (0, q), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(readsT, lenp, padT)
    return dist[0, :Q], endb[0, :Q]
